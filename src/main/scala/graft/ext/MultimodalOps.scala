package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * IMAGE decode is REAL: [[realDecode]] round-trips deterministic PNGs
  * through the JDK's own `javax.imageio` codec (pixels in, pixels out,
  * oracle-checked dimensions + mean RGB). AUDIO decode is REAL too:
  * [[audioDecode]] round-trips deterministic PCM16 WAVs through
  * `javax.sound.sampled` (samples in, samples out, oracle-checked rate /
  * length / amplitude stats). Only VIDEO decode remains a clearly-marked
  * deterministic stub ([[fakeDecode]]) — the container ships no video
  * codec — with everything Spark-side (binary
  * schema, batched partition processing, metadata extraction as columns)
  * real and tested. The batch shape (fixed-size chunks per partition, the
  * Scala analogue of `mapInPandas` Arrow batches) is what matters for
  * vectorized decode throughput at scale.
  */
object MultimodalOps {

  /** ImageIO's default stream cache is FILE-backed: every
    * `ImageIO.read(InputStream)` / `write` spins up (and deletes) a temp
    * file, so a 50k-image partition scan becomes 50k filesystem round-trips
    * that serialize under concurrency — measured 3.7× on 10× rows before
    * this switch (SCALING.md). In-memory payloads want memory-cached
    * streams; flip the JVM-wide default once. */
  private lazy val imageIoMemCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** The JDK's PNG codec SPIs, resolved ONCE per executor JVM — the
    * `ImageIO.read`/`write` facade walks the IIORegistry per call (same
    * story as [[wavReader]]'s registry contention). Reader/writer INSTANCES
    * are not thread-safe; the SPI hands out a fresh one per image for the
    * cost of a constructor. */
  private lazy val pngReaderSpi: javax.imageio.spi.ImageReaderSpi = {
    imageIoMemCache
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
    require(it.hasNext, "no JDK PNG ImageReader on this JVM")
    it.next().getOriginatingProvider
  }
  private lazy val pngWriterSpi: javax.imageio.spi.ImageWriterSpi = {
    imageIoMemCache
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
    require(it.hasNext, "no JDK PNG ImageWriter on this JVM")
    it.next().getOriginatingProvider
  }

  /** Deterministic FAKE decode: metadata derived from the payload bytes.
    * STUB for the video modality only (the JDK has no codec for it; images
    * go through the real [[realDecode]] path, audio through the real
    * [[audioDecode]] path). Kept total and pure so tests and oracles are
    * stable. */
  def fakeDecode(nbytes: Long): (Long, Long, Long, Long) = {
    val width = 64L + nbytes % 576L
    val height = 64L + (nbytes * 7L) % 416L
    val sampleRate = 8000L + (nbytes % 8L) * 1000L
    val nFrames = 1L + nbytes % 240L
    (width, height, sampleRate, nFrames)
  }

  /** Column-expression form of [[fakeDecode]] (codegen'd; used by the oracle
    * query so both engines compute identical metadata). */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("modality",
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video"))
      .withColumn("nbytes", octet_length(col("payload")).cast("long"))
      .withColumn("width", lit(64L) + col("nbytes") % 576L)
      .withColumn("height", lit(64L) + (col("nbytes") * 7L) % 416L)
      .withColumn("sample_rate", lit(8000L) + (col("nbytes") % 8L) * 1000L)
      .withColumn("n_frames", lit(1L) + col("nbytes") % 240L)
      .select(
        col("doc_id"), col("modality"), col("nbytes"),
        when(col("modality") === "image", col("width")).as("width"),
        when(col("modality") === "image", col("height")).as("height"),
        when(col("modality") === "audio", col("sample_rate")).as("sample_rate"),
        when(col("modality") === "video", col("n_frames")).as("n_frames"),
        // frame sampling: every 30th frame index, count of sampled frames
        when(col("modality") === "video",
          (floor((col("n_frames") - 1) / 30) + 1).cast("long")).as("n_sampled_frames"))
      .orderBy("doc_id")

  private val binaryMetaSql =
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nbytes
      |  FROM documents)
      |SELECT doc_id, modality, nbytes,
      |  CASE WHEN modality = 'image' THEN 64 + nbytes % 576 END AS width,
      |  CASE WHEN modality = 'image' THEN 64 + (nbytes * 7) % 416 END AS height,
      |  CASE WHEN modality = 'audio' THEN 8000 + (nbytes % 8) * 1000 END AS sample_rate,
      |  CASE WHEN modality = 'video' THEN 1 + nbytes % 240 END AS n_frames,
      |  CASE WHEN modality = 'video'
      |       THEN CAST(floor(((1 + nbytes % 240) - 1) / 30) + 1 AS BIGINT) END AS n_sampled_frames
      |FROM b ORDER BY doc_id""".stripMargin

  /** Batched partition-level decode + resize + feature-extract — the Scala
    * analogue of a Pandas UDF over `mapInPandas`: rows stream per partition
    * in fixed-size batches so a vectorized codec amortizes per-call
    * overhead. The decode/resize/feature bodies are deterministic STUBS (no
    * codecs in this container); the schema, batch shape, and partition
    * plumbing are the real thing. */
  def decodeBatched(df: DataFrame, batchSize: Int = 32,
      targetW: Long = 224L, targetH: Long = 224L): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("nbytes", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("resized_w", LongType),
      StructField("resized_h", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // spread before the decode (guide §2.5 input skew): the single-file
    // store arrives as ONE split, so without it every batch decodes on one
    // core. This site's exchange carries the PAYLOAD, not just doc_id, so
    // on a multi-split store it would be a full-corpus shuffle — the r17
    // guard (graft.util.Spread) skips it there and sizes the partition
    // count by input bytes otherwise.
    df.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .transform(graft.util.Spread.byCols(_, col("doc_id"))) // guarded spread (r17)
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // STUB decode per batch — a real impl hands `batch` to a codec once.
          batch.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            val nbytes = payload.length.toLong
            val (w, h, _, _) = fakeDecode(nbytes)
            // STUB resize: aspect-preserving letterbox dims. floor(x + 0.5)
            // — NOT Math.round, which compensates for double-rounding since
            // JDK 7 and can differ by 1 near half-integers; the oracle SQL
            // computes the identical floor(x + 0.5) IEEE expression.
            val scale = math.min(targetW.toDouble / w, targetH.toDouble / h)
            val (rw, rh) =
              (math.floor(w * scale + 0.5).toLong, math.floor(h * scale + 0.5).toLong)
            // STUB feature-extract: 8-dim embedding from the first bytes
            val feat = Array.tabulate(8)(i =>
              if (i < payload.length) (payload(i) & 0xff) / 255.0f else 0.0f)
            Row(r.getAs[Long]("doc_id"), nbytes, w, h, rw, rh, feat.toSeq)
          }
        }
      }(enc)
  }

  /** The batched mapPartitions decode path under the oracle gate: scalar
    * outputs (sizes + letterbox resize dims) are deterministic and checked
    * against DuckDB; the float feature vector stays spec-tested
    * (MultimodalSpec) — byte-level string access differs across engines.
    * resize rounding is floor(x + 0.5) on BOTH sides (the Scala stub avoids
    * Math.round, whose double-rounding compensation can differ by 1). */
  def batchedDecode(spark: SparkSession, sfDir: String): DataFrame =
    decodeBatched(Tables.documents(spark, sfDir))
      .select("doc_id", "nbytes", "width", "height", "resized_w", "resized_h")
      .orderBy("doc_id")

  private val batchedDecodeSql =
    """WITH b AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS nbytes FROM documents),
      |d AS (SELECT doc_id, nbytes,
      |        64 + nbytes % 576 AS w, 64 + (nbytes * 7) % 416 AS h FROM b)
      |SELECT doc_id, nbytes, w AS width, h AS height,
      |  CAST(floor(w * least(224.0 / w, 224.0 / h) + 0.5) AS BIGINT) AS resized_w,
      |  CAST(floor(h * least(224.0 / w, 224.0 / h) + 0.5) AS BIGINT) AS resized_h
      |FROM d ORDER BY doc_id""".stripMargin

  /** Deterministic PNG fixture: a `w × h` row-striped RGB image whose
    * dimensions and per-row channel values are closed-form functions of
    * `doc_id` — so the ORACLE can predict what a real decoder must read
    * back without itself decoding PNG. PNG is lossless; the JDK codec must
    * return these exact pixels. */
  def encodePng(docId: Long): Array[Byte] = {
    val w = (8 + docId % 16).toInt
    val h = (8 + (docId * 3) % 12).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val r = ((docId * 7 + y) % 256).toInt
      val g = ((docId * 13 + 2L * y) % 256).toInt
      val b = ((docId * 31 + 3L * y) % 256).toInt
      val rgb = (r << 16) | (g << 8) | b
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    val w2 = pngWriterSpi.createWriterInstance()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try { w2.setOutput(out); w2.write(img); out.flush() }
    finally { w2.dispose(); out.close() }
    baos.toByteArray
  }

  /** REAL image decode — no stub: synthesize a deterministic PNG per
    * document into the binary column (fixture-build step), then decode REAL
    * pixels back through the JDK's `javax.imageio` PNG codec in the same
    * batched `mapPartitions` shape as [[decodeBatched]], extracting
    * dimensions and mean RGB. The oracle reproduces the closed-form
    * expectations ([[encodePng]]'s row stripes) — a decoder that misread
    * size, channel order, or any pixel fails the hash compare. Mean = exact
    * integer pixel sum / exact pixel count in one IEEE division, identical
    * on both engines. */
  def realDecode(df: DataFrame, batchSize: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col("doc_id")) // see decodeBatched: spread the 1-split store before decoding
      .transform(graft.util.Spread.byCols(_, col("doc_id"))) // guarded spread (r17)
      .mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          // fixture-build payload, then the REAL decode: JDK PNG codec via
          // the JVM-cached SPI (the ImageIO facade walks the registry per
          // call), actual pixels
          val img = decodePng(encodePng(id))
          val (w, h) = (img.getWidth, img.getHeight)
          val (sr, sg, sb) = sumRgb(img)
          val n = (w * h).toDouble
          Row(id, w.toLong, h.toLong, sr / n, sg / n, sb / n)
        }
      }
    }(enc)
  }

  def realDecodeQuery(spark: SparkSession, sfDir: String): DataFrame =
    realDecode(Tables.documents(spark, sfDir)).orderBy("doc_id")

  private val realDecodeSql =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id * 3) % 12 AS h FROM documents),
      |py AS (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM d)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  avg((doc_id * 7 + y) % 256) AS mean_r,
      |  avg((doc_id * 13 + 2 * y) % 256) AS mean_g,
      |  avg((doc_id * 31 + 3 * y) % 256) AS mean_b
      |FROM py GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  /** Decode a PNG payload through the JVM-cached codec — the shared decode
    * kernel of [[realDecode]], [[resizeThumb]] and [[frameSample]]. */
  private def decodePng(png: Array[Byte]): java.awt.image.BufferedImage = {
    val rdr = pngReaderSpi.createReaderInstance()
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(png))
    try { rdr.setInput(in); rdr.read(0) }
    finally { rdr.dispose(); in.close() }
  }

  /** Whole-image per-channel pixel sums — the shared stats kernel of
    * [[realDecode]] and [[frameSample]]. */
  private def sumRgb(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** REAL thumbnail resize — the standard curation preprocessing step
    * (decode → fixed-size thumbnail → embed): decodes the PNG fixture's
    * real pixels, then resamples NEAREST-NEIGHBOR to `side × side` with the
    * canonical integer mapping `src = (dst · srcDim) / side` — deterministic
    * by construction, unlike `Image.getScaledInstance`'s
    * implementation-defined kernels, which is what lets the oracle predict
    * the thumbnail's mean RGB in closed form (row stripes sample at
    * `(y·h)//side`). Same batched mapPartitions shape as [[realDecode]];
    * means are exact integer sums over the side² sampled pixels in one IEEE
    * division (division by a power of two — exact on both engines). */
  def resizeThumb(df: DataFrame, side: Int = 8, batchSize: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("thumb_mean_r", DoubleType),
      StructField("thumb_mean_g", DoubleType),
      StructField("thumb_mean_b", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col("doc_id")) // see decodeBatched: spread the 1-split store before decoding
      .transform(graft.util.Spread.byCols(_, col("doc_id"))) // guarded spread (r17)
      .mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val img = decodePng(encodePng(id))
          val (w, h) = (img.getWidth, img.getHeight)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < side) {
            val sy = y * h / side
            var x = 0
            while (x < side) {
              val rgb = img.getRGB(x * w / side, sy)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = (side * side).toDouble
          Row(id, w.toLong, h.toLong, sr / n, sg / n, sb / n)
        }
      }
    }(enc)
  }

  def resizeThumbQuery(spark: SparkSession, sfDir: String): DataFrame =
    resizeThumb(Tables.documents(spark, sfDir)).orderBy("doc_id")

  private val resizeThumbSql =
    """WITH d AS (
      |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id * 3) % 12 AS h FROM documents),
      |py AS (SELECT doc_id, w, h, (unnest(range(0, 8)) * h) // 8 AS sy FROM d)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  avg((doc_id * 7 + sy) % 256) AS thumb_mean_r,
      |  avg((doc_id * 13 + 2 * sy) % 256) AS thumb_mean_g,
      |  avg((doc_id * 31 + 3 * sy) % 256) AS thumb_mean_b
      |FROM py GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  /** Frames-container fixture for [[frameSample]]: `4 + doc_id % 5` PNG
    * frames, length-prefixed behind a `FRM0` magic + frame-count header —
    * the seekable-index shape every real demuxer exposes. Frame `f` is
    * [[encodePng]]'s image for the derived id `doc_id·11 + f`, so every
    * sampled frame's dimensions and stripes stay closed-form for the
    * oracle. (The JDK ships no video codec — the CONTAINER is the honest
    * synthetic piece, exactly as documented on [[fakeDecode]]; the
    * per-frame pixel decode is the real PNG codec.) */
  def encodeFrames(docId: Long): Array[Byte] = {
    val n = (4 + docId % 5).toInt
    val baos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(baos)
    dos.writeInt(0x46524d30) // "FRM0"
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val p = encodePng(docId * 11 + f)
      dos.writeInt(p.length); dos.write(p); f += 1
    }
    dos.flush()
    baos.toByteArray
  }

  /** REAL frame sampling — the video-pipeline step (demux → keep every k-th
    * frame → decode those): walks the container's frame index, SKIPS
    * non-sampled frames without decoding them (the point of stride
    * sampling — decode cost scales with kept frames, not stored frames),
    * and runs the real PNG codec on the kept ones. One output row per
    * (doc, sampled frame) with decoded dimensions + mean RGB,
    * oracle-predicted in closed form. */
  def frameSample(df: DataFrame, stride: Int = 2, batchSize: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_frames", LongType),
      StructField("frame_idx", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col("doc_id")) // see decodeBatched: spread the 1-split store before decoding
      .transform(graft.util.Spread.byCols(_, col("doc_id"))) // guarded spread (r17)
      .mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val id = r.getLong(0)
          val dis = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(encodeFrames(id)))
          require(dis.readInt() == 0x46524d30, s"bad frames magic for doc $id")
          val n = dis.readInt()
          (0 until n).flatMap { f =>
            val len = dis.readInt()
            if (f % stride != 0) { dis.skipBytes(len); None }
            else {
              val png = new Array[Byte](len)
              dis.readFully(png)
              val img = decodePng(png)
              val (w, h) = (img.getWidth, img.getHeight)
              val (sr, sg, sb) = sumRgb(img)
              val p = (w * h).toDouble
              Some(Row(id, n.toLong, f.toLong, w.toLong, h.toLong, sr / p, sg / p, sb / p))
            }
          }
        }
      }
    }(enc)
  }

  def frameSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    frameSample(Tables.documents(spark, sfDir)).orderBy("doc_id", "frame_idx")

  private val frameSampleSql =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS n FROM documents),
      |f AS (SELECT doc_id, n, unnest(range(0, n)) AS fi FROM d),
      |s AS (SELECT doc_id, n, fi, doc_id * 11 + fi AS fid FROM f WHERE fi % 2 = 0),
      |dims AS (SELECT doc_id, n, fi, fid,
      |          8 + fid % 16 AS w, 8 + (fid * 3) % 12 AS h FROM s),
      |py AS (SELECT doc_id, n, fi, fid, w, h, unnest(range(0, h)) AS y FROM dims)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_frames, CAST(fi AS BIGINT) AS frame_idx,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  avg((fid * 7 + y) % 256) AS mean_r,
      |  avg((fid * 13 + 2 * y) % 256) AS mean_g,
      |  avg((fid * 31 + 3 * y) % 256) AS mean_b
      |FROM py GROUP BY doc_id, n, fi, w, h ORDER BY doc_id, frame_idx""".stripMargin

  /** Closed-form PCM16 sample stream for [[encodeWav]]: value of sample `i`
    * of document `docId` — integer-only, reproduced verbatim by the oracle.
    * Range ±2000 fits int16 with headroom. */
  def wavSample(docId: Long, i: Long): Int =
    (((docId * 31L + i * 17L) % 4001L) - 2000L).toInt

  /** Samples per doc / sample rate for the WAV fixture (closed forms the
    * oracle reproduces). */
  def wavSamples(docId: Long): Int = (200L + (docId * 7L) % 300L).toInt
  def wavRate(docId: Long): Int = (8000L + (docId % 4L) * 2000L).toInt

  /** The JDK's own RIFF/WAVE codec, resolved ONCE per executor JVM through
    * the public SPI. Going through the `AudioSystem` facade instead costs a
    * provider-registry lookup PER CALL, and that registry is a synchronized
    * static in the JDK (`JDK13Services.getProviders`) — 32 executor threads
    * serialize on it and the op turns super-linear under load (measured
    * 25.7× on 10× rows before this cache; see SCALING.md). Same codec
    * classes `AudioSystem` would select, no per-call lock. */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.find { r =>
        try { r.getAudioFileFormat(new java.io.ByteArrayInputStream(rawEncodeWav(0L))); true }
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => false }
      }.getOrElse(sys.error("no JDK WAV AudioFileReader on this JVM"))
  }
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala.find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no JDK WAV AudioFileWriter on this JVM"))
  }

  /** [[encodeWav]] through the facade — used only to PROBE for the WAV
    * reader provider (one call per JVM, before [[wavReader]] exists). */
  private def rawEncodeWav(docId: Long): Array[Byte] = {
    val n = wavSamples(docId)
    val sr = wavRate(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = wavSample(docId, i)
      pcm(2 * i) = (v & 0xff).toByte // little-endian int16
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Deterministic WAV fixture: mono 16-bit signed little-endian PCM whose
    * sample values, count, and rate are closed-form functions of `doc_id`
    * ([[wavSample]]/[[wavSamples]]/[[wavRate]]) — so the ORACLE can predict
    * what a real decoder must read back without parsing RIFF itself. WAV PCM
    * is lossless; the JDK codec must return these exact samples. Writes via
    * the JVM-cached [[wavWriter]] SPI (see its note on registry contention).
    */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = wavSamples(docId)
    val sr = wavRate(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = wavSample(docId, i)
      pcm(2 * i) = (v & 0xff).toByte // little-endian int16
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL audio decode — the audio-modality stub is gone: synthesize a
    * deterministic WAV per document into the binary column (fixture-build
    * step), then decode REAL samples back through the JDK's own
    * `javax.sound.sampled` RIFF/WAVE codec in the same batched
    * `mapPartitions` shape as [[decodeBatched]] (a vectorized codec
    * amortizes per-call overhead per fixed-size chunk). Extracted features
    * are the standard audio-curation metadata: sample rate, length,
    * duration, peak amplitude, mean |amplitude|, mean square (energy).
    * Every value is an exact integer or ONE IEEE division of exact
    * integers, so the oracle — which reproduces the closed-form sample
    * stream — matches bit-for-bit; a decoder that misread the header,
    * endianness, or any sample fails the hash compare. Shuffle-free
    * per-partition projection at any scale. */
  def audioDecode(df: DataFrame, batchSize: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", LongType),
      StructField("n_samples", LongType),
      StructField("duration_s", DoubleType),
      StructField("peak_abs", LongType),
      StructField("mean_abs", DoubleType),
      StructField("mean_square", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col("doc_id")) // see decodeBatched: spread the 1-split store before decoding
      .transform(graft.util.Spread.byCols(_, col("doc_id"))) // guarded spread (r17)
      .mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val wav = encodeWav(id) // fixture-build: the opaque binary payload
          // the REAL decode: JDK RIFF/WAVE codec (JVM-cached SPI — the
          // AudioSystem facade's per-call registry lock serializes executor
          // threads; see wavReader), actual PCM frames
          val ais = wavReader.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"doc $id: unexpected decoded format $fmt")
          val sr = fmt.getSampleRate.toLong
          val bytes = ais.readAllBytes()
          ais.close()
          val n = bytes.length / 2
          var sumAbs = 0L; var sumSq = 0L; var peak = 0L
          var i = 0
          while (i < n) {
            // little-endian signed int16 (the decoded stream's format)
            val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
            val a = math.abs(v)
            sumAbs += a; sumSq += v * v
            if (a > peak) peak = a
            i += 1
          }
          Row(id, sr, n.toLong, n.toDouble / sr, peak,
            sumAbs.toDouble / n, sumSq.toDouble / n)
        }
      }
    }(enc)
  }

  def audioDecodeQuery(spark: SparkSession, sfDir: String): DataFrame =
    audioDecode(Tables.documents(spark, sfDir)).orderBy("doc_id")

  private val audioDecodeSql =
    """WITH d AS (
      |  SELECT doc_id, 8000 + (doc_id % 4) * 2000 AS sr, 200 + (doc_id * 7) % 300 AS n
      |  FROM documents),
      |s AS (SELECT doc_id, sr, n, unnest(range(0, n)) AS i FROM d),
      |v AS (SELECT doc_id, sr, n, ((doc_id * 31 + i * 17) % 4001) - 2000 AS v FROM s)
      |SELECT doc_id, CAST(sr AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples,
      |  CAST(n AS DOUBLE) / sr AS duration_s,
      |  CAST(max(abs(v)) AS BIGINT) AS peak_abs,
      |  CAST(sum(abs(v)) AS DOUBLE) / n AS mean_abs,
      |  CAST(sum(v * v) AS DOUBLE) / n AS mean_square
      |FROM v GROUP BY doc_id, sr, n ORDER BY doc_id""".stripMargin

  /** Family-structured PNG fixture for [[phashDedup]]: family
    * `q = doc_id % 97` fixes dimensions and row stripes (the [[encodePng]]
    * pattern with channels mod 200), and replica index `doc_id / 97` adds a
    * uniform brightness delta `(doc_id / 97) % 20` to every channel (no
    * clamping: 199 + 19 < 256). Family members are therefore
    * brightness-shifted RE-ENCODES of one image — the canonical near-dup an
    * average-hash must collapse, and byte-level/exact dedup cannot. */
  def encodePngFam(docId: Long): Array[Byte] = {
    val q = docId % 97
    val delta = ((docId / 97) % 20).toInt
    val w = (8 + q % 16).toInt
    val h = (8 + (q * 3) % 12).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      // quadratic row terms keep the stripe profile non-monotone, so the
      // 8-row average-hash separates families instead of collapsing every
      // gradient-like image onto one low/high pattern
      val r = ((q * 7 + 37L * y * y) % 200).toInt + delta
      val g = ((q * 13 + 23L * y * y + 2L * y) % 200).toInt + delta
      val b = ((q * 31 + 41L * y * y + 3L * y) % 200).toInt + delta
      val rgb = (r << 16) | (g << 8) | b
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    val w2 = pngWriterSpi.createWriterInstance()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try { w2.setOutput(out); w2.write(img); out.flush() }
    finally { w2.dispose(); out.close() }
    baos.toByteArray
  }

  /** REAL image near-duplicate detection via the average hash (aHash —
    * Krawetz's "Looks Like It" construction, the `imagededup`/pHash family
    * baseline): decode real pixels through the JDK codec, nearest-neighbor
    * sample an 8×8 luminance grid ([[resizeThumb]]'s integer mapping,
    * lum = r+g+b with no division), set bit `i` when its cell is brighter
    * than the image mean, pack 64 bits into two 32-bit words. The mean
    * compare is the EXACT integer form `64·lum > total` (total over all 64
    * cells), so a uniform brightness shift adds the same amount to both
    * sides and cancels — [[encodePngFam]]'s brightness-replica families
    * collapse to one hash BY CONSTRUCTION of the algorithm, not the
    * fixture, while exact byte dedup would see distinct files.
    *
    * Dup groups are exact-equal hashes: ONE shuffle of (doc_id, 2×int64) —
    * 16 bytes per image regardless of image size, so at 100 TB of images
    * the grouping stage moves ~GBs. Output per doc: hash words, group size,
    * canonical (min doc id), and the drop flag. */
  def phashDedup(df: DataFrame, batchSize: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ph0", LongType),
      StructField("ph1", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val hashed = df.select(col("doc_id")) // see decodeBatched: spread the 1-split store before decoding
      .transform(graft.util.Spread.byCols(_, col("doc_id"))) // guarded spread (r17)
      .mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val img = decodePng(encodePngFam(id))
          val (w, h) = (img.getWidth, img.getHeight)
          val lum = new Array[Long](64)
          var total = 0L
          var y = 0
          while (y < 8) {
            val sy = y * h / 8
            var x = 0
            while (x < 8) {
              val rgb = img.getRGB(x * w / 8, sy)
              val l = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              lum(y * 8 + x) = l
              total += l
              x += 1
            }
            y += 1
          }
          var ph0 = 0L; var ph1 = 0L
          var i = 0
          while (i < 64) {
            if (64L * lum(i) > total) {
              val bit = 1L << (31 - (i % 32))
              if (i < 32) ph0 += bit else ph1 += bit
            }
            i += 1
          }
          Row(id, ph0, ph1)
        }
      }
    }(enc)
    import org.apache.spark.sql.expressions.Window
    val grp = Window.partitionBy("ph0", "ph1")
    hashed
      .withColumn("group_size", count(lit(1)).over(grp).cast("long"))
      .withColumn("canonical", min(col("doc_id")).over(grp))
      .withColumn("is_dup", col("doc_id") =!= col("canonical"))
      .orderBy("doc_id")
  }

  def phashDedupQuery(spark: SparkSession, sfDir: String): DataFrame =
    phashDedup(Tables.documents(spark, sfDir))

  /** Oracle: the fixture's stripes are constant per row, so each 8×8 cell
    * row shares one luminance; the brightness delta cancels out of the
    * `64·lum > total` compare, so the oracle derives the hash from the
    * FAMILY's delta-free stripes in closed form. Row y of word 0 occupies
    * bits 31−8y…24−8y → weight 255·2^(24−8y) when set. */
  private val phashDedupSql =
    """WITH d AS (SELECT doc_id, doc_id % 97 AS q FROM documents),
      |g AS (SELECT doc_id, q, 8 + (q * 3) % 12 AS h FROM d),
      |cy AS (SELECT doc_id, q, h, unnest(range(0, 8)) AS y FROM g),
      |l AS (SELECT doc_id, y,
      |        ((q * 7 + 37 * ((y * h) // 8) * ((y * h) // 8)) % 200)
      |      + ((q * 13 + 23 * ((y * h) // 8) * ((y * h) // 8) + 2 * ((y * h) // 8)) % 200)
      |      + ((q * 31 + 41 * ((y * h) // 8) * ((y * h) // 8) + 3 * ((y * h) // 8)) % 200) AS lum
      |      FROM cy),
      |t AS (SELECT doc_id, 8 * sum(lum) AS total FROM l GROUP BY doc_id),
      |b AS (SELECT l.doc_id, l.y, CASE WHEN 64 * l.lum > t.total THEN 1 ELSE 0 END AS bit
      |      FROM l JOIN t USING (doc_id)),
      |ph AS (SELECT doc_id,
      |        CAST(sum(CASE WHEN y = 0 THEN bit * 4278190080 WHEN y = 1 THEN bit * 16711680
      |                      WHEN y = 2 THEN bit * 65280 WHEN y = 3 THEN bit * 255 ELSE 0 END) AS BIGINT) AS ph0,
      |        CAST(sum(CASE WHEN y = 4 THEN bit * 4278190080 WHEN y = 5 THEN bit * 16711680
      |                      WHEN y = 6 THEN bit * 65280 WHEN y = 7 THEN bit * 255 ELSE 0 END) AS BIGINT) AS ph1
      |       FROM b GROUP BY doc_id)
      |SELECT doc_id, ph0, ph1,
      |  CAST(count(*) OVER (PARTITION BY ph0, ph1) AS BIGINT) AS group_size,
      |  min(doc_id) OVER (PARTITION BY ph0, ph1) AS canonical,
      |  doc_id <> min(doc_id) OVER (PARTITION BY ph0, ph1) AS is_dup
      |FROM ph ORDER BY doc_id""".stripMargin

  /** Family-structured WAV fixture for [[audioDedup]]: family
    * `q = doc_id % 89` fixes sample count, rate and the base waveform
    * ([[wavSample]]'s formula over q), and replica index `doc_id / 89`
    * applies an integer GAIN `1 + (doc_id / 89) % 3` to every sample
    * (max 3·2000 = 6000, well inside int16). Family members are therefore
    * volume-normalized RE-ENCODES of one recording — the canonical audio
    * near-dup an envelope hash must collapse, and byte dedup cannot. */
  def encodeWavFam(docId: Long): Array[Byte] = {
    val q = docId % 89
    val gain = (1 + (docId / 89) % 3).toInt
    val n = (200L + (q * 7L) % 300L).toInt
    val sr = (8000L + (q % 4L) * 2000L).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (((q * 31 + i.toLong * 17) % 4001) - 2000).toInt * gain
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL audio near-duplicate detection via a gain-invariant envelope
    * hash — the audio twin of [[phashDedup]]: decode real PCM through the
    * JDK codec, split the |sample| stream into 16 equal windows, set bit w
    * when its window is louder than the track mean. The compare is the
    * EXACT integer cross-product `sum_w · n > total · len_w`, so a uniform
    * gain multiplies both sides equally and cancels — [[encodeWavFam]]'s
    * volume-replica families collapse to one (n_samples, signature) key BY
    * CONSTRUCTION of the algorithm, while byte dedup sees distinct files.
    * (Chromaprint-class fingerprints quantize spectral energy the same
    * way; the envelope variant keeps the oracle closed-form.)
    *
    * Dup groups are exact-equal (n_samples, sig16) keys: ONE shuffle of
    * (doc_id, int64, int64) per track regardless of track length. */
  def audioDedup(df: DataFrame, batchSize: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_samples", LongType),
      StructField("sig16", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val hashed = df.select(col("doc_id")) // see decodeBatched: spread the 1-split store before decoding
      .transform(graft.util.Spread.byCols(_, col("doc_id"))) // guarded spread (r17)
      .mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val ais = wavReader.getAudioInputStream(
            new java.io.ByteArrayInputStream(encodeWavFam(id)))
          val bytes = ais.readAllBytes()
          ais.close()
          val n = bytes.length / 2
          val absd = new Array[Long](n)
          var total = 0L
          var i = 0
          while (i < n) {
            val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
            absd(i) = math.abs(v)
            total += absd(i)
            i += 1
          }
          var sig = 0L
          var w = 0
          while (w < 16) {
            val lo = w * n / 16
            val hi = (w + 1) * n / 16
            var sw = 0L
            var j = lo
            while (j < hi) { sw += absd(j); j += 1 }
            if (sw * n > total * (hi - lo)) sig |= 1L << (15 - w)
            w += 1
          }
          Row(id, n.toLong, sig)
        }
      }
    }(enc)
    import org.apache.spark.sql.expressions.Window
    val grp = Window.partitionBy("n_samples", "sig16")
    hashed
      .withColumn("group_size", count(lit(1)).over(grp).cast("long"))
      .withColumn("canonical", min(col("doc_id")).over(grp))
      .withColumn("is_dup", col("doc_id") =!= col("canonical"))
      .orderBy("doc_id")
  }

  def audioDedupQuery(spark: SparkSession, sfDir: String): DataFrame =
    audioDedup(Tables.documents(spark, sfDir))

  /** Oracle: the gain cancels out of the integer cross-product, so the
    * signature derives from the FAMILY's gain-free |sample| stream in
    * closed form. */
  private val audioDedupSql =
    """WITH d AS (SELECT doc_id, doc_id % 89 AS q FROM documents),
      |p AS (SELECT doc_id, q, CAST(200 + (q * 7) % 300 AS BIGINT) AS n FROM d),
      |s AS (SELECT doc_id, q, n, unnest(range(0, n)) AS i FROM p),
      |v AS (SELECT doc_id, n, i, abs(((q * 31 + i * 17) % 4001) - 2000) AS a FROM s),
      |t AS (SELECT doc_id, n, sum(a) AS total FROM v GROUP BY doc_id, n),
      |w AS (SELECT doc_id, n, unnest(range(0, 16)) AS w FROM t),
      |sw AS (SELECT w.doc_id, w.n, w.w,
      |         (w.w * w.n) // 16 AS lo, ((w.w + 1) * w.n) // 16 AS hi
      |       FROM w),
      |ws AS (SELECT sw.doc_id, sw.n, sw.w, sw.hi - sw.lo AS wlen,
      |         coalesce(sum(v.a), 0) AS s
      |       FROM sw LEFT JOIN v ON v.doc_id = sw.doc_id AND v.i >= sw.lo AND v.i < sw.hi
      |       GROUP BY sw.doc_id, sw.n, sw.w, sw.hi - sw.lo),
      |b AS (SELECT ws.doc_id, ws.n, ws.w,
      |        CASE WHEN ws.s * ws.n > t.total * ws.wlen THEN 1 ELSE 0 END AS bit
      |      FROM ws JOIN t ON t.doc_id = ws.doc_id),
      |sg AS (SELECT doc_id, n AS n_samples,
      |         CAST(sum(bit * power(2, 15 - w)) AS BIGINT) AS sig16
      |       FROM b GROUP BY doc_id, n)
      |SELECT doc_id, n_samples, sig16,
      |  CAST(count(*) OVER (PARTITION BY n_samples, sig16) AS BIGINT) AS group_size,
      |  min(doc_id) OVER (PARTITION BY n_samples, sig16) AS canonical,
      |  doc_id <> min(doc_id) OVER (PARTITION BY n_samples, sig16) AS is_dup
      |FROM sg ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_dedup" -> (audioDedupQuery _),
    "mm_phash_dedup" -> (phashDedupQuery _),
    "mm_binary_meta" -> (binaryMeta _),
    "mm_batched_decode" -> (batchedDecode _),
    "mm_real_decode" -> (realDecodeQuery _),
    "mm_resize_thumb" -> (resizeThumbQuery _),
    "mm_frame_sample" -> (frameSampleQuery _),
    "mm_audio_decode" -> (audioDecodeQuery _),
  )

  val oracles: Map[String, String] = Map(
    "mm_audio_dedup" -> audioDedupSql,
    "mm_phash_dedup" -> phashDedupSql,
    "mm_binary_meta" -> binaryMetaSql,
    "mm_batched_decode" -> batchedDecodeSql,
    "mm_real_decode" -> realDecodeSql,
    "mm_resize_thumb" -> resizeThumbSql,
    "mm_frame_sample" -> frameSampleSql,
    "mm_audio_decode" -> audioDecodeSql,
  )
}
