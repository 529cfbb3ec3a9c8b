package graft

import graft.ext.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeBatched (mapPartitions stub) agrees with the expression-form metadata") {
    val viaBatches = MultimodalOps.decodeBatched(Tables.documents(spark, sf), batchSize = 16)
      .select("doc_id", "nbytes", "width", "height")
    val viaExprs = Tables.documents(spark, sf)
      .withColumn("nbytes", octet_length(encode(col("text"), "UTF-8")).cast("long"))
      .select(col("doc_id"), col("nbytes"),
        (lit(64L) + col("nbytes") % 576L).as("width"),
        (lit(64L) + (col("nbytes") * 7L) % 416L).as("height"))
    assert(viaBatches.except(viaExprs).count() == 0)
    assert(viaBatches.count() == viaExprs.count())
  }

  test("batched path also resizes (letterboxed) and extracts features") {
    val got = MultimodalOps.decodeBatched(Tables.documents(spark, sf), batchSize = 8)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rw, rh) = (r.getAs[Long]("resized_w"), r.getAs[Long]("resized_h"))
      assert(rw <= 224 && rh <= 224 && (rw == 224 || rh == 224)) // letterbox hits one edge
      val f = r.getSeq[Float](r.fieldIndex("features"))
      assert(f.length == 8 && f.forall(v => v >= 0f && v <= 1f))
    }
  }

  test("binary payload column is real binary with correct byte length") {
    val r = Tables.documents(spark, sf)
      .select(col("text"), encode(col("text"), "UTF-8").as("payload"))
      .head()
    assert(r.getAs[Array[Byte]]("payload").length == r.getString(0).getBytes("UTF-8").length)
  }

  test("realDecode round-trips ACTUAL pixels through the JDK PNG codec") {
    // not the stub: encodePng writes a real PNG container (magic bytes) and
    // ImageIO must read back the exact stripe colors PNG losslessly stores
    val png = MultimodalOps.encodePng(42L)
    assert(png.take(4).map(_ & 0xff).sameElements(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == (8 + 42 % 16) && img.getHeight == (8 + 42 * 3 % 12))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == (42 * 7 + y) % 256, s"r at ($x,$y)")
      assert(((rgb >> 8) & 0xff) == (42 * 13 + 2 * y) % 256, s"g at ($x,$y)")
      assert((rgb & 0xff) == (42 * 31 + 3 * y) % 256, s"b at ($x,$y)")
    }
    // and the distributed path agrees with a driver-side recompute
    val row = MultimodalOps.realDecode(Tables.documents(spark, sf))
      .where(col("doc_id") === 42L).head()
    assert(row.getAs[Long]("width") == img.getWidth.toLong)
    assert(row.getAs[Long]("height") == img.getHeight.toLong)
  }

  test("frames container round-trips: magic, count, per-frame REAL pixel decode (r6.3)") {
    val bytes = MultimodalOps.encodeFrames(17L)
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    assert(dis.readInt() == 0x46524d30, "FRM0 magic")
    val n = dis.readInt()
    assert(n == (4 + 17 % 5), "frame count closed form")
    // every frame is a decodable PNG with the derived-id dimensions
    for (f <- 0 until n) {
      val len = dis.readInt(); val png = new Array[Byte](len); dis.readFully(png)
      assert(png.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
        s"frame $f PNG signature")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val fid = 17L * 11 + f
      assert(img.getWidth == (8 + fid % 16).toInt && img.getHeight == (8 + fid * 3 % 12).toInt)
    }
    assert(dis.available() == 0, "no trailing bytes")
    // the distributed sampler keeps exactly the stride-0,2,4... frames
    val rows = MultimodalOps.frameSample(Tables.documents(spark, sf))
      .where(col("doc_id") === 17L).collect()
    assert(rows.map(_.getAs[Long]("frame_idx")).sorted.toSeq ==
      (0 until n by 2).map(_.toLong))
  }

  test("resizeThumb uses the canonical nearest-neighbor mapping (r6.3)") {
    // doc 5: w=13, h=11 → thumbnail row y samples source row (y*11)/8;
    // recompute driver-side from the decoded image and compare
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MultimodalOps.encodePng(5L)))
    val (w, h) = (img.getWidth, img.getHeight)
    var sr = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      sr += (img.getRGB(x * w / 8, y * h / 8) >> 16) & 0xff
    val row = MultimodalOps.resizeThumb(Tables.documents(spark, sf))
      .where(col("doc_id") === 5L).head()
    assert(row.getAs[Double]("thumb_mean_r") == sr / 64.0)
    assert(row.getAs[Long]("width") == w.toLong && row.getAs[Long]("height") == h.toLong)
  }

  test("audioDecode round-trips ACTUAL samples through the JDK WAV codec") {
    // not the stub: encodeWav writes a real RIFF/WAVE container and the
    // javax.sound.sampled codec must read back the exact PCM16 samples
    val wav = MultimodalOps.encodeWav(42L)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF", "RIFF magic")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "WAVE form type")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate.toInt == MultimodalOps.wavRate(42L))
    assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
    val bytes = ais.readAllBytes()
    val n = MultimodalOps.wavSamples(42L)
    assert(bytes.length == n * 2, "decoded frame count")
    for (i <- 0 until n) {
      val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
      assert(v == MultimodalOps.wavSample(42L, i), s"sample $i")
    }
    // and the distributed path agrees with a driver-side recompute
    val row = MultimodalOps.audioDecode(Tables.documents(spark, sf))
      .where(col("doc_id") === 42L).head()
    assert(row.getAs[Long]("n_samples") == n.toLong)
    assert(row.getAs[Long]("sample_rate") == MultimodalOps.wavRate(42L).toLong)
    val expPeak = (0 until n).map(i => math.abs(MultimodalOps.wavSample(42L, i))).max
    assert(row.getAs[Long]("peak_abs") == expPeak.toLong)
  }

  test("mm_phash_dedup: aHash collapses brightness replicas that byte dedup cannot (r7)") {
    import spark.implicits._
    // 0 and 97 are the same family at different brightness: distinct PNG
    // bytes (exact dedup keeps both), identical average hash
    val b0 = MultimodalOps.encodePngFam(0L)
    val b97 = MultimodalOps.encodePngFam(97L)
    assert(!java.util.Arrays.equals(b0, b97), "replicas must differ at the byte level")
    val out = MultimodalOps.phashDedup(Tables.documents(spark, sf))
      .select("doc_id", "ph0", "ph1", "canonical", "is_dup")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val fam = out.keys.filter(_ % 97 == 0).toSeq.sorted
    assert(fam.size >= 2, "fixture must contain at least one brightness family")
    val hashes = fam.map(d => (out(d)._2, out(d)._3)).distinct
    assert(hashes.size == 1, s"family 0 must share one hash, got $hashes")
    assert(fam.map(d => out(d)._4).distinct.size == 1, "one canonical per group")
    assert(fam.count(d => !out(d)._5) == fam.map(d => out(d)._4).distinct.size
      || out(fam.head)._4 < fam.head + 1, "exactly the canonical is kept")
    // discrimination: the corpus must not collapse to a handful of hashes
    val distinctHashes = out.values.map(r => (r._2, r._3)).toSet.size
    assert(distinctHashes > out.size / 30,
      s"hash space degenerate: $distinctHashes hashes for ${out.size} docs")
  }

  test("mm_audio_dedup: envelope hash collapses gain replicas that byte dedup cannot (r7)") {
    import spark.implicits._
    // 0 and 89 are the same recording at different gain: distinct WAV
    // bytes, identical (n_samples, envelope signature)
    val b0 = MultimodalOps.encodeWavFam(0L)
    val b89 = MultimodalOps.encodeWavFam(89L)
    assert(!java.util.Arrays.equals(b0, b89), "gain replicas must differ at the byte level")
    val out = MultimodalOps.audioDedup(Tables.documents(spark, sf))
      .select("doc_id", "n_samples", "sig16", "canonical", "is_dup")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val fam = out.keys.filter(_ % 89 == 0).toSeq.sorted
    assert(fam.size >= 2, "fixture must contain at least one gain family")
    assert(fam.map(d => (out(d)._2, out(d)._3)).distinct.size == 1,
      "family 0 must share one (n_samples, sig) key")
    assert(fam.map(d => out(d)._4).distinct.size == 1, "one canonical per group")
    // every group must be exactly one family (simulated discrimination
    // holds through the real codec round-trip)
    val byKey = out.values.groupBy(r => (r._2, r._3))
    byKey.foreach { case (k, rs) =>
      assert(rs.map(_._1 % 89).toSet.size == 1, s"key $k merges families")
    }
  }
}
