package graft

/** Randomized property check for the chunk-dedup family
  * ([[graft.ext.DedupOps.paragraphDedupOf]] / `cdcChunkDedupOf`) against an
  * independent in-memory reference over generated corpora — shared chunks
  * across many docs, within-doc repeats, docs that lose everything,
  * single-word docs, duplicate whole documents. The fixed fixtures prove
  * specific shapes; this proves the removal + ordered-reassembly SEMANTICS
  * over the input space (both ops emit the md5 of the rebuilt text, so the
  * reference recomputes the exact reconstruction).
  */
class ChunkDedupPropertySpec extends SparkSpec {

  private def md5s(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Reference removal semantics shared by both ops: given each doc's
    * ordered chunk list, drop every chunk whose text occurs in ≥ 2 distinct
    * docs, reassemble the rest in order. */
  private def reference(chunksByDoc: Map[Long, Seq[String]])
      : Map[Long, (Long, Long, Long, String)] = {
    val docsPerChunk = chunksByDoc.toSeq
      .flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).distinct.size }
    chunksByDoc.map { case (id, cs) =>
      val kept = cs.filter(c => docsPerChunk(c) < 2)
      id -> ((cs.size.toLong, (cs.size - kept.size).toLong,
        kept.map(_.split(' ').length.toLong).sum, md5s(kept.mkString(" "))))
    }
  }

  /** In-memory mirrors of the two boundary disciplines over the tokenizer's
    * output. */
  private def alignedChunks(words: Seq[String], width: Int): Seq[String] =
    words.grouped(width).map(_.mkString(" ")).toSeq

  private def gear(w: String): Long =
    w.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L)

  private def cdcChunks(words: Seq[String], mod: Long): Seq[String] = {
    // boundary AFTER a gear-hit token: chunk id = hits strictly before pos
    val out = scala.collection.mutable.ArrayBuffer.empty[List[String]]
    var cur = List.empty[String]
    words.foreach { w =>
      cur = cur :+ w
      if (gear(w) % mod == 0) { out += cur; cur = Nil }
    }
    if (cur.nonEmpty) out += cur
    out.map(_.mkString(" ")).toSeq
  }

  test("paragraph and CDC dedup match the in-memory reference on 25 random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    // small vocab on purpose: chunk collisions across docs are the norm
    def word() = s"w${rnd.nextInt(12)}"
    (1 to 25).foreach { scenario =>
      val nDocs = rnd.nextInt(8) + 2
      val shared = (0 until rnd.nextInt(30) + 5).map(_ => word()).mkString(" ")
      val docs = (0 until nDocs).map { i =>
        val own = (0 until rnd.nextInt(60) + 1).map(_ => word()).mkString(" ")
        val text = rnd.nextInt(4) match {
          case 0 => own
          case 1 => shared + " " + own // shared head
          case 2 => own + " " + shared // shared tail
          case _ => own + " " + own // within-doc repeat
        }
        (i.toLong, text)
      }
      val df = docs.toDF("doc_id", "text")
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.split(' ').filter(_.nonEmpty).toSeq
      }.toMap

      def check(result: org.apache.spark.sql.DataFrame,
          exp: Map[Long, (Long, Long, Long, String)], form: String): Unit = {
        val got = result.collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long](1), r.getAs[Long]("n_removed"),
            r.getAs[Long]("kept_tokens"), r.getAs[String]("kept_hash")))).toMap
        assert(got.keySet == exp.keySet, s"$form scenario $scenario doc set")
        exp.foreach { case (id, e) =>
          assert(got(id) == e, s"$form scenario $scenario doc $id: got ${got(id)}, want $e")
        }
      }
      check(graft.ext.DedupOps.paragraphDedupOf(df, chunkWords = 7),
        reference(toks.map { case (id, ws) => id -> alignedChunks(ws, 7) }),
        "paragraph")
      check(graft.ext.DedupOps.cdcChunkDedupOf(df, gearMod = 4L),
        reference(toks.map { case (id, ws) => id -> cdcChunks(ws, 4L) }),
        "cdc")
    }
  }
}
