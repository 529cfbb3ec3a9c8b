package graft

/** Randomized property check for the greedy longest-match subword counter
  * ([[graft.ext.TextOps.bpeCountExpr]]) against a plain Scala reference
  * tokenizer. The codegen'd fold and the reference walk the same contract —
  * at each position take the LONGEST matching vocab entry, else one char —
  * so counts must agree exactly on any input: vocab-dense strings, strings
  * with no vocab hits, overlapping-prefix traps ("t"+"able" vs "table"),
  * empty strings, and single chars.
  */
class BpePropertySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def refBpe(t: String): Long = {
    var p = 0; var n = 0L
    while (p < t.length) {
      val m = ext.TextOps.BpeVocab
        .filter(v => t.startsWith(v, p)).map(_.length)
        .maxOption.getOrElse(1)
      p += m; n += 1
    }
    n
  }

  test("bpe count: codegen'd fold == reference tokenizer on random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // alphabet biased toward vocab chars so matches actually occur, plus
    // spaces and chars outside every vocab entry
    val alphabet = "abcdefghijklmnopqrstuvwxyz .x9"
    val cases: Seq[String] =
      Seq("", "t", "table", "ttable", "tableth", "thth", "xxxx", " ") ++
        (1 to 120).map { i =>
          val len = rnd.nextInt(60)
          (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .withColumn("n", expr(ext.TextOps.bpeCountExpr("t")))
      .withColumn("nk", functions.TextFns.bpeCount(col("t"), ext.TextOps.BpeVocab))
    val got = df.select("id", "n", "nk").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      val (hof, kernel) = got(i.toLong)
      assert(hof == refBpe(t),
        s"case $i '${t.take(40)}': HOF got $hof, want ${refBpe(t)}")
      assert(kernel == hof,
        s"case $i '${t.take(40)}': compiled kernel $kernel != HOF spec $hof")
    }
  }

  test("bpe kernel: codepoint-exact on non-ASCII (surrogates advance whole) (r7)") {
    import spark.implicits._
    // 中文 chars are outside every vocab entry → one token per codepoint;
    // a supplementary char (surrogate pair) must count once, not twice
    val cases = Seq((1L, "中文th中", 4L), (2L, "😀table", 2L), (3L, "αβ", 2L))
    val df = cases.map { case (i, t, _) => (i, t) }.toDF("id", "t")
      .withColumn("nk", functions.TextFns.bpeCount(col("t"), ext.TextOps.BpeVocab))
    val m = df.select("id", "nk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { case (i, t, want) =>
      assert(m(i) == want, s"'$t': got ${m(i)}, want $want")
    }
  }

  test("bpe merge training: driver-local trainer == distributed loop on random corpora (r10)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small alphabet → dense pair collisions → real tie-breaks exercised
    val alphabet = "abcde"
    (0 until 6).foreach { trial =>
      val words = (0 until 40).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val docs = words.grouped(8).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" "), "s") }
        .toSeq.toDF("doc_id", "text", "source")
      val wc = docs.select(explode(expr("filter(split(lower(text), ' '), t -> t != '')")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val dist = ext.TextOps.bpeTrainMergeListDistributed(wc, 6)
      val wArr = wc.collect().map(r => (r.getString(0), r.getLong(1)))
      val loc = ext.TextOps.bpeTrainMergesLocal(wArr, 6)
      assert(loc == dist, s"trial $trial: local $loc != distributed $dist")
    }
  }

  test("bpe merge training: local merge application keeps the pinned replace semantics (r10)") {
    // 'abab' under merge (a,b): the framed replace consumes the shared
    // delimiter, so only the FIRST occurrence merges in one step — the
    // distributed/oracle behavior, not naive array-walk BPE. The local
    // trainer must reproduce it: after merge 1 (a,b), 'abab' contributes
    // pairs (ab,a) and (a,b), NOT (ab,ab).
    val loc = ext.TextOps.bpeTrainMergesLocal(Array(("abab", 10L)), 3)
    // merge1: (a,b) n=20 (two occurrences in |a|b|a|b|).
    // after replace: |ab|a|b| → pairs (ab,a)=10, (a,b)=10 → merge2 tie →
    // '(a b)' < '(ab a)' in UTF-8 order ('a b' vs 'ab a': ' ' < 'b') → (a,b)
    // after replace: |ab|ab| → pairs (ab,ab)=10 → merge3 (ab,ab)
    assert(loc == Seq(("a", "b", 20L), ("a", "b", 10L), ("ab", "ab", 10L)),
      s"got $loc")
  }

  test("bpe count: longest match wins over any shorter prefix") {
    import spark.implicits._
    // "table" is one token (the 5-char entry beats every shorter match);
    // "tabl" has no multi-char match at any position → 4 single chars
    val df = Seq((1L, "table"), (2L, "tabl"), (3L, "thtable")).toDF("id", "t")
      .withColumn("n", expr(ext.TextOps.bpeCountExpr("t")))
    val m = df.select("id", "n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 1L, s"'table' must be a single token, got ${m(1L)}")
    assert(m(2L) == 4L, s"'tabl' must be t+a+b+l = 4, got ${m(2L)}")
    assert(m(3L) == 2L, s"'thtable' must be th+table = 2, got ${m(3L)}")
  }
}
