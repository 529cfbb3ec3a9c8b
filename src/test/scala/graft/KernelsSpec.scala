package graft

import graft.functions.{TextFns, Vec}
import org.apache.spark.sql.functions._

/** The compiled kernels must be bit/value-identical to the composable
  * higher-order-function formulations they replace (which the DuckDB
  * oracles mirror). */
class KernelsSpec extends SparkSpec {

  test("WordShingles ≡ filter/split/transform HOF formulation (as sets)") {
    val docs = Tables.documents(spark, sf).limit(100)
      .withColumn("toks", expr("filter(split(lower(text), ' '), t -> t != '')"))
      .withColumn("hof", expr(
        """array_distinct(transform(
          |  sequence(1, greatest(size(toks) - 2, 0)),
          |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))""".stripMargin))
      .withColumn("kernel", TextFns.wordShingles(col("text"), 3))
    val bad = docs.where(expr(
      "array_sort(hof) != array_sort(kernel)")).count()
    assert(bad == 0)
  }

  test("WordShingles handles short/empty/multi-space texts") {
    import spark.implicits._
    val got = Seq("", "one two", "a  b   c d", "x y z")
      .toDF("text")
      .select(TextFns.wordShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == Nil)
    assert(got(1) == Nil)
    assert(got(2) == List("a b c", "b c d"))
    assert(got(3) == List("x y z"))
  }

  test("WinnowGramHashes ≡ transform(sequence) + conv(substring(md5)) HOF formulation") {
    import spark.implicits._
    val k = 4
    val gram = (0 until k).map(j => s"element_at(toks, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    val gramsExpr = s"IF(size(toks) >= $k, " +
      s"transform(sequence(1, size(toks) - ${k - 1}), i -> $gram), " +
      "CAST(array() AS ARRAY<STRING>))"
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(100)
      .unionByName(Seq(
        (200001L, ""), (200002L, "one two three"), // under k tokens → empty
        (200003L, "a  b   c d e"), // multi-space tokenization
        (200004L, "中文 的 a b c")) // non-ASCII UTF-8 md5 bytes
        .toDF("doc_id", "text"))
      .withColumn("toks", expr("filter(split(lower(text), ' '), t -> t != '')"))
      .withColumn("hof", expr(
        s"transform($gramsExpr, g -> CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT))"))
      .withColumn("kernel", TextFns.winnowGramHashes(col("text"), k))
    assert(docs.where(expr("hof != kernel")).count() == 0)
    assert(docs.count() == 104)
  }

  test("GramMd5s ≡ transform(sequence) + md5(gram) HOF formulation") {
    import spark.implicits._
    val w = 8
    val gram = (0 until w).map(j => s"element_at(toks, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    val winExpr = s"IF(size(toks) >= $w, " +
      s"transform(sequence(1, size(toks) - ${w - 1}), i -> md5($gram)), " +
      "CAST(array() AS ARRAY<STRING>))"
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(100)
      .unionByName(Seq(
        (400001L, ""), (400002L, "one two three"), // under w tokens → empty
        (400003L, "a  b c d e f g h i"), (400004L, "中文 的 a b c d e f g"))
        .toDF("doc_id", "text"))
      .withColumn("toks", expr("filter(split(lower(text), ' '), t -> t != '')"))
      .withColumn("hof", expr(winExpr))
      .withColumn("kernel", TextFns.gramMd5s(col("text"), w))
    assert(docs.where(expr("hof != kernel")).count() == 0)
    assert(docs.count() == 104)
  }

  test("CdcGearTokens ≡ the nested transform/aggregate gear-hash HOF formulation") {
    import spark.implicits._
    val hofExpr =
      """transform(toks, w -> named_struct(
        |  'w', w,
        |  'g', aggregate(
        |         transform(sequence(1, length(w)), i -> cast(ascii(substring(w, i, 1)) as bigint)),
        |         cast(0 as bigint), (h, c) -> (h * 31 + c) % 1000000007)))""".stripMargin
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(100)
      .unionByName(Seq(
        (300001L, ""), (300002L, "  "), (300003L, "a  b   c"),
        (300004L, "中文 mixed ascii")) // non-ASCII codepoints through the hash
        .toDF("doc_id", "text"))
      .withColumn("toks", expr("filter(split(lower(text), ' '), t -> t != '')"))
      .withColumn("hof", expr(hofExpr))
      .withColumn("kernel", TextFns.cdcGearTokens(col("text")))
    assert(docs.where(expr("hof != kernel")).count() == 0)
    assert(docs.count() == 104)
  }

  test("MinHashSignature ≡ array_min(transform(md5)) per permutation") {
    val docs = Tables.documents(spark, sf).limit(100)
      .withColumn("shs", TextFns.wordShingles(col("text"), 3))
      .withColumn("sigs", TextFns.minhashSignature(col("shs"), 4))
    val checks = (0 until 4).map(i =>
      expr(s"element_at(sigs, ${i + 1}) = array_min(transform(shs, s -> md5('$i|' || s)))"))
    assert(docs.where(!checks.reduce(_ && _)).count() == 0)
  }

  test("MinHashSignature is null on empty shingle arrays (array_min parity)") {
    import spark.implicits._
    val got = Seq("one two").toDF("text")
      .select(TextFns.minhashSignature(TextFns.wordShingles(col("text"), 3), 4).as("s"))
      .collect()
    assert(got.head.isNullAt(0))
  }

  test("SimHash32 ≡ the explode + 32-signed-bit-sum relational formulation") {
    val toks = Tables.documents(spark, sf).limit(100)
      .withColumn("toks", expr("filter(split(lower(text), ' '), t -> t != '')"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val sums = (0 until 32).map { j =>
      val nib = s"(instr('0123456789abcdef', substring(h, ${j / 4 + 1}, 1)) - 1)"
      sum(expr(s"2 * (shiftright($nib, ${j % 4}) % 2) - 1")).as(s"sum$j")
    }
    val fp = (0 until 32)
      .map(j => when(col(s"sum$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val relational = toks.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), fp.as("rel"))
    val kernel = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), TextFns.simhash32(col("text")).as("ker"))
    val joined = relational.join(kernel, "doc_id")
    assert(joined.where(col("rel") =!= col("ker")).count() == 0)
    assert(joined.count() == 100)
  }

  test("QtFeatures ≡ the md5-transform + per-bin filter HOF formulation (r10)") {
    val dims = 16
    val hof = Tables.documents(spark, sf).limit(200)
      .withColumn("toks", expr("filter(split(lower(text), ' '), t -> t != '')"))
      .withColumn("hs", expr(
        "transform(toks, t -> CAST(conv(substring(md5(t), 2, 1), 16, 10) AS INT))"))
      .select(col("doc_id"), expr("CAST(size(toks) AS BIGINT)").as("n_hof"),
        expr(s"transform(sequence(0, ${dims - 1}), j -> CAST(size(filter(hs, h -> h = j)) AS BIGINT))").as("f_hof"))
    val ker = Tables.documents(spark, sf).limit(200)
      .withColumn("qf", TextFns.qtFeatures(col("text"), dims))
      .select(col("doc_id"), col("qf.n_tok").as("n_ker"), col("qf.feats").as("f_ker"))
    val j = hof.join(ker, "doc_id")
    assert(j.count() == 200)
    assert(j.where(col("n_hof") =!= col("n_ker")).count() == 0)
    assert(j.where(expr("f_hof != f_ker")).count() == 0)
    // edge inputs: empty, multi-space, non-ASCII (UTF-8 md5 bytes)
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "   "), (3L, "中文 中文 a"), (4L, "x"))
      .toDF("doc_id", "text")
    val ek = edge.withColumn("qf", TextFns.qtFeatures(col("text"), dims))
      .select(col("doc_id"), col("qf.n_tok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ek == Map(1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 1L))
  }

  test("TopKAgg (typed Aggregator) equals per-group sort+limit") {
    import graft.functions.TopKAgg
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
    val agg = new TopKAgg(3).toColumn
    val viaAgg = orders
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .collect().toMap
    val viaWindow = graft.ext.Relational.winTopkPerGroup(spark, sf).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(r => (r.getDouble(3), r.getLong(2))).toSeq)
      .toMap
    assert(viaAgg.keySet == viaWindow.keySet)
    viaAgg.foreach { case (k, v) => assert(v == viaWindow(k), s"custkey $k") }
  }

  test("topk_by_desc registers for the SQL surface; analyzer wraps the bare aggregate") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (1L, 6.0, 12L)).toDF("g", "v", "id")
      .createOrReplaceTempView("tk_sql")
    val top = spark.sql(
      "SELECT topk_by_desc(v, id, struct(id, v), 2) AS top FROM tk_sql GROUP BY g")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getLong(0)) == Seq(11L, 12L), top)
    assert(top.map(_.getDouble(1)) == Seq(7.0, 6.0), top)
  }

  test("custom expressions register for the SQL surface (GraftFunctions)") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash32('hello world spark') AS sh,
        |       arraydot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       evm_uint('ff') AS u,
        |       size(word_shingles('a b c d', 3)) AS n""".stripMargin).head()
    assert(r.getLong(0) == graft.functions.TextKernels.simhash32(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world spark")))
    assert(r.getDouble(1) == 11.0)
    assert(r.getDecimal(2).intValue == 255)
    assert(r.getInt(3) == 2)
  }

  test("NfcNormalize: canonical composition, NOT compatibility folding (r6.3)") {
    import org.apache.spark.unsafe.types.UTF8String
    // combining acute composes; Hangul jamo compose; the circled digit is
    // untouched (that is NFKC's job); normalized inputs return THE SAME
    // object (the zero-allocation fast path)
    val k = graft.functions.TextKernels.nfcNormalize _
    assert(k(UTF8String.fromString("café")).toString == "café")
    assert(k(UTF8String.fromString("한")).toString == "한")
    assert(k(UTF8String.fromString("①")).toString == "①")
    val already = UTF8String.fromString("plain ascii")
    assert(k(already) eq already, "fast path must return the input object")
    // and through codegen via the SQL surface, null-safe
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('café') AS a, nfc_normalize(CAST(NULL AS STRING)) AS b").head()
    assert(r.getString(0) == "café" && r.isNullAt(1))
  }

  test("ArrayDot ≡ aggregate(zip_with) left fold, bit-identical") {
    // DotProductRewrite would turn the HOF side into the kernel and make
    // this comparison vacuous — suspend it so the INTERPRETED fold is what
    // the kernel is compared against.
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == graft.functions.DotProductRewrite)
    try {
      val e = Tables.embeddings(spark, sf).limit(50)
      val pairs = e.select(col("vec_id").as("i"), col("embedding").as("a"))
        .crossJoin(e.select(col("vec_id").as("j"), col("embedding").as("b")))
        .where(col("i") < col("j")).limit(500)
        .withColumn("hof", expr(
          "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
        .withColumn("kernel", Vec.dot(col("a"), col("b")))
      // exact equality — same fold order, so bits must match
      assert(pairs.where(col("hof") =!= col("kernel")).count() == 0)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("DotProductRewrite: plain-SQL HOF dot products compile to the ArrayDot kernel") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val hofDot =
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    val df = Tables.embeddings(spark, sf).limit(20)
      .select(col("embedding").as("a"), col("embedding").as("b"))
      .withColumn("d", expr(hofDot))
    // the optimized plan carries the kernel, not the lambda fold
    val opt = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(opt.contains("arraydot"), opt)
    // and the value equals the kernel bit-for-bit
    assert(df.withColumn("k", Vec.dot(col("a"), col("b")))
      .where(col("d") =!= col("k")).count() == 0)
    // a WEIGHTED fold is not a dot product — left alone
    val other = Tables.embeddings(spark, sf).limit(5)
      .select(col("embedding").as("a"), col("embedding").as("b"))
      .withColumn("w", expr(
        "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 2.0D), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
    assert(!other.queryExecution.optimizedPlan.toString.toLowerCase.contains("arraydot"))
    // length mismatch keeps zip_with's null semantics (the rewrite guards
    // on size equality; over a LocalRelation the optimizer folds the whole
    // projection, so assert the VALUE, which must be null either way)
    val mm = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f))).toDF("a", "b")
      .withColumn("d", expr(hofDot))
    assert(mm.head().isNullAt(2))
    // a BARE float multiply (no casts) rounds each product to float before
    // the fold — a DIFFERENT number than ArrayDot's double multiply. The
    // rule must leave it alone (parquet-backed frame so nothing folds away).
    val bare = Tables.embeddings(spark, sf).limit(5)
      .select(col("embedding").as("a"), col("embedding").as("b"))
      .withColumn("d", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
    assert(!bare.queryExecution.optimizedPlan.toString.toLowerCase.contains("arraydot"))
    // a COMPUTED (non-attribute) vector input is rewritten too: the kernel's
    // nullOnSizeMismatch mode replaced the old If(size=size) wrapper, so the
    // inputs are never duplicated and the computed subtree evaluates once
    val computedHof =
      "aggregate(zip_with(slice(a, 1, 8), reverse(a), " +
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    def computedFrame() = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), col("embedding").as("a"))
      .withColumn("d", expr(computedHof))
    assert(computedFrame().queryExecution.optimizedPlan.toString.toLowerCase.contains("arraydot"))
    // ... and is bit-identical to the interpreted fold (rule suspended).
    // slice(a,1,8) vs reverse(a) also exercises the size-mismatch → null leg
    // on real (64-lane vs 8-lane) data.
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == graft.functions.DotProductRewrite)
    val interp =
      try computedFrame().select("vec_id", "d").collect().map(r => r.get(0) -> r.get(1)).toMap
      finally spark.experimental.extraOptimizations = saved
    val kern = computedFrame().select("vec_id", "d").collect().map(r => r.get(0) -> r.get(1)).toMap
    assert(kern == interp, s"kernel=$kern interp=$interp")
    // NULL elements inside equal-length vectors: the interpreted fold is
    // NULL (x * NULL absorbs) — the rewritten kernel must agree (ADVICE r5)
    val ne = Seq((Seq(Option(1.0), None, Option(3.0)), Seq(Option(4.0), Option(5.0), Option(6.0))))
      .toDF("a", "b").withColumn("d", expr(hofDot))
    assert(ne.head().isNullAt(2))
  }

  test("ArrayDot codegen COMPILES with several dots in one stage (no silent fallback)") {
    // dot(a,b) + norm(a) + norm(b) in one projection is the ANN hot path;
    // fixed Java local names would redeclare across the three inlined
    // kernels and the whole stage would silently run interpreted. Forcing
    // fallback OFF turns that silent regression into a test failure.
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
        .select(
          Vec.dot(col("a"), col("b")).as("d"),
          Vec.norm(col("a")).as("na"),
          Vec.norm(col("b")).as("nb"))
        .head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == math.sqrt(5.0))
      assert(r.getDouble(2) == math.sqrt(25.0))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("ArrayDot handles length mismatch (min length) and empty arrays") {
    import spark.implicits._
    val got = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f)))
      .toDF("a", "b").select(Vec.dot(col("a"), col("b"))).head().getDouble(0)
    assert(got == 1.0 * 4.0 + 2.0 * 5.0)
    val empty = Seq((Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b").select(Vec.dot(col("a"), col("b"))).head().getDouble(0)
    assert(empty == 0.0)
    // a NULL element nulls the whole dot (matches the interpreted HOF fold)
    val withNull = Seq((Seq(Option(1.0), None), Seq(Option(3.0), Option(4.0))))
      .toDF("a", "b").select(Vec.dot(col("a"), col("b"))).head()
    assert(withNull.isNullAt(0))
  }

  test("GopherSignals kernel == composable HOF spec, column for column (r7)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(Seq(
        (100001L, ""), // empty doc: n_tok 0, mean NaN-parity path
        (100002L, "the the the"), // all-stopword, dup trigrams impossible (1 trigram)
        (100003L, "a b a b a b a b"), // duplicated trigrams
        (100004L, "中文 中文 的 word")) // non-ASCII codepoint lengths
        .toDF("doc_id", "text"))
    val cols = Seq("doc_id", "n_tok", "mean_word_len", "dup_trigram_frac",
      "stop_cnt", "r_nwords", "r_wordlen", "r_dup3", "r_stop", "n_failed", "keep")
    val kern = ext.TextOps.withGopherSignals(docs)
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect()
    val hof = ext.TextOps.withGopherSignalsHof(docs)
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect()
    assert(kern.length == hof.length)
    kern.zip(hof).foreach { case (k, h) =>
      cols.indices.foreach { i =>
        val (kv, hv) = (k.get(i), h.get(i))
        val eq = (kv, hv) match {
          case (a: Double, b: Double) => (a.isNaN && b.isNaN) || a == b
          case _ => kv == hv
        }
        assert(eq, s"doc ${k.get(0)} col ${cols(i)}: kernel=$kv hof=$hv")
      }
    }
  }
}
