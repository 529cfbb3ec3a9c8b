package graft

import graft.engine.{Compiler, Enrich, Sources}
import graft.model._
import org.apache.spark.sql.functions._

class EngineSpec extends SparkSpec {

  test("asOfJoin attaches latest state at-or-before probe time, null before first state") {
    import spark.implicits._
    val probes = Seq((1L, 10L), (1L, 25L), (2L, 5L)).toDF("k", "t")
    val state = Seq((1L, 10L, 100L, 1.0), (1L, 20L, 101L, 2.0), (2L, 7L, 102L, 3.0))
      .toDF("k", "st", "sid", "v")
    val got = Enrich.asOfJoin(probes, state, "k", "t", "st", "sid", Seq("v"))
      .orderBy("k", "t").collect()
    // probe (1,10): state at 10 included (offset-0 semantics); (1,25)→v=2; (2,5)→null
    assert(got(0).getDouble(2) == 1.0)
    assert(got(1).getDouble(2) == 2.0)
    assert(got(2).isNullAt(2))
  }

  test("asOfJoin tie-break: larger tieBreaker wins at equal time") {
    import spark.implicits._
    val probes = Seq((1L, 10L)).toDF("k", "t")
    val state = Seq((1L, 10L, 1L, 1.0), (1L, 10L, 2L, 2.0)).toDF("k", "st", "sid", "v")
    val got = Enrich.asOfJoin(probes, state, "k", "t", "st", "sid", Seq("v")).collect()
    assert(got.head.getDouble(2) == 2.0)
  }

  test("QuerySpec validation mirrors dsl/schema.go:213-250") {
    val ev = EventSpec("click", Seq("value"))
    // historical event query must NOT set blockInterval
    val bad = QuerySpec(name = "x", chain = "eth",
      globalEvents = Seq(ev), blockInterval = Some(60),
      saves = Seq("a" -> col("value")))
    intercept[IllegalArgumentException](bad.validate())
    // save block required
    val noSave = QuerySpec(name = "y", chain = "eth", globalEvents = Seq(ev))
    intercept[IllegalArgumentException](noSave.validate())
  }

  test("Compiler: transforms visible to filters and saves; metadata columns attached") {
    val q = QuerySpec(
      name = "t", chain = "testchain",
      globalEvents = Seq(EventSpec("purchase", Seq("value"))),
      transforms = Seq("doubled" -> (col("value") * 2)),
      filters = Seq(col("doubled") > 50),
      saves = Seq("chain" -> col("chain"), "blocknumber" -> col("blocknumber"),
        "contract" -> col("contract_address"), "doubled" -> col("doubled")))
    val df = Compiler.compile(spark, sf, q)
    assert(df.columns.toSeq == Seq("chain", "blocknumber", "contract", "doubled"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) == "testchain"))
    assert(rows.forall(_.getDouble(3) > 50))
  }

  test("Loop.expand keys queries {i}-{name} like chainservice.go:127-131") {
    val specs = Loop.expand(Seq("a", "b")) { (item, _) =>
      QuerySpec(name = "q", chain = item,
        globalEvents = Seq(EventSpec("view", Nil)),
        saves = Seq("chain" -> col("chain")))
    }
    assert(specs.map(_.name) == Seq("0-q", "1-q"))
  }

  test("demux unions differing save schemas with nulls + query_name") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("blocknumber", "a_col")
    val b = Seq((2L, 3.0)).toDF("blocknumber", "b_col")
    val got = Compiler.demux(Map("qa" -> a, "qb" -> b)).orderBy("query_name")
    assert(got.columns.toSet == Set("blocknumber", "a_col", "b_col", "query_name"))
    val rows = got.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("query_name") == "qa" && rows(0).isNullAt(rows(0).fieldIndex("b_col")))
  }

  test("blockDater finds first block at-or-after each target") {
    val got = Sources.blockDater(Tables.events(spark, sf), Seq("2024-01-15 00:00:00"))
      .collect()
    assert(got.length == 1)
    val firstBlock = got.head.getLong(1)
    // the found block's ts must be >= target and the previous block's < target
    val ev = Tables.events(spark, sf).orderBy("event_id").collect()
    val target = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    assert(!ev(firstBlock.toInt).getTimestamp(1).before(target))
    assert(ev(firstBlock.toInt - 1).getTimestamp(1).before(target))
  }

  test("event scans push predicates to the parquet reader") {
    val plan = Sources.contractEvents(spark, sf, Seq(1L, 2L), "purchase")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("event_type"), s"event_type not pushed:\n$plan")
  }

  test("time-sliced as-of join equals the plain form and splits a key across partitions") {
    val ev = Tables.events(spark, sf)
    val probes = ev.where(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value")
    val state = ev.where(col("event_type") === "click")
      .select("user_id", "event_id", "ts", "value")
    val plain = Enrich.asOfJoin(probes, state,
      key = "user_id", leftTime = "event_id", rightTime = "event_id",
      tieBreaker = "event_id", valueCols = Seq("value"))
    // slice boundaries = block-height quartiles of the probe side
    val bounds = probes.stat.approxQuantile("event_id", Array(0.25, 0.5, 0.75), 0.0)
      .map(_.toLong).distinct.sorted.toSeq
    val sliced = Enrich.asOfJoinSliced(probes, state,
      key = "user_id", leftTime = "event_id", rightTime = "event_id",
      tieBreaker = "event_id", valueCols = Seq("value"), boundaries = bounds)
    assert(plain.count() == sliced.count() && plain.count() > 0)
    assert(sliced.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(sliced).count() == 0)
    // the plan must shuffle on (key, slice) — the hot key spreads
    val p = sliced.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id#\\d+L?, __slice#".r.findFirstIn(p).isDefined, p)
  }

  test("repetition/boilerplate survive short and empty documents (ANSI element_at guard)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hi"), (2L, ""), (3L, "a b"), (4L, "a b c d"),
      (5L, "x y x y x y x y")).toDF("doc_id", "text")
    val rep = graft.ext.TextOps.repetitionOf(docs).collect()
    assert(rep.length == 5)
    // <3 tokens → zero trigrams → 0.0 by definition, no crash
    assert(rep.take(3).forall(_.getDouble(1) == 0.0))
    // the looping doc is caught: 6 trigrams, 2 distinct → 4/6 duplicated
    assert(math.abs(rep(4).getDouble(1) - 4.0 / 6.0) < 1e-15)
    assert(rep(4).getDouble(2) == 0.5) // top token x: 4 of 8
    // <5 tokens → no 5-grams at all, no crash
    assert(graft.ext.TextOps.boilerplateNgramsOf(docs.where(col("doc_id") <= 4)).count() == 0)
  }

  test("boilerplate report is bounded: doc-frequency floor and deterministic top-K") {
    import spark.implicits._
    // shared 5-gram "a b c d e" in 3 docs; "p q r s t" in 2; unique tail rows
    val docs = Seq(
      (1L, "a b c d e xx"), (2L, "a b c d e yy"), (3L, "zz a b c d e"),
      (4L, "p q r s t"), (5L, "p q r s t"), (6L, "u v w x y z")).toDF("doc_id", "text")
    val all = graft.ext.TextOps.boilerplateNgramsOf(docs).collect()
    // threshold 2 (the oracle form): both shared 5-grams + the doc-1/2/3
    // side grams that appear twice... assert the two known full-span grams
    val byGram = all.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGram("a b c d e") == 3 && byGram("p q r s t") == 2)
    // raising the floor drops the pairwise tail
    val floor3 = graft.ext.TextOps.boilerplateNgramsOf(docs, minDocs = 3).collect()
    assert(floor3.map(_.getString(0)).toSet == Set("a b c d e"))
    // top-K keeps the most-shared first, deterministically
    val top1 = graft.ext.TextOps.boilerplateNgramsOf(docs, topK = Some(1)).collect()
    assert(top1.length == 1 && top1.head.getString(0) == "a b c d e")
    // a floor below 2 would report every n-gram in the corpus — rejected
    intercept[IllegalArgumentException](
      graft.ext.TextOps.boilerplateNgramsOf(docs, minDocs = 1).collect())
  }

  test("sliced as-of: null state columns don't mask earlier values; state-only slices carry") {
    import spark.implicits._
    // slice boundary at t=5: state (t=1, v=5.0) then (t=2, v=null) in slice
    // 0, probe at t=10 in slice 1 — per-column last-non-null must surface
    // 5.0 (a row-wise carry struct would yield null)
    val probes = Seq((1L, 10L)).toDF("k", "t")
    val state = Seq((1L, 1L, Some(5.0)), (1L, 2L, None)).toDF("k", "t", "v")
    def both(p: org.apache.spark.sql.DataFrame, s: org.apache.spark.sql.DataFrame) = (
      Enrich.asOfJoin(p, s, "k", "t", "t", "t", Seq("v")).collect().toSeq,
      Enrich.asOfJoinSliced(p, s, "k", "t", "t", "t", Seq("v"), Seq(5L)).collect().toSeq)
    val (plain, sliced) = both(probes, state)
    assert(plain == sliced, s"plain=$plain sliced=$sliced")
    assert(sliced.head.getDouble(2) == 5.0)
    // state-only middle slice: boundaries (2, 5) put state t=3 alone in
    // slice 1 with no probes — its value must still reach the probe at t=10
    val probes2 = Seq((1L, 10L)).toDF("k", "t")
    val state2 = Seq((1L, 3L, Some(7.0))).toDF("k", "t", "v")
    val sliced2 = Enrich.asOfJoinSliced(probes2, state2, "k", "t", "t", "t",
      Seq("v"), Seq(2L, 5L)).collect().toSeq
    assert(sliced2.head.getDouble(2) == 7.0, sliced2.toString)
  }

  test("per-chain source registry routes each query to its chain's store (config.go:18-31)") {
    val reg = ChainRegistry(
      Map("ethereum" -> "/root/testdata/sf0.001", "arbitrum" -> "/root/testdata/sf0.01"),
      default = sf)
    val specs = Loop.expand(Seq("ethereum", "arbitrum")) { (chain, _) =>
      QuerySpec(name = "views", chain = chain,
        globalEvents = Seq(EventSpec("view", Seq("value"))),
        saves = Seq("chain" -> col("chain"), "blocknumber" -> col("blocknumber")))
    }
    val compiled = Compiler.compileAll(spark, reg, SchemaSpec(queries = specs))
    val nEth = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_type") === "view").count()
    val nArb = Tables.events(spark, "/root/testdata/sf0.01")
      .where(col("event_type") === "view").count()
    assert(nEth != nArb) // the two stores genuinely differ
    assert(compiled("0-views").count() == nEth)
    assert(compiled("1-views").count() == nArb)
    // unknown chain falls back to the default store
    assert(reg.resolve("base") == sf)
  }

  test("tx monitor: predicate classes AND-fold; empty spec is a passthrough") {
    import graft.engine.{TxFilterSpec, TxMonitor}
    import org.apache.spark.sql.functions._
    val all = TxMonitor.monitor(spark, sf, TxFilterSpec())
    assert(all.count() == Tables.events(spark, sf).count())
    // each predicate class alone narrows; together they intersect
    val v = TxMonitor.monitor(spark, sf, TxFilterSpec(minValue = Some(100.0)))
    val s = TxMonitor.monitor(spark, sf, TxFilterSpec(senders = Seq(1L, 2L)))
    val both = TxMonitor.monitor(spark, sf,
      TxFilterSpec(minValue = Some(100.0), senders = Seq(1L, 2L)))
    assert(v.count() < all.count() && s.count() < all.count())
    assert(both.count() ==
      v.where(col("sender").isin(1L, 2L)).count())
    // receiver predicate works on the derived payload column
    val r = TxMonitor.monitor(spark, sf, TxFilterSpec(receivers = Seq(0L)))
    assert(r.select("receiver").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("LSH band-bucket cap: an all-identical corpus cannot create a giant bucket join") {
    import spark.implicits._
    // 100 docs with IDENTICAL band hashes — the degenerate mass-duplicate
    // corpus: one bucket of 100 → 4950 pairs uncapped.
    val band = (1 to 100).map(i => (i.toLong, "h0", "h1", "h2", "h3"))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    assert(graft.ext.DedupOps.candidatePairs(band, maxBucket = 50).count() == 0)
    assert(graft.ext.DedupOps.candidatePairs(band, maxBucket = 100).count() == 100L * 99 / 2)
    // mixed corpus: the honest small bucket survives while the degenerate
    // one is excluded
    val mixed = band.union(
      Seq((1000L, "x0", "x1", "x2", "x3"), (1001L, "x0", "x1", "x2", "x3"))
        .toDF("doc_id", "b0", "b1", "b2", "b3"))
    assert(graft.ext.DedupOps.candidatePairs(mixed, maxBucket = 50).count() == 1)
  }
}
