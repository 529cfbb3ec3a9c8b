package graft

import graft.ext.{DedupOps, Relational, SimilarityOps}
import graft.queries.ApolloQueries

/** Physical-plan quality gates: the properties that keep these plans viable
  * at 100 TB must hold structurally, not accidentally. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q5: dims join as broadcast, not shuffle") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q3: customer dim broadcast; no cartesian product") {
    val p = plan("q3_shipping_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("flagship: single events scan with address+signature pushed filters") {
    val p = plan("apollo_flagship_swaps")
    assert(p.contains("PushedFilters"), p)
    // batched scan: exactly one parquet scan of events
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("tx_monitor: declarative predicates reach the scan as pushed filters") {
    val p = plan("tx_monitor")
    // value bounds, sender set, and method set must survive the txView
    // aliasing and land in the parquet reader; the receiver/input predicates
    // (JSON payload lookups) evaluate post-scan by design
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(value,20.0"), p)
    assert(p.contains("In(user_id"), p)
    // the display string truncates the pushed list; the method-set predicate
    // is visible in the post-scan Filter either way
    assert(p.contains("event_type#") && p.contains("IN (purchase,error)"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("dsl_aggregate: grouped aggregation is hash-based with a partial stage") {
    val p = plan("dsl_aggregate")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("s8 block dim join broadcasts the header dimension") {
    val p = plan("s8_block_metadata_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("s7 as-of enrichment is one window pass — no join operators at all") {
    val p = plan("s7_event_asof_enrich")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("minhash LSH: no cartesian product anywhere (candidates via bucket equi-join)") {
    val p = plan("dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding cosine near-dup: bucketed candidates — no all-pairs join") {
    val p = plan("dedup_embedding_cosine")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("incremental embedding dedup: corpus never shuffles — batch side broadcasts (r7)") {
    val p = plan("dedup_embedding_incremental")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the CANDIDATE join (keyed on tbl, bk) must be a broadcast-hash join
    // with the cosine filter fused in — a sort-merge shape there would
    // shuffle the at-rest corpus index on every ingest batch. (The final
    // new-ids ⟕ best join is rows-per-batch sized; AQE broadcasts it at
    // runtime.)
    assert(p.contains("BroadcastHashJoin [tbl"), p)
    assert(!p.linesIterator.exists(l => l.contains("SortMergeJoin") && l.contains("bk#")), p)
  }

  test("ngram jaccard: no cartesian / nested-loop anywhere") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("brute-force similarity broadcasts the query side") {
    val p = plan("sim_brute_topk")
    assert(p.contains("Broadcast"), p)
  }

  test("multi-table LSH ANN: candidate set broadcasts; the embedding table never cartesians") {
    val p = plan("sim_lsh_ann")
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ANN recall joins stay broadcast-shaped — no cartesian anywhere") {
    val p = plan("sim_ann_recall")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("clustered-fixture recall: broadcast routing, no cartesian (r5)") {
    val p = plan("sim_clustered_recall")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Broadcast"), p)
  }

  test("contamination: benchmark gram set broadcasts — the corpus side never shuffles for membership") {
    val p = plan("text_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("per-block balance: one as-of window shuffle + broadcast genesis dim, no merge join") {
    val p = plan("fn_balance_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("registry/price lookups broadcast the dim — the fact side never shuffles for them") {
    val pIs = plan("fn_is_contract")
    assert(pIs.contains("BroadcastHashJoin"), pIs)
    val pPrice = plan("fn_get_price")
    assert(pPrice.contains("BroadcastHashJoin"), pPrice)
    assert(!pPrice.contains("SortMergeJoin"), pPrice)
  }

  test("skew-stress agg shuffles by (key, salt) — the hot key never hits one reducer") {
    val p = plan("skew_hot_key_agg")
    // first exchange must partition on the salted compound key
    assert("hashpartitioning\\(skew_key#\\d+L?, salt#".r.findFirstIn(p).isDefined, p)
  }

  test("scans prune columns: q1 reads only the aggregated lineitem columns") {
    val p = plan("q1_pricing_summary")
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"), p)
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"), readSchema)
  }

  test("s9 block dater: one conditional-aggregation pass — no BNLJ, no cartesian (r3 fix guard)") {
    val p = plan("s9_block_dater")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("sampleGrid at 10M ticks: distributed Range — no single-task array explode (r3 fix guard)") {
    val addrs = spark.range(0, 4).toDF("user_id")
    // ~10M one-second ticks: the pre-r3 sequence()+explode form materialized
    // the whole array in one task; the Range form must split across tasks.
    val g = graft.engine.Sources.sampleGrid(spark, "2024-01-01", "2024-04-26", 1L, addrs)
    val p = g.queryExecution.executedPlan.toString
    assert(p.contains("Range"), p)
    assert(!p.toLowerCase.contains("explode"), p)
    assert(g.select("sample_ts").rdd.getNumPartitions > 1, "tick generation must parallelize")
  }

  test("blockDater join fallback (>64 targets) matches the conditional-agg form") {
    import graft.engine.Sources
    val ev = Tables.events(spark, sf)
    val targets = (0 until 70).map(i => f"2024-01-${i % 28 + 1}%02d ${i % 24}%02d:00:00")
    assert(targets.distinct.size > 64)
    val viaJoin = Sources.blockDater(ev, targets ++ targets) // dupes collapse too
    val (a, b) = targets.splitAt(35)
    val viaAgg = Sources.blockDater(ev, a).union(Sources.blockDater(ev, b))
    assert(viaJoin.count() == viaAgg.count())
    assert(viaJoin.except(viaAgg).count() == 0)
    assert(viaAgg.except(viaJoin).count() == 0)
  }

  test("agg_topk_bounded: map-side partial aggregate, no window, no global sort of the fact (r9)") {
    val plan = ext.Relational.topkAggPerGroup(spark, sf)
      .queryExecution.executedPlan.toString
    // the whole point vs the window form: the per-group cut happens in an
    // aggregate with a partial (pre-shuffle) stage, never a Window sort
    assert(!plan.contains("Window"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate pair:\n$plan")
  }

  test("INVENTORY-WIDE plan audit: no cartesian product anywhere; BNLJ only where justified (r6)") {
    // The targeted asserts above pin known-risky shapes; this sweep closes
    // the rest of the inventory: every BATCH query's physical plan is
    // checked for the two scale-killer operators. Excluded by name (with
    // the reason, not silently): queries whose construction EXECUTES work —
    // streaming drains and driver-iterative algorithms — their plan
    // discipline is covered by the targeted asserts + oracle parity.
    val executesOnBuild = Set(
      "s3_stream_batch_parity", "s3_compiled_stream_parity", "s6_method_poller",
      "s7_realtime_event_methods", "s7_realtime_negative_offset",
      "s7_realtime_positive_offset", "mempool_monitor", "dsl_stream_aggregate",
      "stream_join_parity", "stream_neardup_dedup", "raw_stream_passthrough",
      "stream_priority_sample", "stream_index_upsert", "stream_kn_score_parity",
      "stream_ccnet_mix_parity", // two-hop foreachBatch run; final frame is the memory sink
      "dedup_cluster_canonical", "dedup_best_survivor", "curation_pipeline",
      "dedup_semantic", // reuses the memoized cluster fixtures
      "sim_pagerank",   // Pregel-style loop: localCheckpoint per iteration
      "sim_lpa_communities", // same Pregel loop shape (label votes per iteration)
      "s9_block_dater") // driver-side binary-search refinement
    // BroadcastNestedLoopJoin is legitimate ONLY against a broadcast
    // one-row (or few-row constant) side — the documented crossJoin uses
    val bnljJustified = Set(
      "sample_mixture",   // two 1-row/20-row broadcast aggregates onto the scan
      "sample_temperature", // 1-row (tok_total, t_min) aggregate broadcast, same shape
      "sample_token_budget", // 1-row budget aggregate broadcast (SamplingOps scaladoc)
      "sample_bpe_budget",   // same budgetKeep shape, subword-token currency
      "sample_ccnet_mix",    // budgetKeep's 1-row budget + score-range broadcasts atop the KN stats' 1-row total
      "sample_importance",// 1-row corpus-mean aggregate broadcast
      "q14_promo_share",  // 1-row ratio numerator/denominator combine
      "approx_distinct",  // 1-row exact-vs-HLL comparison frame
      "split_train_val_test", // 1-row corpus count broadcast
      "text_contamination", "text_contamination_bloom", // tiny benchmark-set constants
      "s5_method_timeseries", "s5_method_grid_compiled", // tick grid × contract list (both tiny, Sources.scala:86)
      "template_aave", "template_compound", "template_makerdao", // the same S5 grid shape
      "sim_brute_topk", "sim_ann_recall", // brute-force baseline: queries (8 rows) broadcast against candidates BY DESIGN
      "sim_mips_topk",    // same 8-row broadcast scan, inner-product scoring
      "sim_pq_ann",       // ADC scan: 8-row query side broadcast against the codes column BY DESIGN
      "sim_pq_rerank",    // same ADC scan shape feeding the shortlist; the fetch itself is an equi-join
      "sim_pq_trained",   // same ADC scan (8-row query side broadcast) off the TRAINED codebook
      "sim_binary_hamming", // Hamming scan: 8-row packed-query side broadcast against the code words BY DESIGN
      "sim_ivf_ann",      // routing: 8 queries × broadcast representative set (both tiny; SimilarityOps:155)
      "text_tfidf_topk",  // 1-row corpus doc-count broadcast for the idf term (TextOps:401)
      "text_bm25_topk",   // 1-row (nd, tl, avgdl) stats aggregate broadcast onto the scored rows
      "text_hybrid_rrf",  // bm25 stats row + 4-row dense-query side broadcast against candidates BY DESIGN
      "sim_outlier_filter", // 1-row (n, s, ss) stats aggregate broadcast onto the scan
      "text_pmi_pairs",   // two 1-row corpus-total aggregates broadcast onto the pair counts
      "text_kn_train", "text_kn_score", // 1-row bigram-type total (N1+(··)) broadcast onto the stat joins
      "text_kn_incremental", // same knTrainTable tail off the merged counts
      "text_kn3_train", "text_kn3_score", // 1-row (y,z)-type total (N1+(··)) broadcast, one order up
      "text_kn3_score_bucketed", // same kn3Apply tail (1-row N1+(··) broadcast); model side reads buckets
      "text_kn5_train", "text_kn5_score", // 1-row order-1 total (den1) broadcast, the order-n ladder
      "text_kn5_incremental", // same ladder tail off the merged counts
      "text_kn5_score_bucketed", // same scorer tail; model orders 3-5 read buckets
      "text_kn5_merge_score", // same scorer tail over the MERGED landing (r15)
      "sim_clustered_recall")
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(executesOnBuild)
      .flatMap { name =>
        val plan = graft.SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljJustified(name)
        if (cart || bnlj)
          Some(s"$name: ${if (cart) "CartesianProduct " else ""}${if (bnlj) "unjustified BNLJ" else ""}")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("AQE splits the hot-key JOIN at runtime — the join-side complement of salted aggs (r9.2)") {
    import org.apache.spark.sql.functions._
    // ~90% of BOTH sides fold onto key 0 (the skew_asof_sliced shape); a
    // static plan sends that key's entire join to one reducer. The claim
    // the skew ops' scaladocs make — "AQE skew-join handles the join-side
    // equivalent" — executed and checked, not assumed.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256b",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128b",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val ev = Tables.events(spark, sf)
      val hot = when(col("event_id") % 10 < 9, lit(0L)).otherwise(col("user_id"))
      // repartition(8) first: the single-file fixture yields ONE map task
      // per side, and a skewed reduce partition made of one shuffle block
      // has no map boundaries for AQE to split at — multi-split inputs are
      // the production shape
      val l = ev.where(col("event_type") === "purchase")
        .select(hot.as("k"), col("event_id").as("l_id"), col("value").as("l_v"))
        .repartition(8)
      val r = ev.where(col("event_type") === "click")
        .select(hot.as("k"), col("event_id").as("r_id"), col("value").as("r_v"))
        .repartition(8)
      val j = l.join(r, "k")
      // execute THIS frame: count() would spawn its own query execution and
      // leave j's adaptive plan un-run
      assert(j.collect().nonEmpty)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot-key join skewed at runtime:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("layout_zorder_scan: ONE Z-layout prunes on BOTH dimensions; a 1-D sort cannot (r9)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val zdir = new java.io.File(sys.props("java.io.tmpdir"), "graft_ztest_z").getAbsolutePath
    val udir = new java.io.File(sys.props("java.io.tmpdir"), "graft_ztest_u").getAbsolutePath
    ext.Relational.writeZorder(ev, zdir)
    ev.repartitionByRange(32, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(udir)
    // per-file min/max IS what parquet row-group stats pruning consults
    def fileStats(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("value").as("vlo"), max("value").as("vhi"))
      .collect()
    val (zs, us) = (fileStats(zdir), fileStats(udir))
    val maxU = ev.agg(max("user_id")).head.getLong(0)
    // value-only predicate [100, 164): sorted-by-user files all straddle it
    def vHit(r: org.apache.spark.sql.Row) =
      r.getAs[Double]("vhi") >= 100.0 && r.getAs[Double]("vlo") < 164.0
    val (zv, uv) = (zs.count(vHit), us.count(vHit))
    assert(uv * 10 >= us.length * 9, s"user-sorted layout should not prune on value: $uv/${us.length}")
    assert(zv * 10 <= zs.length * 7, s"z-layout should skip >=30% of files on value: $zv/${zs.length}")
    assert(zv < uv, s"z-layout must beat the 1-D sort on the value box: $zv vs $uv")
    // user-only predicate (the SAME box the gated query uses): still prunes
    def uHit(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("uhi") >= maxU / 7 && r.getAs[Long]("ulo") <= maxU / 4
    val zu = zs.count(uHit)
    assert(zu * 10 <= zs.length * 7, s"z-layout should skip >=30% of files on user: $zu/${zs.length}")
  }

  test("layout_pruned_scan: lang is a PARTITION filter, not a data filter (r7)") {
    // the written layout must turn the lang predicate into directory
    // pruning — it may appear only in PartitionFilters; source stays a
    // pushed data filter against row-group stats
    val df = ext.Relational.layoutPrunedScan(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val part = "PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(p)
    assert(part.isDefined, s"lang must prune partitions:\n$p")
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(p).getOrElse("")
    assert(!pushed.contains("lang"), s"lang must not reach the data filters: $pushed")
    assert(pushed.contains("source"), s"source must push to row-group stats: $pushed")
  }

  test("streaming admission per-batch plan: row-bearing work keys on the bucket, never one partition (r11)") {
    // the plan admitByBudget runs INSIDE each micro-batch (its streaming
    // wrapper adds nothing row-bearing): the per-row prefix-sum window must
    // partition by the rescaled bucket, and the only SinglePartition
    // exchanges allowed are the two CONSTANT-size frames — the 1-row
    // min/max rescale agg and the ≤65-row bucket-offset window. The r10
    // form (groupByKey(0) + whole-batch sort in one task) is what this
    // guards against.
    import spark.implicits._
    val batch = (1 to 1000).map(i => (i.toLong, (i % 97).toDouble / 97.0, 1L + i % 5))
      .toDF("doc_id", "mean_p", "n_tok")
    val (withCum, _) =
      ext.SamplingOps.bucketedCumBefore(batch, "mean_p", "n_tok", descending = true)
    val p = withCum.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(qb"),
      s"the row-bearing exchange must key on the rescaled bucket:\n$p")
    assert("windowspecdefinition\\(qb".r.findAllIn(p).nonEmpty,
      s"the per-row window must partition by the bucket:\n$p")
    // ≤ 3: the ≤65-row bucket-offset window plus the 1-row min/max rescale
    // agg, whose subtree prints twice (it feeds both the row projection and
    // the bucket rollup; AQE reuses the exchange at runtime). All three sit
    // over constant-size frames — none carries the row-bearing stream.
    val singles = "SinglePartition".r.findAllIn(p).length
    assert(singles <= 3, s"unexpected single-partition exchanges ($singles):\n$p")
  }

  test("whole-stage codegen covers the flagship transform/filter/save pipeline") {
    // AQE's pre-execution plan hides codegen wrapping; disable it to see the
    // final operator tree structurally.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = ApolloQueries.flagship(spark, sf).queryExecution.executedPlan.toString
      // "*(n)" prefixes mark WholeStageCodegen stages; the whole
      // filter/project pipeline must sit inside stage 1 with the scan.
      assert(p.contains("*(1) Project") && p.contains("*(1) Filter"), p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
