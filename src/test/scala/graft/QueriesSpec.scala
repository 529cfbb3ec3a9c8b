package graft

/** Every declared query must run and produce rows on the smoke fixture, and
  * every oracle key must have a matching query (driver-contract invariants).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; queries all named uniquely") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle-only keys: ${ok -- qk}")
    // every query is oracle-gated — approx_distinct's estimate quality is
    // asserted via its within_5pct column since r4
    assert((qk -- ok).isEmpty, s"queries lacking an oracle: ${qk -- ok}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("fn_balance_lookup is per-block: a static snapshot join would fail its oracle") {
    import org.apache.spark.sql.functions._
    val perBlock = graft.queries.ApolloQueries.balanceLookup(spark, sf)
    // one address probed at two blocks between which its balance changed
    val changed = perBlock.groupBy("user_id")
      .agg(countDistinct("balance").as("n_bals"))
      .where(col("n_bals") > 1)
    assert(changed.count() > 0,
      "fixture must contain mid-range balance changes or the oracle cannot " +
        "distinguish per-block from snapshot")
    // and the snapshot form (latest-only) actually disagrees
    val snapshot = graft.engine.Enrich.balanceLookup(
      Tables.events(spark, sf).where(col("event_type") === "purchase"),
      Tables.customer(spark, sf),
      factAddr = "user_id", balAddr = "c_custkey", balCol = "c_acctbal",
      scaleDecimals = 2, as = "balance")
      .select(col("event_id").as("blocknumber"), col("user_id"), col("value"), col("balance"))
    assert(perBlock.exceptAll(snapshot).count() > 0)
  }

  test("fn_token_balance is per-block and slice-partitioned (10-token hot keys)") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.ApolloQueries.tokenBalance(spark, sf)
    // per-block: some token's balance changes across the probed range
    val changed = df.groupBy("token").agg(countDistinct("token_balance").as("n"))
      .where(col("n") > 1)
    assert(changed.count() > 0, "token balances must change mid-range")
    // the as-of shuffle key must be (token, slice) — 10 tokens would
    // otherwise bottleneck on 10 reducers at scale
    val p = df.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(token#\\d+L?, __slice#".r.findFirstIn(p).isDefined, p)
  }

  test("int8 quantization: max lane hits ±127 exactly, error bounded by scale/2 per lane") {
    import org.apache.spark.sql.functions._
    val q = graft.ext.SimilarityOps.quantizeInt8(Tables.embeddings(spark, sf))
    val checked = q.select(
      col("vec_id"), col("q_scale"),
      expr("array_max(transform(q_vec, x -> abs(CAST(x AS INT))))").as("q_max"),
      expr("size(q_vec)").as("n"),
      expr(
        """aggregate(zip_with(embedding, q_vec, (x, q) ->
          |  abs(CAST(x AS DOUBLE) - CAST(q AS DOUBLE) * q_scale)),
          |CAST(0.0 AS DOUBLE), (a, v) -> greatest(a, v))""".stripMargin).as("max_err"))
    val rows = checked.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(r.fieldIndex("q_scale"))
      if (scale > 0) {
        // symmetric quantization: the max-|x| lane maps to exactly ±127
        assert(r.getInt(r.fieldIndex("q_max")) == 127, r.toString)
        // round() puts every lane within half a step of its float value
        assert(r.getDouble(r.fieldIndex("max_err")) <= scale / 2 + 1e-12, r.toString)
      }
      assert(r.getInt(r.fieldIndex("n")) == 64)
    }
    // storage story: the quantized column is int8 lanes, not floats
    assert(q.schema("q_vec").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.ByteType)
  }

  test("clustered-fixture ANN: recall far exceeds the scan fraction (index earns its keep)") {
    import org.apache.spark.sql.functions._
    val r = graft.ext.SimilarityOps.clusteredRecall(spark, sf)
      .agg(avg("recall_at_5").as("recall"), max("scanned_fraction").as("scanned"))
      .head()
    val recall = r.getDouble(0)
    val scanned = r.getDouble(1)
    assert(scanned <= 0.26, s"scanned fraction $scanned exceeds the 2/8-cell budget")
    assert(recall >= 0.8, s"recall@5 $recall on the clustered fixture — index not separating signal")
    assert(recall > 2 * scanned, s"recall $recall must beat the $scanned scan fraction decisively")
  }

  test("best-survivor: exactly one keeper per family, and it has the max quality") {
    import org.apache.spark.sql.functions._
    val out = ext.DedupOps.bestSurvivor(spark, sf).cache()
    // one keeper per cluster
    val perCluster = out.groupBy("cluster")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"), max("quality").as("maxq"))
    assert(perCluster.where(col("keepers") =!= 1).isEmpty)
    // the keeper IS the max-quality member
    assert(out.where(col("keep")).join(perCluster, Seq("cluster"))
      .where(col("quality") =!= col("maxq")).isEmpty)
    // quality-aware selection differs from min-id when a better member exists
    val minIdKeep = out.groupBy("cluster").agg(min("doc_id").as("doc_id"))
    val divergent = out.where(col("keep"))
      .join(minIdKeep, Seq("cluster", "doc_id"), "left_semi")
    assert(divergent.count() < out.where(col("keep")).count(),
      "quality-aware survivor never diverged from min-id — fixture too uniform to test the policy")
  }

  test("semantic dedup: tight clusters collapse, min-id per cluster survives") {
    import org.apache.spark.sql.functions._
    val out = ext.DedupOps.semDedup(spark, sf).cache()
    val total = out.count()
    val kept = out.where(col("keep")).cache()
    // the clustered fixture is 8 tight clusters — semantic dedup must
    // collapse most of the corpus...
    assert(kept.count() < total / 2, s"kept ${kept.count()} of $total — nothing deduped")
    // ...but every cluster keeps at least one survivor, and the cluster's
    // min-id member (which no lower id can drop) is always among them
    assert(kept.select("cl").distinct().count() == 8)
    val minIds = out.groupBy("cl").agg(min("vec_id").as("vec_id"))
    assert(kept.join(minIds, Seq("cl", "vec_id")).count() == 8,
      "a cluster's min-id member was dropped — impossible under u<v dedup")
  }

  test("pack_sequences: bins tile each source contiguously in exact token units") {
    import org.apache.spark.sql.functions._
    val out = ext.SamplingOps.packSequences(Tables.documents(spark, sf)).cache()
    // offsets live inside the context window; reconstruction identity holds
    assert(out.where(col("bin_offset") < 0 || col("bin_offset") >= 512).isEmpty)
    assert(out.where(col("bin_id") < 0).isEmpty)
    // per source: bin_id*ctx + offset must equal the running token count
    // (recompute independently and diff)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val recomputed = out
      .withColumn("expect_cum", coalesce(sum("est_tokens").over(w), lit(0L)))
    assert(recomputed.where(col("bin_id") * 512 + col("bin_offset") =!= col("expect_cum")).isEmpty)
    // packing is per-source: each source starts at bin 0 offset 0
    val firsts = out.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")))
      .where(col("rk") === 1)
    assert(firsts.where(col("bin_id") =!= 0 || col("bin_offset") =!= 0).isEmpty)
  }

  test("mixture sampling: binding source keeps ~all tokens, others downsample to the mix") {
    import org.apache.spark.sql.functions._
    val out = ext.SamplingOps.mixtureSample(spark, sf).cache()
    // rates live in (0, 1] (+ulp): the binding source saturates at ~1.0
    val rates = out.select("accept_rate").collect().map(_.getDouble(0))
    assert(rates.forall(r => r > 0.0 && r <= 1.0 + 1e-9))
    assert(rates.max > 0.999, s"no binding source at rate ~1 (max ${rates.max})")
    // kept tokens track share*B: every source's expected kept-token mass is
    // accept_rate * t_tokens; allow sampling noise (25 docs/source at this SF)
    val bad = out.where(
      abs(col("kept_tokens") - col("accept_rate") * col("t_tokens")) >
        col("t_tokens") * 0.5 + lit(200.0))
    assert(bad.isEmpty, bad.collect().mkString(", "))
    // decisions re-derive: kept_docs is the count of docs whose seeded
    // uniform clears the rate (recompute independently for one source)
    val one = out.orderBy("source").head()
    val src = one.getString(0); val rate = one.getDouble(2)
    val u = conv(substring(md5(concat(lit("graft-sample-1|mix|"),
      col("doc_id").cast("string"))), 1, 6), 16, 10).cast("double") / lit(16777216.0)
    val recount = Tables.documents(spark, sf).where(col("source") === src)
      .where(u < lit(rate)).count()
    assert(recount == one.getLong(3))
  }

  test("bloom decontamination equals the exact broadcast form row-for-row") {
    // Bloom has no false negatives and the confirm join kills false
    // positives, so the sketch-prefiltered result must be identical
    val exact = ext.TextOps.contamination(spark, sf)
    val bloom = ext.TextOps.contaminationBloom(spark, sf)
    assert(exact.collect().toSeq == bloom.collect().toSeq)
  }

  test("importance sampling: keep rate tracks mean quality; decisions are per-doc stable") {
    import org.apache.spark.sql.functions._
    val out = ext.SamplingOps.importanceSample(spark, sf).cache()
    val r = out.agg(
      avg(col("keep").cast("double")).as("kept_frac"),
      avg("quality").as("mean_q")).head()
    // E[kept] = mean quality; 500-doc binomial noise is ~0.02, allow 0.1
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.1,
      s"kept ${r.getDouble(0)} vs mean quality ${r.getDouble(1)}")
    // the decision is u(doc_id) < quality exactly — recompute and diff
    assert(out.where((col("u") < col("quality")) =!= col("keep")).isEmpty)
    // u is a real uniform draw, not constant
    assert(out.select("u").distinct().count() > 400)
  }

  test("incremental dedup: one row per new-batch doc, matches only from the corpus side") {
    import org.apache.spark.sql.functions._
    val out = ext.DedupOps.incrementalDedup(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    // output = EXACTLY the new batch (seeded-md5 split), one row each
    assert(out.count() == docs.where(ext.DedupOps.isNewCol).count())
    assert(out.where(!ext.DedupOps.isNewCol).isEmpty, "a corpus doc leaked into the new batch")
    // a match must point INTO the corpus, never at another new doc, and
    // carry the exact-Jaccard floor; non-matches carry nulls
    val dupOf = out.where(col("is_dup")).select(col("dup_of").as("doc_id"))
    assert(dupOf.join(docs.where(ext.DedupOps.isNewCol), Seq("doc_id")).isEmpty,
      "dup_of points at a new-batch doc — incremental dedup must check against the corpus only")
    assert(out.where(col("is_dup") && col("dup_jaccard") < 0.5).isEmpty)
    assert(out.where(!col("is_dup") && (col("dup_of").isNotNull || col("dup_jaccard").isNotNull)).isEmpty)
  }

  test("dup spans: cross-doc shared substrings merge into maximal spans; within-doc repeats don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // shares a 10-token substring with doc 2
      (2L, "x y a b c d e f g h i j z"),
      (3L, "p q r s t u v w p q r s t u v w") // repeated 8-gram, but only inside doc 3
    ).toDF("doc_id", "text")
    val out = ext.TextOps.dupSpansOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // doc 1: window starts 1..3 all duplicated → one span covering tokens 1-10
    // doc 2: window starts 3..5 → tokens 3-12; doc 3: nothing (not cross-doc)
    assert(out == Seq((1L, 1L, 10L, 3L), (2L, 3L, 12L, 3L)), out.toString)
  }

  test("winnowing: the local guarantee — docs sharing a >= w+k-1 token run share a fingerprint") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // k=4, w=4 → guarantee threshold = 7 shared tokens; these two docs
    // share EXACTLY the 7-token run "one two three four five six seven"
    // and nothing else
    val docs = Seq(
      (1L, "aa bb one two three four five six seven cc dd ee ff gg"),
      (2L, "pp qq rr one two three four five six seven ss tt")
    ).toDF("doc_id", "text")
    val fp = ext.TextOps.winnowFingerprints(docs, 4, 4)
    val shared = fp.where(col("doc_id") === 1).select("fp_h")
      .intersect(fp.where(col("doc_id") === 2).select("fp_h"))
    assert(!shared.isEmpty,
      "winnowing guarantee violated: a shared 7-token run produced no shared fingerprint")
    // density: every full window contributes exactly one fingerprint, so
    // n_fp <= n_windows and every selected pos is a valid gram position
    val out = ext.TextOps.winnowOf(docs).collect()
    out.foreach { r =>
      val (ng, nf) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_fp"))
      assert(nf >= 1 && nf <= ng - 3, s"doc ${r.getLong(0)}: $nf of ${ng - 3} windows")
    }
  }

  test("winnow pairs: the local guarantee carries end-to-end — a minimal 7-token overlap is a candidate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb one two three four five six seven cc dd ee ff gg"),
      (2L, "pp qq rr one two three four five six seven ss tt"),
      (3L, "completely different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val out = ext.TextOps.winnowPairsOf(docs).collect()
    val pair = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, s"guaranteed candidate pair missing: ${out.toSeq}")
    assert(pair.get.getAs[Long]("shared_fp") >= 1L)
    val j = pair.get.getAs[Double]("jaccard")
    assert(j > 0.2 && j < 0.7, s"exact jaccard sanity: $j")
    assert(!out.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L),
      "disjoint doc must not appear unless hashes collide")
  }

  test("winnowing: short docs fall back to min-of-everything and still match (r6.3 review)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 6 tokens → 3 grams < w=4: no full window, but classic winnowing still
    // emits the min over all grams — identical short docs MUST share it,
    // and n_grams must report the true gram count, not 0
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta")
    ).toDF("doc_id", "text")
    val out = ext.TextOps.winnowOf(docs).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_grams") == 3L, s"true gram count: ${r.toSeq}")
      assert(r.getAs[Long]("n_fp") == 1L, s"one fallback fingerprint: ${r.toSeq}")
    }
    assert(out.map(_.getAs[String]("fp_md5")).distinct.length == 1,
      "identical short docs must share their fallback fingerprint")
  }

  test("winnowing: equal hashes in a window select the RIGHTMOST position") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // all 4-grams of "a a a a a a a a" are identical → every window's min is
    // a tie and must resolve to its LAST start: windows s=1,2 select 4,5
    val docs = Seq((1L, "a a a a a a a a")).toDF("doc_id", "text")
    val fp = ext.TextOps.winnowFingerprints(docs, 4, 4)
      .select("fp_pos").as[Long].collect().sorted.toSeq
    assert(fp == Seq(4L, 5L), s"got $fp")
  }

  test("sign-hash width is the embedding-LSH scale knob: occupancy collapses per bit (r6.4)") {
    // the dedup_embedding_cosine scale contract (b ∝ log N): each added
    // sign bit ~halves bucket occupancy on near-isotropic embeddings, so
    // widening the hash as N grows holds candidates-per-vector constant
    import org.apache.spark.sql.functions._
    def occupancy(bits: Int): (Long, Double) = {
      val bucket = (0 until bits)
        .map(i => s"CASE WHEN element_at(embedding, ${1 + i}) > 0 THEN ${1L << (bits - 1 - i)} ELSE 0 END")
        .mkString("CAST(", " + ", " AS BIGINT)")
      val r = Tables.embeddings(spark, sf).select(expr(bucket).as("bk"))
        .groupBy("bk").count()
        .agg(max("count").as("mx"), avg("count").as("av")).head()
      (r.getLong(0), r.getDouble(1))
    }
    val (max4, avg4) = occupancy(4)
    val (max8, avg8) = occupancy(8)
    assert(avg8 * 8 < avg4, s"avg occupancy must collapse: b=4 $avg4 vs b=8 $avg8")
    assert(max8 * 2 < max4, s"max occupancy must collapse: b=4 $max4 vs b=8 $max8")
  }

  test("embeddingCosine width parameterization: gate default IS b=4, bounds loud (r7)") {
    // the oracle gate never sets SPARK_GRAFT_EMB_BITS, so the gated query
    // must be bit-identical to the explicit fixture width — and the knob
    // must reject widths the 64-dim vectors can't hash (2 tables × b dims)
    val gate = ext.DedupOps.embeddingCosine(spark, sf).collect()
    val b4 = ext.DedupOps.embeddingCosineAt(spark, sf, 4).collect()
    assert(gate.toSeq == b4.toSeq, "gate default diverged from explicit b=4")
    // wider b trades recall for candidate volume: pairs at b=7 must still
    // all be TRUE near-dups (the exact-cosine confirm is width-independent)
    val b7 = ext.DedupOps.embeddingCosineAt(spark, sf, 7).collect()
    assert(b7.forall(_.getDouble(2) >= 0.4))
    intercept[IllegalArgumentException] {
      ext.DedupOps.embeddingCosineAt(spark, sf, 0)
    }
    intercept[IllegalArgumentException] {
      ext.DedupOps.embeddingCosineAt(spark, sf, 33)
    }
  }

  test("trained PQ: the k-means-fitted codebook routes every top-5 to the right cluster (r7)") {
    // closes the kmeansTrain→index loop: codebooks here are TRAINED per
    // subspace (not the fixture's sign grid), and the end-to-end read path
    // must still route correctly — same_cluster TRUE on all 8×5 rows, and
    // the exact re-rank stage must produce strictly ranked l2 per query
    val rows = ext.SimilarityOps.pqTrained(spark, sf).collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getBoolean(5)), "trained codebook misrouted a query")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val l2s = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(l2s.sorted.sameElements(l2s), s"q$q re-rank not l2-ordered")
    }
  }

  test("trained IVF: trained cells route every query home; scoring stays within NProbe cells (r7)") {
    // the middle leg of the trainer→index wiring: cells are the Lloyd
    // codebook's fit (not min-id members, not the generator's labels). On
    // the separable fixture the trained quantizer must (a) route all 8×5
    // survivors to the query's own generating cluster, (b) score only
    // members of ≤ NProbe routed cells per query, (c) rank by exact L2
    val rows = ext.SimilarityOps.ivfTrained(spark, sf).collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getAs[Boolean]("same_cluster")), "trained cells misrouted a query")
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("cell")).distinct.length <= 3, s"q$q scored > NProbe cells")
      val l2s = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("l2"))
      assert(l2s.sorted.sameElements(l2s), s"q$q not l2-ordered")
    }
  }

  test("trained SemDeDup: trained cells converge to the generator's → keep set identical (r7)") {
    // the trained quantizer reaches purity 1.0 on the separable fixture, so
    // its cells are a relabeling of the generator's — the within-cell pair
    // set, and therefore the keep/drop decisions, must match semDedup's
    // fixture-arithmetic cells row for row (cell IDs may permute; keep not)
    val trained = ext.DedupOps.semDedupTrained(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val fixture = ext.DedupOps.semDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(trained.size == fixture.size)
    val diverged = fixture.collect { case (id, k) if trained(id) != k => id }
    assert(diverged.isEmpty, s"keep/drop diverged for vec_ids ${diverged.take(5).mkString(",")}")
  }

  test("PQ re-rank: the exact stage reorders the tie-flattened ADC shortlist (r6.4)") {
    val rows = ext.SimilarityOps.pqRerank(spark, sf).collect()
    assert(rows.length == 40) // 8 queries × top-5
    // within a cell ADC collapses to id-order ties, so the exact stage must
    // actually move things: every surviving row was promoted from deeper in
    // the shortlist than its final rank
    val reordered = rows.count(r => r.getAs[Long]("rank") != r.getAs[Long]("adc_rank"))
    assert(reordered > 20, s"exact re-rank changed only $reordered/40 positions")
    assert(rows.forall(_.getAs[Boolean]("same_cluster")), "routing must hold through re-rank")
  }

  test("k-means training: inertia descends and purity reaches 1.0 on the clustered fixture") {
    val rows = ext.SimilarityOps.kmeansTrain(spark, sf).collect()
    val byIter = rows.groupBy(_.getAs[Long]("iter"))
    assert(byIter.keySet == Set(1L, 2L, 3L) && byIter.values.forall(_.length == 8))
    val totals = byIter.view.mapValues(_.map(_.getAs[Long]("inertia")).sum).toMap
    assert(totals(2L) <= totals(1L) && totals(3L) <= totals(2L),
      s"Lloyd inertia must descend: $totals")
    // converged assignment = the generator's clustering, every cluster pure
    byIter(3L).foreach { r =>
      assert(r.getAs[Double]("majority_frac") == 1.0,
        s"cluster ${r.getAs[Long]("cluster")} purity ${r.getAs[Double]("majority_frac")}")
    }
  }

  test("temperature sampling: binding source at rate exactly 1.0, rates fall as 1/sqrt(size)") {
    val rows = ext.SamplingOps.temperatureSample(spark, sf).collect()
      .map(x => (x.getAs[Long]("t_tokens"), x.getAs[Double]("accept_rate")))
    val minT = rows.map(_._1).min
    rows.foreach { case (t, rate) =>
      assert(rate == math.sqrt(minT.toDouble / t.toDouble), s"rate for T=$t")
    }
    // the α=0.5 flattening property: a source k× the binding source's size
    // keeps sqrt(k)× the tokens in expectation, not k× — rates strictly
    // decrease as sizes grow
    val sorted = rows.sortBy(_._1)
    assert(sorted.head._2 == 1.0)
    sorted.sliding(2).foreach { case Array((t1, r1), (t2, r2)) =>
      if (t1 < t2) assert(r2 < r1, s"rate must fall: T=$t1 r=$r1 vs T=$t2 r=$r2")
    }
  }

  test("containment flags a subset doc that the symmetric Jaccard threshold misses") {
    // the asymmetric measure's reason to exist: a short doc fully EMBEDDED
    // in a long one — containment = 1.0 while Jaccard stays under the 0.5
    // dedup threshold (the synthetic corpus's same-length perturbations
    // never produce this shape, so pin it on a constructed pair)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"filler$i").mkString(" ")
    val pair = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextFns.wordShingles(col("text"), 3).as("shs"))
    val Seq(s1, s2) = pair.orderBy("doc_id").collect()
      .map(_.getSeq[String](1).toSet).toSeq
    val inter = (s1 & s2).size.toDouble
    val jaccard = inter / (s1 | s2).size
    val containment = math.max(inter / s1.size, inter / s2.size)
    assert(containment >= 0.8, s"containment $containment — subset pair must flag")
    assert(jaccard < 0.5, s"jaccard $jaccard — the symmetric threshold must miss this pair")
  }

  test("paragraph dedup removes a cross-doc shared paragraph from ALL docs, keeps within-doc repeats") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def chunk(prefix: String) = (1 to 20).map(i => s"$prefix$i").mkString(" ")
    val shared = chunk("nav") // boilerplate paragraph in docs 1 AND 2
    val uniqA = chunk("bodya")
    val uniqB = chunk("bodyb")
    val rep = chunk("rep") // repeated WITHIN doc 3 only
    val docs = Seq(
      (1L, shared + " " + uniqA),
      (2L, shared + " " + uniqB),
      (3L, rep + " " + rep),
    ).toDF("doc_id", "text")
    val out = graft.ext.DedupOps.paragraphDedupOf(docs)
      .orderBy("doc_id").collect()
    def md5s(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // docs 1+2: the shared paragraph removed from BOTH; unique body survives
    assert(out(0).getAs[Long]("n_paras") == 2 && out(0).getAs[Long]("n_removed") == 1)
    assert(out(1).getAs[Long]("n_removed") == 1)
    assert(out(0).getAs[String]("kept_hash") == md5s(uniqA))
    assert(out(1).getAs[String]("kept_hash") == md5s(uniqB))
    assert(out(0).getAs[Long]("kept_tokens") == 20L)
    // doc 3: the repeat is within ONE doc — distinct-doc frequency is 1, kept whole
    assert(out(2).getAs[Long]("n_removed") == 0L,
      "within-doc repetition must not trigger cross-corpus paragraph removal")
    assert(out(2).getAs[String]("kept_hash") == md5s(rep + " " + rep))
  }

  test("CDC chunking survives a one-word prepend that defeats aligned paragraph chunks") {
    // the reason content-defined boundaries exist: doc 2 = doc 1 with ONE
    // word prepended. Every aligned 20-word chunk shifts → paragraph dedup
    // finds nothing; CDC boundaries depend on token content, resync right
    // after the edit, and the shared tail chunks are found and removed.
    import spark.implicits._
    val body = (1 to 200).map(i => s"w${i * 7 % 101}x$i").mkString(" ")
    val docs = Seq((1L, body), (2L, "prepended " + body)).toDF("doc_id", "text")
    val aligned = graft.ext.DedupOps.paragraphDedupOf(docs)
      .agg(org.apache.spark.sql.functions.sum("n_removed")).head().getLong(0)
    assert(aligned == 0L,
      s"aligned chunking should find NO shared chunk after the shift, got $aligned")
    val cdc = graft.ext.DedupOps.cdcChunkDedupOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_removed"))).toMap
    val (n1, rem1) = cdc(1L)
    val (n2, rem2) = cdc(2L)
    assert(rem1 > n1 / 2 && rem2 > n2 / 2,
      s"CDC must remove the majority of both docs' chunks (resynced boundaries): " +
        s"doc1 $rem1/$n1, doc2 $rem2/$n2")
  }

  test("PQ-ADC search routes every top-5 hit to the query's true cluster from codes alone") {
    // the claim PQ can honestly make (measured first: an UNTRAINED codebook
    // on isotropic embeddings gives recall ≈ random 0.025 — quantization
    // cannot rank within a cell, production re-ranks shortlists exactly):
    // with the quantizer FIT to the clustered fixture, asymmetric distance
    // over the 8 three-bit codes must pick same-cluster candidates for
    // every query — 64-float vectors never touched after encoding
    val rows = graft.ext.SimilarityOps.pqAnn(spark, sf).collect()
    assert(rows.length == 8 * 5, "8 queries x top-5")
    assert(rows.forall(_.getAs[Boolean]("same_cluster")),
      "ADC routed a top-5 hit to a foreign cluster")
    // and encoding is deterministic: same codes on a re-run (the property
    // that makes the codes column a durable index artifact)
    val h1 = graft.ext.SimilarityOps.pqCodes(spark, sf)
      .agg(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.concat_ws(",",
          org.apache.spark.sql.functions.collect_list("code_hash")))).head().getString(0)
    val h2 = graft.ext.SimilarityOps.pqCodes(spark, sf)
      .agg(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.concat_ws(",",
          org.apache.spark.sql.functions.collect_list("code_hash")))).head().getString(0)
    assert(h1 == h2, "PQ codes must be stable across runs")
  }

  test("shuffle shards: bucketed two-phase global rank ≡ naive global order; shards balanced (r7)") {
    val rows = graft.ext.SamplingOps.shuffleShards(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard_id"), r.getAs[Long]("pos_in_shard")))
    // driver-side recompute of the naive form: one global seeded-md5 order
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = {
      val b = md.digest(s"graft-sample-1|shard|$id".getBytes("UTF-8"))
      b.map("%02x".format(_)).mkString
    }
    val expected = rows.map(_._1).sortBy(id => (h(id), id)).zipWithIndex.map {
      case (id, pos) => id -> ((pos.toLong % 16, pos.toLong / 16))
    }.toMap
    rows.foreach { case (id, shard, pos) =>
      assert((shard, pos) == expected(id), s"doc $id: ($shard,$pos) != ${expected(id)}")
    }
    // round-robin striping ⇒ shard sizes differ by at most one
    val sizes = rows.groupBy(_._2).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: min ${sizes.min} max ${sizes.max}")
  }

  test("token-budget selection: bucketed two-phase prefix sum ≡ the global single-reducer order") {
    val rows = graft.ext.SamplingOps.tokenBudgetSample(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Double]("quality"), r.getAs[Long]("cum_before"), r.getAs[Boolean]("keep")))
    // driver-side recompute of the NAIVE form: one global (quality desc,
    // doc_id) order, running token prefix — the two-phase plan must agree
    // exactly on every doc
    val total = rows.map(_._2).sum
    val budget = total * 2 / 5
    var cum = 0L
    val expected = rows.sortBy(r => (-r._3, r._1)).map { r =>
      val before = cum; cum += r._2
      r._1 -> ((before, before < budget))
    }.toMap
    rows.foreach { case (id, _, _, cumBefore, keep) =>
      val (expBefore, expKeep) = expected(id)
      assert(cumBefore == expBefore, s"doc $id: cum_before $cumBefore != $expBefore")
      assert(keep == expKeep, s"doc $id: keep mismatch")
    }
    // boundary: the kept set overshoots the budget by less than one doc,
    // and dropping its worst member would land under it
    val kept = rows.filter(_._5)
    val keptTokens = kept.map(_._2).sum
    assert(kept.length < rows.length, "fixture must actually drop docs")
    assert(keptTokens >= budget, "kept set must reach the budget")
    val lastIn = kept.maxBy(r => (r._4))
    assert(keptTokens - lastIn._2 < budget, "overshoot bounded by the crossing doc")
  }

  test("report_source_overlap: pair counts from constructed shared grams (r7)") {
    import spark.implicits._
    val g = "one two three four five six seven eight"
    // a and b share exactly gram g; c shares nothing; within-source repeats
    // of g (two a-docs) must not inflate the distinct-gram count
    val docs = Seq(
      (1L, "a", g), (2L, "a", g + " nine"), (3L, "b", g),
      (4L, "c", "x1 x2 x3 x4 x5 x6 x7 x8"))
      .toDF("doc_id", "source", "text")
    val out = ext.TextOps.sourceOverlapOf(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5)))
    assert(out.length == 1, s"only (a,b) overlaps: ${out.mkString(",")}")
    val (sa, sb, shared, ov) = out.head
    assert(sa == "a" && sb == "b" && shared == 1L)
    // overlap = shared / min(|grams_a|, |grams_b|): a has 2 distinct grams
    // (g and its shift), b has 1 → 1/1
    assert(ov == 1.0d)
  }

  test("sim_outlier_filter: 2-sigma flag is exact and order-free (r7)") {
    import spark.implicits._
    // nine unit-ish vectors + one doubled: z(outlier) = 3 sigma, z(rest) =
    // 1/3 sigma — the flag must mark exactly the doubled one
    val base = Array.fill(64)(0.1f)
    val big = base.map(_ * 2.0f)
    val em = ((1L to 9L).map(i => (i, base.toSeq)) :+ (10L, big.toSeq))
      .toDF("vec_id", "embedding")
    val out = ext.SimilarityOps.outlierFilterOf(em)
      .select("vec_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(10L), "the doubled-norm vector must flag")
    assert((1L to 9L).forall(!out(_)), "uniform vectors must not flag")
    // degenerate corpus: all norms equal -> variance 0 -> nothing flags
    val same = ext.SimilarityOps.outlierFilterOf(
      (1L to 5L).map(i => (i, base.toSeq)).toDF("vec_id", "embedding"))
      .where(org.apache.spark.sql.functions.col("is_outlier")).count()
    assert(same == 0L, "zero-variance corpus must produce zero outliers")
  }

  test("sim_binary_hamming: packed-word Hamming equals direct sign disagreement (r7)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val signs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(_ > 0f).toArray }.toMap
    val out = ext.SimilarityOps.binaryHamming(spark, sf)
      .select("q_id", "c_id", "ham").as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, c, ham) =>
      val direct = signs(q).zip(signs(c)).count { case (a, b) => a != b }
      assert(ham == direct, s"pair ($q,$c): packed ham $ham != direct $direct")
    }
  }

  test("split_leakage_purge: split labels re-derive from md5 independently (r7)") {
    import spark.implicits._
    def split(docId: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"graft-sample-1|$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hex.substring(0, 2), 16) % 10
      if (bucket < 8) "train" else if (bucket == 8) "val" else "test"
    }
    val rows = ext.DedupOps.splitLeakagePurge(spark, sf)
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (trainDoc, evalDoc, evalSplit) =>
      assert(split(trainDoc) == "train", s"$trainDoc not a train doc")
      assert(split(evalDoc) == evalSplit, s"$evalDoc split mismatch")
      assert(evalSplit == "val" || evalSplit == "test")
    }
  }

  test("report_quality_funnel: stages are monotone and n_dropped is consistent (r7)") {
    import spark.implicits._
    val rows = ext.TextOps.qualityFunnel(spark, sf)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("raw", "lang_en", "gopher_keep", "exact_unique"))
    assert(rows.head._3 == Tables.documents(spark, sf).count(), "stage 1 must count the corpus")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, "funnel must be non-increasing")
      assert(b._4 == a._3 - b._3, "n_dropped must equal the stage loss")
    }
    assert(rows.head._4 == 0L, "raw stage drops nothing")
  }

  test("sample_cluster_balanced: every trained cell contributes min(cap, size) (r7)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cellSizes = ext.SimilarityOps.trainedAssignment(spark, sf)
      .groupBy("cell").count().as[(Long, Long)].collect().toMap
    val sampled = ext.SamplingOps.clusterBalancedSample(spark, sf)
      .groupBy("cell").count().as[(Long, Long)].collect().toMap
    assert(sampled.keySet == cellSizes.keySet, "every non-empty cell must be represented")
    cellSizes.foreach { case (cell, n) =>
      assert(sampled(cell) == math.min(25L, n), s"cell $cell: ${sampled(cell)} of $n")
    }
    // the cap must actually bind somewhere or the op degenerates to identity
    assert(cellSizes.values.exists(_ > 25L), "fixture must have at least one over-cap cell")
  }

  test("sim_random_projection: JL norm preservation holds in aggregate (r7)") {
    import spark.implicits._
    val rows = ext.SimilarityOps.randomProjection(spark, sf)
      .select("distortion").as[Double].collect()
    assert(rows.nonEmpty)
    val mean = rows.sum / rows.length
    // E[||Px/sqrt(k)||^2] = ||x||^2: the corpus-mean distortion must sit
    // near 1 even though per-vector variance at k=16 is wide
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean outside JL expectation")
    assert(rows.forall(d => d > 0.0 && d.isFinite))
  }

  test("bm25: tf grows score, tf SATURATES, length normalizes, non-matches absent (r9)") {
    import spark.implicits._
    def doc(n: Long, sparks: Int, pads: Int) =
      (n, (Seq.fill(sparks)("spark") ++ Seq.fill(pads)("pad")).mkString(" "))
    // all len 20 except e (len 40) — isolates each BM25 property
    val docs = Seq(
      doc(1, 1, 19), doc(2, 2, 18), doc(3, 10, 10), doc(4, 11, 9),
      doc(5, 1, 39), // same tf as doc 1, twice the length
      (6L, "pad pad pad") // no query term at all
    ).toDF("doc_id", "text")
    val out = ext.TextOps.bm25TopkOf(spark, docs)
      .where($"query_id" === 0L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(!out.contains(6L), "doc without any query term must not be scored")
    assert(out(2L) > out(1L), "more occurrences must score higher at equal length")
    assert(out(1L) > out(5L), "equal tf must score higher in the shorter doc")
    // Okapi saturation: the 1->2 gain dwarfs the 10->11 gain
    assert(out(2L) - out(1L) > (out(4L) - out(3L)) * 2,
      s"tf gain must saturate: ${out(2L) - out(1L)} vs ${out(4L) - out(3L)}")
  }

  test("quality training: distributed centroid trainer ≡ local replay; beats majority class (r9)") {
    val feats = ext.TextOps.qualityTrainFeatures(Tables.documents(spark, sf))
      .collect().map(r => (r.getAs[Long]("y"), r.getAs[scala.collection.Seq[Long]]("feats")))
    // independent straight-from-the-definition Rocchio replay
    val pos = feats.filter(_._1 == 1L); val neg = feats.filter(_._1 == -1L)
    val cp = (0 until 16).map(d => pos.map(_._2(d)).sum * 1024L / pos.length)
    val cn = (0 until 16).map(d => neg.map(_._2(d)).sum * 1024L / neg.length)
    val w = (0 until 16).map(d => cp(d) - cn(d))
    val theta = (0 until 16).map(d => cp(d) * cp(d) - cn(d) * cn(d)).sum
    def pred(x: scala.collection.Seq[Long]): Long =
      if (2048L * (0 until 16).map(d => w(d) * x(d)).sum - theta > 0) 1L else -1L
    val nCorrect = feats.count { case (y, x) => pred(x) == y }
    val out = ext.TextOps.qualityTrain(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 16).foreach(d => assert(out(d.toLong) == w(d), s"dim $d"))
    assert(out(16L) == theta, "theta")
    assert(out(17L) == nCorrect.toLong, "n_correct")
    // the trained rule must clearly beat always-predicting the majority label
    val majority = math.max(pos.length, neg.length)
    assert(nCorrect > majority,
      s"accuracy $nCorrect/${feats.length} must beat majority $majority/${feats.length}")
  }

  test("BPE training: hand-computed merges, second-order merge, early stop when exhausted (r9)") {
    import spark.implicits._
    // corpus 'aaab'×3 + 'ab'×1:
    //   iter1 pairs (a,a)=6 (a,b)=4        → merge (a,a)
    //   iter2 '|aa|a|b|' gives (a,b)=4 (aa,a)=3 → merge (a,b)
    //   iter3 '|aa|ab|' gives (aa,ab)=3        → SECOND-ORDER merge
    //   iter4 'aaab' fully merged, 'ab' a single symbol → no pairs → stop
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val out = ext.TextOps.bpeTrainOf(spark, docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, "a", "a", 6L), (2L, "a", "b", 4L), (3L, "aa", "ab", 3L)),
      s"got $out")
  }

  test("BPE apply: per-doc subword counts sit between word count and char count; merges bite (r9)") {
    import org.apache.spark.sql.functions.{col, expr}
    val out = ext.TextOps.bpeApply(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val chars = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(
        "aggregate(filter(split(lower(text), ' '), t -> t != ''), 0L, (a, t) -> a + length(t))").as("tc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (doc, (bpe, ws)) =>
      assert(bpe >= ws, s"doc $doc: a word is at least one subword ($bpe < $ws)")
      assert(bpe <= chars(doc), s"doc $doc: a subword is at least one char ($bpe > ${chars(doc)})")
    }
    // six learned merges must actually compress: strictly fewer subwords
    // than characters corpus-wide
    assert(out.values.map(_._1).sum < chars.values.sum)
  }

  test("topk_by_desc aggregate: equals window top-k, invariant to partitioning (r9)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{struct, posexplode, row_number}
    // deliberate key collisions (v mod 1000 over 5000 rows) exercise the
    // (key, tie) total order that makes update/merge order irrelevant
    val df = (1 to 5000).map(i =>
      (i % 13L, ((i * 2654435761L) % 1000L).toDouble, i.toLong)).toDF("g", "v", "id")
    def viaAgg(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(graft.functions.Vec.topkBy($"v", $"id", struct($"id", $"v"), 5).as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "s")))
      .select($"g", ($"i" + 1).cast("long").as("rk"), $"s.id".as("id"), $"s.v".as("v"))
      .collect().toSet
    val w = Window.partitionBy("g").orderBy($"v".desc, $"id")
    val viaWindow = df.withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 5).select("g", "rk", "id", "v").collect().toSet
    val shuffled = viaAgg(df.repartition(17, $"id"))
    assert(shuffled == viaWindow, "aggregate top-k must equal the window form")
    assert(shuffled == viaAgg(df.coalesce(1)), "result must not depend on partitioning")
  }

  test("topk_by_desc: a NULL payload struct is excluded, not ranked (r10 advice)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{struct, when, posexplode}
    // the outer-join shape: a row can carry a valid sort key while its
    // payload struct is null (all-null struct children do NOT make the
    // struct itself null — only the outer join's null side does). Pinned
    // semantics: such rows are SKIPPED, like null keys — the declared
    // element type is non-nullable (containsNull=false), so ranking a null
    // payload would emit a row the type contract forbids.
    val left = Seq((1L, 100.0), (2L, 50.0), (3L, 25.0)).toDF("id", "v")
    val right = Seq((1L, "a"), (3L, "c")).toDF("rid", "tag") // id 2 unmatched
    val joined = left.join(right, $"id" === $"rid", "left")
      .select($"id", $"v", when($"rid".isNotNull, struct($"rid", $"tag")).as("p"))
    val top = joined.groupBy()
      .agg(graft.functions.Vec.topkBy($"v", $"id", $"p", 2).as("top"))
      .select(posexplode($"top").as(Seq("i", "s")))
      .select($"s.rid".as("rid")).as[Long].collect().toSeq
    // id 2 (v=50, null payload) is skipped entirely: top-2 = ids 1 and 3
    assert(top == Seq(1L, 3L), s"null-payload row must not occupy a top-k slot: $top")
  }

  test("hybrid RRF: fused score re-derives from the two leg ranks exactly (r9)") {
    val out = ext.TextOps.hybridRrf(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      val lex = Option(row.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val den = Option(row.getAs[java.lang.Long]("dense_rank")).map(_.toLong)
      assert(lex.isDefined || den.isDefined, "a fused doc must come from at least one leg")
      val expect = lex.map(r => 1.0 / (60L + r).toDouble).getOrElse(0.0) +
        den.map(r => 1.0 / (60L + r).toDouble).getOrElse(0.0)
      assert(row.getAs[Double]("rrf") == expect, s"rrf must re-derive from ranks: $row")
    }
    // within each query the fused list is sorted by rrf desc (doc_id ties)
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getAs[Double]("rrf") >= b.getAs[Double]("rrf")
        case _ => true
      })
    }
  }

  test("sample_priority: exact k, single shared threshold, weight floor, w>tau certainty (r9)") {
    val out = ext.SamplingOps.prioritySample(spark, sf).collect()
    assert(out.length == 100)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to 100L))
    // estimator floor: est_w = max(w, tau) — never below the true weight
    assert(out.forall(r => r.getAs[Double]("est_w") >= r.getAs[Long]("n_chars").toDouble))
    // every est_w that isn't the doc's own weight must be the ONE shared tau
    val taus = out.filter(r => r.getAs[Double]("est_w") != r.getAs[Long]("n_chars").toDouble)
      .map(_.getAs[Double]("est_w")).distinct
    assert(taus.length <= 1, s"expected one shared threshold, got ${taus.toSeq}")
    // priority sampling's certainty property: any doc heavier than tau has
    // priority w/u >= w > tau and MUST be in the sample
    taus.headOption.foreach { tau =>
      val sampled = out.map(_.getAs[Long]("doc_id")).toSet
      import spark.implicits._
      val heavy = Tables.documents(spark, sf)
        .where($"n_chars".cast("double") > tau)
        .select("doc_id").collect().map(_.getLong(0))
      assert(heavy.forall(sampled), "every doc with w > tau must be sampled")
    }
  }

  test("fuzzy-title join: blocking survives a FIRST-segment edit; threshold excludes dist 4 (r9.2)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = "the quick brown fox jumps over the lazy dog in fog" // ≥48 chars
    def sub(s: String, at: Int, c: Char) = s.updated(at, c)
    val docs = Seq(
      (1L, base),
      (2L, sub(sub(base, 15, 'x'), 27, 'y')),          // 2 subs in segs 2,3 → cand, dist 2
      (3L, sub(sub(sub(base, 5, 'q'), 15, 'x'), 27, 'y')), // 3 subs in segs 1,2,3; seg4 free → cand, dist 3
      (4L, sub(sub(sub(sub(base, 13, 'a'), 15, 'b'), 17, 'c'), 19, 'd')), // 4 subs in ONE segment → cand, dist 4 → dropped by threshold
      (5L, sub(base, 0, 'x'))                           // position-0 edit: seg1 differs, segs 2-4 carry → cand, dist 1
    ).toDF("doc_id", "text")
    val out = ext.DedupOps.fuzzyTitleOf(docs, 12)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.get((1L, 2L)).contains(2L))
    assert(out.get((1L, 3L)).contains(3L))
    assert(out.get((1L, 5L)).contains(1L), "a first-character edit must not defeat the blocking")
    assert(!out.contains((1L, 4L)), "dist 4 must fail the threshold even as a candidate")
    assert(out.keys.forall { case (a, b) => a < b })
    assert(out.values.forall(_ <= 3L))
  }

  test("pmi: always-adjacent pair ranks with the exact lift; co-frequent non-adjacent pair absent (r9.2)") {
    import spark.implicits._
    val docs = (
      (1 to 10).map(i => (i.toLong, "zig zag pad")) ++
      (11 to 20).map(i => (i.toLong, "red mid blue"))
    ).toDF("doc_id", "text")
    // NU=60, NB=40; c(zig)=c(zag)=10, c_xy=10 → lift = 10·60·60/(10·10·40) = 9.0 exact
    val byPair = ext.TextOps.pmiPairsOf(docs).select("x", "y", "c_xy", "lift").collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(byPair.get(("zig", "zag")).contains((10L, 9.0)))
    assert(!byPair.contains(("red", "blue")),
      "co-frequent but never-adjacent words are not a collocation")
  }

  test("range join: purchases attribute only into the CONTAINING click session; end exclusive (r9.2)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, 1L, "click", "2024-01-01 00:00:00"),
      (2L, 1L, "click", "2024-01-01 00:10:00"),
      (3L, 1L, "purchase", "2024-01-01 00:20:00"), // inside [00:00, 00:40)
      (4L, 1L, "purchase", "2024-01-01 00:40:00"), // AT the exclusive end → out
      (5L, 1L, "purchase", "2024-01-01 02:00:00"), // far outside → out
      (6L, 2L, "purchase", "2024-01-01 00:20:00")  // right time, session-less user → out
    ).toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = ext.Relational.joinRangeBucketedOf(rows).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getAs[Long]("event_id") == 3L)
    assert(r.getAs[Long]("n_clicks") == 2L)
    assert(r.getAs[Long]("s_end") - r.getAs[Long]("s_start") == 2400L) // 10 min span + 30 min gap
  }

  test("MIPS: augmented-cosine order ≡ dot order; raw cosine DISAGREES when norms vary (r9.2)") {
    // the Neyshabur–Srebro reduction sim_mips_topk documents, pinned on
    // vectors with varying norms (the gate fixture is unit-norm, where
    // MIPS and cosine coincide — this spec is where the distinction lives)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    val q = Array(1.0, 0.2)
    val cands = Map("c1" -> Array(0.9, 0.1), "c2" -> Array(3.0, -1.0), "c3" -> Array(0.5, 0.5))
    val m = cands.values.map(norm).max
    def aug(c: Array[Double]) = c :+ math.sqrt(m * m - dot(c, c))
    val qa = q :+ 0.0
    val byDot = cands.toSeq.sortBy { case (id, c) => (-dot(q, c), id) }.map(_._1)
    val byAugCos = cands.toSeq.sortBy { case (id, c) =>
      (-dot(qa, aug(c)) / (norm(qa) * norm(aug(c))), id) }.map(_._1)
    val byRawCos = cands.toSeq.sortBy { case (id, c) =>
      (-dot(q, c) / (norm(q) * norm(c)), id) }.map(_._1)
    assert(byAugCos == byDot, s"augmentation must preserve MIPS order: $byAugCos vs $byDot")
    assert(byRawCos != byDot, "raw cosine must rank differently when magnitudes differ")
    cands.values.foreach(c => assert(math.abs(norm(aug(c)) - m) < 1e-12)) // all augmented norms = M
  }

  test("bpe fertility: bounded by [1, mean word length]; totals cross-check bpe apply (r9.2)") {
    val out = ext.TextOps.bpeFertility(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val f = r.getAs[Double]("fertility")
      val meanLen = r.getAs[Long]("n_word_chars").toDouble / r.getAs[Long]("ws_tokens")
      assert(f >= 1.0 && f <= meanLen, s"fertility $f outside [1, $meanLen]")
    }
    // the per-source rollup and the per-doc op segment identically
    import org.apache.spark.sql.functions._
    val bySource = out.map(_.getAs[Long]("bpe_tokens")).sum
    val byDoc = ext.TextOps.bpeApply(spark, sf)
      .agg(sum("bpe_trained_tokens")).head().getLong(0)
    assert(bySource == byDoc, s"$bySource != $byDoc")
  }

  test("pagerank: Q12 mass conserved within floor loss; teleport floor; ranks differentiate (r9)") {
    import org.apache.spark.sql.functions._
    val pr = ext.SimilarityOps.pagerank(spark, sf)
    val scale = 1000000000000L // Q12: 1.0 == 10^12 (PrScale)
    val rows = pr.agg(count(lit(1)), sum("pr_q12"), min("pr_q12")).head
    val (n, total, minPr) = (rows.getLong(0), rows.getLong(1), rows.getLong(2))
    // exact arithmetic conserves mass; the only leak is floor division —
    // bounded per iteration by E (pr div od) + n (dang div n) + n (div 20)
    // + n (base), E <= KnnK*n = 3n, so 3 iterations lose < 18n units
    assert(total <= scale, s"mass above 1.0: $total")
    assert(total >= scale - 18L * n, s"floor loss exceeds bound: ${scale - total} > ${18L * n}")
    // damped walk's teleport floor: every node holds at least (1-d)/N
    assert(minPr >= (3L * scale) / (20L * n), s"below teleport floor: $minPr")
    // the kNN graph structure must actually differentiate authority
    assert(pr.select("pr_q12").distinct().count() > 1)
  }

  test("kn lm: hand-computed rationals; KN identity; scoring ladder hits all three branches (r9.4)") {
    import spark.implicits._
    // en TRAIN corpus, hand stats:  doc1 "a b a b" → (a,b),(b,a),(a,b);
    // doc2 "a c" → (a,c).  c_xy: (a,b)=2 (b,a)=1 (a,c)=1;  c(a·)=3 N1p(a·)=2,
    // c(b·)=1 N1p(b·)=1;  N1p(·a)=N1p(·b)=N1p(·c)=1;  N1p(··)=3.
    //   P(b|a) = (2−¾)/3 + ¾·(2/3)·(1/3) = 7/12  → num 21, den 36
    //   P(c|a) = (¼)/3  + ¾·(2/3)·(1/3) = 1/4   → num  9, den 36
    //   P(a|b) = (¼)/1  + ¾·(1/1)·(1/3) = 1/2   → num  6, den 12
    // KN identity for context a: seen 7/12 + 1/4 + unseen-y (y=a, interp
    // only) ¾·(2/3)·(1/3) = 1/6  →  7/12 + 3/12 + 2/12 = 1 exactly.
    val docs = Seq(
      (1L, "a b a b", "en"),
      (2L, "a c", "en"),
      (3L, "a b", "de"),  // seen-bigram branch
      (4L, "b c", "de"),  // bigram unseen, context seen → interpolation only
      (5L, "c a", "de"),  // context unseen → continuation only
      (6L, "c zz", "de")  // context unseen AND OOV continuation → the max(·,1) floor
    ).toDF("doc_id", "text", "lang")
    val lm = ext.TextOps.knLmTrainOf(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(r.fieldIndex("p_num")), r.getLong(r.fieldIndex("p_den"))))).toMap
    assert(lm == Map(("a", "b") -> (21L, 36L), ("a", "c") -> (9L, 36L),
      ("b", "a") -> (6L, 12L)), s"trained table mismatch: $lm")

    val Q = 1048576L
    val sc = ext.TextOps.knScoreOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def q(num: Long, den: Long) = num * Q / den // floor — exactly the op's fixed point
    // doc3: one seen bigram (a,b) → floor(21Q/36)
    assert(sc(3L) == ((1L, 0L, q(21, 36).toDouble / Q)))
    // doc4: (b,c) unseen, context b seen: ¾·(1/1)·(1/3) = 1/4 → Q/4 exact
    assert(sc(4L) == ((1L, 1L, 0.25)))
    // doc5: context c unseen → P_cont(a) = 1/3 → floor(Q/3)
    assert(sc(5L) == ((1L, 1L, q(1, 3).toDouble / Q)))
    // doc6: OOV continuation floors N1p(·zz) at 1 → same 1/3
    assert(sc(6L) == ((1L, 1L, q(1, 3).toDouble / Q)))
    // doc1 self-scores its three training bigrams; doc2 its one
    assert(sc(1L)._1 == 3L && sc(1L)._2 == 0L && sc(2L)._2 == 0L)

    // tertiles over the 6 means (desc, doc_id tiebreak):
    // doc3 .583 > doc1 .556 > doc5 = doc6 (1/3) > doc2 = doc4 (1/4)
    val b = ext.TextOps.knBucketsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("bucket"))).toMap
    assert(b == Map(3L -> "head", 1L -> "head", 5L -> "middle", 6L -> "middle",
      2L -> "tail", 4L -> "tail"), s"bucket mismatch: $b")

    // CCNet mix over the same fixture: tail (docs 2, 4) dropped; survivor
    // tokens 2+4+2+2 = 10 → budget = 10·2/5 = 4; admission in quality
    // order doc3 (cum 0, keep) → doc1 (cum 2, keep) → doc5 (cum 6, drop)
    // → doc6 (cum 8, drop).
    val mix = ext.SamplingOps.ccnetMixOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getString(r.fieldIndex("bucket")), r.getLong(r.fieldIndex("n_tok")),
          r.getLong(r.fieldIndex("cum_before")), r.getBoolean(r.fieldIndex("keep")))).toMap
    assert(mix == Map(
      1L -> (("head", 4L, 2L, true)),
      3L -> (("head", 2L, 0L, true)),
      5L -> (("middle", 2L, 6L, false)),
      6L -> (("middle", 2L, 8L, false))), s"mix mismatch: $mix")
  }

  test("lpa: two triangles over a bridge resolve to TWO communities (where CC would merge) (r9.4)") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, one bridge 3-4; symmetric edge list.
    // Hand-run of 3 synchronous votes (ties -> smallest label):
    //   iter1: 1->2 2->1 3->1 4->3 5->4 6->4
    //   iter2: 1->1 2->1 3->1 4->4 5->3 6->3
    //   iter3: 1->1 2->1 3->1 4->3 5->3 6->3
    // — the bridge does NOT merge the triangles (pointer-jumping CC gives
    // one component on this graph; LPA's majority vote keeps two).
    val half = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val edges = (half ++ half.map(_.swap)).toDF("src", "nbr")
    val nodes = (1L to 6L).toDF("vec_id")
    val got = ext.SimilarityOps.lpaOnEdges(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L),
      s"communities mismatch: $got")
  }

  test("derived sign-hash width is memoized — one embeddings count() serves every consumer (r15, r14 advice)") {
    // lpaCommunities / pagerank / knnGraph / embeddingCosine each derive
    // the width within one driver run; before r15 each call re-paid a
    // full count() of the embeddings table. The derivation now caches per
    // (session, canonical store, target): a repeat call must run ZERO
    // Spark jobs. The listener bus is async, so instead of flushing we
    // run a sentinel job AFTER the memo hit — events deliver in order, so
    // when the sentinel's start arrives, any job the memo hit ran would
    // already be counted.
    val t = math.max(1L, Tables.embeddings(spark, sf).count() / 64)
    val first = ext.SimilarityOps.embBitsFor(spark, sf, Some(t)) // prime
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      assert(ext.SimilarityOps.embBitsFor(spark, sf, Some(t)) == first)
      // RDD count: exactly ONE job, no AQE sub-jobs (a Dataset count runs
      // two under AQE — the shuffle map stage submits separately)
      spark.sparkContext.range(0L, 10L).count()
      val deadline = System.nanoTime() + 10000000000L
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(jobs.get() == 1,
        s"the memoized width derivation re-ran ${jobs.get() - 1} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("sign-hash width DERIVES from the store at a population target (r14)") {
    // the b ∝ log N occupancy contract, executable: the fixture default is
    // b=4 (the oracle gate sets no env), and a per-bucket population
    // target derives the minimal width whose bucket count covers N/target —
    // the knob that kept the 100× kNN candidate join from exhausting the
    // heap in the r14.8 decade audit (fixture b=4 there: 12.5k per bucket).
    import org.apache.spark.sql.functions._
    assert(ext.SimilarityOps.embBitsFor(spark, sf, None) == 4)
    val n = Tables.embeddings(spark, sf).count()
    // a target that wants more than 2^4 buckets must widen past the floor…
    val t = math.max(1L, n / 64)
    val b = ext.SimilarityOps.embBitsFor(spark, sf, Some(t))
    val buckets = math.max(1L, n / t)
    assert((1L << b) >= buckets, s"derived width $b cannot hold $buckets buckets")
    assert(b == 4 || (1L << (b - 1)) < buckets, s"derived width $b is not minimal for $buckets")
    // …and a huge target keeps the floor
    assert(ext.SimilarityOps.embBitsFor(spark, sf, Some(n * 2)) == 4)
    // the derived width drives the REAL graph build: a valid ranked kNN
    val g = ext.SimilarityOps.knnGraphAt(spark, sf, b).cache()
    try {
      assert(g.count() > 0, "derived-width kNN graph is empty")
      assert(g.groupBy("src", "rank").count().where(col("count") > 1).isEmpty,
        "(src, rank) must be unique in the ranked graph")
    } finally { g.unpersist(); () }
  }
}
