package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Structured-Streaming parity (SURVEY §3.3): the same pipelines as batch,
  * via the file source + memory sink, driven synchronously. */
class StreamingSpec extends SparkSpec {

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  test("streaming windowed counts equal the batch aggregation") {
    val streamed = runToMemory(
      Streams.windowedCounts(Streams.eventStream(spark, sf)), "wc", mode = "complete")
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("sum_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.select("day", "event_type", "n").except(
      batch.select("day", "event_type", "n")).count() == 0)
  }

  test("streaming session windows FUSE across micro-batches (r6)") {
    // the property complete-mode session parity relies on: a later batch's
    // row landing BETWEEN two existing sessions must merge them into one
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val sess = in.toDF().toDF("ts", "user_id", "value")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n_events"))
    val q = sess.writeStream.outputMode("complete").format("memory")
      .queryName("sess_fuse").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
      in.addData((ts(0), 1L, 1.0), (ts(50), 1L, 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_fuse").count() == 2, "50-min-apart events must open two sessions")
      in.addData((ts(25), 1L, 1.0))
      q.processAllAvailable()
      val fused = spark.table("sess_fuse").collect()
      assert(fused.length == 1 && fused.head.getAs[Long]("n_events") == 3L,
        s"bridging row failed to fuse the sessions: ${fused.toSeq}")
      assert(fused.head.getAs[java.sql.Timestamp]("s") == ts(0) &&
        fused.head.getAs[java.sql.Timestamp]("e") == ts(80))
    } finally q.stop()
  }

  test("streaming HOPPING windows equal the batch aggregation (r6)") {
    // the same 1-day/6-hour groupBy as Relational.timeWindowHopping, run
    // through the streaming engine: each event must land in its 4
    // overlapping windows under readStream exactly as in batch
    def hop(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n"))
    val streamed = runToMemory(hop(Streams.eventStream(spark, sf)), "hopwin", mode = "complete")
    val batch = hop(Tables.events(spark, sf))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
  }

  test("directory-layout store: NEW part files stream in as later micro-batches (r6)") {
    // tableStream's directory branch (any real producer's layout, incl.
    // GenScale): the claim "new matching files stream in" must hold — an
    // appended part file after the first drain arrives as a NEW micro-batch
    import java.nio.file.{Files, Paths}
    val store = Files.createTempDirectory("dirstore").toString
    val tableDir = s"$store/events.parquet" // DIRECTORY named like the table
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Tables.events already converted ts to TIMESTAMP; write raw long nanos
    // back so the stream's declared schema (ts LongType) matches a real
    // producer's layout
    def dump(where: String, half: Int): Unit =
      Tables.events(spark, sf)
        .withColumn("ts", expr("unix_micros(ts) * 1000")) // µs → ns
        .where(if (half == 0) col("event_id") % 2 === 0 else col("event_id") % 2 === 1)
        .coalesce(1).write.mode("append").parquet(where)
    dump(tableDir, 0)
    val q = Streams.eventStream(spark, store)
      .writeStream.outputMode("append").format("memory").queryName("dirstore_t").start()
    try {
      q.processAllAvailable()
      val firstCount = spark.table("dirstore_t").count()
      assert(firstCount > 0, "first drain empty — directory branch not reading")
      dump(tableDir, 1) // a NEW part file lands in the live directory
      q.processAllAvailable()
      val total = spark.table("dirstore_t").count()
      assert(total > firstCount, "appended part file did not stream in")
      assert(total == Tables.events(spark, sf).count(),
        s"streamed $total, want the full table")
    } finally q.stop()
  }

  test("UTC-adjusted timestamp store layout streams AND matches batch (r7 advice)") {
    // A user who rewrites/repartitions the store with plain spark.write gets
    // ts as a UTC-adjusted timestamp (isAdjustedToUTC=true). Tables.events
    // reads that layout fine; the stream source must too — previously it
    // declared NTZ for every non-long ts and the parquet reader rejected the
    // file at runtime. The stream schema now copies the probed dataType.
    import java.nio.file.Files
    val store = Files.createTempDirectory("utcstore").toString
    Tables.events(spark, sf) // ts is TimestampType — spark.write default layout
      .coalesce(1).write.parquet(s"$store/events.parquet")
    val batch = Tables.events(spark, store)
    assert(batch.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val streamed = runToMemory(
      Streams.eventStream(spark, store).select("event_id", "ts"), "utc_t")
    assert(streamed.count() == batch.count(), "stream/batch row divergence")
    // instants must agree exactly, not just counts
    val bSum = batch.agg(sum(expr("unix_micros(ts)"))).head().getLong(0)
    val sSum = streamed.agg(sum(expr("unix_micros(ts)"))).head().getLong(0)
    assert(bSum == sSum, "stream/batch instant divergence on UTC-adjusted layout")
  }

  test("corrupt ts layout fails loud, not garbage (r7 advice)") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("badstore").toString
    Tables.events(spark, sf)
      .withColumn("ts", col("ts").cast("string")) // third, unsupported layout
      .coalesce(1).write.parquet(s"$store/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, store) }
    assert(e.getMessage.contains("StringType"),
      s"error should name the offending type, got: ${e.getMessage}")
  }

  test("curation pipeline: admission invariants hold end-to-end (r7)") {
    // the two-hop stream (gopher filter → min-doc dedup → budget admit):
    // cum_before must chain exactly (cum[i+1] = cum[i] + n_tok[i] in doc_id
    // order), keep must be a PREFIX of the admission order, and every
    // surviving simhash must appear exactly once
    val rows = Streams.curationStream(spark, sf)
      .select("doc_id", "simhash", "n_tok", "cum_before", "keep").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.sortBy(_.getLong(0))
    byDoc.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(3) == a.getLong(3) + a.getLong(2),
          s"cum_before chain broken at doc ${b.getLong(0)}")
      case _ => ()
    }
    val keeps = byDoc.map(_.getBoolean(4))
    assert(!keeps.dropWhile(identity).contains(true), "keep is not a prefix")
    val hashes = rows.map(_.getLong(1))
    assert(hashes.distinct.length == hashes.length, "dedup emitted a simhash twice")
  }

  test("ccnet mix: MULTI-batch streaming admission ≡ batch op (r10 verdict 1)") {
    // the admission artifact is written as AdmitShards range-sorted files
    // and read back one file per micro-batch, so this run chains the
    // carried offset across several genuine batches; the result must equal
    // the batch op's GLOBAL (mean_p DESC, doc_id) admission exactly —
    // cum_before values included, not just keep flags
    val cols = Seq("doc_id", "bucket", "n_tok", "cum_before", "keep")
    val streamed = Streams.ccnetMixStream(spark, sf)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSeq
    val batch = graft.ext.SamplingOps.ccnetMix(spark, sf)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch, "multi-batch streaming admission diverged from the batch mix")
  }

  // ---- cluster-portability of the admission seam (r11 verdict 2/8):
  // the order contract is the __shard manifest column, NOT file mtimes,
  // and offsets are pure functions — so scrambled mtimes, any arrival
  // order, and mid-run crashes all converge to the same output ----

  /** Sequential reference admission over (v asc, doc_id) — the ground
    * truth the distributed seam must reproduce exactly. */
  private def sequentialAdmit(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Boolean)] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, tok) =>
      val r = (id, cum, cum < budget); cum += tok; r
    }
  }

  test("admission order contract survives a filesystem that scrambles mtimes (r11 verdict 2)") {
    import spark.implicits._
    val hop = java.nio.file.Files.createTempDirectory("admit_mtime").toString
    Streams.deleteOnShutdown(hop)
    val data = (1L to 400L).map(i => (i, 1L + (i * 7) % 23)).toDF("doc_id", "n_tok")
    Streams.writeRangeSortedShards(data, s"$hop/src", 4, col("doc_id"))
    // simulate a store with NO mtime order (HDFS/S3 granularity, rewrites,
    // copies): stamp mtimes in REVERSE shard order — under the retired
    // mtime contract the file source would replay newest-range-first and
    // every offset would be wrong
    val files = new java.io.File(s"$hop/src").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    files.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L - i * 60000L))
    }
    val budget = 2000L
    val got = Streams.admitByBudget(spark, s"$hop/src", identity,
      orderCol = "doc_id", descending = false, budget = budget,
      outCols = Seq("doc_id", "n_tok", "cum_before", "keep"), hop = hop)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).sortBy(_._1).toSeq
    val want = sequentialAdmit((1L to 400L).map(i => (i, 1L + (i * 7) % 23)), budget)
    assert(got == want, "scrambled mtimes changed the admission result")
    Streams.deleteDir(hop)
  }

  test("admission is shard-count-FREE: 1, 4, and 9 shards admit the identical set (r13)") {
    // the scaladoc's claim behind admitShardsFor (shards are pure LAYOUT —
    // the count may derive from artifact size without touching semantics),
    // pinned: the same artifact re-landed at three different shard counts,
    // including a count above the gate floor and the degenerate single
    // shard, admits byte-identical rows ≡ the sequential reference.
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i, 1L + (i * 11) % 29))
    val budget = 2200L
    val want = sequentialAdmit(rows, budget)
    Seq(1, 4, 9).foreach { n =>
      val hop = java.nio.file.Files.createTempDirectory(s"admit_n$n").toString
      Streams.deleteOnShutdown(hop)
      Streams.writeRangeSortedShards(rows.toDF("doc_id", "n_tok"), s"$hop/src", n, col("doc_id"))
      val got = Streams.admitByBudget(spark, s"$hop/src", identity,
        orderCol = "doc_id", descending = false, budget = budget,
        outCols = Seq("doc_id", "n_tok", "cum_before", "keep"), hop = hop)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).sortBy(_._1).toSeq
      assert(got == want, s"$n-shard admission diverged from the sequential reference")
      Streams.deleteDir(hop)
    }
  }

  test("DERIVED multi-shard count (no override, above the floor) drives a real admission gate (r13 verdict 5)") {
    // admitShardsFor's formula had only ever produced the floor (4) in an
    // executed gate — the 1/4/9 pin above uses explicit counts. Here the
    // DERIVATION itself (shrunk targetBytes, no env override) yields >4
    // shards, the artifact is landed at that derived count, and the
    // admission output still matches the sequential reference exactly.
    import spark.implicits._
    assert(!sys.env.contains("SPARK_GRAFT_ADMIT_SHARDS"),
      "this spec must exercise the derived path, not the env override")
    val hop = java.nio.file.Files.createTempDirectory("admit_derived").toString
    Streams.deleteOnShutdown(hop)
    val rows = (1L to 400L).map(i => (i, 1L + (i * 13) % 31))
    rows.toDF("doc_id", "n_tok").coalesce(1).write.mode("overwrite").parquet(s"$hop/art")
    val p = new org.apache.hadoop.fs.Path(s"$hop/art")
    val bytes = p.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(p).getLength
    val target = math.max(1L, bytes / 7)
    val n = Streams.admitShardsFor(spark, s"$hop/art", target)
    assert(n > 4, s"derived count must clear the floor to prove anything: $n")
    Streams.writeRangeSortedShards(
      rows.toDF("doc_id", "n_tok"), s"$hop/src", n, col("doc_id"))
    val budget = 2600L
    val got = Streams.admitByBudget(spark, s"$hop/src", identity,
      orderCol = "doc_id", descending = false, budget = budget,
      outCols = Seq("doc_id", "n_tok", "cum_before", "keep"), hop = hop)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).sortBy(_._1).toSeq
    assert(got == sequentialAdmit(rows, budget),
      s"derived $n-shard admission diverged from the sequential reference")
    Streams.deleteDir(hop)
  }

  test("admission resumes after a mid-run crash — restart ≡ single uninterrupted run (r11 verdict 8)") {
    import spark.implicits._
    val data = (1L to 400L).map(i => (i, 1L + (i * 13) % 31))
    val budget = 2500L
    def run(hop: String, crashAfter: Int): Option[Seq[(Long, Long, Boolean)]] =
      try Some(Streams.admitByBudget(spark, s"$hop/src", identity,
        orderCol = "doc_id", descending = false, budget = budget,
        outCols = Seq("doc_id", "n_tok", "cum_before", "keep"), hop = hop,
        crashAfterBatches = crashAfter)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).sortBy(_._1).toSeq)
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => None }
    val hop = java.nio.file.Files.createTempDirectory("admit_crash").toString
    Streams.deleteOnShutdown(hop)
    Streams.writeRangeSortedShards(data.toDF("doc_id", "n_tok"), s"$hop/src", 4, col("doc_id"))
    // run 1 crashes after 2 of 4 batches (the 2nd batch's output IS
    // written, then the engine dies before committing — a replay case)
    assert(run(hop, crashAfter = 2).isEmpty, "the injected crash did not surface")
    // run 2: same hop + checkpoint — resumes, replays the uncommitted
    // batch idempotently (shard-keyed overwrite), finishes the rest; the
    // offsets re-derive from the manifest with no carried state to lose
    val resumed = run(hop, crashAfter = Int.MaxValue)
      .getOrElse(fail("restart did not complete"))
    assert(resumed == sequentialAdmit(data, budget),
      "crash+resume diverged from the uninterrupted admission")
    Streams.deleteDir(hop)
  }

  test("admission of an artifact whose staged set is EMPTY returns a typed empty frame (r11 advice)") {
    import spark.implicits._
    val hop = java.nio.file.Files.createTempDirectory("admit_empty").toString
    Streams.deleteOnShutdown(hop)
    val data = (1L to 40L).map(i => (i, 5L)).toDF("doc_id", "n_tok")
    Streams.writeRangeSortedShards(data, s"$hop/src", 2, col("doc_id"))
    val got = Streams.admitByBudget(spark, s"$hop/src",
      st => st.where(col("doc_id") < 0), // stages every row out
      orderCol = "doc_id", descending = false, budget = 100L,
      outCols = Seq("doc_id", "n_tok", "cum_before", "keep"), hop = hop)
    assert(got.columns.toSeq == Seq("doc_id", "n_tok", "cum_before", "keep"))
    assert(got.count() == 0)
    Streams.deleteDir(hop)
  }

  test("streaming filter pushes the signature predicate per micro-batch") {
    val streamed = runToMemory(
      Streams.eventStream(spark, sf, Some("purchase"))
        .select("event_id", "event_type"), "filtered")
    assert(streamed.count() ==
      Tables.events(spark, sf).where(col("event_type") === "purchase").count())
    assert(streamed.where(col("event_type") =!= "purchase").count() == 0)
  }

  test("streaming session windows produce per-user sessions") {
    val streamed = runToMemory(
      Streams.sessionized(Streams.eventStream(spark, sf)), "sess", mode = "complete")
    assert(streamed.count() > 0)
    // session count bounded by event count
    assert(streamed.agg(sum("n_events")).head().getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("streaming dedup keeps at most one row per (user, type)") {
    val streamed = runToMemory(Streams.dedupStream(Streams.eventStream(spark, sf)), "dd")
    val dupes = streamed.groupBy("user_id", "event_type").count().where(col("count") > 1)
    assert(dupes.count() == 0)
  }

  test("stateful streaming as-of enrichment matches the batch window form (S7)") {
    val streamed = runToMemory(
      Streams.asOfEnrichStream(Streams.eventStream(spark, sf)), "asof")
      .select("blocknumber", "user_id", "value", "last_click")
    val batch = graft.queries.ApolloQueries.eventAsOfEnrich(spark, sf)
      .select("blocknumber", "user_id", "value", "last_click")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("stream-stream windowed join matches the batch interval join") {
    val streamed = runToMemory(
      Streams.streamStreamJoin(
        Streams.eventStream(spark, sf, Some("purchase")),
        Streams.eventStream(spark, sf, Some("click"))), "ssj")
    val ev = Tables.events(spark, sf)
    val bp = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_block"), col("ts").as("p_ts"))
    val bc = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_block"), col("ts").as("c_ts"))
    val batch = bp.join(bc,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("interval 3600 seconds") &&
        col("c_ts") <= col("p_ts"))
    assert(streamed.count() == batch.count())
    assert(streamed.count() > 0)
    assert(streamed.select("user_id", "p_block", "c_block")
      .except(batch.select("user_id", "p_block", "c_block")).count() == 0)
  }

  test("asOfEnrichStream fails loud when one key exceeds the per-batch buffer cap") {
    val df = Streams.asOfEnrichStream(Streams.eventStream(spark, sf), maxBufferedPerKey = 5)
    val q = df.writeStream.outputMode("append").format("memory").queryName("asof_cap").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable()
      finally q.stop()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + chain(t.getCause)
    assert(chain(e).contains("exceeded 5 buffered rows"), chain(e))
  }

  test("streaming near-dup dedup emits exactly the batch-distinct fingerprints") {
    val streamed = Streams.nearDupDedupStream(spark, sf)
    val batch = graft.ext.DedupOps.simhash(spark, sf).select("simhash").distinct()
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.except(batch).count() == 0)
    // and it actually deduplicates: fewer fingerprints than documents
    assert(streamed.count() < Tables.documents(spark, sf).count())
  }

  test("stateful as-of enrichment carries state across REAL micro-batches") {
    import java.nio.file.{Files, Paths}
    // split the events table into 3 TIME-ORDERED files and stream them one
    // file per trigger — 3 micro-batches, so clicks in batch 1 must enrich
    // purchases arriving in batches 2-3 purely via GroupState carry-forward
    val dir = Files.createTempDirectory("asof_mb").toString
    // split the NORMALIZED frame (ts TimestampType instants) so the fixture
    // is independent of which physical ts layout the store shipped with
    val raw = Tables.events(spark, sf)
    val maxId = raw.agg(max("event_id")).head().getLong(0)
    val cuts = Seq(0L, maxId / 3, 2 * maxId / 3, maxId + 1)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val tmp = s"$dir/stage$i"
      raw.where(col("event_id") >= lo && col("event_id") < hi)
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(s"$dir/f$i.parquet")
      Files.move(part.toPath, dst)
      // file source processes oldest-mtime first — pin strictly increasing
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    // precondition the split relies on: event_id ranges ARE time ranges
    // (event_id monotone in ts) — assert it rather than assume it of the
    // synthetic generator
    val fileMaxTs = (0 until 3).map(i =>
      spark.read.parquet(s"$dir/f$i.parquet")
        .agg(max("ts")).head().getTimestamp(0).getTime)
    assert(fileMaxTs == fileMaxTs.sorted, s"files not time-ordered: $fileMaxTs")
    val tsSchema = org.apache.spark.sql.types.StructType(
      Streams.eventSchema.fields.map {
        case f if f.name == "ts" =>
          f.copy(dataType = org.apache.spark.sql.types.TimestampType)
        case f => f
      })
    val base = spark.readStream.schema(tsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
    val streamed = runToMemory(Streams.asOfEnrichStream(base), "asof_mb")
      .select("blocknumber", "user_id", "value", "last_click")
    val batch = graft.queries.ApolloQueries.eventAsOfEnrich(spark, sf)
      .select("blocknumber", "user_id", "value", "last_click")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    // exceptAll: MULTISET difference — set-based except would miss a bug
    // that duplicates one identical row while dropping another
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("Mode.Realtime event query compiles to a streaming plan matching batch (S3 via Compiler)") {
    val rt = graft.queries.ApolloQueries.compiledStreamParity(spark, sf)
    val batch = graft.queries.ApolloQueries.flagship(spark, sf)
    assert(rt.count() == batch.count() && batch.count() > 0)
    assert(rt.except(batch).count() == 0)
    assert(batch.except(rt).count() == 0)
  }

  test("Mode.Realtime method query matches the batch S5 grid (S6 via Compiler)") {
    val rt = graft.queries.ApolloQueries.methodPollerRealtime(spark, sf)
    val batch = graft.queries.ApolloQueries.methodGridCompiled(spark, sf)
    assert(rt.count() == batch.count() && batch.count() > 0)
    assert(rt.except(batch).count() == 0)
    assert(batch.except(rt).count() == 0)
  }

  test("Mode.Realtime event-triggered methods match the batch as-of form (S7 via Compiler)") {
    val rt = graft.queries.ApolloQueries.realtimeEventMethods(spark, sf)
    // the batch form of the same spec: offset-0 method via historical compile
    val batchSpec = graft.model.QuerySpec(
      name = "purchases_with_click_batch", chain = "ethereum",
      contracts = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L).map(a =>
        graft.model.ContractSpec(a, events = Seq(graft.model.EventSpec(
          "purchase", Seq("value"),
          methods = Seq(graft.model.MethodSpec("click", Seq("value"), blockOffset = 0L)))))),
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "contract" -> col("user_id"),
        "value" -> col("value"),
        "click_value" -> col("click_value")))
    val batch = graft.engine.Compiler.compile(spark, sf, batchSpec).orderBy("blocknumber")
    assert(rt.count() == batch.count() && batch.count() > 0)
    assert(rt.except(batch).count() == 0)
    assert(batch.except(rt).count() == 0)
  }

  test("Mode.Realtime event methods: time bounds apply to probes, NOT state (batch parity)") {
    // the probe window starts mid-data — clicks BEFORE the window must still
    // enrich the first in-window purchase, exactly like the batch path whose
    // state scan is unbounded
    def spec(mode: graft.model.Mode) = graft.model.QuerySpec(
      name = s"bounded_$mode", chain = "ethereum",
      contracts = (0L until 10L).map(a =>
        graft.model.ContractSpec(a, events = Seq(graft.model.EventSpec(
          "purchase", Seq("value"),
          methods = Seq(graft.model.MethodSpec("click", Seq("value"))))))),
      startTime = Some("2024-01-15"), endTime = Some("2024-01-25"),
      mode = mode,
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "contract" -> col("user_id"),
        "value" -> col("value"),
        "click_value" -> col("click_value")))
    val rtStream = graft.engine.Compiler.compile(spark, sf, spec(graft.model.Mode.Realtime))
    val rt = Streams.runToTable(rtStream, "s7_rt_bounded").orderBy("blocknumber")
    val batch = graft.engine.Compiler.compile(spark, sf, spec(graft.model.Mode.Historical))
      .orderBy("blocknumber")
    assert(rt.count() == batch.count() && batch.count() > 0)
    // pre-window state must be visible: at least one in-window purchase is
    // enriched by a click outside (before) the window
    assert(batch.where(col("click_value").isNotNull).count() > 0)
    assert(rt.except(batch).count() == 0)
    assert(batch.except(rt).count() == 0)
  }

  test("Mode.Realtime NEGATIVE block offset matches the batch as-of (events.go:287-288)") {
    val rt = graft.queries.ApolloQueries.realtimeNegativeOffset(spark, sf)
    val batch = graft.queries.ApolloQueries.methodOffset(spark, sf)
    assert(rt.count() == batch.count() && batch.count() > 0)
    assert(rt.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(rt).count() == 0)
    // (event_ids are globally unique in the testbed, so offset 0 and -1
    // coincide here; the look-back is distinguished on the hand-built
    // fixture in the null-state test below, offset -2)
  }

  test("negative-offset state ring carries across REAL micro-batches") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("ring_mb").toString
    // split the NORMALIZED frame (ts TimestampType instants) so the fixture
    // is independent of which physical ts layout the store shipped with
    val raw = Tables.events(spark, sf)
    val maxId = raw.agg(max("event_id")).head().getLong(0)
    val cuts = Seq(0L, maxId / 3, 2 * maxId / 3, maxId + 1)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val tmp = s"$dir/stage$i"
      raw.where(col("event_id") >= lo && col("event_id") < hi)
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(s"$dir/f$i.parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val tsSchema = org.apache.spark.sql.types.StructType(
      Streams.eventSchema.fields.map {
        case f if f.name == "ts" =>
          f.copy(dataType = org.apache.spark.sql.types.TimestampType)
        case f => f
      })
    val base = spark.readStream.schema(tsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
    val spec = graft.model.QuerySpec(
      name = "prior_click_mb", chain = "ethereum",
      contracts = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L).map(a =>
        graft.model.ContractSpec(a, events = Seq(graft.model.EventSpec(
          "purchase", Seq("value"),
          methods = Seq(graft.model.MethodSpec("click", Seq("value"), blockOffset = -1L)))))),
      mode = graft.model.Mode.Realtime,
      saves = Nil)
    val streamed = runToMemory(
      Streams.eventMethodsStream(spark, sf, spec, eventsOverride = Some(base))
        .select(col("event_id").as("blocknumber"), col("user_id").as("contract"),
          col("value"), col("click_value")), "ring_mb")
    val batch = graft.queries.ApolloQueries.methodOffset(spark, sf)
      .select("blocknumber", "contract", "value", "click_value")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("null state columns survive the stream (per-column last ignoreNulls parity)") {
    import java.nio.file.{Files, Paths}
    // hand-built fixture: clicks with NULL values interleaved — the batch
    // as-of skips them (last ignoreNulls); a primitive-unboxing stream
    // would attach 0.0 instead (round-4 advice finding)
    val dir = Files.createTempDirectory("nullst").toString
    val rows = Seq(
      // (event_id, ts_nanos, user_id, event_type, value, props)
      (1L, 1000000000000L, 7L, "click", Some(11.0), "a"),
      (2L, 2000000000000L, 7L, "purchase", Some(100.0), "b"),
      (3L, 3000000000000L, 7L, "click", None, "c"), // null click value
      (4L, 4000000000000L, 7L, "purchase", None, "d"), // null probe value
      (5L, 5000000000000L, 7L, "click", Some(55.0), null.asInstanceOf[String]),
      (6L, 6000000000000L, 7L, "purchase", Some(300.0), "f"))
    val df = spark.createDataFrame(rows.map(r =>
      (r._1, r._2, r._3, r._4, r._5.map(Double.box).orNull.asInstanceOf[java.lang.Double], r._6)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(ts AS BIGINT) AS ts", "user_id", "event_type",
        "CAST(value AS DOUBLE) AS value", "props")
    val tmp = s"$dir/stage"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$dir/events.parquet"))
    def spec(mode: graft.model.Mode) = graft.model.QuerySpec(
      name = s"nullst_$mode", chain = "ethereum",
      contracts = Seq(graft.model.ContractSpec(7L, events = Seq(graft.model.EventSpec(
        "purchase", Seq("value"),
        methods = Seq(graft.model.MethodSpec("click", Seq("value", "props"))))))),
      mode = mode,
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "value" -> col("value"),
        "click_value" -> col("click_value"),
        "click_props" -> col("click_props")))
    val rt = Streams.runToTable(
      graft.engine.Compiler.compile(spark, dir, spec(graft.model.Mode.Realtime)), "nullst_rt")
      .orderBy("blocknumber")
    val batch = graft.engine.Compiler.compile(spark, dir, spec(graft.model.Mode.Historical))
      .orderBy("blocknumber")
    assert(rt.count() == 3 && batch.count() == 3)
    assert(rt.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(rt).count() == 0)
    // block 4: click at block 3 had NULL value → click_value must still be
    // 11.0 (per-column carry), and the probe's own null value stays null
    val b4 = rt.where(col("blocknumber") === 4).head()
    assert(b4.isNullAt(b4.fieldIndex("value")))
    assert(b4.getDouble(b4.fieldIndex("click_value")) == 11.0)
    assert(b4.getString(b4.fieldIndex("click_props")) == "c")
    // block 6: click at 5 has value but NULL props → props carries from 3
    val b6 = rt.where(col("blocknumber") === 6).head()
    assert(b6.getDouble(b6.fieldIndex("click_value")) == 55.0)
    assert(b6.getString(b6.fieldIndex("click_props")) == "c")

    // deeper look-back IS distinguishable: offset -2 at block 6 targets
    // block 4 → skips the click at 5, lands on the null-valued click at 3,
    // per-column carry resolves value back to 11.0 — and stream == batch
    def spec2(mode: graft.model.Mode) = spec(mode).copy(
      name = s"nullst2_$mode",
      contracts = Seq(graft.model.ContractSpec(7L, events = Seq(graft.model.EventSpec(
        "purchase", Seq("value"),
        methods = Seq(graft.model.MethodSpec("click", Seq("value", "props"),
          blockOffset = -2L)))))))
    val rt2 = Streams.runToTable(
      graft.engine.Compiler.compile(spark, dir, spec2(graft.model.Mode.Realtime)), "nullst_rt2")
      .orderBy("blocknumber")
    val batch2 = graft.engine.Compiler.compile(spark, dir, spec2(graft.model.Mode.Historical))
      .orderBy("blocknumber")
    assert(rt2.exceptAll(batch2).count() == 0)
    assert(batch2.exceptAll(rt2).count() == 0)
    val c6 = rt2.where(col("blocknumber") === 6).head()
    assert(c6.getDouble(c6.fieldIndex("click_value")) == 11.0)
    assert(c6.getString(c6.fieldIndex("click_props")) == "c")
  }

  test("realtime POSITIVE block offset: probes wait for the target block, then match batch") {
    import java.nio.file.{Files, Paths}
    // same hand-built fixture shape as the null-state test: user 7, blocks
    // 1..6 alternate click/purchase; click 3 has a NULL value
    val dir = Files.createTempDirectory("posoff").toString
    val rows = Seq(
      (1L, 1000000000000L, 7L, "click", Some(11.0), "a"),
      (2L, 2000000000000L, 7L, "purchase", Some(100.0), "b"),
      (3L, 3000000000000L, 7L, "click", None, "c"),
      (4L, 4000000000000L, 7L, "purchase", Some(200.0), "d"),
      (5L, 5000000000000L, 7L, "click", Some(55.0), "e"),
      (6L, 6000000000000L, 7L, "purchase", Some(300.0), "f"))
    val df = spark.createDataFrame(rows.map(r =>
      (r._1, r._2, r._3, r._4, r._5.map(Double.box).orNull.asInstanceOf[java.lang.Double], r._6)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .selectExpr("event_id", "CAST(ts AS BIGINT) AS ts", "user_id", "event_type",
        "CAST(value AS DOUBLE) AS value", "props")
    val tmp = s"$dir/stage"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$dir/events.parquet"))
    def spec(mode: graft.model.Mode) = graft.model.QuerySpec(
      name = s"posoff_$mode", chain = "ethereum",
      contracts = Seq(graft.model.ContractSpec(7L, events = Seq(graft.model.EventSpec(
        "purchase", Seq("value"),
        methods = Seq(graft.model.MethodSpec("click", Seq("value"), blockOffset = 1L)))))),
      mode = mode,
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "value" -> col("value"),
        "click_value" -> col("click_value")))
    val rt = Streams.runToTable(
      graft.engine.Compiler.compile(spark, dir, spec(graft.model.Mode.Realtime)), "posoff_rt")
      .orderBy("blocknumber")
    val batch = graft.engine.Compiler.compile(spark, dir, spec(graft.model.Mode.Historical))
      .orderBy("blocknumber")
    // batch answers all three probes from the archive; the stream resolves a
    // probe only once the chain strictly passes block + 1, so the LAST
    // purchase (block 6, target 7 — never reached) is still waiting
    assert(batch.count() == 3)
    assert(rt.count() == 2)
    assert(rt.exceptAll(batch.where(col("blocknumber") < 6)).count() == 0)
    assert(batch.where(col("blocknumber") < 6).exceptAll(rt).count() == 0)
    // probe 2 targets block 3, whose click value is NULL → per-column carry
    // back to click 1 (11.0); probe 4 targets block 5 → 55.0
    val r2 = rt.where(col("blocknumber") === 2).head()
    assert(r2.getDouble(r2.fieldIndex("click_value")) == 11.0)
    val r4 = rt.where(col("blocknumber") === 4).head()
    assert(r4.getDouble(r4.fieldIndex("click_value")) == 55.0)
  }

  test("positive-offset pending probes survive micro-batch boundaries") {
    import java.nio.file.{Files, Paths}
    // split the fixture so the probe and its target land in DIFFERENT
    // micro-batches: pending state must carry across batches
    val dir = Files.createTempDirectory("posoff_mb").toString
    def write(name: String, rows: Seq[(Long, Long, Long, String, java.lang.Double, String)],
        mtime: Long): Unit = {
      val df = spark.createDataFrame(rows)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .selectExpr("event_id", "CAST(ts AS BIGINT) AS ts", "user_id", "event_type",
          "CAST(value AS DOUBLE) AS value", "props")
      val tmp = s"$dir/stage_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(s"$dir/$name.parquet")
      Files.move(part.toPath, dst)
      dst.toFile.setLastModified(mtime)
    }
    write("b0", Seq(
      (1L, 1000000000000L, 7L, "click", 11.0, "a"),
      (2L, 2000000000000L, 7L, "purchase", 100.0, "b")), 1700000000000L)
    write("b1", Seq(
      (3L, 3000000000000L, 7L, "click", 33.0, "c"),
      (4L, 4000000000000L, 7L, "click", 44.0, "d")), 1700000060000L)
    val base = spark.readStream.schema(Streams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val spec = graft.model.QuerySpec(
      name = "posoff_mb", chain = "ethereum",
      contracts = Seq(graft.model.ContractSpec(7L, events = Seq(graft.model.EventSpec(
        "purchase", Seq("value"),
        methods = Seq(graft.model.MethodSpec("click", Seq("value"), blockOffset = 1L)))))),
      mode = graft.model.Mode.Realtime,
      saves = Nil)
    val streamed = runToMemory(
      Streams.eventMethodsStream(spark, sf, spec, eventsOverride = Some(base))
        .select(col("event_id").as("blocknumber"), col("value"), col("click_value")),
      "posoff_mb_sink")
    // the probe at block 2 (batch 0) targets block 3 (batch 1) and resolves
    // when block 4 arrives: click_value = 33.0 (the click AT the target)
    assert(streamed.count() == 1)
    val r = streamed.head()
    assert(r.getLong(r.fieldIndex("blocknumber")) == 2L)
    assert(r.getDouble(r.fieldIndex("click_value")) == 33.0)
  }

  test("Mode.Realtime method query WITHOUT end_time compiles to the unbounded poller stream") {
    val spec = graft.model.QuerySpec(
      name = "open_poll", chain = "ethereum", mode = graft.model.Mode.Realtime,
      contracts = (0L until 5L).map(a =>
        graft.model.ContractSpec(a, methods = Seq(
          graft.model.MethodSpec("purchase", Seq("value", "event_id"))))),
      blockInterval = Some(5L),
      saves = Seq(
        "sample_ts" -> col("sample_ts"),
        "contract" -> col("user_id"),
        "last_value" -> col("purchase_value"),
        "last_block" -> col("purchase_event_id")))
    val df = graft.engine.Compiler.compile(spark, sf, spec)
    assert(df.isStreaming, "open-ended realtime poll must be a streaming frame")
    assert(df.columns.toSeq == Seq("sample_ts", "contract", "last_value", "last_block"))
  }

  test("method poller is a valid unbounded plan (S6)") {
    val state = Tables.events(spark, sf).groupBy("user_id").agg(max("value").as("value"))
    val df = Streams.methodPoller(spark, Seq(1L, 2L), state)
    assert(df.isStreaming)
    assert(df.columns.contains("sample_ts") && df.columns.contains("value"))
  }

  test("index upsert: a doc matches only PRIOR batches — later and same-batch twins invisible (r9.2)") {
    import spark.implicits._
    // shards = doc_id % 4; the single-pass shard writer (r13 verdict 4)
    // gives NO mtime order, so batches may arrive in ANY shard order —
    // and the assertions hold under all of them because "earlier" is the
    // __shard VALUE (both-direction probe + min-of-mins rollup):
    //  (0, 1): the later-arriving of shards 0/1 emits the match (1→0)
    //  (2, 6): both shard 2, SAME batch → probe-before-append hides them
    //  (7, 4): doc 7 (shard 3) matches doc 4 (shard 0) — min earlier
    //          SHARD, even though doc 3 (shard 3) shares its batch
    val same1 = "alpha beta gamma delta epsilon"
    val same2 = "zeta eta theta iota kappa"
    val same3 = "lambda mu nu xi omicron"
    val docs = Seq(
      (0L, same1), (1L, same1),
      (2L, same2), (6L, same2),
      (4L, same3), (7L, same3), (3L, same3),
      (5L, "unique words only here nothing shared")
    ).toDF("doc_id", "text")
    val out = Streams.indexUpsertStreamOf(spark, docs, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.get(1L).contains(0L), s"cross-batch twin must match: $out")
    assert(!out.contains(2L) && !out.contains(6L),
      "same-batch twins must NOT match (probe runs before append)")
    assert(out.get(7L).contains(4L), "min over EARLIER shards only")
    assert(out.get(3L).contains(4L),
      s"doc 3 matches the shard-0 twin, never batch-mate 7: $out")
    assert(!out.contains(0L) && !out.contains(4L) && !out.contains(5L))
  }

  test("index upsert: compaction after EVERY batch is semantically invisible (r14)") {
    import spark.implicits._
    // the twin fixture above, with the index table compacted (swap +
    // rename to one sorted file per bucket) after every single append —
    // the hostile cadence. A compaction that dropped, duplicated, or
    // reordered index rows would change which twins match; the emitted
    // matches must be exactly the uncompacted run's.
    val same1 = "alpha beta gamma delta epsilon"
    val same2 = "zeta eta theta iota kappa"
    val same3 = "lambda mu nu xi omicron"
    val docs = Seq(
      (0L, same1), (1L, same1),
      (2L, same2), (6L, same2),
      (4L, same3), (7L, same3), (3L, same3),
      (5L, "unique words only here nothing shared")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx_compact").toString
    Streams.deleteOnShutdown(tmp)
    Streams.writeIdxShards(spark, docs, 4, tmp)
    val out = Streams.indexUpsertRunOver(spark, docs.schema, tmp, compactEvery = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Streams.deleteDir(tmp)
    assert(out == Map(1L -> 0L, 7L -> 4L, 3L -> 4L),
      s"per-batch compaction changed the emitted matches: $out")
  }

  test("index upsert: a crash between index append and commit resumes exactly-once (r14)") {
    import spark.implicits._
    // the nastiest window: the driver dies AFTER a batch appended its
    // bands to the index but BEFORE the engine committed the batch. The
    // resume replays that batch against an index that already holds its
    // own bands — without the probe's equal-shard filter the replay emits
    // self-matches and same-shard matches (here 7→3: doc 3 is 7's same-
    // shard twin, and 3 < 4 wins the min), and if a failed run DROPPED the
    // accumulated table the resume would probe pre-crash docs against an
    // empty index and silently unmatch everything. Shard 3 carries docs
    // {7, 3} — both matching doc 4 (shard 0) AND each other's text — so
    // this fixture trips every one of those corruptions.
    val same1 = "alpha beta gamma delta epsilon"
    val same2 = "zeta eta theta iota kappa"
    val same3 = "lambda mu nu xi omicron"
    val docs = Seq(
      (0L, same1), (1L, same1),
      (2L, same2), (6L, same2),
      (4L, same3), (7L, same3), (3L, same3),
      (5L, "unique words only here nothing shared")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx_crash").toString
    Streams.deleteOnShutdown(tmp)
    Streams.writeIdxShards(spark, docs, 4, tmp)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    // run 1: compaction after every append (hostile cadence) and the
    // injected crash after shard 3's append lands
    val crash = intercept[Exception] {
      Streams.indexUpsertRunOver(spark, docs.schema, tmp,
        compactEvery = 1, failAfterAppendOnce = Some(3))
    }
    assert(msgs(crash).exists(_.contains("injected crash")),
      s"expected the injected crash, got: ${msgs(crash)}")
    // the failed run must KEEP the accumulated index for the resume
    assert(spark.catalog.tableExists(Streams.idxTableFor(tmp)),
      "a failed run dropped the index its checkpoint already counts as appended")
    // run 2: same artifact + checkpoint — replays the crashed batch, then
    // finishes; the result must be EXACTLY the uninterrupted run's
    val out = Streams.indexUpsertRunOver(spark, docs.schema, tmp, compactEvery = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Streams.deleteDir(tmp)
    assert(out == Map(1L -> 0L, 7L -> 4L, 3L -> 4L),
      s"crash-resume changed the emitted matches (replay self/same-shard leak " +
        s"or a lost index): $out")
    // completion reclaimed the per-run table as usual
    assert(!spark.catalog.tableExists(Streams.idxTableFor(tmp)),
      "the completed resume left its per-run table behind")
  }

  test("index upsert: a NEW-process resume re-registers the surviving index data (r14)") {
    import spark.implicits._
    // cross-PROCESS crash: the in-memory catalog's table ENTRY dies with
    // the JVM while the parquet lives on in the warehouse. An unhealed
    // resume sees tableExists == false and silently rebuilds from an
    // empty index — same wrong-answer class as the dropped-on-failure
    // table. Simulated by moving the data dir aside, dropping the entry,
    // and restoring the data under the SWAP name (the hardest composite:
    // new process AND a compaction that died mid-RENAME).
    val same1 = "alpha beta gamma delta epsilon"
    val same3 = "lambda mu nu xi omicron"
    val docs = Seq(
      (0L, same1), (1L, same1),
      (4L, same3), (7L, same3), (3L, same3),
      (5L, "unique words only here nothing shared")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx_xproc").toString
    Streams.deleteOnShutdown(tmp)
    Streams.writeIdxShards(spark, docs, 4, tmp)
    intercept[Exception] {
      Streams.indexUpsertRunOver(spark, docs.schema, tmp,
        compactEvery = 1, failAfterAppendOnce = Some(3))
    }
    val table = Streams.idxTableFor(tmp)
    val tname = table.split('.').last
    val dbLoc = new java.net.URI(spark.catalog.getDatabase("graft_idx_upsert").locationUri)
    val mainDir = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(dbLoc), tname)
    val swapDir = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(dbLoc), tname + "_swap")
    val fs = mainDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(mainDir), "the crashed run must leave its data on disk")
    // simulate the JVM death: entry gone, data alive — under the swap name
    val stash = new org.apache.hadoop.fs.Path(tmp, "stash")
    assert(fs.rename(mainDir, stash))
    spark.sql(s"DROP TABLE $table") // dir already moved: only the entry dies
    assert(fs.rename(stash, swapDir))
    assert(!spark.catalog.tableExists(table) && !fs.exists(mainDir))
    // resume on the "new process": recovery renames the swap data back,
    // re-registers it with the bucket spec, and the replay stays exact
    val out = Streams.indexUpsertRunOver(spark, docs.schema, tmp, compactEvery = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 0L, 7L -> 4L, 3L -> 4L),
      s"new-process resume lost or corrupted the surviving index: $out")
    // completion reclaims BOTH the entry and the (external) data files
    assert(!spark.catalog.tableExists(table), "per-run table entry not reclaimed")
    assert(!fs.exists(mainDir) && !fs.exists(swapDir),
      "external index data left behind in the warehouse")
    Streams.deleteDir(tmp)
  }

  test("index upsert: the compaction DROP→RENAME crash window heals on resume (r14)") {
    import spark.implicits._
    // compactIdxTable swaps via saveAsTable(swap); DROP main; RENAME swap.
    // A death between the DROP and the RENAME leaves the WHOLE accumulated
    // index only under the swap name — tableExists(main) is then false,
    // and an unhealed resume would silently rebuild from an empty index.
    val db = "graft_idx_upsert"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val main = s"$db.t_recoverspec"
    val swap = main + "_swap"
    spark.sql(s"DROP TABLE IF EXISTS $main")
    spark.sql(s"DROP TABLE IF EXISTS $swap")
    try {
      Seq((1L, 0, 11L, 0), (2L, 1, 22L, 1)).toDF("doc_id", "band_idx", "bk", "__shard")
        .write.bucketBy(2, "band_idx", "bk").sortBy("band_idx", "bk")
        .saveAsTable(swap)
      // state as left by the crash: main dropped, swap complete
      Streams.recoverIdxSwap(spark, main)
      assert(spark.catalog.tableExists(main) && !spark.catalog.tableExists(swap),
        "recovery must rename the stranded swap back to the index name")
      assert(spark.table(main).count() == 2)
      // the OTHER window (death between saveAsTable(swap) and DROP main):
      // main is still the live index; the swap is a stale copy — recovery
      // drops it and leaves main untouched
      spark.table(main).write.bucketBy(2, "band_idx", "bk")
        .sortBy("band_idx", "bk").saveAsTable(swap)
      Streams.recoverIdxSwap(spark, main)
      assert(spark.catalog.tableExists(main) && !spark.catalog.tableExists(swap),
        "recovery must drop a stale swap when the index survived the crash")
      assert(spark.table(main).count() == 2)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $main")
      spark.sql(s"DROP TABLE IF EXISTS $swap")
    }
  }

  test("index compaction: the size-triggered default rewrites O(log) bytes — matches identical to cadence (r15, r14 verdict 2)") {
    import spark.implicits._
    // the r14 fixed cadence rewrote the ENTIRE accumulated index every N
    // appends — amortized O(index/cadence) write bytes per batch,
    // unbounded as the index grows. The size trigger (delta >= ratio x
    // compacted) is the doubling discipline: over B equal batches it
    // compacts at batches 1,2,4,8,... — O(log B) rewrites totalling
    // ~2x the final index, where a cadence rewrites O(B) times. Both
    // policies must emit the SAME matches (compaction is invisible).
    val shards = 12
    val docs = (0 until 24).map { d =>
      val text = if (d % 2 == 0) s"alpha beta gamma delta epsilon zeta eta theta common$d"
      else "identical twin payload words one two three four five"
      (d.toLong, text)
    }.toDF("doc_id", "text")
    def run(compactEvery: Int): (Map[Long, Long], Long, Long, Long) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_idx_size").toString
      Streams.deleteOnShutdown(tmp)
      Streams.writeIdxShards(spark, docs, shards, tmp)
      val b0 = Streams.idxCompactionBytes.get()
      val n0 = Streams.idxCompactions.get()
      val a0 = Streams.idxAppendBytes.get()
      val out = Streams.indexUpsertRunOver(spark, docs.schema, tmp, compactEvery)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val res = (out, Streams.idxCompactionBytes.get() - b0,
        Streams.idxCompactions.get() - n0, Streams.idxAppendBytes.get() - a0)
      Streams.deleteDir(tmp)
      res
    }
    val (mCadence, bytesCadence, nCadence, _) = run(compactEvery = 1)
    val (mSize, bytesSize, nSize, appended) = run(compactEvery = -1)
    assert(mSize == mCadence, "compaction policy changed the matches")
    assert(nCadence == shards.toLong, s"cadence-1 must compact per batch, did $nCadence")
    // the doubling INVARIANT: with ratio 1, every rewrite is at most
    // 2 x the delta that triggered it, so total rewrite bytes stay under
    // ~2 x the raw appended bytes AT ANY SCALE (slack for the post-
    // compaction shrink inflating later triggers at toy file sizes) —
    // where a fixed cadence rewrites the whole index every period,
    // unbounded amplification per ingested byte as the index grows
    assert(bytesSize <= (2.5 * appended).toLong,
      s"size-triggered rewrote $bytesSize bytes for $appended appended — the doubling bound is broken")
    assert(nSize < nCadence && bytesSize < bytesCadence,
      s"size-triggered ($nSize compactions, $bytesSize B) must beat the per-batch cadence ($nCadence, $bytesCadence B)")
  }

  test("index bucket count derives from the artifact (minimal, floored) and persists across a crash-resume (r15, r14 verdict 3)") {
    import spark.implicits._
    // the derivation itself: minimal power of two meeting the per-bucket
    // target, floored at the fixture's 8 so the gate layout is unchanged
    val t = 1L << 20
    assert(Streams.idxBucketsFor(0L, t) == 8)
    assert(Streams.idxBucketsFor(8 * t, t) == 8)
    assert(Streams.idxBucketsFor(8 * t + 1, t) == 16)
    assert(Streams.idxBucketsFor(100 * t, t) == 128) // 64 * t < 100t <= 128 * t
    assert(Streams.idxBucketsFor(Long.MaxValue, t) == 4096) // runaway cap
    // end-to-end at a DERIVED width: a tiny per-bucket target pushes the
    // count past the floor; the run must emit the same matches as the
    // floor-width run, and a crash-resume must read the recorded layout
    // back instead of re-deriving (appends must match the crashed run)
    val same1 = "alpha beta gamma delta epsilon"
    val same3 = "lambda mu nu xi omicron"
    val docs = Seq(
      (0L, same1), (1L, same1),
      (4L, same3), (7L, same3), (3L, same3),
      (5L, "unique words only here nothing shared")
    ).toDF("doc_id", "text")
    val tmp1 = java.nio.file.Files.createTempDirectory("graft_idx_floorw").toString
    Streams.deleteOnShutdown(tmp1)
    Streams.writeIdxShards(spark, docs, 4, tmp1)
    val base = Streams.indexUpsertRunOver(spark, docs.schema, tmp1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Streams.deleteDir(tmp1)
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_idx_derivw").toString
    Streams.deleteOnShutdown(tmp2)
    Streams.writeIdxShards(spark, docs, 4, tmp2)
    val fs = new org.apache.hadoop.fs.Path(tmp2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val artifactBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$tmp2/in")).getLength
    val expected = Streams.idxBucketsFor(artifactBytes, targetBytes = 64L)
    assert(expected > 8, s"test target too large to exercise the derivation ($expected)")
    intercept[Exception] {
      Streams.indexUpsertRunOver(spark, docs.schema, tmp2,
        failAfterAppendOnce = Some(3), idxBucketTarget = 64L)
    }
    // the crashed run recorded its derived layout in the sidecar...
    val table = Streams.idxTableFor(tmp2)
    assert(Streams.readIdxBucketsSidecar(spark, table).contains(expected),
      "the derived bucket count was not persisted for the resume")
    // ...and the resume (which never sees the target) replays to the
    // exact floor-width answer over the derived-width layout
    val out = Streams.indexUpsertRunOver(spark, docs.schema, tmp2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == base, s"derived-width index diverged: $out vs $base")
    Streams.deleteDir(tmp2)
  }

  test("index upsert: compaction crash on a RE-REGISTERED index leaves the main dir OCCUPIED — recovery clears it (r15)") {
    import spark.implicits._
    // On a re-registered (EXTERNAL) index, compaction's `DROP TABLE main`
    // keeps the data files: a death between that DROP and compaction's
    // main-dir delete leaves the dir occupied while the complete managed
    // swap survives. The r14 recovery renamed the swap straight onto the
    // occupied dir — on Hadoop local FS that NESTS the swap data inside it
    // (duplicate rows the min rollup silently absorbs) or fails loudly.
    // Recovery now clears the stale-but-content-equal dir first, the same
    // dir-level heal reRegisterIdxTable does on the cross-process path.
    val db = "graft_idx_upsert"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val main = s"$db.t_swaphealspec"
    val swap = main + "_swap"
    spark.sql(s"DROP TABLE IF EXISTS $main")
    spark.sql(s"DROP TABLE IF EXISTS $swap")
    val rows = Seq((1L, 0, 11L, 0), (2L, 1, 22L, 1), (3L, 2, 33L, 0))
    val dbLoc = new java.net.URI(spark.catalog.getDatabase(db).locationUri)
    val mainDir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dbLoc), "t_swaphealspec")
    val fs = mainDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      if (fs.exists(mainDir)) fs.delete(mainDir, true)
      // the index as a RE-REGISTERED external table (the r14 cross-process
      // lifecycle): land managed, stash the dir across the entry drop,
      // restore, re-register
      rows.toDF("doc_id", "band_idx", "bk", "__shard")
        .write.bucketBy(8, "band_idx", "bk").sortBy("band_idx", "bk")
        .saveAsTable(main)
      val stash = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(dbLoc), "t_swaphealspec_stash")
      assert(fs.rename(mainDir, stash))
      spark.sql(s"DROP TABLE $main")
      assert(fs.rename(stash, mainDir))
      Streams.reRegisterIdxTable(spark, main)
      assert(spark.catalog.tableExists(main))
      // compaction up to the crash point: swap written, external main
      // DROPped (files STAY) — death strikes before the dir delete
      spark.table(main).write.bucketBy(8, "band_idx", "bk")
        .sortBy("band_idx", "bk").saveAsTable(swap)
      spark.sql(s"DROP TABLE $main")
      assert(fs.exists(mainDir),
        "external DROP must keep the data files — the window under test")
      // resume
      Streams.recoverIdxSwap(spark, main)
      assert(spark.catalog.tableExists(main) && !spark.catalog.tableExists(swap),
        "recovery must rename the stranded swap back to the index name")
      assert(spark.table(main).count() == rows.size,
        "the heal duplicated rows — the swap data nested inside the occupied dir")
      assert(spark.table(main).collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet == rows.toSet)
      assert(!fs.listStatus(mainDir).exists(_.isDirectory),
        "a directory nested inside the index data dir — the rename collided")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $main")
      spark.sql(s"DROP TABLE IF EXISTS $swap")
      if (fs.exists(mainDir)) fs.delete(mainDir, true)
    }
  }

  test("index upsert order contract survives a filesystem that scrambles mtimes (r12 verdict 1)") {
    import spark.implicits._
    // same twin layout as the r9.2 spec — but the shard files arrive in
    // REVERSE order (mtimes stamped backwards, the HDFS/S3 no-order case
    // the retired java.io.File mtime device silently failed on). With the
    // order carried as the __shard DATA column, "earlier" means lower
    // shard — a pure function of the artifact — so the result is
    // IDENTICAL under any arrival order.
    val same1 = "alpha beta gamma delta epsilon"
    val same2 = "zeta eta theta iota kappa"
    val same3 = "lambda mu nu xi omicron"
    val docs = Seq(
      (0L, same1), (1L, same1),
      (2L, same2), (6L, same2),
      (4L, same3), (7L, same3), (3L, same3),
      (5L, "unique words only here nothing shared")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_idx_scramble").toString
    Streams.deleteOnShutdown(tmp)
    Streams.writeIdxShards(spark, docs, 4, tmp)
    // hostile FS: newest-first replay (reverse shard order) — the shard
    // data files live one per __shard=i partition directory (single-pass
    // writer, r13 verdict item 4)
    val files = new java.io.File(s"$tmp/in").listFiles()
      .filter(_.isDirectory).sortBy(_.getName)
      .flatMap(_.listFiles().filter(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")))
    assert(files.length == 4, s"expected one data file per shard dir: ${files.toSeq}")
    files.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L - i * 60000L))
    }
    val out = Streams.indexUpsertRunOver(spark, docs.schema, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Streams.deleteDir(tmp)
    assert(out == Map(1L -> 0L, 7L -> 4L, 3L -> 4L),
      s"scrambled arrival order changed the emitted matches: $out")
  }

  test("admission shard count derives from the at-rest artifact (r12 verdict 4)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("admit_sizing").toString
    Streams.deleteOnShutdown(dir)
    (1L to 5000L).map(i => (i, s"payload_$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/art")
    // gate regime: the artifact is far under one target file — the floor
    // (4 shards) holds the genuine multi-batch admission contract
    assert(Streams.admitShardsFor(spark, s"$dir/art") == 4)
    // store regime: shards grow as ceil(bytes / target file size)
    val p = new org.apache.hadoop.fs.Path(s"$dir/art")
    val bytes = p.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(p).getLength
    val target = math.max(1L, bytes / 10)
    assert(Streams.admitShardsFor(spark, s"$dir/art", target) ==
      ((bytes + target - 1) / target).toInt)
    // a missing artifact never divides by surprise: floor applies
    assert(Streams.admitShardsFor(spark, s"$dir/definitely_absent") == 4)
    Streams.deleteDir(dir)
  }
}
