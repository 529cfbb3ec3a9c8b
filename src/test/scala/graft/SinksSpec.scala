package graft

import java.nio.file.Files

import graft.engine.{Compiler, Sinks}
import graft.streaming.Streams
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("K2 csv sink writes header + all rows") {
    val out = tmp("csv")
    val df = Tables.region(spark, sf)
    Sinks.csv(df, s"$out/region")
    val back = spark.read.option("header", "true").csv(s"$out/region")
    assert(back.count() == df.count())
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("parquet sink round-trips schema and rows") {
    val out = tmp("pq")
    val df = Tables.nation(spark, sf)
    Sinks.parquet(df, s"$out/nation")
    val back = spark.read.parquet(s"$out/nation")
    assert(back.schema == df.schema)
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)
  }

  test("R8 demux sink partitions by query_name (per-query dirs, pruned reads)") {
    import spark.implicits._
    val out = tmp("demux")
    val demuxed = Compiler.demux(Map(
      "qa" -> Seq((1L, "a")).toDF("blocknumber", "v"),
      "qb" -> Seq((2L, "b")).toDF("blocknumber", "v")))
    Sinks.demuxParquet(demuxed, s"$out/multi")
    val dirs = new java.io.File(s"$out/multi").listFiles().map(_.getName).filter(_.startsWith("query_name="))
    assert(dirs.toSet == Set("query_name=qa", "query_name=qb"))
    // partition pruning: reading one query touches only its directory
    val one = spark.read.parquet(s"$out/multi").where(col("query_name") === "qa")
    assert(one.count() == 1)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }

  test("K3 jdbc sink round-trips through embedded Derby: overwrite then append") {
    import org.apache.spark.sql.SaveMode
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = Tables.region(spark, sf)
    Sinks.jdbc(df, url, "region_t", props)
    val back = spark.read.jdbc(url, "region_t", props)
    assert(back.count() == df.count())
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
    // overwrite reproduces the reference's drop-and-recreate contract
    Sinks.jdbc(df, url, "region_t", props)
    assert(spark.read.jdbc(url, "region_t", props).count() == df.count())
    // append accumulates
    Sinks.jdbc(df, url, "region_t", props, SaveMode.Append)
    assert(spark.read.jdbc(url, "region_t", props).count() == 2 * df.count())
  }

  test("multi-sink writes every sink from one cached computation (main.go:145-155)") {
    val out = tmp("multi")
    val df = Tables.nation(spark, sf)
    Sinks.multi(df, Seq(
      d => Sinks.csv(d, s"$out/csv"),
      d => Sinks.json(d, s"$out/json"),
      d => Sinks.parquet(d, s"$out/pq")))
    assert(spark.read.option("header", "true").csv(s"$out/csv").count() == df.count())
    assert(spark.read.json(s"$out/json").count() == df.count())
    assert(spark.read.parquet(s"$out/pq").count() == df.count())
  }

  test("R8 streaming demux: two compiled realtime queries land one directory each") {
    val out = tmp("sdemux")
    def spec(name: String, sig: String) = graft.model.QuerySpec(
      name = name, chain = "ethereum", mode = graft.model.Mode.Realtime,
      globalEvents = Seq(graft.model.EventSpec(sig, Seq("value"))),
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "value" -> col("value")))
    val compiled = Map(
      "rt_purchases" -> Compiler.compile(spark, sf, spec("rt_purchases", "purchase")),
      "rt_clicks" -> Compiler.compile(spark, sf, spec("rt_clicks", "click")))
    assert(compiled.values.forall(_.isStreaming))
    val q = Sinks.demuxParquetStream(
      Compiler.demux(compiled), s"$out/multi", s"$out/ckpt", bounded = true)
    q.awaitTermination()
    val dirs = new java.io.File(s"$out/multi").listFiles()
      .map(_.getName).filter(_.startsWith("query_name=")).toSet
    assert(dirs == Set("query_name=rt_purchases", "query_name=rt_clicks"))
    // each directory holds exactly its query's rows
    val ev = Tables.events(spark, sf)
    val back = spark.read.parquet(s"$out/multi")
    assert(back.where(col("query_name") === "rt_purchases").count() ==
      ev.where(col("event_type") === "purchase").count())
    assert(back.where(col("query_name") === "rt_clicks").count() ==
      ev.where(col("event_type") === "click").count())
    // and the checkpoint pinned offsets (restartable)
    assert(new java.io.File(s"$out/ckpt/offsets").listFiles().nonEmpty)
    // batch frames are routed to the batch form loudly
    intercept[IllegalArgumentException](
      Sinks.demuxParquetStream(Tables.nation(spark, sf), s"$out/x", s"$out/y"))
  }

  test("streaming aggregate upserts into SQL: one current row per group, replay-stable") {
    val out = tmp("upsert")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:memory:graftup;create=true"
    def aggStream = {
      val spec = graft.model.QuerySpec(
        name = "agg_rt", chain = "ethereum", mode = graft.model.Mode.Realtime,
        globalEvents = Seq(graft.model.EventSpec("purchase", Seq("value"))),
        saves = Seq("contract" -> col("contract_address"), "v" -> col("value")),
        groupBy = Seq("contract"),
        aggregates = Seq("n" -> count(lit(1)), "biggest" -> max(col("v"))))
      Compiler.compile(spark, sf, spec)
    }
    val q = Sinks.upsertJdbcStream(aggStream, Seq("contract"), url, "agg_live",
      props, s"$out/ckpt1", bounded = true)
    q.awaitTermination()
    val back = spark.read.jdbc(url, "agg_live", props)
    val want = Tables.events(spark, sf).where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("contract"))
      .agg(count(lit(1)).as("n"), max("value").as("biggest"))
    // one CURRENT row per group, equal to the batch aggregate
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty)
    // replay from a FRESH checkpoint reprocesses everything — groups are
    // REPLACED, not appended, so the table converges to the same state
    val q2 = Sinks.upsertJdbcStream(aggStream, Seq("contract"), url, "agg_live",
      props, s"$out/ckpt2", bounded = true)
    q2.awaitTermination()
    val again = spark.read.jdbc(url, "agg_live", props)
    assert(again.count() == want.count())
    assert(again.exceptAll(want).isEmpty)
    // loud on batch frames / bad keys
    intercept[IllegalArgumentException](Sinks.upsertJdbcStream(
      Tables.nation(spark, sf), Seq("n_nationkey"), url, "x", props, s"$out/x"))
    intercept[IllegalArgumentException](Sinks.upsertJdbcStream(
      aggStream, Seq("nope"), url, "x", props, s"$out/y"))
    // loop-stamped names ("0-signups") are not bare identifiers — they
    // quote through the dialect like the demux sink does
    val q3 = Sinks.upsertJdbcStream(aggStream, Seq("contract"), url, "0-agg",
      props, s"$out/ckpt3", bounded = true)
    q3.awaitTermination()
    assert(spark.read.jdbc(url, Sinks.quotedTable(url, "0-agg"), props).count() == want.count())
  }

  test("upsert sink replaces the NULL group instead of accumulating stale rows") {
    val out = tmp("upsertnull")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:memory:graftupnull;create=true"
    // group key NULL for odd contracts — Spark keeps NULL as a real group
    def stream = {
      val spec = graft.model.QuerySpec(
        name = "agg_null", chain = "ethereum", mode = graft.model.Mode.Realtime,
        globalEvents = Seq(graft.model.EventSpec("purchase", Seq("value"))),
        saves = Seq(
          "bucket" -> when(col("contract_address") % 2 === 0, col("contract_address")),
          "v" -> col("value")),
        groupBy = Seq("bucket"),
        aggregates = Seq("n" -> count(lit(1))))
      Compiler.compile(spark, sf, spec)
    }
    def runOnce(ck: String): Unit = {
      val q = Sinks.upsertJdbcStream(stream, Seq("bucket"), url, "null_agg",
        props, s"$out/$ck", bounded = true)
      q.awaitTermination()
    }
    runOnce("ck1")
    runOnce("ck2") // replay: the NULL group must be REPLACED, not duplicated
    val back = spark.read.jdbc(url, "null_agg", props)
    assert(back.where(col("bucket").isNull).count() == 1,
      "NULL group accumulated stale rows — IS NULL delete predicate broken")
    val want = Tables.events(spark, sf).where(col("event_type") === "purchase")
      .groupBy(when(col("user_id") % 2 === 0, col("user_id")).as("bucket"))
      .agg(count(lit(1)).as("n"))
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty)
  }

  test("SSE sink pushes every result row as a data: frame over TCP (ROADMAP.md:72-74)") {
    val out = tmp("sse")
    val srv = new SseTestServer
    try {
      val spec = graft.model.QuerySpec(
        name = "sse_rt", chain = "ethereum", mode = graft.model.Mode.Realtime,
        globalEvents = Seq(graft.model.EventSpec("error", Seq("value"))),
        saves = Seq("blocknumber" -> col("blocknumber"), "value" -> col("value")))
      val stream = Compiler.compile(spark, sf, spec)
      val q = Sinks.sseStream(stream, "localhost", srv.port, s"$out/ckpt", bounded = true)
      q.awaitTermination()
      val expect = Tables.events(spark, sf).where(col("event_type") === "error").count()
      srv.awaitFrames(expect)
      assert(srv.received.size() == expect, s"got ${srv.received.size()} frames, want $expect")
      // frames are self-describing JSON rows
      import scala.jdk.CollectionConverters._
      assert(srv.received.asScala.forall(f => f.startsWith("{") && f.contains("\"blocknumber\"")))
      // batch frames rejected loudly
      intercept[IllegalArgumentException](
        Sinks.sseStream(Tables.nation(spark, sf), "localhost", srv.port, s"$out/x"))
    } finally srv.stop()
  }

  test("SSE restart/replay: resumed runs emit nothing new; replayed frames reuse ids (at-least-once)") {
    // the delivery contract in Sinks.sseStream's scaladoc, exercised:
    //  (1) a RESTART from the committed checkpoint emits NO duplicate frames
    //      (source progress is exactly-once);
    //  (2) a REPLAY (fresh checkpoint — the uncommitted-epoch case) re-emits
    //      frames carrying the SAME id: lines, so a consumer deduping by id
    //      converges to one copy — at-least-once wire, exactly-once effect.
    val out = tmp("sserestart")
    val srv = new SseTestServer
    try {
      def stream = {
        val spec = graft.model.QuerySpec(
          name = "sse_replay", chain = "ethereum", mode = graft.model.Mode.Realtime,
          globalEvents = Seq(graft.model.EventSpec("error", Seq("value"))),
          saves = Seq("blocknumber" -> col("blocknumber"), "value" -> col("value")))
        Compiler.compile(spark, sf, spec)
      }
      val expect = Tables.events(spark, sf).where(col("event_type") === "error").count()
      Sinks.sseStream(stream, "localhost", srv.port, s"$out/ck1", bounded = true)
        .awaitTermination()
      srv.awaitFrames(expect)
      assert(srv.received.size() == expect, s"got ${srv.received.size()}, want $expect")
      import scala.jdk.CollectionConverters._
      val firstIds = srv.ids.asScala.toVector
      assert(firstIds.forall(_.matches("\\d+-\\d+-\\d+")), s"missing/odd ids: ${firstIds.take(3)}")
      assert(firstIds.distinct.size == firstIds.size, "ids must be unique within a run")
      // (1) restart from the SAME checkpoint: nothing re-emitted
      Sinks.sseStream(stream, "localhost", srv.port, s"$out/ck1", bounded = true)
        .awaitTermination()
      Thread.sleep(1500) // would-be duplicates need time to arrive
      assert(srv.received.size() == expect,
        s"restart from committed checkpoint re-emitted frames: ${srv.received.size()} != $expect")
      // (2) replay from a FRESH checkpoint: same frames, SAME ids
      Sinks.sseStream(stream, "localhost", srv.port, s"$out/ck2", bounded = true)
        .awaitTermination()
      srv.awaitFrames(2 * expect)
      assert(srv.received.size() == 2 * expect)
      val replayIds = srv.ids.asScala.drop(firstIds.size).toVector
      assert(replayIds.sorted == firstIds.sorted,
        "replayed frames must reuse the same ids for consumer dedup")
      // consumer-side dedup by (id, payload) converges to exactly one copy
      val byId = srv.ids.asScala.zip(srv.received.asScala).toMap
      assert(byId.size == expect)
    } finally srv.stop()
  }

  test("R8 streaming demux to SQL: one table per realtime query (output.go:82-104 contract)") {
    val out = tmp("sjdbc")
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val url = "jdbc:derby:memory:graftstream;create=true"
    def spec(name: String, sig: String) = graft.model.QuerySpec(
      name = name, chain = "ethereum", mode = graft.model.Mode.Realtime,
      globalEvents = Seq(graft.model.EventSpec(sig, Seq("value"))),
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "value" -> col("value")))
    // "0-rt_purchases" is the loop-expansion naming shape (item-name) — not
    // a bare SQL identifier; the sink must quote it per the target dialect
    val compiled = Map(
      "0-rt_purchases" -> Compiler.compile(spark, sf, spec("0-rt_purchases", "purchase")),
      "rt_tbl_clicks" -> Compiler.compile(spark, sf, spec("rt_tbl_clicks", "click")))
    val q = Sinks.demuxJdbcStream(
      Compiler.demux(compiled), url, props, s"$out/ckpt", bounded = true)
    q.awaitTermination()
    val ev = Tables.events(spark, sf)
    val quoted = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier("0-rt_purchases")
    assert(spark.read.jdbc(url, quoted, props).count() ==
      ev.where(col("event_type") === "purchase").count())
    assert(spark.read.jdbc(url, "rt_tbl_clicks", props).count() ==
      ev.where(col("event_type") === "click").count())
    // the demux column does not leak into the tables
    assert(!spark.read.jdbc(url, "rt_tbl_clicks", props).columns.contains("query_name"))
  }

  test("streaming foreachBatch sink is checkpointed (exactly-once beyond the reference)") {
    val out = tmp("stream")
    val target = s"$out/rows"
    val q = Streams.eventStream(spark, sf, Some("purchase"))
      .writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(target)
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamedCount = spark.read.parquet(target).count()
    assert(streamedCount ==
      Tables.events(spark, sf).where(col("event_type") === "purchase").count())
    // checkpoint exists and pins the source offset
    assert(new java.io.File(s"$out/ckpt/offsets").listFiles().nonEmpty)
  }

  // -------------------------------------------------------------------
  // K3 "generalized SQL output" (reference ROADMAP.md:76 — MySQL / SQL
  // Server): the sandbox ships exactly ONE embedded engine (Derby), so a
  // second LIVE engine cannot be exercised offline. The dialect seam is
  // proven instead: the upsert statement generator is driven through
  // Spark's own JdbcDialect registry with a RECORDING java.sql connection
  // under both ANSI-double-quote (Derby/default) and MySQL-backtick
  // quoting, asserting the exact SQL text, the IS-NULL-masked delete
  // variants, and the batch/commit shape — everything that differs per
  // dialect, against the same code path the live-Derby tests execute.
  // -------------------------------------------------------------------

  /** java.sql.Connection proxy that records prepared SQL + batch counts. */
  private class RecordingConn {
    val prepared = scala.collection.mutable.ArrayBuffer.empty[String]
    val batches = scala.collection.mutable.Map.empty[String, Int]
    val params = scala.collection.mutable.Map.empty[String, List[List[Any]]]

    private def psFor(sql: String): java.sql.PreparedStatement = {
      var cur = scala.collection.mutable.ListBuffer.empty[(Int, Any)]
      java.lang.reflect.Proxy.newProxyInstance(
        getClass.getClassLoader, Array(classOf[java.sql.PreparedStatement]),
        (_, m, args) => m.getName match {
          case "setObject" =>
            cur += ((args(0).asInstanceOf[Int], args(1))); null
          case "addBatch" =>
            batches(sql) = batches.getOrElse(sql, 0) + 1
            params(sql) = params.getOrElse(sql, Nil) :+ cur.sortBy(_._1).map(_._2).toList
            cur = scala.collection.mutable.ListBuffer.empty[(Int, Any)]
            null
          case "executeBatch" => Array.empty[Int]
          case "close" => null
          case other => throw new UnsupportedOperationException(other)
        }).asInstanceOf[java.sql.PreparedStatement]
    }

    val conn: java.sql.Connection = java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      (_, m, args) => m.getName match {
        case "prepareStatement" =>
          val sql = args(0).asInstanceOf[String]
          prepared += sql
          psFor(sql)
        case "close" | "commit" | "setAutoCommit" => null
        case other => throw new UnsupportedOperationException(other)
      }).asInstanceOf[java.sql.Connection]
  }

  test("K3 upsert generation is dialect-generic: ANSI quotes vs MySQL backticks (ROADMAP.md:76)") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    import spark.implicits._
    val rows = Seq[(java.lang.Long, String, java.lang.Long)](
      (1L, "a", 10L), (null, "b", 20L), (2L, null, 30L))
      .toDF("group-key", "label", "n").collect()
    val cols = Seq("group-key", "label", "n")
    val keys = Seq("group-key", "label")
    // the same registry resolution the live sink performs
    val ansi = JdbcDialects.get("jdbc:derby:memory:x").quoteIdentifier _
    val mysql = JdbcDialects.get("jdbc:mysql://host/db").quoteIdentifier _
    assert(ansi("group-key") == "\"group-key\"")
    assert(mysql("group-key") == "`group-key`")

    val rc1 = new RecordingConn
    Sinks.upsertInto(rc1.conn, cols, rows, keys, "\"0-agg\"", ansi)
    val rc2 = new RecordingConn
    Sinks.upsertInto(rc2.conn, cols, rows, keys, "`0-agg`", mysql)

    // exact statement text per dialect: quoted insert column list...
    assert(rc1.prepared.contains(
      """INSERT INTO "0-agg" ("group-key", "label", "n") VALUES (?, ?, ?)"""))
    assert(rc2.prepared.contains(
      "INSERT INTO `0-agg` (`group-key`, `label`, `n`) VALUES (?, ?, ?)"))
    // ...and one DELETE variant per observed null-mask, IS NULL where the
    // key is null (k = NULL never matches in ANY dialect)
    assert(rc1.prepared.contains(
      """DELETE FROM "0-agg" WHERE "group-key" = ? AND "label" = ?"""))
    assert(rc1.prepared.contains(
      """DELETE FROM "0-agg" WHERE "group-key" IS NULL AND "label" = ?"""))
    assert(rc1.prepared.contains(
      """DELETE FROM "0-agg" WHERE "group-key" = ? AND "label" IS NULL"""))
    assert(rc2.prepared.contains(
      "DELETE FROM `0-agg` WHERE `group-key` = ? AND `label` IS NULL"))
    // batch shape: 3 inserts, and each delete variant batched once
    assert(rc1.batches.filter(_._1.startsWith("INSERT")).values.sum == 3)
    assert(rc1.batches.filter(_._1.startsWith("DELETE")).values.sum == 3)
    // non-null key params bound in key order, null keys skipped
    assert(rc1.params("""DELETE FROM "0-agg" WHERE "group-key" IS NULL AND "label" = ?""")
      == List(List("b")))
    assert(rc1.params("""DELETE FROM "0-agg" WHERE "group-key" = ? AND "label" IS NULL""")
      == List(List(2L)))
  }

  test("K3 upsert: a mid-batch failure ROLLS BACK explicitly before close (r14)") {
    // close() with an open transaction is driver-DEFINED (some engines
    // commit!), so a failed batch without an explicit rollback could land
    // PARTIALLY — half its groups replaced, half stale — and Derby (which
    // happens to roll back on close) would never show it. The transaction
    // wrapper must call rollback() before the connection closes, never
    // commit(), and surface the original failure.
    import spark.implicits._
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val failingPs: java.sql.PreparedStatement =
      java.lang.reflect.Proxy.newProxyInstance(
        getClass.getClassLoader, Array(classOf[java.sql.PreparedStatement]),
        (_, m, _) => m.getName match {
          case "setObject" | "addBatch" | "close" => null
          case "executeBatch" => throw new java.sql.SQLException("disk full mid-batch")
          case other => throw new UnsupportedOperationException(other)
        }).asInstanceOf[java.sql.PreparedStatement]
    val conn: java.sql.Connection = java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      (_, m, _) => m.getName match {
        case "prepareStatement" => failingPs
        case n @ ("setAutoCommit" | "commit" | "rollback" | "close") => calls += n; null
        case other => throw new UnsupportedOperationException(other)
      }).asInstanceOf[java.sql.Connection]
    val rows = Seq((1L, 10L)).toDF("k", "n").collect()
    val e = intercept[java.sql.SQLException] {
      Sinks.upsertTxn(conn, Seq("k", "n"), rows, Seq("k"), "\"t\"", s => s""""$s"""")
    }
    assert(e.getMessage.contains("disk full"), e.getMessage)
    assert(calls.contains("rollback"),
      s"the failed transaction must roll back explicitly, got calls: $calls")
    assert(!calls.contains("commit"),
      s"a failed batch must never commit, got calls: $calls")
  }
}
