package graft

import graft.sources.EvmLogs
import org.apache.spark.sql.functions._

/** DSv2 connector: block-range partitioning + pushdown (the S1-S4 live-source
  * contracts, with a deterministic fetch standing in for the RPC). */
class EvmLogsSourceSpec extends SparkSpec {

  private def logs(opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft.sources.EvmLogsProvider")
      .option("start", 0).option("end", 1000).option("parts", 8)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("reads the full deterministic range and matches the generator") {
    val df = logs()
    val expected = (0L until 1000L).map(EvmLogs.fetchBlockLogs(_).size).sum
    assert(df.count() == expected)
    // spot-check one block's rows against the generator
    val b42 = df.where(col("blocknumber") === 42).collect()
    val gen = EvmLogs.fetchBlockLogs(42L)
    assert(b42.length == gen.length)
    assert(b42.map(_.getAs[String]("topic")).toSet == gen.map(_._5).toSet)
  }

  test("planInputPartitions splits the block range into `parts` tasks (SmartFilterLogs chunking)") {
    assert(logs().rdd.getNumPartitions == 8)
    assert(logs(Map("parts" -> "3")).rdd.getNumPartitions == 3)
  }

  test("address + topic + block-range predicates push into the source") {
    val df = logs().where(col("topic") === "Swap" && col("address").isin(1L, 2L, 3L) &&
      col("blocknumber") >= 100 && col("blocknumber") < 200)
    // DSv2 scans render the Scan.description(): pushed predicates must have
    // reached the connector state, not remained Spark-side only
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("topic=Some(Swap)"), scanDesc)
    assert(scanDesc.contains("addresses=Some"), scanDesc)
    assert(scanDesc.contains("[100, 200)"), scanDesc)
    // results equal the generator filtered the same way
    val expected = (100L until 200L).flatMap(EvmLogs.fetchBlockLogs)
      .count { case (_, _, _, a, t, _) => t == "Swap" && Set(1L, 2L, 3L)(a) }
    assert(df.count() == expected)
  }

  test("same-column pushed predicates intersect instead of overwriting") {
    // address = 5 AND address IN (5, 6): the pushed set must be {5}, not {5,6}
    val df = logs().where(col("address") === 5L && col("address").isin(5L, 6L))
    val expected = (0L until 1000L).flatMap(EvmLogs.fetchBlockLogs)
      .count { case (_, _, _, a, _, _) => a == 5L }
    assert(df.count() == expected)
    // contradictory topics: conjunction is unsatisfiable -> empty scan
    val none = logs().where(col("topic") === "Swap" && col("topic") === "Mint")
    assert(none.count() == 0)
    // disjoint address constraints -> empty intersection -> no rows
    val disjoint = logs().where(col("address") === 5L && col("address") === 6L)
    assert(disjoint.count() == 0)
  }

  test("block-range pushdown narrows the partitions actually planned") {
    val narrow = logs().where(col("blocknumber") >= 900 && col("blocknumber") < 910)
    val expected = (900L until 910L).map(EvmLogs.fetchBlockLogs(_).size).sum
    assert(narrow.count() == expected)
  }

  test("LIMIT pushes into the source: readers stop fetching at the cap (r6)") {
    // plan side: the pushed limit reaches the connector's scan state
    val df = logs().limit(7)
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("limit=Some(7)"), scanDesc)
    assert(df.count() == 7)
    // reader side: a partition holding far more rows emits exactly the cap,
    // leaving the rest of the block range unfetched (lazy iterator)
    val part = graft.sources.EvmLogsPartition(
      from = 0L, until = 1000L, addresses = None, topic = None,
      columns = Array("blocknumber"), limit = Some(5))
    val reader = new graft.sources.EvmLogsPartitionReader(part)
    var n = 0
    while (reader.next()) n += 1
    assert(n == 5, s"reader emitted $n rows past its pushed limit")
    // no limit pushed → the same partition yields the full range
    val unlimited = new graft.sources.EvmLogsPartitionReader(part.copy(limit = None))
    var m = 0
    while (unlimited.next()) m += 1
    assert(m == (0L until 1000L).map(graft.sources.EvmLogs.fetchBlockLogs(_).size).sum)
  }

  test("column pruning reaches the reader (declared-outputs-only decode)") {
    val df = logs().select("blocknumber", "value")
    // DSv2 BatchScan lists the pruned output column set
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("BatchScan evmlogs[blocknumber#"), scan)
    assert(!scan.contains("block_hash"), scan)
    assert(df.agg(sum("value")).head().getDouble(0) > 0)
  }

  test("micro-batch stream ingests the chain by block offsets, exactly once") {
    val q = spark.readStream.format("graft.sources.EvmLogsProvider")
      .option("start", 0).option("end", 500).option("blocksPerBatch", 100)
      .load()
      .writeStream.outputMode("append").format("memory").queryName("evmstream")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("evmstream")
    val expected = (0L until 500L).map(EvmLogs.fetchBlockLogs(_).size).sum
    assert(got.count() == expected) // no duplicates, no gaps across micro-batches
    assert(got.select("blocknumber").distinct().count() == 500)
  }

  test("Trigger.AvailableNow drains the bounded backfill to `end` and terminates") {
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.format("graft.sources.EvmLogsProvider")
      .option("start", 0).option("end", 500).option("blocksPerBatch", 100)
      .load()
      .writeStream.outputMode("append").format("memory").queryName("evmavailnow")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination() // must self-terminate — that IS the assertion
    val got = spark.table("evmavailnow")
    val expected = (0L until 500L).map(EvmLogs.fetchBlockLogs(_).size).sum
    assert(got.count() == expected)
    assert(got.select("blocknumber").distinct().count() == 500)
  }

  test("checkpointed restart resumes from committed offsets — no dups, no gaps") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("evmck").toString
    // run 1 ingests blocks [0,300); run 2 is a RESTART against the same
    // checkpoint with the chain tip now at 500 — it must resume from the
    // committed offset (300), not re-ingest from initialOffset.
    def run(end: Int): Unit = {
      val q = spark.readStream.format("graft.sources.EvmLogsProvider")
        .option("start", 0).option("end", end).option("blocksPerBatch", 100)
        .load()
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ck")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run(300)
    run(500)
    val got = spark.read.parquet(s"$dir/out")
    val expected = (0L until 500L).map(EvmLogs.fetchBlockLogs(_).size).sum
    assert(got.count() == expected) // a re-ingest would double blocks [0,300)
    assert(got.select("blocknumber").distinct().count() == 500)
  }

  test("connector feeds the same pipeline shapes as the parquet path") {
    val agg = logs().where(col("topic") === "Transfer")
      .groupBy("address").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("address")).limit(5)
    assert(agg.count() == 5)
  }
}
