package graft.engine

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch sources (SURVEY §2.1 S1/S2/S5/S9).
  *
  * The testbed stand-in for the EVM log store is the `events` parquet table
  * (FIXTURES.md §C): event_type ≙ event signature (topic0), user_id ≙
  * contract address, event_id ≙ block number (monotone in ts), ts ≙ block
  * timestamp. All predicates here are plain Catalyst filters so they reach
  * the parquet reader as PushedFilters — the analogue of the reference
  * pushing address+topic0 into `eth_getLogs`
  * (/root/reference/chainservice/events.go:39,65).
  */
object Sources {

  /** S1 — historical contract-event scan: address-set + signature filter.
    * Reference: ChainService.FilterEvents, chainservice/events.go:23-118.
    */
  def contractEvents(
      spark: SparkSession,
      sfDir: String,
      addresses: Seq[Long],
      signature: String,
      startTime: Option[String] = None,
      endTime: Option[String] = None,
  ): DataFrame = {
    val base = Tables.events(spark, sfDir)
      .where(col("user_id").isin(addresses: _*) && col("event_type") === signature)
    timeBound(base, startTime, endTime)
  }

  /** S2 — historical global-event scan: signature only, no address filter.
    * Reference: FilterGlobalEvents, chainservice/events.go:121-216.
    */
  def globalEvents(
      spark: SparkSession,
      sfDir: String,
      signature: String,
      startTime: Option[String] = None,
      endTime: Option[String] = None,
  ): DataFrame =
    timeBound(
      Tables.events(spark, sfDir).where(col("event_type") === signature),
      startTime,
      endTime)

  private def timeBound(df: DataFrame, start: Option[String], end: Option[String]): DataFrame = {
    val s = start.map(t => col("ts") >= to_timestamp(lit(t))).getOrElse(lit(true))
    val e = end.map(t => col("ts") < to_timestamp(lit(t))).getOrElse(lit(true))
    df.where(s && e)
  }

  /** S5 — the sampling grid for historical method time-series: one row per
    * (sample time, contract address). The reference generates block numbers
    * `for i := start; i < end; i += interval` (chainservice.go:180-188) and
    * `eth_call`s each contract at each block; here the grid is generated
    * distributed (`sequence` + explode — no driver loop, no collect) and the
    * "call" is an as-of join against the state table (see [[Enrich.asOfJoin]]).
    *
    * Scale note: the grid is tiny relative to the fact table (samples ×
    * contracts), so it is always the broadcast/left side; the heavy side
    * shuffles once by contract key inside the as-of join.
    */
  def sampleGrid(
      spark: SparkSession,
      startTime: String,
      endTime: String, // inclusive
      intervalSeconds: Long,
      addresses: DataFrame, // one column: address
  ): DataFrame = {
    val ticks = spark.range(1)
      .select(explode(sequence(
        to_timestamp(lit(startTime)),
        to_timestamp(lit(endTime)),
        expr(s"interval $intervalSeconds seconds"))).as("sample_ts"))
    ticks.crossJoin(addresses)
  }

  /** S9 — BlockDater: timestamp → first block at-or-after it. The reference
    * binary-searches headers over RPC (chainservice/block_dater.go:48-79);
    * here one aggregate pass over the events table answers every target at
    * once (event_id is monotone in ts, so min(event_id | ts >= target) is the
    * first block). Targets are a tiny literal relation → broadcast cross.
    */
  def blockDater(events: DataFrame, targets: Seq[String]): DataFrame = {
    val t = events.sparkSession
      .createDataFrame(targets.map(Tuple1(_))).toDF("target")
      .select(to_timestamp(col("target")).as("target_ts"))
    events.join(broadcast(t), col("ts") >= col("target_ts"))
      .groupBy(col("target_ts"))
      .agg(min(col("event_id")).as("first_block"))
  }
}
