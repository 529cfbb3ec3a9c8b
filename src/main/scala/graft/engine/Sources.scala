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

  private[graft] def timeBound(df: DataFrame, start: Option[String], end: Option[String]): DataFrame = {
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
    // spark.range(nTicks), NOT one sequence(...) array exploded from a single
    // row: a year at 1-second cadence is a 31M-element array materialized in
    // ONE task before explode — range generates ticks split across tasks, so
    // the grid parallelizes at any cadence. Bounds are query literals, so
    // computing the tick count driver-side costs nothing.
    require(intervalSeconds > 0, s"sampleGrid: interval must be positive, got $intervalSeconds")
    val startEpoch = literalEpochSeconds(spark, startTime)
    val endEpoch = literalEpochSeconds(spark, endTime)
    require(endEpoch >= startEpoch, s"sampleGrid: end $endTime before start $startTime")
    val nTicks = (endEpoch - startEpoch) / intervalSeconds + 1
    val ticks = spark.range(0, nTicks)
      .select(timestamp_seconds(lit(startEpoch) + col("id") * intervalSeconds).as("sample_ts"))
    ticks.crossJoin(addresses)
  }

  /** Epoch seconds of a date/datetime literal — the driver-side twin of
    * `to_timestamp(lit(s))`. Accepts "yyyy-MM-dd", with optional time part
    * separated by ' ' or ISO 'T', with optional fractional seconds (truncated
    * — grid cadence is whole seconds). The offset comes from the SESSION
    * timezone (spark.sql.session.timeZone), so driver-side grid arithmetic
    * agrees with to_timestamp/timestamp_seconds rendering in any session, not
    * just UTC ones. */
  private[graft] def literalEpochSeconds(spark: SparkSession, s: String): Long = {
    import java.time.{LocalDate, LocalDateTime, ZoneId}
    val norm = s.trim.replace(' ', 'T')
    val dt =
      if (norm.contains("T")) LocalDateTime.parse(norm)
      else LocalDate.parse(norm).atStartOfDay()
    val zone = ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
    dt.atZone(zone).toEpochSecond
  }

  /** S9 — BlockDater: timestamp → first block at-or-after it. The reference
    * binary-searches headers over RPC (chainservice/block_dater.go:48-79);
    * here one conditional-aggregation pass over the events table answers
    * every target at once (event_id is monotone in ts, so
    * min(event_id | ts >= target) is the first block). No join at all —
    * targets become N aggregate expressions in a single map-side-combined
    * scan, then unpivot the one result row; targets with no block at-or-after
    * drop out (the semantics the former inner join had).
    */
  def blockDater(events: DataFrame, targets: Seq[String]): DataFrame = {
    require(targets.nonEmpty, "blockDater: at least one target timestamp required")
    // Duplicate targets collapse to one output row (the pre-r3 groupBy
    // semantics); each distinct target costs one aggregate expression, so
    // past ~64 the conditional-agg form would bloat whole-stage codegen —
    // fall back to a broadcast theta-join + hash aggregate there (matched
    // pairs stream straight into map-side partial min, never materialized).
    val distinctTargets = targets.distinct
    if (distinctTargets.size > 64) return blockDaterJoin(events, distinctTargets)
    val aggs = distinctTargets.zipWithIndex.map { case (t, i) =>
      min(when(col("ts") >= to_timestamp(lit(t)), col("event_id"))).as(s"__fb$i")
    }
    events.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(distinctTargets.zipWithIndex.map { case (t, i) =>
        struct(to_timestamp(lit(t)).as("target_ts"), col(s"__fb$i").as("first_block"))
      }: _*)).as("r"))
      .select(col("r.target_ts"), col("r.first_block"))
      .where(col("first_block").isNotNull)
  }

  /** Many-target formulation: broadcast the (small) target list, theta-join
    * `ts >= target_ts`, aggregate min(event_id) per target. O(targets) work
    * per event row either way; this form keeps the generated code constant
    * size at the cost of one (partial-aggregated) shuffle. */
  private def blockDaterJoin(events: DataFrame, targets: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    val t = spark.createDataFrame(targets.map(Tuple1(_))).toDF("__target")
      .select(to_timestamp(col("__target")).as("target_ts"))
    events.join(broadcast(t), col("ts") >= col("target_ts"))
      .groupBy("target_ts").agg(min("event_id").as("first_block"))
  }
}
