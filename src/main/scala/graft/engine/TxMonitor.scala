package graft.engine

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transaction + mempool monitoring — the reference's roadmap items
  * "Transaction monitoring: filter historical transactions based on certain
  * predicates: value thresholds, sender and receiver addresses, gas prices
  * and amounts, or certain method calls or inputs" and "Mempool monitoring:
  * monitor mempool transactions and save them based on a predicate. Same as
  * above." (/root/reference/ROADMAP.md:67-70 — both unimplemented there).
  *
  * The predicate classes become ONE AND-folded Catalyst filter, so the
  * declarative predicates (value bounds, sender set, method set) reach the
  * parquet reader as PushedFilters — at 100 TB the scan only decodes row
  * groups whose stats overlap the predicate. Testbed tx mapping (FIXTURES
  * §C): sender ≙ user_id, method selector ≙ event_type, value ≙ value,
  * receiver ≙ props `$.to`-style payload lookup (`$.k` here) — a live tx
  * source has `to` as a physical column, so the receiver predicate pushes
  * down too; on the testbed it evaluates post-scan (still codegen'd).
  *
  * Mempool mode is the SAME spec over the streaming source: a pending-tx
  * feed is a stream, the monitor is a per-row predicate, so micro-batches
  * filter with identical semantics — batch ≡ stream is oracle-gated
  * (`mempool_monitor` hash-matches the batch `tx_monitor` oracle).
  */
final case class TxFilterSpec(
    minValue: Option[Double] = None,  // inclusive
    maxValue: Option[Double] = None,  // exclusive
    senders: Seq[Long] = Nil,         // empty = any
    receivers: Seq[Long] = Nil,       // empty = any
    methods: Seq[String] = Nil,       // method selectors (event_type); empty = any
    inputPredicates: Seq[Column] = Nil, // "certain method calls or inputs"
) {
  /** The AND-fold of every declared predicate class (true when none). */
  def predicate: Column = {
    val all: Seq[Column] =
      minValue.map(v => col("value") >= v).toSeq ++
        maxValue.map(v => col("value") < v).toSeq ++
        (if (senders.isEmpty) Nil else Seq(col("sender").isin(senders: _*))) ++
        (if (receivers.isEmpty) Nil else Seq(col("receiver").isin(receivers: _*))) ++
        (if (methods.isEmpty) Nil else Seq(col("method").isin(methods: _*))) ++
        inputPredicates
    all.reduceOption(_ && _).getOrElse(lit(true))
  }
}

object TxMonitor {

  /** The tx view of an event frame (batch scan or stream — same columns in,
    * same columns out, so the two modes cannot drift). */
  def txView(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("block"),
      col("ts"),
      col("user_id").as("sender"),
      get_json_object(col("props"), "$.k").cast("long").as("receiver"),
      col("event_type").as("method"),
      col("value"),
      col("props"))

  /** Historical transaction monitor: one filtered scan. */
  def monitor(spark: SparkSession, sfDir: String, spec: TxFilterSpec): DataFrame =
    txView(Tables.events(spark, sfDir)).where(spec.predicate)

  /** Mempool monitor: the same predicate over the streaming source (the
    * testbed's pending-tx feed stand-in). Returns an unstarted streaming
    * frame; a live deployment writes it to a latency-appropriate sink. */
  def monitorStream(spark: SparkSession, sfDir: String, spec: TxFilterSpec): DataFrame =
    txView(graft.streaming.Streams.eventStream(spark, sfDir)).where(spec.predicate)
}
