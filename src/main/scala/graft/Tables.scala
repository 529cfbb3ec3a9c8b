package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * In the reference the "source" is an EVM JSON-RPC endpoint
  * (`/root/reference/chainservice/events.go:23-118`); here every source is a
  * parquet scan so Catalyst can push filters/projections into the reader.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts has shipped in two physical layouts: TIMESTAMP(NANOS), which
    * Spark has no native type for (read as long nanos under the legacy flag
    * and truncate to microseconds — exactly what DuckDB's µs timestamps do,
    * so oracle values agree), and plain timestamp[us] with
    * isAdjustedToUTC=false, which Spark reads natively as TIMESTAMP_NTZ.
    * Both normalize to the same contract downstream code was built on:
    * `ts` is a TimestampType instant (sessions pin UTC, so the NTZ cast is
    * value-preserving and both layouts yield identical instants). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ→instant is only value-preserving when the session is UTC;
        // fail loud rather than silently shift every instant by host tz.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other " +
            "(expected TIMESTAMP(NANOS)-as-long, timestamp_ntz, or timestamp)")
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
