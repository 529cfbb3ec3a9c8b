package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Errors-as-data (SURVEY §2.5): the reference threads failures through the
  * row itself (`CallResult.Err`, /root/reference/types/types.go:40) so one
  * bad log/call never kills the pipeline — the main loop logs and skips
  * (main.go:173-177). The distributed analogue: a nullable `err` column
  * derived next to each fallible derivation, with a dead-letter split
  * instead of a log line.
  */
object Errors {

  /** Add `name` via `value` plus `err` describing why it came out null while
    * its input was present (decode failure), preserving any earlier error. */
  def withTagged(df: DataFrame, name: String, value: Column, input: Column): DataFrame = {
    val failed = value.isNull && input.isNotNull
    val tag = concat(lit(s"$name: decode failed for value "), input.cast("string"))
    val existing = if (df.columns.contains("err")) col("err") else lit(null).cast("string")
    df.withColumn(name, value)
      .withColumn("err", when(existing.isNotNull, existing).when(failed, tag))
  }

  /** Split into (clean, dead-letter) — the clean side continues the
    * pipeline, the dead-letter side goes to its own sink for inspection
    * (the `badRecordsPath` pattern). */
  def deadLetterSplit(df: DataFrame): (DataFrame, DataFrame) =
    (df.where(col("err").isNull).drop("err"), df.where(col("err").isNotNull))
}
