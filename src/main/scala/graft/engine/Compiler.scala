package graft.engine

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compiles a [[graft.model.QuerySpec]] into a DataFrame pipeline:
  *
  *   source → withColumns(transforms) → filter(AND preds) → select(saves)
  *
  * This is the reference's whole per-row driver loop
  * (/root/reference/main.go:173-193 + dsl/schema.go:174-211) pushed into
  * Catalyst: transforms/filters/saves become plan expressions, so they run
  * distributed under whole-stage codegen and filters can be pushed down into
  * the scan instead of being evaluated after collection.
  */
object Compiler {

  /** Compile one query against the testbed event store. */
  def compile(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    q.validate()
    val sourced = eventSource(spark, sfDir, q)
      .withColumn("chain", lit(q.chain))
      .withColumn("blocknumber", col("event_id"))
      .withColumn("timestamp", unix_timestamp(col("ts")))
    val transformed = q.transforms.foldLeft(sourced) { case (df, (name, e)) =>
      df.withColumn(name, e)
    }
    val filtered = transformed.where(Functions.allOf(q.filters))
    filtered.select(q.saves.map { case (name, e) => e.as(name) }: _*)
  }

  /** Compile every query of a schema, keyed like the reference keys its
    * per-query channels (chainservice.go:127-131). */
  def compileAll(spark: SparkSession, sfDir: String, schema: SchemaSpec): Map[String, DataFrame] = {
    schema.validate()
    schema.queries.map(q => q.name -> compile(spark, sfDir, q)).toMap
  }

  /** R8 — per-query demux as data: one unioned frame tagged with query_name,
    * ready for `write.partitionBy("query_name")` (one output dir per query,
    * the Spark analogue of the reference's per-query channels/sinks).
    */
  def demux(compiled: Map[String, DataFrame]): DataFrame =
    compiled.toSeq.sortBy(_._1).map { case (name, df) =>
      // Demuxed queries share a sink ⇒ align on the union of columns.
      df.withColumn("query_name", lit(name))
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

  private def eventSource(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    // Contracts declaring the same event signature share ONE scan with an
    // address-set predicate (pushed into the reader), instead of a scan per
    // contract — the reference batches the same way by passing all addresses
    // in a single eth_getLogs filter (chainservice/events.go:39).
    val bySignature = q.contracts
      .flatMap(c => c.events.map(ev => ev.signature -> c.address))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
    val scans =
      q.globalEvents.map(ev =>
        Sources.globalEvents(spark, sfDir, ev.signature, q.startTime, q.endTime)) ++
        bySignature.map { case (sig, addrs) =>
          Sources.contractEvents(spark, sfDir, addrs, sig, q.startTime, q.endTime)
        }
    require(scans.nonEmpty, s"query ${q.name}: no event source declared")
    scans.reduce(_ unionByName _)
  }
}
