package graft

import graft.engine.Compiler
import graft.model.JsonSchema
import org.apache.spark.sql.functions._

class JsonSchemaSpec extends SparkSpec {

  private val doc =
    """{
      |  "variables": {"min_amount": "0"},
      |  "loop": ["ethereum", "arbitrum"],
      |  "queries": [{
      |    "name": "swaps",
      |    "chain": "${item}",
      |    "events": [{"signature": "purchase", "outputs": ["value"]}],
      |    "contracts": [1, 2, 3, 5, 8],
      |    "start_time": "2024-01-05", "end_time": "2024-01-25",
      |    "transforms": {"amount": "value / 100.0"},
      |    "filters": ["amount != ${min_amount}"],
      |    "saves": {"chain": "chain", "block": "blocknumber", "amount": "amount"}
      |  }]
      |}""".stripMargin

  test("JSON schema → loop-expanded QuerySpecs with substituted variables") {
    val schema = JsonSchema.parse(doc)
    schema.validate()
    assert(schema.queries.map(_.name) == Seq("0-swaps", "1-swaps"))
    assert(schema.queries.map(_.chain) == Seq("ethereum", "arbitrum"))
    assert(schema.queries.head.contracts.map(_.address) == Seq(1L, 2L, 3L, 5L, 8L))
    assert(schema.queries.head.startTime.contains("2024-01-05"))
  }

  test("compiled JSON schema equals the hand-built pipeline") {
    val schema = JsonSchema.parse(doc)
    val compiled = Compiler.compile(spark, sf, schema.queries.head)
    val manual = Tables.events(spark, sf)
      .where(col("user_id").isin(1L, 2L, 3L, 5L, 8L) && col("event_type") === "purchase" &&
        col("ts") >= to_timestamp(lit("2024-01-05")) && col("ts") < to_timestamp(lit("2024-01-25")))
      .withColumn("amount", col("value") / 100.0)
      .where(col("amount") =!= 0)
      .select(lit("ethereum").as("chain"), col("event_id").as("block"), col("amount"))
    assert(compiled.columns.toSeq == Seq("chain", "block", "amount"))
    assert(compiled.count() == manual.count())
    assert(compiled.except(manual).count() == 0)
  }

  test("global-event query when no contracts are declared") {
    val schema = JsonSchema.parse(
      """{"queries":[{"name":"g","chain":"eth",
        |  "events":[{"signature":"view","outputs":["value"]}],
        |  "saves":{"block":"blocknumber","v":"value"}}]}""".stripMargin)
    val df = Compiler.compile(spark, sf, schema.queries.head)
    assert(df.count() ==
      Tables.events(spark, sf).where(col("event_type") === "view").count())
  }
}
