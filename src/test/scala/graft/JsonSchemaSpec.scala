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

  test("object loop items bind ${item.attr}; object variables bind ${name.attr}") {
    val schema = JsonSchema.parse(
      """{
        |  "variables": {"net": {"min_value": 10}, "top": 3},
        |  "loop": [
        |    {"chain": "ethereum", "sig": "purchase", "addr": "5"},
        |    {"chain": "arbitrum", "sig": "click", "addr": "8"}
        |  ],
        |  "queries": [{
        |    "name": "evts", "chain": "${item.chain}",
        |    "contracts": ["${item.addr}"],
        |    "events": [{"signature": "${item.sig}", "outputs": ["value"]}],
        |    "filters": ["value >= ${net.min_value}", "user_id <= ${top} + 10"],
        |    "saves": {"chain": "chain", "block": "blocknumber", "v": "value"}
        |  }]
        |}""".stripMargin)
    assert(schema.queries.map(_.name) == Seq("0-evts", "1-evts"))
    assert(schema.queries.map(_.chain) == Seq("ethereum", "arbitrum"))
    assert(schema.queries.map(_.contracts.map(_.address)) == Seq(Seq(5L), Seq(8L)))
    assert(schema.queries.head.contracts.head.events.head.signature == "purchase")
    val df = Compiler.compile(spark, sf, schema.queries.head)
    val manual = Tables.events(spark, sf)
      .where(col("user_id") === 5L && col("event_type") === "purchase" &&
        col("value") >= 10 && col("user_id") <= 13)
    assert(df.count() == manual.count())
  }

  test("event-triggered method with block_offset parses and compiles (S7)") {
    val schema = JsonSchema.parse(
      """{"queries":[{"name":"m","chain":"eth",
        |  "contracts": [1, 2, 3, 5, 8],
        |  "events":[{"signature":"purchase","outputs":["value"],
        |    "methods":[{"name":"click","outputs":["value"],"block_offset":-1}]}],
        |  "saves":{"block":"blocknumber","v":"value","cv":"click_value"}}]}""".stripMargin)
    val m = schema.queries.head.contracts.head.events.head.methods.head
    assert(m.name == "click" && m.blockOffset == -1L && m.outputs == Seq("value"))
    val df = Compiler.compile(spark, sf, schema.queries.head)
    assert(df.columns.toSeq == Seq("block", "v", "cv"))
    // offset -1: a click at the event's own block must NOT be visible; the
    // compiled frame equals the window formulation over prior blocks.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val manual = Tables.events(spark, sf)
      .where(col("user_id").isin(1L, 2L, 3L, 5L, 8L))
      .withColumn("cv",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("block"), col("value").as("v"), col("cv"))
    assert(df.count() == manual.count() && df.count() > 0)
    assert(df.except(manual).count() == 0)
  }

  test("event methods fire only for the triggering event's rows (events.go:93-105)") {
    val schema = JsonSchema.parse(
      """{"queries":[{"name":"m2","chain":"eth",
        |  "contracts": [1, 2, 3, 5, 8],
        |  "events":[
        |    {"signature":"purchase","outputs":["value"],
        |     "methods":[{"name":"click","outputs":["value"]}]},
        |    {"signature":"view","outputs":["value"]}],
        |  "saves":{"et":"event_type","block":"blocknumber","cv":"click_value"}}]}""".stripMargin)
    val df = Compiler.compile(spark, sf, schema.queries.head)
    // view rows must NOT carry method outputs — the method is declared under
    // the purchase event only.
    assert(df.where(col("et") === "view" && col("cv").isNotNull).count() == 0)
    assert(df.where(col("et") === "purchase" && col("cv").isNotNull).count() > 0)
  }

  test("duplicate method names with different specs are rejected, not silently merged") {
    val schema = JsonSchema.parse(
      """{"queries":[{"name":"dup","chain":"eth",
        |  "contracts": [1],
        |  "events":[
        |    {"signature":"purchase","outputs":["value"],
        |     "methods":[{"name":"click","outputs":["value"],"block_offset":0}]},
        |    {"signature":"view","outputs":["value"],
        |     "methods":[{"name":"click","outputs":["value"],"block_offset":-1}]}],
        |  "saves":{"block":"blocknumber","cv":"click_value"}}]}""".stripMargin)
    val e = intercept[IllegalArgumentException](Compiler.compile(spark, sf, schema.queries.head))
    assert(e.getMessage.contains("click"))
  }

  test("contract method block + block_interval parses to the grid plan (S5)") {
    val schema = JsonSchema.parse(
      """{"queries":[{"name":"g","chain":"eth",
        |  "contracts": [0, 1, 2],
        |  "methods":[{"name":"purchase","outputs":["value"]}],
        |  "block_interval": 86400,
        |  "start_time": "2024-01-01", "end_time": "2024-01-10",
        |  "saves":{"t":"sample_ts","c":"user_id","v":"purchase_value"}}]}""".stripMargin)
    schema.validate()
    val df = Compiler.compile(spark, sf, schema.queries.head)
    assert(df.columns.toSeq == Seq("t", "c", "v"))
    assert(df.count() == 10 * 3) // 10 daily ticks (inclusive) x 3 contracts
  }

  test("contract objects with scoped transforms parse and apply per contract") {
    val schema = JsonSchema.parse(
      """{"queries":[{"name":"ct","chain":"eth",
        |  "contracts": [
        |    {"address": 1, "transforms": {"amount": "value / 100.0"}},
        |    {"address": 2, "transforms": {"amount": "value / 1000.0"}},
        |    3],
        |  "events":[{"signature":"purchase","outputs":["value"]}],
        |  "saves":{"c":"user_id","v":"value","amount":"amount"}}]}""".stripMargin)
    val specs = schema.queries.head.contracts
    assert(specs.map(_.address) == Seq(1L, 2L, 3L))
    assert(specs(0).transforms.map(_._1) == Seq("amount") && specs(2).transforms.isEmpty)
    val df = Compiler.compile(spark, sf, schema.queries.head)
    val rows = df.where(col("v") =!= 0).groupBy("c")
      .agg(max(col("amount") / col("v")).as("ratio")).collect()
      .map(r => r.getAs[Long]("c") -> r.getAs[Double]("ratio")).toMap
    assert(math.abs(rows(1L) - 0.01) < 1e-12)
    assert(math.abs(rows(2L) - 0.001) < 1e-12)
    assert(rows.get(3L).forall(_ == null.asInstanceOf[Double]) || df.where(col("c") === 3 && col("amount").isNotNull).count() == 0)
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

  test("contract objects with their OWN events scope per contract (r4 JSON dialect)") {
    val doc =
      """{
        |  "queries": [{
        |    "name": "scoped",
        |    "chain": "ethereum",
        |    "contracts": [
        |      {"address": 1, "events": [{"signature": "purchase", "outputs": ["value"]}]},
        |      {"address": 2, "events": [{"signature": "click", "outputs": ["value"]}]},
        |      3
        |    ],
        |    "events": [{"signature": "view", "outputs": ["value"]}],
        |    "saves": {"blocknumber": "blocknumber", "contract": "user_id", "sig": "event_type"}
        |  }]
        |}""".stripMargin
    val q = JsonSchema.parse(doc).queries.head
    // own events stay scoped; the bare contract falls back to the query list
    assert(q.contracts.map(c => c.address -> c.events.map(_.signature)) ==
      Seq(1L -> Seq("purchase"), 2L -> Seq("click"), 3L -> Seq("view")))
    val got = Compiler.compile(spark, sf, q)
    val ev = Tables.events(spark, sf)
    val expected =
      ev.where(col("user_id") === 1 && col("event_type") === "purchase").count() +
        ev.where(col("user_id") === 2 && col("event_type") === "click").count() +
        ev.where(col("user_id") === 3 && col("event_type") === "view").count()
    assert(got.count() == expected && expected > 0)
    assert(got.where(col("contract") === 1 && col("sig") =!= "purchase").count() == 0)
    assert(got.where(col("contract") === 3 && col("sig") =!= "view").count() == 0)
  }
}
