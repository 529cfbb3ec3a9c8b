package graft

import graft.engine.{Errors, Metrics, Sinks}
import graft.functions.Evm
import org.apache.spark.sql.functions._

/** §2.5 infrastructure behaviors: errors-as-data, telemetry, K4 json sink,
  * R2 call-input packing. */
class InfraSpec extends SparkSpec {

  test("R2: call-input packing matches the reference word layout (callmsg.go:19-54)") {
    import spark.implicits._
    val df = Seq(("0xC02aaA39b223FE8D0A0e5C4F27eAD9083C756Cc2", 12345L)).toDF("owner", "amount")
    val got = df.select(Evm.callData("0x70a08231",
      Evm.encodeAddress(col("owner")), Evm.encodeUint(col("amount"))).as("calldata"))
      .head().getString(0)
    assert(got == "0x70a08231" +
      "000000000000000000000000c02aaa39b223fe8d0a0e5c4f27ead9083c756cc2" +
      "0000000000000000000000000000000000000000000000000000000000003039")
    // round-trip through the decoders
    val decoded = Seq((got.substring(10, 74), got.substring(74))).toDF("w1", "w2")
      .select(Evm.address(col("w1")).as("a"), Evm.uint(col("w2")).as("v")).head()
    assert(decoded.getString(0) == "0xc02aaa39b223fe8d0a0e5c4f27ead9083c756cc2")
    assert(decoded.getDecimal(1).longValue == 12345L)
  }

  test("errors flow as data and split to a dead-letter side (types.go:40 semantics)") {
    import spark.implicits._
    val overflow = "f" * 64 // uint256 max: 78 digits, exceeds Decimal(38) → null
    val df = Seq(("ff", 1L), (overflow, 2L), (null: String, 3L)).toDF("word", "id")
    val parsed = Errors.withTagged(df, "v", Evm.uint(col("word")), col("word"))
    val (clean, dead) = Errors.deadLetterSplit(parsed)
    assert(clean.count() == 2) // "ff" decodes; null input passes through clean
    assert(dead.count() == 1)
    val d = dead.head()
    assert(d.getAs[String]("err").contains("decode failed"))
    assert(d.getLong(d.fieldIndex("id")) == 2L)
  }

  test("metrics listener records per-action wall time + rows (chainservice.go:293-307)") {
    val l = Metrics.install(spark)
    val n = Tables.region(spark, sf).count()
    // listener delivery is async; poll briefly
    var tries = 0
    while (l.snapshot().isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
    val snap = l.snapshot()
    assert(snap.nonEmpty)
    assert(snap.exists(_.action == "count"))
    assert(l.dump().contains("count"))
    assert(n == 5)
  }

  test("K4 json sink round-trips rows") {
    val out = java.nio.file.Files.createTempDirectory("json").toString
    val df = Tables.region(spark, sf)
    Sinks.json(df, s"$out/region")
    val back = spark.read.json(s"$out/region")
    assert(back.count() == df.count())
  }
}
