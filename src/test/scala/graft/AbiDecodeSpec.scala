package graft

import graft.functions.Evm
import graft.model.{AbiEvent, AbiInput, AbiSchema}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** R1/R2 decode parity against hand-built ABI-encoded fixtures matching the
  * reference's erc20/unipair test ABIs (test/erc20.abi.json,
  * test/unipair.abi.json). */
class AbiDecodeSpec extends SparkSpec {

  private def pad64(hex: String): String = ("0" * (64 - hex.length)) + hex

  test("Evm.uint decodes 32-byte words, nulls beyond 38 digits") {
    import spark.implicits._
    val oneEth = pad64(BigInt("1000000000000000000").toString(16)) // 1e18
    val big = "f" * 64 // uint256 max — 78 digits, exceeds Decimal(38)
    val got = Seq(oneEth, big, "0x" + oneEth).toDF("w")
      .select(Evm.uint(col("w")).as("v")).collect()
    assert(got(0).getDecimal(0).toBigInteger == new java.math.BigInteger("1000000000000000000"))
    assert(got(1).isNullAt(0))
    assert(got(2).getDecimal(0).toBigInteger == new java.math.BigInteger("1000000000000000000"))
  }

  test("Evm.uintHex keeps full 256-bit fidelity where uint nulls out (cty string path)") {
    import spark.implicits._
    val w255 = "8" + "0" * 63 // 2^255 — 77 decimal digits, far past Decimal(38)
    val max = "f" * 64 // uint256 max
    val got = Seq(w255, "0x" + max, "00ff", "0" * 64).toDF("w")
      .select(Evm.uintHex(col("w")).as("h"), Evm.uint(col("w")).as("d")).collect()
    assert(got(0).getString(0) == "0x" + w255.dropWhile(_ == '0'))
    assert(BigInt(got(0).getString(0).drop(2), 16) == BigInt(2).pow(255))
    assert(got(0).isNullAt(1)) // the decimal path nulls — the hex survives
    assert(got(1).getString(0) == "0x" + max)
    assert(BigInt(got(1).getString(0).drop(2), 16) == BigInt(2).pow(256) - 1)
    assert(got(2).getString(0) == "0xff") // left-pad path + canonicalization
    assert(got(3).getString(0) == "0x0") // zero keeps one digit
  }

  test("Evm.int decodes two's complement negatives") {
    import spark.implicits._
    val minusTwo = "f" * 63 + "e"
    val got = Seq(minusTwo).toDF("w").select(Evm.int(col("w"))).head()
    assert(got.getDecimal(0).toBigInteger.longValue == -2L)
  }

  test("Evm.address takes the low 20 bytes, lowercased, like events.go:447-450") {
    import spark.implicits._
    val topic = pad64("C02AAA39B223FE8D0A0E5C4F27EAD9083C756CC2".toLowerCase)
    val got = Seq(topic.toUpperCase).toDF("w").select(Evm.address(col("w"))).head().getString(0)
    assert(got == "0xc02aaa39b223fe8d0a0e5c4f27ead9083c756cc2")
  }

  test("Evm decoders left-pad short words (events.go:451-456 semantics)") {
    import spark.implicits._
    val got = Seq("ff").toDF("w").select(Evm.uint(col("w"))).head().getDecimal(0)
    assert(got.toBigInteger.intValue == 255)
  }

  test("encodeUint round-trips values beyond Long.MaxValue (arbitrary precision)") {
    import spark.implicits._
    // 12.3e18 wei ≫ 2^63 — the old hex()-based encode narrowed to LONG and
    // produced null calldata for every real token amount.
    val big = "12300000000000000000"
    val got = Seq(big).toDF("v")
      .select(Evm.encodeUint(col("v").cast("decimal(38,0)")).as("w"))
      .select(col("w"), Evm.uint(col("w")).cast("string").as("back"))
      .head()
    assert(got.getString(0).length == 64)
    assert(got.getString(0) == pad64(BigInt(big).toString(16)))
    assert(got.getString(1) == big)
    // negative values are outside the uint domain → null word
    val neg = Seq("-1").toDF("v")
      .select(Evm.encodeUint(col("v").cast("decimal(38,0)"))).head()
    assert(neg.isNullAt(0))
  }

  test("AbiSchema parses events and maps types per generate/utils.go:19-50") {
    val abi =
      """[
        |  {"type":"event","name":"Transfer","inputs":[
        |    {"name":"from","type":"address","indexed":true},
        |    {"name":"to","type":"address","indexed":true},
        |    {"name":"value","type":"uint256","indexed":false}]},
        |  {"type":"function","name":"balanceOf","inputs":[{"name":"owner","type":"address"}]}
        |]""".stripMargin
    val events = AbiSchema.parse(abi)
    assert(events.map(_.name) == Seq("Transfer"))
    val t = events.head
    assert(t.structType == StructType(Seq(
      StructField("from", StringType), StructField("to", StringType),
      StructField("value", DecimalType(38, 0)))))
  }

  test("decodeLog unpacks an ERC20 Transfer: indexed topics + data word") {
    import spark.implicits._
    val from = pad64("1111111111111111111111111111111111111111")
    val to = pad64("2222222222222222222222222222222222222222")
    val value = pad64(BigInt(123456789L).toString(16))
    val df = Seq((Array("0xsig", from, to), "0x" + value)).toDF("topics", "data")
    val ev = AbiEvent("Transfer", Seq(
      AbiInput("from", "address", indexed = true),
      AbiInput("to", "address", indexed = true),
      AbiInput("value", "uint256", indexed = false)))
    val got = ev.decodeLog(df, "topics", "data").select("from", "to", "value").head()
    assert(got.getString(0) == "0x1111111111111111111111111111111111111111")
    assert(got.getString(1) == "0x2222222222222222222222222222222222222222")
    assert(got.getDecimal(2).toBigInteger.longValue == 123456789L)
  }

  test("decodeLog unpacks a unipair Swap: 2 indexed + 4 data words in order") {
    import spark.implicits._
    val sender = pad64("3333333333333333333333333333333333333333")
    val toAddr = pad64("4444444444444444444444444444444444444444")
    val amounts = Seq(10L, 0L, 0L, 42L).map(v => pad64(BigInt(v).toString(16)))
    val df = Seq((Array("0xsig", sender, toAddr), amounts.mkString))
      .toDF("topics", "data")
    val ev = AbiEvent("Swap", Seq(
      AbiInput("sender", "address", indexed = true),
      AbiInput("amount0In", "uint256", indexed = false),
      AbiInput("amount1In", "uint256", indexed = false),
      AbiInput("amount0Out", "uint256", indexed = false),
      AbiInput("amount1Out", "uint256", indexed = false),
      AbiInput("to", "address", indexed = true)))
    val got = ev.decodeLog(df, "topics", "data")
      .select("sender", "amount0In", "amount1In", "amount0Out", "amount1Out", "to").head()
    assert(got.getString(0) == "0x3333333333333333333333333333333333333333")
    assert(got.getDecimal(1).toBigInteger.longValue == 10L)
    assert(got.getDecimal(2).toBigInteger.longValue == 0L)
    assert(got.getDecimal(3).toBigInteger.longValue == 0L)
    assert(got.getDecimal(4).toBigInteger.longValue == 42L)
    assert(got.getString(5) == "0x4444444444444444444444444444444444444444")
  }

  test("parse_decimals over decoded uint mirrors the reference amount path") {
    import spark.implicits._
    val raw = pad64(BigInt("2500000000000000000").toString(16)) // 2.5e18
    val got = Seq(raw).toDF("w")
      .select(graft.engine.Functions.parseDecimals(Evm.uint(col("w")), 18).as("v"))
      .head().getDouble(0)
    assert(got == 2.5)
  }
}
