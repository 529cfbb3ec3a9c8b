package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EVM ABI word decoders (SURVEY §2.2 R1/R2): the reference unpacks indexed
  * topics and 32-byte data words into named columns per the event ABI
  * (HandleLog, /root/reference/chainservice/events.go:410-484; left-pads
  * short data to 64 hex chars :451-456). Here each decode is a codegen'd
  * scalar expression over a 64-hex-char word, so a log-decode projection is
  * ordinary Catalyst projection work — pruned, pushed down, whole-stage
  * compiled.
  *
  * Type mapping follows SURVEY §1.2: uint/int → DecimalType(38,0) (values
  * beyond 38 digits decode to null — the reference itself rounds through
  * big.Float → float64, so 38 exact digits exceeds its fidelity), address →
  * lowercase 0x-string, bool → boolean.
  */
object EvmKernels {

  /** Strip optional 0x prefix; left-pad to 64 chars like events.go:451-456. */
  def normalizeWord(w: UTF8String): String = {
    val s0 = w.toString
    val s = if (s0.startsWith("0x") || s0.startsWith("0X")) s0.substring(2) else s0
    if (s.length >= 64) s else ("0" * (64 - s.length)) + s
  }

  def evmAddress(w: UTF8String): UTF8String = {
    val s = normalizeWord(w)
    UTF8String.fromString("0x" + s.substring(24).toLowerCase)
  }

  def evmUint(w: UTF8String): Decimal = {
    val bi = new BigInteger(normalizeWord(w), 16)
    if (bi.toString.length > 38) null else Decimal(BigDecimal(bi), 38, 0)
  }

  def evmInt(w: UTF8String): Decimal = {
    val raw = new BigInteger(normalizeWord(w), 16)
    // two's complement over 256 bits
    val signed =
      if (raw.testBit(255)) raw.subtract(BigInteger.ONE.shiftLeft(256)) else raw
    if (signed.abs.toString.length > 38) null else Decimal(BigDecimal(signed), 38, 0)
  }

  def evmBool(w: UTF8String): Boolean =
    new BigInteger(normalizeWord(w), 16).signum() != 0

  /** Canonical hex passthrough of a uint256 word: "0x" + lowercase hex with
    * leading zeros stripped ("0x0" for zero). Values past DecimalType(38,0)
    * null out of [[evmUint]]; this companion keeps the FULL 256-bit value as
    * a string — the reference's cty path carries the number as a string end
    * to end (/root/reference/dsl/schema.go:488-512), so a >38-digit amount
    * survives there and must survive here. */
  def evmUintHex(w: UTF8String): UTF8String = {
    val s = normalizeWord(w).toLowerCase
    val t = s.dropWhile(_ == '0')
    UTF8String.fromString("0x" + (if (t.isEmpty) "0" else t))
  }

  /** ABI-encode an unsigned integer (DecimalType(38,0)) into a 64-hex word
    * via BigInteger — `hex()` would narrow through LONG and null anything
    * ≥ 2^63 (every 1e18-scaled token amount). Null for negative values
    * (uint domain) — callers use evm_int packing for signed. */
  def encodeUint(d: Decimal): UTF8String = {
    val bd = d.toJavaBigDecimal
    // null (not a crash) for fractional or negative input — the SQL-exposed
    // evm_encode_uint accepts any decimal type, uint words only encode
    // non-negative integers (same null convention as the decoders).
    if (bd.stripTrailingZeros.scale > 0 || bd.signum < 0) null
    else {
      val hex = bd.toBigInteger.toString(16)
      if (hex.length > 64) null
      else UTF8String.fromString(("0" * (64 - hex.length)) + hex)
    }
  }

  /** Word i (0-based) of a concatenated ABI data blob. */
  def evmWord(data: UTF8String, i: Int): UTF8String = {
    val s0 = data.toString
    val s = if (s0.startsWith("0x") || s0.startsWith("0X")) s0.substring(2) else s0
    val from = i * 64
    if (from + 64 > s.length) null else UTF8String.fromString(s.substring(from, from + 64))
  }
}

sealed abstract class EvmWordExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expects a hex string, got ${child.dataType}")
}

/** address = last 20 bytes of the padded word (events.go:447-450). */
case class EvmAddress(child: Expression) extends EvmWordExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(w: Any): Any =
    EvmKernels.evmAddress(w.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmKernels.evmAddress($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** uint256 word → DecimalType(38,0); null if it exceeds 38 digits. */
case class EvmUint(child: Expression) extends EvmWordExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override protected def nullSafeEval(w: Any): Any =
    EvmKernels.evmUint(w.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.freshName("dec")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.types.Decimal $d = graft.functions.EvmKernels.evmUint($c);
         |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int256 word (two's complement) → DecimalType(38,0). */
case class EvmInt(child: Expression) extends EvmWordExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override protected def nullSafeEval(w: Any): Any =
    EvmKernels.evmInt(w.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.freshName("dec")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.types.Decimal $d = graft.functions.EvmKernels.evmInt($c);
         |if ($d == null) { ${ev.isNull} = true; } else { ${ev.value} = $d; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** uint256 word → canonical full-fidelity hex string (no 38-digit cap). */
case class EvmUintHex(child: Expression) extends EvmWordExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(w: Any): Any =
    EvmKernels.evmUintHex(w.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmKernels.evmUintHex($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class EvmBool(child: Expression) extends EvmWordExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(w: Any): Any =
    EvmKernels.evmBool(w.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EvmKernels.evmBool($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** uint (decimal(38,0)) → 64-hex-char ABI word, arbitrary precision
  * (R2 call packing, /root/reference/generate/callmsg.go:19-54). */
case class EvmEncodeUint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expects a decimal, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    EvmKernels.encodeUint(v.asInstanceOf[Decimal])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.freshName("word")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.unsafe.types.UTF8String $s = graft.functions.EvmKernels.encodeUint($c);
         |if ($s == null) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column API for ABI decoding. */
object Evm {
  def address(word: Column): Column = shim.column(EvmAddress(shim.expression(word)))
  def uint(word: Column): Column = shim.column(EvmUint(shim.expression(word)))

  /** Full-fidelity companion to [[uint]]: the word's canonical hex string —
    * survives values past 38 decimal digits that `uint` nulls out. */
  def uintHex(word: Column): Column = shim.column(EvmUintHex(shim.expression(word)))
  def int(word: Column): Column = shim.column(EvmInt(shim.expression(word)))
  def bool(word: Column): Column = shim.column(EvmBool(shim.expression(word)))

  /** Word i (0-based) of a data blob (R1 non-indexed outputs). */
  def word(data: Column, i: Int): Column = {
    import org.apache.spark.sql.functions._
    // strip optional 0x then fixed-offset substring — stays codegen'd
    substring(regexp_replace(data, "^0[xX]", ""), i * 64 + 1, 64)
  }

  // ---- R2: call-input packing (BuildCallMsg/BuildCallInput,
  // /root/reference/generate/callmsg.go:19-54). The 4-byte selector is the
  // keccak of the signature — computed once at plan time by the schema
  // compiler (passed in as a literal; keccak is not in the JDK and the
  // selector is a plan-time constant, never per-row work).

  /** ABI-encode an unsigned integer column into a 64-hex-char word.
    * Arbitrary-precision: values ≥ 2^63 (every 1e18-scaled amount) encode
    * correctly — the earlier hex()-based form silently narrowed the decimal
    * to LONG and nulled them. */
  def encodeUint(v: Column): Column =
    shim.column(EvmEncodeUint(shim.expression(v.cast("decimal(38,0)"))))

  /** ABI-encode an address column (0x-prefixed or raw) into a word. */
  def encodeAddress(addr: Column): Column = {
    import org.apache.spark.sql.functions._
    lpad(lower(regexp_replace(addr, "^0[xX]", "")), 64, "0")
  }

  /** Full calldata: 0x + selector + packed argument words. */
  def callData(selectorHex: String, args: Column*): Column = {
    import org.apache.spark.sql.functions._
    val sel = selectorHex.stripPrefix("0x").toLowerCase
    require(sel.length == 8, s"selector must be 4 bytes of hex, got '$selectorHex'")
    concat((lit("0x" + sel) +: args): _*)
  }
}
