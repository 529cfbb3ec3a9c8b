package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL-surface registration for the custom expressions, so `spark.sql`
  * users get the same kernels as the Column API:
  *
  *   - at runtime: `GraftFunctions.register(spark)`
  *   - at deploy time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def strArg(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(s, _: org.apache.spark.sql.types.StringType) if s != null =>
      s.toString
    case other => throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }


  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "arraydot" -> (es => ArrayDot(es(0), es(1))),
    "word_shingles" -> (es => WordShingles(es(0), intArg(es(1), "shingle width k"))),
    "minhash_signature" -> (es => MinHashSignature(es(0), intArg(es(1), "numPerm"))),
    "simhash32" -> (es => SimHash32(es(0))),
    "nfc_normalize" -> (es => NfcNormalize(es(0))),
    "evm_address" -> (es => EvmAddress(es(0))),
    "evm_uint" -> (es => EvmUint(es(0))),
    "evm_uint_hex" -> (es => EvmUintHex(es(0))),
    "evm_int" -> (es => EvmInt(es(0))),
    "evm_bool" -> (es => EvmBool(es(0))),
    "evm_encode_uint" -> (es => EvmEncodeUint(es(0))),
    // aggregate: the analyzer wraps a bare AggregateFunction returned from
    // a registry builder in its AggregateExpression itself
    "topk_by_desc" -> (es => TopKByDesc(es(0), es(1), es(2), intArg(es(3), "k"))),
    // the reference DSL's scalar functions by name, so HCL-translated (and
    // plain spark.sql) expressions resolve them (dsl/functions.go:15-21).
    // Pure catalyst trees — a Column-API round-trip would wrap unresolved
    // ColumnNodes that survive analysis as Unevaluable.
    "parse_decimals" -> { es =>
      import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Literal, Pow}
      import org.apache.spark.sql.types.DoubleType
      Cast(Divide(Cast(es(0), DoubleType), Pow(Literal(10.0), Cast(es(1), DoubleType))), DoubleType)
    },
    "format_date" -> { es =>
      import org.apache.spark.sql.catalyst.expressions.{Literal, UnixTimestamp}
      UnixTimestamp(es(1),
        Literal(graft.engine.Functions.goLayoutToJava(strArg(es(0), "go layout"))))
    },
  )

  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    // the HOF-dot → ArrayDot optimizer rule (idempotent add)
    if (!spark.experimental.extraOptimizations.contains(DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotProductRewrite
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
