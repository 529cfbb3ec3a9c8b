package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference DSL's scalar-function surface re-expressed as Catalyst
  * `Column` helpers (codegen-friendly; no UDFs).
  *
  * Reference registry: /root/reference/dsl/functions.go:15-21 (upper, lower,
  * abs, parse_decimals, format_date) plus the chain-bound functions
  * balance/token_balance (dsl/functions.go:71-103) which become joins — see
  * [[Enrich]].
  */
object Functions {

  /** parse_decimals(raw, d) = raw / 10^d as double.
    * Reference: /root/reference/dsl/functions.go:26-43 (big.Int → big.Float
    * quotient → float64; i.e. the reference itself downgrades to double, so
    * DoubleType output is full parity).
    */
  def parseDecimals(raw: Column, decimals: Int): Column =
    (raw.cast("double") / pow(lit(10.0), lit(decimals))).cast("double")

  /** format_date(goLayout, s) = unix seconds of s parsed with a Go
    * reference-time layout. Reference: /root/reference/dsl/functions.go:49-66
    * (time.Parse → Unix()). We translate the Go layout to a JDK pattern and
    * use `unix_timestamp`, which keeps the whole expression codegen'd.
    */
  def formatDate(goLayout: String, date: Column): Column =
    unix_timestamp(date, goLayoutToJava(goLayout))

  /** `now` variable: unix seconds captured once at schema-load time
    * (reference: /root/reference/dsl/schema.go:372). Plan-time literal.
    */
  def nowSeconds(): Column = lit(System.currentTimeMillis() / 1000L)

  /** Go reference-time layout ("2006-01-02 15:04:05") → JDK DateTimeFormatter
    * pattern ("yyyy-MM-dd HH:mm:ss"). Longest-match scan over the published
    * Go layout atoms (pkg.go.dev/time#pkg-constants).
    */
  def goLayoutToJava(goLayout: String): String = {
    // Order matters: longer atoms first so "Jan" wins over "1", "2006" over "06".
    val atoms: Seq[(String, String)] = Seq(
      "2006" -> "yyyy",
      "Monday" -> "EEEE",
      "Mon" -> "EEE",
      "January" -> "MMMM",
      "Jan" -> "MMM",
      "15" -> "HH",
      "01" -> "MM",
      "02" -> "dd",
      "03" -> "hh",
      "04" -> "mm",
      "05" -> "ss",
      "06" -> "yy",
      ".000" -> ".SSS",
      "PM" -> "a",
      "pm" -> "a",
      "-07:00" -> "XXX",
      "-0700" -> "Z",
      "Z07:00" -> "XXX",
      "MST" -> "zzz",
      "1" -> "M",
      "2" -> "d",
      "3" -> "h",
      "4" -> "m",
      "5" -> "s",
    )
    val sb = new StringBuilder
    var i = 0
    while (i < goLayout.length) {
      atoms.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, java)) => sb.append(java); i += go.length
        case None =>
          val c = goLayout.charAt(i)
          // Quote alphabetic literals so the JDK formatter doesn't eat them.
          if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
          i += 1
      }
    }
    sb.toString
  }

  /** Ternary `cond ? a : b` (HCL conditional, schema.example.hcl:50-52). */
  def ternary(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(cond, ifTrue).otherwise(ifFalse)

  /** AND-fold of the reference's filter list semantics: row survives only if
    * every predicate is true (/root/reference/dsl/schema.go:131-164).
    */
  def allOf(preds: Seq[Column]): Column =
    preds.reduceOption(_ && _).getOrElse(lit(true))
}
