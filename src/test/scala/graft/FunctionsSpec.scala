package graft

import graft.engine.Functions
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("goLayoutToJava translates the published Go layout atoms") {
    assert(Functions.goLayoutToJava("2006-01-02") == "yyyy-MM-dd")
    assert(Functions.goLayoutToJava("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss")
    assert(Functions.goLayoutToJava("02 Jan 06") == "dd MMM yy")
    assert(Functions.goLayoutToJava("Monday, January 2, 2006") == "EEEE, MMMM d, yyyy")
    assert(Functions.goLayoutToJava("03:04 PM") == "hh:mm a")
  }

  test("formatDate parses like the reference (unix seconds)") {
    import spark.implicits._
    val got = Seq("2024-01-15").toDF("d")
      .select(Functions.formatDate("2006-01-02", col("d")).as("u"))
      .head().getLong(0)
    assert(got == 1705276800L) // 2024-01-15T00:00:00Z
  }

  test("parseDecimals divides by 10^d as double (dsl/functions.go:26-43 parity)") {
    import spark.implicits._
    val got = Seq(123456.0).toDF("raw")
      .select(Functions.parseDecimals(col("raw"), 3).as("v"))
      .head().getDouble(0)
    assert(got == 123.456)
  }

  test("parseDecimals round-trips across magnitudes (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(50)((rnd.nextDouble() * 2e12 - 1e12, rnd.nextInt(13)))
    val df = cases.toDF("raw", "d")
    val got = df.select(col("raw"), col("d"),
      (col("raw").cast("double") / pow(lit(10.0), col("d"))).as("v")).collect()
    got.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(0) / math.pow(10, r.getInt(1)))
    }
  }

  test("allOf AND-folds; empty list keeps every row (dsl/schema.go:131-164)") {
    import spark.implicits._
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("a", "b")
    assert(df.where(Functions.allOf(Seq(col("a") > 1, col("b") < 30))).count() == 1)
    assert(df.where(Functions.allOf(Nil)).count() == 3)
  }

  test("ternary matches HCL conditional semantics") {
    import spark.implicits._
    val got = Seq(1, 2).toDF("x")
      .select(Functions.ternary(col("x") % 2 === 0, lit("even"), lit("odd")).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("odd", "even"))
  }
}
