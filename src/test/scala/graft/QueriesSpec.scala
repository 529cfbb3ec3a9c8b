package graft

/** Every declared query must run and produce rows on the smoke fixture, and
  * every oracle key must have a matching query (driver-contract invariants).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; queries all named uniquely") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"oracle-only keys: ${ok -- qk}")
    // every query is oracle-gated — approx_distinct's estimate quality is
    // asserted via its within_5pct column since r4
    assert((qk -- ok).isEmpty, s"queries lacking an oracle: ${qk -- ok}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
