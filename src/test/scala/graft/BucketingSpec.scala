package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: pre-shuffling the fact tables on the join
  * key at write time removes the per-query shuffle entirely — the standard
  * 100 TB technique for repeated fact-fact joins (SCALING.md). */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without an exchange on the bucketed key") {
    // warehouse.dir is a static conf; the shared session's default
    // (./spark-warehouse) is fine — the database is dropped afterwards.
    val db = "bucketdemo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.lineitem(spark, sf)
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.li_bucketed")
      Tables.orders(spark, sf)
        .write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.ord_bucketed")

      val joined = spark.table(s"$db.li_bucketed")
        .join(spark.table(s"$db.ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        // the join itself must not re-shuffle its inputs: no Exchange
        // between the scans and the SortMergeJoin
        val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
        assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"), plan)
        assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan)
        // and the result is right
        val n = joined.agg(sum("count")).head().getLong(0)
        assert(n == Tables.lineitem(spark, sf).count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }
}
