package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Model-size probe for the landed-LM bucket sizing (round-11 verdict
  * item 3): prints, per store, the kn3 model row count (en trigram
  * types), the kn5 top-order count (en 5-gram types), and the bucket
  * count [[graft.ext.TextOps.modelBuckets]] derives from each — the
  * numbers behind the SCALING.md parity row for the
  * hand-tuned-vs-derived comparison.
  *
  * Usage: `runMain graft.tools.KnCounts <sfDir> [sfDir...]`
  */
object KnCounts {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: KnCounts <sfDir> [sfDir...]")
    val spark = SparkSession.builder()
      .appName("graft-kn-counts")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // zstd shuffle (SCALING r12.2; round-12 verdict item 5) — see Run.scala
      .config("spark.io.compression.codec", sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      // report bucketed-scan sort order (guarded inside Spark by a
      // single-file-per-bucket check): compacted index/model tables feed
      // sort-merge joins with NO re-sort of the at-rest side
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // subset co-partitioning for the prefix-bucketed kn5 q/d pairs: one
      // corpus exchange per landed order serves BOTH joins (pre-3.3
      // default; the only subset-partitioned sources here are the LM
      // tables, whose n-gram prefixes are far past any skew concern)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    println("| store | kn3 types | kn3 buckets | kn5 types | kn5 buckets |")
    println("|---|---|---|---|---|")
    args.foreach { dir =>
      val en = graft.Tables.documents(spark, dir).where(col("lang") === "en")
      val n3 = graft.ext.TextOps.knNCountsOf(en, 3).count()
      val n5 = graft.ext.TextOps.knNCountsOf(en, 5).count()
      val b3 = graft.ext.TextOps.modelBuckets(n3, "GRAFT_NO_SUCH_ENV")
      val b5 = graft.ext.TextOps.modelBuckets(n5, "GRAFT_NO_SUCH_ENV")
      println(s"| $dir | $n3 | $b3 | $n5 | $b5 |")
    }
    spark.stop()
  }
}
