package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the pointer-jumping ROUND COUNT of the near-dup cluster map
  * per store: runs `dedup_cluster_canonical` and prints the per-iteration
  * label-sum trace ([[graft.ext.DedupOps.lastIterSums]]). The scale claim
  * is rounds ∝ log(component diameter) — an extra decade of corpus should
  * buy at most ~one extra round; this records the number instead of
  * inferring it from wall-clock ratios.
  *
  * Usage: `runMain graft.tools.CcRounds <storeDir> [storeDir...]`
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CcRounds <storeDir> [storeDir...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
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
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val n = graft.ext.DedupOps.clusterCanonical(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val sums = graft.ext.DedupOps.lastIterSums.reverse
      // the last round's sum equals its predecessor — that equality is the
      // convergence probe, so "useful" rounds = size - 1
      println(f"CC $dir: labeled_nodes=$n rounds=${sums.size} " +
        f"(useful=${sums.size - 1}) wall=$secs%.1fs sums=${sums.mkString(",")}")
    }
    spark.stop()
  }
}
