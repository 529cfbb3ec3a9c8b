package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the kn5 APPEND-MERGE path against a full re-land (r15,
  * r14 verdict item 6): copies a store's documents artifact to a scratch
  * dir, lands the staged-counts model, appends a fraction of the corpus
  * as new part files (the daily-ingest shape), then times
  * [[graft.ext.TextOps.mergeKn5Model]] vs a fresh full landing over the
  * SAME appended store — and verifies the two score identically (the
  * additive-counts property, also spec'd at gate scale in BucketingSpec).
  *
  * Usage: `runMain graft.tools.KnMergeProbe <sfDir> [appendFrac]`
  */
object KnMergeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: KnMergeProbe <sfDir> [appendFrac]")
    val frac = if (args.length > 1) args(1).toDouble else 0.01
    val spark = SparkSession.builder()
      .appName("graft-kn-merge-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      // the bucketed-layout contract (see BucketedPlan; deployment parity
      // with the Bench/Verify builders)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scratch copy: the probe appends to its own store, never the input's
    val store = java.nio.file.Files.createTempDirectory("graft_knmerge").toString
    graft.streaming.Streams.deleteOnShutdown(store)
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"${args(0)}/documents.parquet")
    val dst = new org.apache.hadoop.fs.Path(s"$store/documents.parquet")
    val fs = src.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val db = "graft_kn5m_mergeprobe"
    Seq(db, db + "_fresh").foreach(d => spark.sql(s"DROP DATABASE IF EXISTS $d CASCADE"))
    val (_, tLand) = timed(graft.ext.TextOps.landKn5Model(spark, store, db, landCounts = true))
    // the ingest batch: `frac` of the corpus re-keyed past the max id,
    // landed as NEW part files (every parquet writer's append shape)
    val docs = graft.Tables.documents(spark, store)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    docs.sample(withReplacement = false, frac, seed = 42L)
      .withColumn("doc_id", col("doc_id") + maxId + 1L)
      .write.mode("append").parquet(s"$store/documents.parquet")
    val (merged, tMerge) = timed(graft.ext.TextOps.mergeKn5Model(spark, store, db))
    require(merged.isDefined, "the append was not recognized as merge-eligible")
    val (fresh, tFull) = timed(
      graft.ext.TextOps.landKn5Model(spark, store, db + "_fresh", landCounts = true))
    // parity at probe scale too, not just the gate spec's toy corpus
    val after = graft.Tables.documents(spark, store)
    def scores(m: graft.ext.TextOps.KnNModel) = graft.ext.TextOps
      .knNScoreOfGrams(graft.ext.TextOps.knNDocGrams(after, 5), m)
      .agg(count(lit(1)), sum(col("n_backoff")), sum(col("mean_p"))).head()
    val eq = scores(merged.get) == scores(fresh)
    println(f"KNMERGE ${args(0)}: land=$tLand%.1fs merge=$tMerge%.1fs " +
      f"reland=$tFull%.1fs appendFrac=$frac parity=$eq")
    Seq(db, db + "_fresh").foreach(d => spark.sql(s"DROP DATABASE IF EXISTS $d CASCADE"))
    graft.streaming.Streams.deleteDir(store)
    spark.stop()
    if (!eq) sys.exit(1)
  }
}
