package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured scaling probe: time the SAME queries against two stores (e.g.
  * the driver's sf0.1 and the GenScale-built sf1.0 at 10× the rows) and
  * report warm-time ratios — converting SCALING.md's plan-shape arguments
  * into measurements. A scan/shuffle-bound query should scale ≈ the data
  * ratio; log-factor extra is expected for iterative CC; a SUPER-linear
  * ratio (≫ data ratio) is a scale bug to diagnose.
  *
  * Usage: `runMain graft.tools.ScaleProbe <dirA> <dirB> <name,name,...>`.
  * Prints one markdown row per query: warmA, warmB, ratio. Each timing is
  * cold-then-warm (warm reported) with the two PER-QUERY pollution retries
  * from [[graft.Bench]] (warm > 1.5× cold, cpu-util < 1/3). Bench's third
  * trigger (suite-median) deliberately does NOT apply: the probe's query
  * list is hand-picked around the expensive tail, so "over 2× the median"
  * is the expected shape here, not a pollution signal.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleProbe <dirA> <dirB> <name,name,...>")
    val Array(dirA, dirB, namesCsv) = args
    val names = namesCsv.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-partition override: the bench pins partitions = cores, which
    // keeps bytes/partition growing with store size — at a 100× store a
    // cluster (or AQE) would scale partition COUNT instead. Probing with a
    // store-sized count separates genuine plan super-linearity from
    // fat-partition spill.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // Scan-split override, the SCAN-side analogue of SPARK_GRAFT_SHUFFLE:
    // the default 128m split bins a ~1 GB store into ~12 scan tasks — under
    // 32 cores a linear scan-agg reads as super-linear wall (q1 measured
    // 4.5× on 10× rows; 32m splits restore saturation and the ratio
    // collapses). On a cluster input splits scale with the data, so this
    // regime is local-mode-only; the knob separates it from real plan cost.
    val maxPart = sys.env.getOrElse("SPARK_GRAFT_MAXPART", "128m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
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
    val mxBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val sunBean = mxBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }

    def sample(name: String, dir: String): (Double, Double) = {
      val cpu0 = sunBean.map(_.getProcessCpuTime)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val util = (for (a <- cpu0; b <- sunBean.map(_.getProcessCpuTime))
        yield (b - a) / 1e9 / wall).getOrElse(Double.NaN)
      spark.catalog.clearCache()
      (wall, util)
    }

    def warmTime(name: String, dir: String): Double = {
      val (cold, _) = sample(name, dir)
      var (warm, util) = sample(name, dir)
      if (warm > 1.5 * cold || (!util.isNaN && util < 1.0 / 3.0)) {
        val (third, _) = sample(name, dir) // polluted sample — one more chance
        if (third < warm) warm = third
      }
      warm
    }

    // JVM/session warmup outside any timed region
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.Tables.events(spark, dirA).limit(1).collect()
    graft.Tables.events(spark, dirB).limit(1).collect()

    println(f"| query | warm $dirA%s (s) | warm $dirB%s (s) | ratio |")
    println("|---|---|---|---|")
    val rows = names.map { n =>
      val a = warmTime(n, dirA)
      val b = warmTime(n, dirB)
      println(f"| $n | $a%.2f | $b%.2f | ${b / a}%.1f× |")
      (n, a, b)
    }
    val ta = rows.map(_._2).sum; val tb = rows.map(_._3).sum
    println(f"| **total** | $ta%.2f | $tb%.2f | ${tb / ta}%.1f× |")
    spark.stop()
  }
}
