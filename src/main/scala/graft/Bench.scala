package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Times every SparkEntry query at SPARK_GRAFT_SF_DIR with
  * full materialization (noop sink — `count()` lets Catalyst prune whole
  * projections, under-measuring projection-heavy queries), fails LOUDLY
  * (a query that throws is reported per-name and the process exits non-zero
  * — a timing for a broken query is worse than no timing), and writes the
  * one-line JSON metric both to stdout and to bench_out.json so log spew can
  * never corrupt the parsed line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, parquet footer reads, shuffle machinery)
    // outside the timed region so per-query numbers measure the plans, not
    // one-time JVM startup attributed to whichever query runs first.
    // events MUST warm via Tables.events (nanos-as-long legacy flag) — a raw
    // read throws PARQUET_TYPE_ILLEGAL on its TIMESTAMP(NANOS) column.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
    }
    Tables.events(spark, sfDir).limit(1).collect()

    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] QUERY FAILED: $name — $e")
          failed ::= name
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries that cache intermediates would otherwise accumulate blocks
      // across the whole run and distort later measurements.
      spark.catalog.clearCache()
      name -> dt
    }
    val ok = results.filterNot(r => failed.contains(r._1))
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
