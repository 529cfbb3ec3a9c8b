package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-query profiler (optimization rounds): runs a named query cold + warm
  * under the bench's exact session confs and prints a per-stage wall/task
  * breakdown of the WARM run, so optimization targets the measured stage,
  * not a guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.Profile <query> [warmRuns=1]"
  */
object Profile {
  final case class StageRow(
      id: Int, name: String, wallMs: Long, taskTimeMs: Long, tasks: Int,
      shuffleReadMB: Double, shuffleWriteMB: Double, inputMB: Double)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Profile <query> [warmRuns]"))
    val warmRuns = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
      // local chmod without fork/exec (r16): no libhadoop on this box, so
      // stock RawLocalFileSystem shells `chmod` per created file/dir —
      // FileOutputCommitter mkdirs + every parquet part file pay a fork of
      // this JVM. NioLocalFileSystem sets the same bits via java.nio.
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS", "graft.util.NioLocalFileSystem"))
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_FM",
          "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))

    // bench-identical warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
    }
    graft.Tables.events(spark, sfDir).limit(1).collect()

    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = run()
    spark.catalog.clearCache()

    val stages = mutable.ArrayBuffer.empty[StageRow]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long)] // id, submit, end
    val jobStart = mutable.Map.empty[Int, Long]
    val jobSite = mutable.Map.empty[Int, String]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        val m = si.taskMetrics
        stages += StageRow(
          si.stageId, si.name.takeWhile(_ != '\n'), wall,
          m.executorRunTime, si.numTasks,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6)
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart(js.jobId) = js.time
        jobSite(js.jobId) = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs += ((je.jobId, jobStart.getOrElse(je.jobId, je.time), je.time))
    }
    spark.sparkContext.addSparkListener(listener)
    var best = Double.MaxValue
    (1 to warmRuns).foreach { _ =>
      spark.catalog.clearCache()
      val w = run()
      if (w < best) best = w
    }
    Thread.sleep(500) // let the listener bus drain
    println(f"%nPROFILE $name  cold=$cold%.3f s  warm(best of $warmRuns)=$best%.3f s")
    println(f"jobs=${jobs.size} (over all $warmRuns warm runs)  sum job wall=${jobs.map(j => j._3 - j._2).sum / 1e3}%.3f s")
    println("stages by wall (all warm runs):")
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"tasks"}%6s ${"shRdMB"}%8s ${"shWrMB"}%8s ${"inMB"}%8s  name")
    stages.sortBy(-_.wallMs).take(40).foreach { s =>
      println(f"${s.id}%6d ${s.wallMs}%8d ${s.taskTimeMs}%8d ${s.tasks}%6d ${s.shuffleReadMB}%8.2f ${s.shuffleWriteMB}%8.2f ${s.inputMB}%8.2f  ${s.name.take(70)}")
    }
    val gaps = {
      val sorted = jobs.sortBy(_._2)
      var lastEnd = 0L
      var gap = 0L
      sorted.foreach { case (_, s, e) =>
        if (lastEnd > 0 && s > lastEnd) gap += (s - lastEnd)
        lastEnd = math.max(lastEnd, e)
      }
      gap
    }
    println(f"driver-side gap between jobs (no job running): ${gaps / 1e3}%.3f s across warm runs")
    // largest inter-job gaps, attributed to the job that FOLLOWS each gap
    // (the gap is the driver work spent producing that job) + the one before
    val sorted = jobs.sortBy(_._2)
    val gapRows = sorted.sliding(2).collect {
      case mutable.ArrayBuffer((idA, _, endA), (idB, startB, _)) if startB > endA =>
        (startB - endA, idA, idB)
    }.toSeq.sortBy(-_._1).take(25)
    println("largest gaps (ms, afterJob -> beforeJob [callSite of the following job]):")
    gapRows.foreach { case (g, a, b) =>
      println(f"  $g%6d  j$a%-5d -> j$b%-5d  after=${jobSite.getOrElse(a, "?").take(45)}%-45s next=${jobSite.getOrElse(b, "?").take(45)}")
    }
    spark.stop()
  }
}
