package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-capture tool (optimization rounds): writes `.explain("formatted")`
  * for each named query to `<outDir>/<query>_<tag>.txt`, under the SAME
  * session confs the bench runs with, so committed plan files reflect what
  * the bench actually executes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.Plans <outDir> <tag> <q1,q2,...|all>"
  *
  * Streaming-engine queries (stream_*) execute the real micro-batch engine
  * inside their builder; their returned frame is the materialized result, so
  * the formatted plan shows the post-run table — still captured (it proves
  * the harness shape), but the per-batch plan lives in the checkpoint logs.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r16")
    val tag = if (args.length > 1) args(1) else "before"
    val names: Seq[String] =
      if (args.length > 2 && args(2) != "all") args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
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
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_FM",
          "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager"))
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
      // local chmod without fork/exec (r16): no libhadoop on this box, so
      // stock RawLocalFileSystem shells `chmod` per created file/dir —
      // FileOutputCommitter mkdirs + every parquet part file pay a fork of
      // this JVM. NioLocalFileSystem sets the same bits via java.nio.
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS", "graft.util.NioLocalFileSystem"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    var failed = List.empty[String]
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plans] unknown query: $name"); failed ::= name
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            // queryExecution.explainString gives the same text explain() prints
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), txt)
            println(s"[plans] wrote $outDir/${name}_$tag.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plans] FAILED $name: $e")
              failed ::= name
          }
      }
    }
    spark.stop()
    if (failed.nonEmpty) { System.err.println(s"[plans] failures: ${failed.sorted.mkString(",")}"); sys.exit(1) }
  }
}
