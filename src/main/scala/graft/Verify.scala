package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg (builder-side iteration only; the driver passes 2):
    // comma-separated query names to run instead of the full inventory
    val only: Option[Set[String]] = args.drop(2).headOption.map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // deployment parity with Bench/Run: the gate exercises the sorted
      // bucketed-scan path (sort order only reported under Spark's own
      // single-file-per-bucket guard) under the DuckDB oracles
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // subset co-partitioning for the prefix-bucketed kn5 q/d pairs: one
      // corpus exchange per landed order serves BOTH joins (pre-3.3
      // default; the only subset-partitioned sources here are the LM
      // tables, whose n-gram prefixes are far past any skew concern)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // streaming-checkpoint manager + checksum parity with Bench (r16):
      // the FileContext-based default forks readlink/ls per state-store
      // delta rename on a no-native-Hadoop local FS — see Bench.scala for
      // the measurement; env-overridable for real checkpoint filesystems.
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
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
