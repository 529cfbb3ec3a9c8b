package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry: times whole queries in one session (first run
  * includes codegen/JIT; second run is steady-state). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    t("warmup")(Tables.documents(spark, sfDir).count())
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // noop sink, not count(): count() lets Catalyst prune whole
      // projections and under-measures projection-heavy queries ~5×
      // (BUILDLOG round-2 finding 2) — match Bench's materialization.
      def once(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      t(s"$n#1")(once())
      t(s"$n#2")(once())
      t(s"$n#3")(once())
    }
    spark.stop()
  }
}
