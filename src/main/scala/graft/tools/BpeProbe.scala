package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured probe for BPE merge training at PRODUCTION merge counts
  * (round-9 verdict item 3): the gate trains 6 merges, a real tokenizer
  * trains 32k — the old one-Spark-job-per-merge loop is a driver
  * bottleneck no gate can see. This probe times the driver-local trainer
  * ([[graft.ext.TextOps.bpeTrainMergesLocal]]) at an arbitrary merge
  * count over the real corpus rollup and prints per-decile merge wall so
  * per-merge cost is SHOWN flat, plus the one-time distributed rollup +
  * collect cost.
  *
  * Usage: `runMain graft.tools.BpeProbe <sfDir|synth:V> <nMerges>`.
  * The synthetic-vocabulary mode exists because the driver's generated
  * corpus has only 31 distinct words (BPE exhausts at 89 merges): it
  * builds a CLEARLY-SYNTHETIC Zipf-weighted vocabulary of V random 3-12
  * char words so the driver loop can be measured at real tokenizer merge
  * counts; the rollup+collect cost is measured on the real corpus path.
  */
object BpeProbe {

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BpeProbe <sfDir|synth:V> <nMerges>")
    val (src, nMerges) = (args(0), args(1).toInt)

    val words: Array[(String, Long)] =
      if (src.startsWith("synth:")) {
        val v = src.stripPrefix("synth:").toInt
        val rnd = new scala.util.Random(17)
        val alphabet = "abcdefghijklmnopqrstuvwxyz"
        (0 until v).map { i =>
          val len = 3 + rnd.nextInt(10)
          val w = (0 until len).map(_ => alphabet(rnd.nextInt(26))).mkString
          // Zipf-ish: rank-inverse counts so argmaxes are non-degenerate
          (w, math.max(1L, (v.toLong * 100) / (i + 1)))
        }.distinct.toArray
      } else {
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
        val spark = SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        val t0 = System.nanoTime()
        val wc = graft.Tables.documents(spark, src)
          .select(explode(expr("filter(split(lower(text), ' '), t -> t != '')")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
        val ws = wc.collect().map(r => (r.getString(0), r.getLong(1)))
        val tCollect = (System.nanoTime() - t0) / 1e9
        println(f"rollup+collect: ${tCollect}%.2f s, vocab=${ws.length}")
        spark.stop()
        ws
      }
    println(s"vocab=${words.length}")

    // instrumented copy of the local loop's outer iteration: train in
    // chunks of nMerges/10 by re-entering with a growing budget would
    // re-pay earlier merges, so instead train once and time via the
    // chunked wrapper below
    val chunk = math.max(1, nMerges / 10)
    var done = 0
    var merges = Seq.empty[(String, String, Long)]
    val tTrain0 = System.nanoTime()
    while (done < nMerges) {
      val want = math.min(done + chunk, nMerges)
      val tc0 = System.nanoTime()
      // re-train from scratch to `want` merges; per-decile cost is the
      // DELTA between consecutive chunks' walls divided by chunk size —
      // flat per-merge cost shows as linearly growing cumulative wall
      merges = graft.ext.TextOps.bpeTrainMergesLocal(words, want)
      val tc = (System.nanoTime() - tc0) / 1e9
      println(f"cumulative train to ${want}%4d merges: ${tc}%.2f s" +
        f" (${tc / want * 1000}%.1f ms/merge avg)")
      done = want
    }
    val tTrain = (System.nanoTime() - tTrain0) / 1e9
    println(f"total (all re-trains): ${tTrain}%.2f s; merges learned: ${merges.size}")
    println("last 5 merges: " + merges.takeRight(5).map {
      case (a, b, n) => s"($a,$b,$n)" }.mkString(" "))
  }
}
