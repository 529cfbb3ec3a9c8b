package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Signature-variant shootout with full materialization (noop sink — no
  * column pruning lies). */
object Prof2 {
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
      println(f"[prof2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val shinglesExpr =
      """array_distinct(transform(
        |  sequence(1, greatest(size(toks) - 2, 0)),
        |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))""".stripMargin
    def docSh(rep: Boolean) = {
      val d = Tables.documents(spark, sfDir)
      (if (rep) d.repartition(col("doc_id")) else d)
        .withColumn("toks", expr("filter(split(lower(text), ' '), t -> t != '')"))
        .select(col("doc_id"), expr(shinglesExpr).as("shs"))
    }
    def sigArr(rep: Boolean) = docSh(rep).select(
      (Seq(col("doc_id")) ++ (0 until 16).map(i =>
        expr(s"array_min(transform(shs, s -> md5('$i|' || s)))").as(s"mh$i"))): _*)
    def sigAgg(rep: Boolean) = docSh(rep)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .groupBy("doc_id")
      .agg(min(md5(concat(lit("0|"), col("sh")))).as("mh0"),
        (1 until 16).map(i => min(md5(concat(lit(s"$i|"), col("sh")))).as(s"mh$i")): _*)

    t("warmup")(mat(Tables.documents(spark, sfDir)))
    t("shingles_only")(mat(docSh(rep = false)))
    t("sigArr_norep_1")(mat(sigArr(rep = false)))
    t("sigArr_norep_2")(mat(sigArr(rep = false)))
    t("sigArr_rep_1")(mat(sigArr(rep = true)))
    t("sigArr_rep_2")(mat(sigArr(rep = true)))
    t("sigAgg_norep_1")(mat(sigAgg(rep = false)))
    t("sigAgg_rep_1")(mat(sigAgg(rep = true)))
    t("sigAgg_rep_2")(mat(sigAgg(rep = true)))
    spark.stop()
  }
}
