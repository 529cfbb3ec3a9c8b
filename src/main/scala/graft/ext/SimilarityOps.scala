package graft.ext

import graft.Tables
import graft.functions.Vec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact baseline. The query set is tiny and
  *    broadcast; the candidate scan streams once — O(Q·N) work, no shuffle
  *    of the big side, so it scales linearly with candidates.
  *  - LSH-bucketed ANN: sign-bit bucketing (axis-aligned random-hyperplane
  *    LSH). Queries only probe their own bucket → each query touches ~N/2^b
  *    candidates. The scale path: bucket id is a shuffle key, buckets are
  *    independent.
  *
  * Dot products fold in array order on both engines → bit-identical doubles;
  * ranking ties broken by vec_id.
  */
object SimilarityOps {

  private val TopK = 5


  private def dotSql(x: String, y: String) =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), " +
      s"k -> CAST($x[k] AS DOUBLE) * CAST($y[k] AS DOUBLE))), (acc, v) -> acc + v)"

  /** Brute-force cosine top-5: queries = vec_id < 8, candidates = the rest. */
  def bruteTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir).withColumn("norm", Vec.norm(col("embedding")))
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("norm").as("qn"))
    val c = e.where(col("vec_id") >= 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"), col("norm").as("cn"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    c.join(broadcast(q))
      .withColumn("cos_sim", Vec.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select("q_id", "rank", "c_id", "cos_sim")
      .orderBy("q_id", "rank")
  }

  private val bruteTopkSql =
    s"""WITH e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm FROM embeddings),
       |p AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.norm * c.norm) AS cos_sim
       |  FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id >= 8),
       |r AS (
       |  SELECT q_id, c_id, cos_sim,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rank
       |  FROM p)
       |SELECT q_id, rank, c_id, cos_sim FROM r WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  /** Sign-bit LSH bucket id from 4 consecutive components starting at
    * `startDim` (1-based) — axis-aligned random-hyperplane LSH. Shared with
    * [[DedupOps.embeddingCosine]]'s multi-table candidate generation. */
  def signBucketExpr(startDim: Int): String =
    (0 until 4).map { i =>
      s"CASE WHEN element_at(embedding, ${startDim + i}) > 0 THEN ${8 >> i} ELSE 0 END"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  def signBucketSql(startDim: Int): String =
    (0 until 4).map { i =>
      s"CASE WHEN embedding[${startDim + i}] > 0 THEN ${8 >> i} ELSE 0 END"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  private val bucketExpr = signBucketExpr(1)

  private val bucketSql = signBucketSql(1)

  /** ANN via LSH buckets: per query, top-5 among same-bucket candidates. */
  def lshAnn(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("norm", Vec.norm(col("embedding")))
      .withColumn("bucket", expr(bucketExpr))
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("norm").as("qn"), col("bucket"))
    val c = e.where(col("vec_id") >= 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"), col("norm").as("cn"), col("bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos_sim", Vec.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select("q_id", "bucket", "rank", "c_id", "cos_sim")
      .orderBy("q_id", "rank")
  }

  private val lshAnnSql =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm,
       |    $bucketSql AS bucket
       |  FROM embeddings),
       |p AS (
       |  SELECT q.vec_id AS q_id, q.bucket, c.vec_id AS c_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.norm * c.norm) AS cos_sim
       |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < 8 AND c.vec_id >= 8),
       |r AS (
       |  SELECT q_id, bucket, c_id, cos_sim,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rank
       |  FROM p)
       |SELECT q_id, bucket, rank, c_id, cos_sim FROM r WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  /** IVF-style ANN: a coarse quantizer routes each query to ONE cell, and
    * only that cell's members are scored. Cells = the `label` partitioning;
    * each cell's representative = its min-vec_id member (a deterministic
    * seeded quantizer — in production the representatives come from k-means,
    * which changes the routing table, not the plan shape). At scale the cell
    * id is the shuffle key: each query scores ~N/cells candidates, cells are
    * independent, and the representative table broadcasts. */
  def ivfAnn(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir).withColumn("norm", Vec.norm(col("embedding")))
    val reps = e.groupBy("label")
      .agg(min_by(col("embedding"), col("vec_id")).as("rvec"))
      .withColumn("rnorm", Vec.norm(col("rvec")))
    val q = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("norm").as("qn"))
    // route: nearest representative (nprobe = 1), ties by label
    val wr = Window.partitionBy("q_id").orderBy(col("rcos").desc, col("label"))
    val routed = q.join(broadcast(reps))
      .withColumn("rcos", Vec.dot(col("qe"), col("rvec")) / (col("qn") * col("rnorm")))
      .withColumn("rrank", row_number().over(wr))
      .where(col("rrank") === 1)
      .select(col("q_id"), col("qe"), col("qn"), col("label").as("probe_label"))
    val c = e.where(col("vec_id") >= 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"), col("norm").as("cn"),
        col("label").as("probe_label"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("c_id"))
    c.join(broadcast(routed), Seq("probe_label"))
      .withColumn("cos_sim", Vec.dot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= TopK)
      .select("q_id", "probe_label", "rank", "c_id", "cos_sim")
      .orderBy("q_id", "rank")
  }

  private val ivfAnnSql =
    s"""WITH e AS (SELECT vec_id, label, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS norm FROM embeddings),
       |reps AS (SELECT label, arg_min(embedding, vec_id) AS rvec FROM e GROUP BY label),
       |repsn AS (SELECT label, rvec, sqrt(${dotSql("rvec", "rvec")}) AS rnorm FROM reps),
       |routed AS (
       |  SELECT q_id, probe_label FROM (
       |    SELECT q.vec_id AS q_id, r.label AS probe_label,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${dotSql("q.embedding", "r.rvec")} / (q.norm * r.rnorm) DESC, r.label) AS rrank
       |    FROM e q CROSS JOIN repsn r WHERE q.vec_id < 8)
       |  WHERE rrank = 1),
       |scored AS (
       |  SELECT ro.q_id, ro.probe_label, c.vec_id AS c_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.norm * c.norm) AS cos_sim
       |  FROM routed ro
       |  JOIN e q ON q.vec_id = ro.q_id
       |  JOIN e c ON c.label = ro.probe_label AND c.vec_id >= 8),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS BIGINT) AS rank
       |      FROM scored)
       |SELECT q_id, probe_label, rank, c_id, cos_sim FROM r WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_brute_topk" -> (bruteTopk _),
    "sim_lsh_ann" -> (lshAnn _),
    "sim_ivf_ann" -> (ivfAnn _),
  )

  val oracles: Map[String, String] = Map(
    "sim_brute_topk" -> bruteTopkSql,
    "sim_lsh_ann" -> lshAnnSql,
    "sim_ivf_ann" -> ivfAnnSql,
  )
}
