package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's testdata (TESTDATA.md) for the
  * local scaling probe: replicate an existing store K× with key offsets so
  * joins, aggregations, and dedup families scale the way a genuinely
  * K×-larger corpus would.
  *
  * Design per table (TPC-H scaling discipline — facts scale, tiny dims
  * stay fixed):
  *   - `region`/`nation`: copied (constant dimensions, as in TPC-H).
  *   - `customer`/`supplier`/`part`/`orders`/`lineitem`: replicated with
  *     each key shifted by `replica × (max(key)+1)` — every FK pair
  *     (orders↔lineitem, customer↔orders, part/supplier↔lineitem) lands in
  *     the same replica, so join fan-outs scale linearly, never
  *     quadratically.
  *   - `events`: `event_id` (the block-number surrogate) shifts per
  *     replica; `ts`/`user_id`/`value`/`props` are kept, so the SAME time
  *     range holds K× the events and each monitored contract sees K× rows —
  *     how a busier chain scales, and what keeps per-contract filters
  *     selective rather than degenerate.
  *   - `documents`: `doc_id` shifts; replica i>0 rewrites every word
  *     `w → w~i`. Within a replica the shingle space is renamed
  *     BIJECTIVELY, so each replica holds an exact copy of the corpus's
  *     near-dup family structure (K× the families); across replicas the
  *     shingle sets are disjoint, so families do NOT merge into K×-sized
  *     clusters — a K× corpus has K× dup families, not K×-bigger ones.
  *   - `embeddings`: `vec_id` shifts; replica i rotates the vector by i
  *     lanes (norm-preserving, direction-destroying), so ANN/cosine ops see
  *     K× genuinely distinct points instead of K exact copies per point
  *     (which would blow candidate pairs quadratically inside LSH buckets).
  *
  * Usage: `runMain graft.tools.GenScale <srcDir> <outDir> <replicas>`.
  * Writes one parquet dir per table under outDir. Everything is a pure
  * column transform of the source — no RNG, so the output is reproducible.
  */
object GenScale {

  private def offsetKeys(df: DataFrame, rep: Int, keys: Map[String, Long]): DataFrame =
    keys.foldLeft(df) { case (d, (k, span)) => d.withColumn(k, col(k) + lit(rep * span)) }

  /** max(key)+1 — the per-replica shift that keeps key spaces disjoint. */
  private def span(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  def scaleStore(spark: SparkSession, src: String, out: String, replicas: Int): Unit = {
    require(replicas >= 1, "replicas must be >= 1")
    // events.ts replicates as whatever the source store holds — long nanos
    // (TIMESTAMP(NANOS) under the legacy flag, rewritten as plain INT64) or
    // native µs timestamps; Tables.events/Streams.eventStream probe the
    // written store's footer and normalize either layout identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      println(s"genscale: $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    // constant dims
    Seq("region", "nation").foreach(t => write(t, read(t)))

    val customer = read("customer"); val custSpan = span(customer, "c_custkey")
    val supplier = read("supplier"); val suppSpan = span(supplier, "s_suppkey")
    val part = read("part"); val partSpan = span(part, "p_partkey")
    val orders = read("orders"); val orderSpan = span(orders, "o_orderkey")
    val events = read("events"); val eventSpan = span(events, "event_id")
    val docs = read("documents"); val docSpan = span(docs, "doc_id")
    val embs = read("embeddings"); val vecSpan = span(embs, "vec_id")
    val lineitem = read("lineitem")

    def reps(f: Int => DataFrame): DataFrame =
      (0 until replicas).map(f).reduce(_ unionByName _)

    write("customer", reps(i => offsetKeys(customer, i, Map("c_custkey" -> custSpan))))
    write("supplier", reps(i => offsetKeys(supplier, i, Map("s_suppkey" -> suppSpan))))
    write("part", reps(i => offsetKeys(part, i, Map("p_partkey" -> partSpan))))
    write("orders", reps(i => offsetKeys(orders, i,
      Map("o_orderkey" -> orderSpan, "o_custkey" -> custSpan))))
    write("lineitem", reps(i => offsetKeys(lineitem, i,
      Map("l_orderkey" -> orderSpan, "l_partkey" -> partSpan, "l_suppkey" -> suppSpan))))
    write("events", reps(i => offsetKeys(events, i, Map("event_id" -> eventSpan))))

    write("documents", reps { i =>
      val shifted = offsetKeys(docs, i, Map("doc_id" -> docSpan))
      if (i == 0) shifted
      else {
        val renamed = array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"~$i"))), " ")
        shifted.withColumn("text", renamed)
          .withColumn("n_chars", length(col("text")).cast("long"))
      }
    })

    write("embeddings", reps { i =>
      val shifted = offsetKeys(embs, i, Map("vec_id" -> vecSpan))
      if (i == 0) shifted
      else {
        val n = size(col("embedding"))
        // rotation cycles 1..63, NEVER 0: an `i % dim` of zero would emit
        // exact copies of the base vectors — the quadratic LSH-bucket
        // blowup this rotation exists to avoid (testbed vectors are
        // 64-lane; any dim > 63 keeps the slice arithmetic valid)
        val rot = lit(((i - 1) % 63) + 1)
        shifted.withColumn("embedding",
          concat(slice(col("embedding"), rot + 1, n - rot), slice(col("embedding"), lit(1), rot)))
      }
    })
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GenScale <srcDir> <outDir> <replicas>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-genscale")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // sanity: documents.n_chars must equal length(text) in the source, or
    // the replica recompute would silently change its meaning
    val bad = spark.read.parquet(s"${args(0)}/documents.parquet")
      .where(col("n_chars") =!= length(col("text"))).count()
    require(bad == 0, s"documents.n_chars != length(text) on $bad source rows")
    scaleStore(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }
}
