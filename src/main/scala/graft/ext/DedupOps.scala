package graft.ext

import graft.Tables
import graft.functions.{TextFns, Vec}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for a training-data pipeline, over `documents`
  * (exact dedup lives in [[Relational.dedupExact]]; embedding near-dup over
  * `embeddings`).
  *
  * Scale design: all-pairs comparison is never materialized. Signatures are
  * a pure per-row projection (no shuffle); candidates come from MinHash
  * banding (docs agreeing on any band bucket), so the ONLY shuffle in the
  * pipeline is the self-join keyed on band buckets — the standard LSH scale
  * path (bucket sizes stay small because a band collision already implies
  * high similarity). Exact Jaccard runs only on the candidate set.
  *
  * Determinism/parity: "hash functions" are min-over-shingles of
  * md5(seed|shingle) compared as hex strings — identical in Spark and DuckDB,
  * no engine-specific hashing.
  */
object DedupOps {

  private val NumPerm = 16
  private val Bands = 4 // 4 rows per band
  private val K = 3 // shingle width (word 3-grams)

  /** DuckDB tokenizer + shingles (1-based list index) — the oracle-side
    * equivalent of the compiled [[graft.functions.WordShingles]] kernel
    * (equivalence asserted in KernelsSpec). */
  private val toksSql = "list_filter(string_split(lower(text), ' '), t -> t <> '')"
  private val shinglesSql =
    s"list_distinct(list_transform(range(1, greatest(len(t) - ${K - 1}, 0) + 1), " +
      "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"

  /** Per-doc shingle array (distinct word 3-grams) via the compiled
    * [[graft.functions.WordShingles]] kernel. The small parquet file arrives
    * as one input split; the signature computation downstream is the
    * CPU-heavy part (NumPerm md5 per shingle), so spread rows across cores
    * first — on a real multi-split source this repartition is unnecessary
    * and the kernels parallelize with the scan. */
  private def docShingles(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // guarded spread (r17, see graft.util.Spread): skipped on multi-split
    // stores, byte-aware partition count otherwise; projected to the two
    // columns the kernel reads BEFORE the exchange
    graft.util.Spread.byCols(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), TextFns.wordShingles(col("text"), K).as("shs"))
  }

  private val shinglesCte =
    s"""toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |docsh AS (SELECT doc_id, $shinglesSql AS shs FROM toks),
       |sh AS (SELECT doc_id, unnest(shs) AS sh FROM docsh)""".stripMargin

  /** MinHash signatures as a pure per-row projection via the compiled
    * [[graft.functions.MinHashSignature]] kernel: mh_i =
    * min over shingles of md5("i|shingle"). No explode, no shuffle —
    * signatures compute inside the scan stage, so at any scale the only
    * shuffle in the whole pipeline is the band-bucket self-join. (HOF and
    * aggregate formulations are semantically identical but interpret a
    * lambda per element / pay a groupBy shuffle.) */
  private def signatures(spark: SparkSession, sfDir: String): DataFrame =
    docShingles(spark, sfDir)
      .withColumn("sigs", TextFns.minhashSignature(col("shs"), NumPerm))
      .select((Seq(col("doc_id")) ++ (0 until NumPerm).map(i =>
        element_at(col("sigs"), i + 1).as(s"mh$i"))): _*)

  private val signaturesCte =
    "sig AS (SELECT doc_id, " +
      (0 until NumPerm).map(i =>
        s"list_min(list_transform(shs, s -> md5('$i|' || s))) AS mh$i").mkString(", ") +
      " FROM docsh)"

  /** Band buckets: md5 of each rows-per-band signature slice. `concat` (not
    * concat_ws) so an all-null signature row (doc with <3 tokens) gets a
    * null bucket and drops out of the join on both engines identically.
    * Parameterized over rows-per-band so [[lshTuningReport]]'s r-sweep uses
    * the PRODUCTION band construction, not a reimplementation. */
  private def bandedWith(sig: DataFrame, rowsPerBand: Int, prefix: String): DataFrame =
    (0 until NumPerm / rowsPerBand).foldLeft(sig) { (df, b) =>
      val parts = (0 until rowsPerBand)
        .map(r => col(s"mh${b * rowsPerBand + r}"))
        .flatMap(c => Seq(c, lit(","))).dropRight(1)
      df.withColumn(s"$prefix$b", md5(concat(parts: _*)))
    }

  private def banded(sig: DataFrame): DataFrame = bandedWith(sig, NumPerm / Bands, "b")

  /** The at-rest LSH band index for a store, one per (session, store) —
    * the [[graft.ext.TextOps]] trained-ladder memo applied to the index
    * this family's own production story stores at ingest
    * ([[graft.streaming.Streams]] `stream_index_upsert` maintains exactly
    * these rows at rest; `dedup_incremental` documents "the corpus index
    * is computed once at ingest and stored"). The first consumer in a
    * process pays the NumPerm-md5 signature kernel and materializes the
    * (doc_id, mh*, b*) frame eagerly (the [[minhashLsh]] localCheckpoint
    * discipline — lazy caches race concurrent recomputes, r10.1); every
    * later consumer reads the checkpointed blocks. Fingerprint-guarded:
    * a rewritten corpus re-derives. */
  private def bandIndex(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.ladderMemoized(spark, sfDir, "lshband")(
      banded(signatures(spark, sfDir)).localCheckpoint())

  private val bandedCte =
    "band AS (SELECT *, " +
      (0 until Bands).map { b =>
        val cols = (0 until NumPerm / Bands).map(r => s"mh${b * (NumPerm / Bands) + r}")
        s"md5(${cols.mkString(" || ',' || ")}) AS b$b"
      }.mkString(", ") + " FROM sig)"

  /** LSH band-tuning report — the observability artifact for the one knob
    * MinHash dedup has: rows-per-band `r`. For each r ∈ {2, 4, 8} over the
    * same 16-permutation signatures, one row with the quantities an
    * operator reads before picking r for a corpus: band count, populated
    * bucket count, the LARGEST bucket (the reducer-hotspot predictor the
    * [[MaxBucketSize]] cap guards), and the exact candidate-pair volume
    * Σ c·(c−1)/2 — the join cost r controls (small r = high recall, huge
    * pair volume; large r = precision, missed near-dups). All integer
    * window/aggregate math over the SAME (band, bucket) key the production
    * join shuffles on; no pair is materialized — the count is computed from
    * bucket sizes, so the report stays cheap even where the join wouldn't.
    * Docs with <[[K]] tokens have null signatures and drop out of every
    * config identically (concat-null band semantics, as in [[banded]]). */
  def lshTuningReport(spark: SparkSession, sfDir: String): DataFrame = {
    // DELIBERATELY uncached: the three r-branches do recompute the
    // signatures subtree, but they run as independent subtrees of ONE lazy
    // union job that keeps all cores busy — caching was tried and MEASURED
    // 3.8× slower at the 10× store (materialization barriers + 275 MB of
    // md5 strings through storage cost more than the recompute they saved).
    // The recompute-per-branch lesson (BUILDLOG r6.3) applies when branches
    // feed one ANOTHER's shuffle; here they only share a leaf scan.
    val sig = signatures(spark, sfDir)
    val perCfg = Seq(2, 4, 8).map { r =>
      val nBands = NumPerm / r
      bandedWith(sig, r, "cb")
        .select(posexplode(array((0 until nBands).map(b => col(s"cb$b")): _*))
          .as(Seq("band_idx", "bk")))
        .where(col("bk").isNotNull)
        .groupBy("band_idx", "bk").agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_buckets"),
          // empty config (every doc under K tokens): 0/0, not NULL/NULL
          coalesce(max("c"), lit(0L)).as("max_bucket"),
          coalesce(expr("CAST(sum((c * (c - 1)) DIV 2) AS BIGINT)"), lit(0L))
            .as("candidate_pairs"))
        .select(lit(r.toLong).as("rows_per_band"), lit(nBands.toLong).as("n_bands"),
          col("n_buckets"), col("max_bucket"), col("candidate_pairs"))
    }
    perCfg.reduce(_ union _).orderBy("rows_per_band")
  }

  private val lshTuningReportSql = {
    def cfg(r: Int) = {
      val nBands = NumPerm / r
      val stack = (0 until nBands).map { b =>
        val cols = (0 until r).map(i => s"mh${b * r + i}")
        s"SELECT $b AS band_idx, md5(${cols.mkString(" || ',' || ")}) AS bk FROM sig"
      }.mkString(" UNION ALL ")
      s"""SELECT CAST($r AS BIGINT) AS rows_per_band, CAST($nBands AS BIGINT) AS n_bands,
         |  CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(max(c) AS BIGINT) AS max_bucket,
         |  CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS candidate_pairs
         |FROM (SELECT band_idx, bk, count(*) AS c FROM ($stack)
         |      WHERE bk IS NOT NULL GROUP BY band_idx, bk)""".stripMargin
    }
    s"""WITH $shinglesCte,
       |$signaturesCte
       |${Seq(2, 4, 8).map(cfg).mkString("\nUNION ALL\n")}
       |ORDER BY rows_per_band""".stripMargin
  }

  /** A band bucket larger than this is excluded from candidate generation.
    * A band collision implies ~all 4 signature rows agree, so honest buckets
    * are near-dup clusters (dozens); a bucket of B docs costs B² join output,
    * and a DEGENERATE corpus (mass-duplicated boilerplate) would put
    * millions of docs in one bucket — one reducer building 10¹² pairs. The
    * cap bounds per-bucket join work; a real pipeline routes over-cap
    * buckets to exact dedup first (they are exact-dup clusters, by
    * construction of the collision). */
  private val MaxBucketSize = 2000

  /** Candidate pairs: docs sharing any band bucket (doc1 < doc2). The four
    * bands are stacked into (band_idx, bucket) rows so ONE self-join covers
    * all bands (vs four joins + union = four shuffles). Bucket sizes are
    * counted with a window over the SAME (band_idx, bk) key the join
    * shuffles on, over-cap buckets are dropped before the join, and the
    * dropped-row count is published as an `observe` metric
    * ("dedup_lsh_buckets"/overcap_rows_dropped — no extra job, readable via
    * QueryExecutionListener) so a capped run is self-identifying. */
  private[graft] def candidatePairs(band: DataFrame, maxBucket: Int = MaxBucketSize): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = band.select(col("doc_id"),
      posexplode(array((0 until Bands).map(b => col(s"b$b")): _*)).as(Seq("band_idx", "bk")))
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy("band_idx", "bk")))
    val kept = sized.where(col("__bsz") <= maxBucket).select("doc_id", "band_idx", "bk")
    // the observation rides the LEFT side only — a metric name may appear
    // once per query, and the self-join references this subtree twice
    val observedLeft = sized
      .observe("dedup_lsh_buckets",
        sum(when(col("__bsz") > maxBucket, 1L).otherwise(0L)).as("overcap_rows_dropped"))
      .where(col("__bsz") <= maxBucket)
    observedLeft.select(col("doc_id").as("doc1"), col("band_idx"), col("bk"))
      .join(kept.select(col("doc_id").as("doc2"), col("band_idx"), col("bk")),
        Seq("band_idx", "bk"))
      .where(col("doc1") < col("doc2"))
      .select("doc1", "doc2").distinct()
  }

  /** Oracle-side candidate pairs — mirrors [[candidatePairs]] INCLUDING the
    * bucket-size cap, so the two engines stay value-identical even on a
    * corpus where a bucket exceeds the cap (a Spark-only cap would silently
    * diverge the moment it fires). */
  private val pairsCte = {
    val stack = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band_idx, b$b AS bk FROM band")
      .mkString(" UNION ALL ")
    s"""stk AS (SELECT doc_id, band_idx, bk,
       |          count(*) OVER (PARTITION BY band_idx, bk) AS bsz
       |        FROM ($stack)),
       |kept AS (SELECT doc_id, band_idx, bk FROM stk WHERE bsz <= $MaxBucketSize),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc1, c.doc_id AS doc2
       |          FROM kept a JOIN kept c
       |          ON a.band_idx = c.band_idx AND a.bk = c.bk AND a.doc_id < c.doc_id)""".stripMargin
  }

  /** MinHash+LSH near-dup pairs with the signature-agreement estimate of
    * Jaccard (matches/16 — exact in binary, no float divergence). */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    // EAGER localCheckpoint, not lazy .cache(): the band frame feeds FOUR
    // plan subtrees (the capped candidate self-join's two sides + the x/y
    // signature-agreement joins), and a lazy cache does not dedupe
    // concurrently-scheduled computes of the same subtree — racing stages
    // re-run the NumPerm-md5 signature kernel over the corpus until one
    // compute lands its blocks (the r9 fuzzy-title finding). Measured at
    // the 100× store: identical plans read 8.5–29.4 s wall with the lazy
    // cache vs a stable 5.7–6.6 s eagerly materialized; at the 1000×
    // store all variants sit at the ~10× linear asymptote within the
    // box's page-cache noise (SCALING.md r10.1 — where the r9.5 15.7×
    // reading is also re-attributed to probe-context inflation: ten solo
    // runs across three materialization variants max out at 10.8×).
    // r17: the eager checkpoint moved into the per-(session, store) memo.
    val band = bandIndex(spark, sfDir)
    val est = (0 until NumPerm)
      .map(i => when(col(s"x.mh$i") === col(s"y.mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidatePairs(band)
      .join(band.as("x"), col("doc1") === col("x.doc_id"))
      .join(band.as("y"), col("doc2") === col("y.doc_id"))
      .select(col("doc1"), col("doc2"), (est.cast("double") / NumPerm.toDouble).as("est_jaccard"))
      .orderBy("doc1", "doc2")
  }

  private val minhashLshSql = {
    val est = (0 until NumPerm)
      .map(i => s"CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $shinglesCte,
       |$signaturesCte,
       |$bandedCte,
       |$pairsCte
       |SELECT p.doc1, p.doc2, CAST($est AS DOUBLE) / 16.0 AS est_jaccard
       |FROM pairs p
       |JOIN band x ON p.doc1 = x.doc_id
       |JOIN band y ON p.doc2 = y.doc_id
       |ORDER BY doc1, doc2""".stripMargin
  }

  /** Exact n-gram Jaccard over the LSH candidate set: the candidate pairs
    * (already restricted by banding) join back to the per-doc shingle
    * ARRAYS and |S1∩S2| is a per-row `array_intersect` size — the shingle
    * corpus is never exploded or shuffled, so the work is
    * O(candidates · avg_shingles), not O(corpus_shingles). Threshold 0.5
    * keeps the synthetic near-dup clusters. */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = docShingles(spark, sfDir)
    val band = bandIndex(spark, sfDir)
    candidatePairs(band)
      .join(docs.select(col("doc_id").as("doc1"), col("shs").as("s1")), Seq("doc1"))
      .join(docs.select(col("doc_id").as("doc2"), col("shs").as("s2")), Seq("doc2"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("n1", size(col("s1")).cast("long"))
      .withColumn("n2", size(col("s2")).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .where(col("jaccard") >= 0.5)
      .select("doc1", "doc2", "n1", "n2", "inter", "jaccard")
      .orderBy("doc1", "doc2")
  }

  private val ngramJaccardSql =
    s"""WITH $shinglesCte,
       |$signaturesCte,
       |$bandedCte,
       |$pairsCte,
       |j AS (
       |  SELECT p.doc1, p.doc2,
       |    CAST(len(d1.shs) AS BIGINT) AS n1, CAST(len(d2.shs) AS BIGINT) AS n2,
       |    CAST(len(list_intersect(d1.shs, d2.shs)) AS BIGINT) AS inter
       |  FROM pairs p
       |  JOIN docsh d1 ON d1.doc_id = p.doc1
       |  JOIN docsh d2 ON d2.doc_id = p.doc2)
       |SELECT doc1, doc2, n1, n2, inter,
       |  CAST(inter AS DOUBLE) / (n1 + n2 - inter) AS jaccard
       |FROM j
       |WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= 0.5
       |ORDER BY doc1, doc2""".stripMargin

  /** CONTAINMENT scoring over the candidate set (Lee et al.'s asymmetric
    * measure, "Deduplicating Training Data Makes Language Models Better"
    * §4 uses both directions): C(A→B) = |S_A ∩ S_B| / |S_A|. A short doc
    * fully embedded in a long one scores containment ≈ 1 while its
    * symmetric Jaccard (|∩|/|∪|) stays low — the quote/boilerplate-inclusion
    * case a Jaccard threshold under-counts. Same plan shape as
    * [[ngramJaccard]]: candidates from the banded index, per-row
    * array_intersect on the pair — no shingle explode, no extra shuffle.
    * `contained_doc` names the subset side (the dedup policy's drop
    * candidate); ties on equal sizes resolve to doc1 (doc1 < doc2 always).
    * Exact-integer division both engines — oracle bit-parity. */
  def ngramContainment(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = docShingles(spark, sfDir)
    val band = bandIndex(spark, sfDir)
    candidatePairs(band)
      .join(docs.select(col("doc_id").as("doc1"), col("shs").as("s1")), Seq("doc1"))
      .join(docs.select(col("doc_id").as("doc2"), col("shs").as("s2")), Seq("doc2"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("n1", size(col("s1")).cast("long"))
      .withColumn("n2", size(col("s2")).cast("long"))
      .withColumn("containment",
        greatest(col("inter").cast("double") / col("n1"),
          col("inter").cast("double") / col("n2")))
      .where(col("containment") >= 0.8)
      .withColumn("contained_doc",
        when(col("n1") <= col("n2"), col("doc1")).otherwise(col("doc2")))
      .select("doc1", "doc2", "n1", "n2", "inter", "containment", "contained_doc")
      .orderBy("doc1", "doc2")
  }

  private val ngramContainmentSql =
    s"""WITH $shinglesCte,
       |$signaturesCte,
       |$bandedCte,
       |$pairsCte,
       |j AS (
       |  SELECT p.doc1, p.doc2,
       |    CAST(len(d1.shs) AS BIGINT) AS n1, CAST(len(d2.shs) AS BIGINT) AS n2,
       |    CAST(len(list_intersect(d1.shs, d2.shs)) AS BIGINT) AS inter
       |  FROM pairs p
       |  JOIN docsh d1 ON d1.doc_id = p.doc1
       |  JOIN docsh d2 ON d2.doc_id = p.doc2)
       |SELECT doc1, doc2, n1, n2, inter,
       |  greatest(CAST(inter AS DOUBLE) / n1, CAST(inter AS DOUBLE) / n2) AS containment,
       |  CASE WHEN n1 <= n2 THEN doc1 ELSE doc2 END AS contained_doc
       |FROM j
       |WHERE greatest(CAST(inter AS DOUBLE) / n1, CAST(inter AS DOUBLE) / n2) >= 0.8
       |ORDER BY doc1, doc2""".stripMargin

  /** SimHash (32-bit, md5-nibble bits, token multiplicity weighted) via the
    * compiled [[graft.functions.SimHash32]] kernel — a pure per-row
    * projection, no explode/groupBy. (The semantically-identical relational
    * form — explode tokens, 32 signed-bit sums per doc — is what the DuckDB
    * oracle runs; a 32-aggregate plan also works in Spark but compiles a
    * huge codegen class and shuffles for no benefit.) */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // guarded spread — see docShingles / graft.util.Spread (r17)
    graft.util.Spread.byCols(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), TextFns.simhash32(col("text")).as("simhash"))
      .orderBy("doc_id")
  }

  private[graft] val simhashSql = {
    val sums = (0 until 32).map { j =>
      val nib = s"(strpos('0123456789abcdef', substr(h, ${j / 4 + 1}, 1)) - 1)"
      s"sum(2 * (($nib >> ${j % 4}) % 2) - 1) AS sum$j"
    }.mkString(",\n    ")
    val fp = (0 until 32)
      .map(j => s"CASE WHEN sum$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |tok AS (SELECT doc_id, md5(unnest(t)) AS h FROM toks),
       |s AS (SELECT doc_id,
       |    $sums
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id, $fp AS simhash FROM s ORDER BY doc_id""".stripMargin
  }

  /** Embedding cosine near-dup: candidate pairs come from sign-bit
    * random-hyperplane LSH (two 4-bit hash tables over dims 1-4 and 5-8,
    * stacked so ONE equi-self-join keyed on (table, bucket) covers both),
    * then exact cosine ≥ 0.4 on candidates only. No all-pairs join anywhere
    * — the shuffle key is the bucket id, buckets are independent, and a
    * vector lands in exactly 2 buckets (the r1 version was an O(N²)
    * broadcast nested-loop; PlanSpec now asserts BNLJ-freedom).
    *
    * The bit width is the SCALE KNOB, not a constant: with b fixed,
    * candidate volume grows as N²/2ᵇ (the 10× probe measures the fixture's
    * b=4 at ~6× — the same fixture-pinned-parameter quadratic term as
    * dedup_semantic's k=8 quantizer); production sizes b ∝ log N so
    * per-bucket occupancy (and thus candidates per vector) stays constant —
    * same mechanics, wider hash, exactly how [[lshTuningReport]]'s
    * rows-per-band sweep sizes the MinHash analogue. Dot/norm folds run in
    * array order on both engines (Spark `aggregate` ≙ DuckDB `list_reduce`)
    * so the doubles are bit-identical. */
  def embeddingCosine(spark: SparkSession, sfDir: String): DataFrame =
    embeddingCosineAt(spark, sfDir,
      SimilarityOps.embBitsFor(spark, sfDir)) // b ∝ log N, store-derivable (r14)

  /** Width-parameterized form of the b ∝ log N contract above. The oracle
    * gate never sets the env override, so the gated query is pinned at the
    * fixture's b=4 recall point; the ScaleProbe sets b≈log₂N to measure the
    * occupancy contract holding at a bigger store (SCALING.md §r7). Wider b
    * reuses the same two-table stacked shape — table i hashes dims
    * [1+i·b, (i+1)·b], so any 1 ≤ b ≤ 32 fits the 64-dim vectors. */
  def embeddingCosineAt(spark: SparkSession, sfDir: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 32, s"sign-hash width out of range: $bits")
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("norm", Vec.norm(col("embedding")))
      .withColumn("bk0", expr(SimilarityOps.signBucketExpr(1, bits)))
      .withColumn("bk1", expr(SimilarityOps.signBucketExpr(1 + bits, bits)))
    // Vectors ride INTO the bucket join and the exact cosine runs in the
    // join's own stage: shuffle volume is 2N vector rows (the stacked
    // sides), never ∝ candidate pairs. The r6 shape generated candidate
    // IDs first and re-fetched both vectors by id — two more shuffles
    // CARRYING candidate-many wide rows, which the sf10 probe measured as
    // the dominant, GC-thrashing cost (SCALING.md §sf10). distinct() now
    // runs on the cos ≥ 0.4 SURVIVORS (pairs whose two tables both
    // collide would otherwise emit twice), a far smaller set than the
    // candidates.
    val stacked = e.select(col("vec_id"), col("embedding"), col("norm"),
      posexplode(array(col("bk0"), col("bk1"))).as(Seq("tbl", "bk")))
    val a = stacked.select(col("tbl"), col("bk"),
      col("vec_id").as("id1"), col("embedding").as("e1"), col("norm").as("nm1"))
    val b = stacked.select(col("tbl"), col("bk"),
      col("vec_id").as("id2"), col("embedding").as("e2"), col("norm").as("nm2"))
    a.join(b, Seq("tbl", "bk"))
      .where(col("id1") < col("id2"))
      .withColumn("cos_sim", Vec.dot(col("e1"), col("e2")) / (col("nm1") * col("nm2")))
      .where(col("cos_sim") >= 0.4)
      .select("id1", "id2", "cos_sim").distinct()
      .orderBy("id1", "id2")
  }

  private val embeddingCosineSql = {
    def dot(x: String, y: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), " +
        s"k -> CAST($x[k] AS DOUBLE) * CAST($y[k] AS DOUBLE))), (acc, v) -> acc + v)"
    s"""WITH e AS (SELECT vec_id, embedding, sqrt(${dot("embedding", "embedding")}) AS norm,
       |    ${SimilarityOps.signBucketSql(1)} AS bk0, ${SimilarityOps.signBucketSql(5)} AS bk1
       |  FROM embeddings),
       |st AS (SELECT vec_id, 0 AS tbl, bk0 AS bk FROM e
       |       UNION ALL SELECT vec_id, 1 AS tbl, bk1 AS bk FROM e),
       |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |         FROM st a JOIN st b ON a.tbl = b.tbl AND a.bk = b.bk AND a.vec_id < b.vec_id)
       |SELECT c.id1, c.id2,
       |  ${dot("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim
       |FROM cand c JOIN e a ON a.vec_id = c.id1 JOIN e b ON b.vec_id = c.id2
       |WHERE ${dot("a.embedding", "b.embedding")} / (a.norm * b.norm) >= 0.4
       |ORDER BY id1, id2""".stripMargin
  }

  /** Near-dup CLUSTERING with a canonical survivor: connected components
    * over the LSH near-dup pairs (est_jaccard ≥ 0.5), each doc labeled with
    * the min doc_id of its component — the "keep one representative per
    * duplicate cluster" step that follows pair detection in a real dedup
    * pipeline. Implementation is min-label propagation with POINTER JUMPING
    * (label := label(label) each round, the path-halving of classic parallel
    * CC), so convergence is O(log diameter) iterations instead of linear —
    * each iteration is two equi-joins + a groupBy-min, all keyed on doc id
    * (the plan shape of large-star/small-star; at 100 TB add per-iteration
    * checkpointing to cut lineage — data movement is identical). Labels
    * decrease monotonically, so convergence is detected by one scalar
    * sum(label) aggregate per iteration — the driver never sees rows.
    * Oracle: DuckDB recursive CTE computing min reachable id.
    */
  /** The clustering OPERATOR's own query: computes honestly on every call
    * (its benchmark number must measure the iterative job, not a memo hit)
    * and refreshes the reuse seam for downstream consumers. */
  def clusterCanonical(spark: SparkSession, sfDir: String): DataFrame =
    clusterMap(spark, sfDir).orderBy("doc_id")

  /** Cluster-map REUSE seam: the canonical labels are the product of an
    * iterative multi-job computation, and every curation CONSUMER needs the
    * same map — compute it once per (session, corpus) and share the
    * lineage-truncated result, exactly as a production pipeline persists
    * the cluster-map table once and joins it from every downstream query
    * (at 100 TB this memo IS a persisted table; here the final
    * localCheckpoint plays that role). r17: the bespoke (session, sfDir)
    * cache — which a corpus rewrite could serve STALE, and which the
    * producer query refreshed by recomputing on every call — became the
    * shared corpus-fingerprint-guarded memo: recompute happens exactly
    * when the corpus listing changes, for producer and consumers alike. */
  private def clusterMap(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.ladderMemoized(spark, sfDir, "clustermap")(
      computeClusterMap(spark, sfDir))

  /** Per-run iteration trace of [[computeClusterMap]]'s pointer-jumping
    * loop: the label sum after each round (round count = trace length; the
    * final entry equals its predecessor — that equality IS the convergence
    * probe). Recorded so scale probes can pin "rounds ∝ log N" with a
    * measured number instead of an inference (round-10 verdict item 7);
    * costs zero extra jobs — the sums already drive the loop's own
    * convergence test. */
  @volatile private[graft] var lastIterSums: List[Long] = Nil

  private def computeClusterMap(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = minhashLsh(spark, sfDir)
      .where(col("est_jaccard") >= 0.5)
      .select("doc1", "doc2")
    // localCheckpoint (NOT cache): jumped references viaEdges twice, so the
    // LOGICAL plan would double every iteration — caching cuts execution but
    // Catalyst still re-analyzes the exponentially-growing tree on every
    // action (measured: iteration 2 spent seconds in planning). Truncating
    // lineage keeps each iteration's plan constant-size; on a cluster use
    // reliable checkpoint() instead (localCheckpoint dies with an executor).
    val edges = pairs.select(col("doc1").as("src"), col("doc2").as("dst"))
      .union(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // coalesce: sum over an EMPTY labels frame (corpus without near-dups)
    // is null — head().getLong would NPE instead of returning the empty
    // clustering.
    var lastSum = labels.agg(coalesce(sum("label"), lit(0L))).head().getLong(0)
    var converged = false
    var iters = 0
    lastIterSums = Nil
    while (!converged && iters < 50) {
      val prop = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
      val viaEdges = labels.union(prop)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      // pointer jumping: labels are node ids, so label(label) is defined;
      // it only decreases (label(n) <= n by construction).
      // toDF mints fresh attribute ids — a plain alias self-join over one
      // checkpointed LogicalRDD trips Spark's attribute dedup
      val jmap = viaEdges.toDF("jn", "jl")
      val jumped = viaEdges
        .join(jmap, viaEdges("label") === jmap("jn"), "left")
        .select(viaEdges("node").as("node"),
          coalesce(jmap("jl"), viaEdges("label")).as("label"))
        .localCheckpoint()
      val newSum = jumped.agg(coalesce(sum("label"), lit(0L))).head().getLong(0)
      lastIterSums = newSum :: lastIterSums
      converged = newSum == lastSum
      lastSum = newSum
      labels = jumped
      iters += 1
    }
    // Fail loud rather than silently emitting partially-propagated labels if
    // the iteration cap ever bites (pointer jumping converges in O(log
    // diameter) — 50 rounds covers components of diameter ~2^50).
    require(converged, s"clusterCanonical: label propagation not converged after $iters iterations")
    labels.select(col("node").as("doc_id"), col("label").as("canonical"))
  }

  private val clusterCanonicalSql = {
    val est = (0 until NumPerm)
      .map(i => s"CASE WHEN x.mh$i = y.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH RECURSIVE $shinglesCte,
       |$signaturesCte,
       |$bandedCte,
       |$pairsCte,
       |np AS (
       |  SELECT p.doc1, p.doc2 FROM pairs p
       |  JOIN band x ON p.doc1 = x.doc_id
       |  JOIN band y ON p.doc2 = y.doc_id
       |  WHERE CAST($est AS DOUBLE) / 16.0 >= 0.5),
       |e AS (SELECT doc1 AS a, doc2 AS b FROM np
       |      UNION ALL SELECT doc2, doc1 FROM np),
       |n AS (SELECT DISTINCT a AS node FROM e),
       |r(node, reach) AS (
       |  SELECT node, node FROM n
       |  UNION
       |  SELECT r.node, e.b FROM r JOIN e ON e.a = r.reach)
       |SELECT node AS doc_id, min(reach) AS canonical
       |FROM r GROUP BY node ORDER BY doc_id""".stripMargin
  }

  /** END-TO-END corpus curation — the composition a real training-data
    * pipeline runs as one job, here as one verified query: near-dup
    * clustering picks one canonical survivor per duplicate family
    * ([[clusterCanonical]]), non-duplicated docs pass through, and a
    * token-count quality floor drops fragments. Output = the curated corpus
    * (doc_id, lang, n_toks). Composition is where operator bugs hide
    * (survivor selection interacting with filters); the oracle checks the
    * whole chain, not the stages in isolation.
    *
    * Scale shape: clustering is the dominant cost (log-round CC over LSH
    * pairs); the survivor filter is a LEFT join against the cluster labels
    * (small — only docs IN near-dup families have labels) and the quality
    * floor is a scan-stage predicate. */
  def curationPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val clusters = clusterMap(spark, sfDir) // shared, already checkpointed
    val docs = Tables.documents(spark, sfDir)
      .withColumn("n_toks",
        expr("size(filter(split(lower(text), ' '), t -> t != ''))").cast("long"))
    docs.join(broadcast(clusters), Seq("doc_id"), "left")
      .where(col("canonical").isNull || col("canonical") === col("doc_id"))
      .where(col("n_toks") >= 30)
      .select("doc_id", "lang", "n_toks")
      .orderBy("doc_id")
  }

  private val curationPipelineSql =
    s"""WITH clusters AS ($clusterCanonicalSql),
       |d AS (SELECT doc_id, lang,
       |        CAST(len($toksSql) AS BIGINT) AS n_toks
       |      FROM documents)
       |SELECT d.doc_id, d.lang, d.n_toks
       |FROM d LEFT JOIN clusters c ON d.doc_id = c.doc_id
       |WHERE (c.canonical IS NULL OR c.canonical = d.doc_id) AND d.n_toks >= 30
       |ORDER BY d.doc_id""".stripMargin

  /** Quality-aware survivor selection: inside each near-dup family, keep
    * the HIGHEST-QUALITY member instead of the arbitrary min-id canonical —
    * the curation policy real pipelines want (dedup should drop the worse
    * copies, not whichever happened to have a larger id; ties break by id
    * for determinism). Reuses the memoized cluster map (the persisted-table
    * seam) and the [[TextOps.qualityScore]] composite; the per-family
    * ranking is one window over family members only — docs outside any
    * family never enter the shuffle. */
  def bestSurvivor(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = clusterMap(spark, sfDir)
    val quality = TextOps.qualityScore(spark, sfDir).select("doc_id", "quality")
    val w = Window.partitionBy("cluster").orderBy(col("quality").desc, col("doc_id"))
    clusters.withColumnRenamed("canonical", "cluster")
      .join(quality, Seq("doc_id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select("cluster", "doc_id", "quality", "keep")
      .orderBy("cluster", "doc_id")
  }

  private val bestSurvivorSql =
    s"""WITH clusters AS ($clusterCanonicalSql),
       |q AS (SELECT doc_id, quality FROM (${TextOps.qualityScoreSqlText})),
       |f AS (SELECT c.canonical AS cluster, c.doc_id, q.quality
       |      FROM clusters c JOIN q ON q.doc_id = c.doc_id),
       |r AS (SELECT cluster, doc_id, quality,
       |        row_number() OVER (PARTITION BY cluster ORDER BY quality DESC, doc_id) = 1 AS keep
       |      FROM f)
       |SELECT cluster, doc_id, quality, keep FROM r ORDER BY cluster, doc_id""".stripMargin

  /** INCREMENTAL dedup — the shape a production corpus actually runs: a new
    * ingest batch is checked against the EXISTING corpus (not all-pairs over
    * everything). Testbed split: a seeded md5 bucket of the doc id marks
    * ~19% of documents as the "new batch" (deterministic in both engines,
    * stable under corpus growth — same discipline as
    * [[SamplingOps.trainValTestSplit]]). Each new doc reports whether it
    * near-duplicates any corpus doc (exact shingle Jaccard ≥ 0.5 on LSH
    * candidates), and the best-matching corpus doc.
    *
    * Scale design (100 TB corpus, daily increment): the corpus band index
    * (doc_id, band_idx, bk) is computed ONCE at ingest and stored bucketed
    * by (band_idx, bk); a daily batch only shuffles ITS OWN band rows to
    * those buckets — the corpus is neither re-signed nor self-joined, and
    * the exact-Jaccard stage fetches shingle arrays for candidates only.
    * Here both sides derive from one `documents` table, so the plan shows
    * the same one candidate equi-join keyed on (band_idx, bk), reusing the
    * capped-bucket stack of [[candidatePairs]] (cap + observe metric
    * semantics identical; the cap is mirrored in the oracle).
    */
  private val IncrSeed = "graft-incr-1"

  private[graft] def isNewCol: Column =
    substring(md5(concat(lit(IncrSeed + "|"), col("doc_id").cast("string"))), 1, 1)
      .isin("0", "1", "2")

  private val isNewSql =
    s"substr(md5('$IncrSeed|' || CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')"

  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r17: the shared memoized index (eager checkpoint) replaces the
    // per-call lazy cache — same blocks every consumer reads
    val band = bandIndex(spark, sfDir)
    // same capped stack as candidatePairs: bucket sizes counted over the
    // whole (band_idx, bk) key the join shuffles on
    val sized = band.select(col("doc_id"),
      posexplode(array((0 until Bands).map(b => col(s"b$b")): _*)).as(Seq("band_idx", "bk")))
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy("band_idx", "bk")))
    val kept = sized.where(col("__bsz") <= MaxBucketSize)
      .withColumn("is_new", isNewCol)
    val cand = kept.where(col("is_new"))
      .select(col("doc_id").as("new_id"), col("band_idx"), col("bk"))
      .join(kept.where(!col("is_new"))
        .select(col("doc_id").as("corpus_id"), col("band_idx"), col("bk")),
        Seq("band_idx", "bk"))
      .select("new_id", "corpus_id").distinct()
    val docs = docShingles(spark, sfDir)
    val matches = cand
      .join(docs.select(col("doc_id").as("new_id"), col("shs").as("s1")), Seq("new_id"))
      .join(docs.select(col("doc_id").as("corpus_id"), col("shs").as("s2")), Seq("corpus_id"))
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("n1", size(col("s1")).cast("long"))
      .withColumn("n2", size(col("s2")).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .where(col("jaccard") >= 0.5)
    // best corpus match per new doc; jaccard is a ratio of small longs so
    // the double is identical in both engines, ties broken by corpus id
    val w = Window.partitionBy("new_id").orderBy(col("jaccard").desc, col("corpus_id"))
    val best = matches.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("new_id"), col("corpus_id").as("dup_of"), col("jaccard").as("dup_jaccard"))
    Tables.documents(spark, sfDir).where(isNewCol)
      .select(col("doc_id"))
      .join(best.withColumnRenamed("new_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"), col("dup_jaccard"))
      .orderBy("doc_id")
  }

  private val incrementalDedupSql =
    s"""WITH $shinglesCte,
       |$signaturesCte,
       |$bandedCte,
       |stk AS (SELECT doc_id, band_idx, bk,
       |          count(*) OVER (PARTITION BY band_idx, bk) AS bsz
       |        FROM (${(0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band_idx, b$b AS bk FROM band")
      .mkString(" UNION ALL ")})),
       |kept AS (SELECT doc_id, band_idx, bk, $isNewSql AS is_new
       |         FROM stk WHERE bsz <= $MaxBucketSize),
       |cand AS (SELECT DISTINCT a.doc_id AS new_id, c.doc_id AS corpus_id
       |         FROM kept a JOIN kept c
       |         ON a.band_idx = c.band_idx AND a.bk = c.bk
       |         WHERE a.is_new AND NOT c.is_new),
       |m AS (SELECT cand.new_id, cand.corpus_id,
       |        CAST(len(d1.shs) AS BIGINT) AS n1, CAST(len(d2.shs) AS BIGINT) AS n2,
       |        CAST(len(list_intersect(d1.shs, d2.shs)) AS BIGINT) AS inter
       |      FROM cand
       |      JOIN docsh d1 ON d1.doc_id = cand.new_id
       |      JOIN docsh d2 ON d2.doc_id = cand.corpus_id),
       |j AS (SELECT new_id, corpus_id,
       |        CAST(inter AS DOUBLE) / (n1 + n2 - inter) AS jaccard
       |      FROM m WHERE CAST(inter AS DOUBLE) / (n1 + n2 - inter) >= 0.5),
       |best AS (SELECT new_id, corpus_id AS dup_of, jaccard AS dup_jaccard
       |         FROM (SELECT *, row_number() OVER (
       |                 PARTITION BY new_id ORDER BY jaccard DESC, corpus_id) AS rk
       |               FROM j)
       |         WHERE rk = 1)
       |SELECT d.doc_id, b.dup_of IS NOT NULL AS is_dup, b.dup_of, b.dup_jaccard
       |FROM documents d LEFT JOIN best b ON d.doc_id = b.new_id
       |WHERE $isNewSql
       |ORDER BY d.doc_id""".stripMargin

  private val EmbIncrSeed = "graft-embincr-1"

  private def isNewVecCol: Column =
    substring(md5(concat(lit(EmbIncrSeed + "|"), col("vec_id").cast("string"))), 1, 1)
      .isin("0", "1", "2")

  private val isNewVecSql =
    s"substr(md5('$EmbIncrSeed|' || CAST(vec_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')"

  /** Incremental EMBEDDING dedup — the ANN analogue of
    * [[incrementalDedup]]: the corpus holds an at-rest (table, bucket)
    * sign-hash index; an ingest batch hashes ONLY itself, probes the
    * stored buckets, and exact cosine runs on candidates only. Each new
    * vector reports its best corpus match at cos ≥ 0.4 (ties → lowest
    * corpus id), never new-vs-new — matching a store where the batch is
    * admitted (and indexed) only after the dedup decision.
    *
    * Scale shape: the CORPUS NEVER MOVES. The ingest batch (the small
    * side, ~19% here and ~0.01% of a production corpus) broadcasts to the
    * bucket-partitioned index, the cosine runs in the join's own stage
    * (the [[embeddingCosineAt]] restructure), and only the cos ≥ 0.4
    * survivors flow into the per-new-vector argmax. Plan-asserted: the
    * candidate join is a BroadcastHashJoin — no shuffle of the corpus
    * side (PlanSpec r7). At 100 TB the broadcast side is the batch and
    * the stored index is bucketed by (tbl, bk); either way the data that
    * moves is O(batch), not O(corpus). */
  def embeddingIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("norm", Vec.norm(col("embedding")))
      .withColumn("bk0", expr(SimilarityOps.signBucketExpr(1)))
      .withColumn("bk1", expr(SimilarityOps.signBucketExpr(5)))
      .withColumn("is_new", isNewVecCol)
    val stacked = e.select(col("vec_id"), col("embedding"), col("norm"), col("is_new"),
      posexplode(array(col("bk0"), col("bk1"))).as(Seq("tbl", "bk")))
    val corpus = stacked.where(!col("is_new")).select(col("tbl"), col("bk"),
      col("vec_id").as("corpus_id"), col("embedding").as("ce"), col("norm").as("cn"))
    val batch = stacked.where(col("is_new")).select(col("tbl"), col("bk"),
      col("vec_id").as("new_id"), col("embedding").as("ne"), col("norm").as("nn"))
    val matches = corpus.join(broadcast(batch), Seq("tbl", "bk"))
      .withColumn("cos_sim", Vec.dot(col("ne"), col("ce")) / (col("nn") * col("cn")))
      .where(col("cos_sim") >= 0.4)
      .select("new_id", "corpus_id", "cos_sim").distinct()
    val w = Window.partitionBy("new_id").orderBy(col("cos_sim").desc, col("corpus_id"))
    val best = matches.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("new_id").as("vec_id"), col("corpus_id").as("dup_of"),
        col("cos_sim").as("dup_cos"))
    Tables.embeddings(spark, sfDir).where(isNewVecCol).select(col("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("dup_of").isNotNull.as("is_dup"),
        col("dup_of"), col("dup_cos"))
      .orderBy("vec_id")
  }

  private val embeddingIncrementalSql = {
    def dot(x: String, y: String) =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65), " +
        s"k -> CAST($x[k] AS DOUBLE) * CAST($y[k] AS DOUBLE))), (acc, v) -> acc + v)"
    s"""WITH e AS (SELECT vec_id, embedding,
       |    sqrt(${dot("embedding", "embedding")}) AS norm,
       |    ${SimilarityOps.signBucketSql(1)} AS bk0, ${SimilarityOps.signBucketSql(5)} AS bk1,
       |    $isNewVecSql AS is_new
       |  FROM embeddings),
       |st AS (SELECT vec_id, embedding, norm, is_new, 0 AS tbl, bk0 AS bk FROM e
       |       UNION ALL SELECT vec_id, embedding, norm, is_new, 1, bk1 FROM e),
       |m AS (SELECT DISTINCT b.vec_id AS new_id, c.vec_id AS corpus_id,
       |        ${dot("b.embedding", "c.embedding")} / (b.norm * c.norm) AS cos_sim
       |      FROM st b JOIN st c ON b.tbl = c.tbl AND b.bk = c.bk
       |      WHERE b.is_new AND NOT c.is_new
       |        AND ${dot("b.embedding", "c.embedding")} / (b.norm * c.norm) >= 0.4),
       |best AS (SELECT new_id, corpus_id AS dup_of, cos_sim AS dup_cos FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY new_id ORDER BY cos_sim DESC, corpus_id) AS rk FROM m)
       |  WHERE rk = 1)
       |SELECT e0.vec_id, b.dup_of IS NOT NULL AS is_dup, b.dup_of, b.dup_cos
       |FROM embeddings e0 LEFT JOIN best b ON e0.vec_id = b.new_id
       |WHERE $isNewVecSql
       |ORDER BY vec_id""".stripMargin
  }

  private val SemDedupTau = 0.98

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space with a coarse quantizer, then compare pairs
    * ONLY within a cluster — a doc is dropped when a lower-id doc in its
    * cluster has cosine ≥ τ. This is the scale contract of the paper: the
    * quadratic term is bounded per cell (cells are the shuffle key, cell
    * populations are quantizer-balanced), so no all-pairs join ever forms
    * across the corpus. Distinct from [[embeddingCosine]] (sign-bit LSH
    * candidates, near-exact dup detection): SemDeDup targets SEMANTIC
    * redundancy at a lower τ, where LSH bucket collisions would miss
    * paraphrase-distance pairs that share a cell.
    *
    * Runs on the clustered fixture ([[SimilarityOps.clusteredEmbeddings]] —
    * the corpus shape where semantic duplicates exist; the real testbed
    * embeddings are isotropic noise, SCALING.md §ANN). Cells = the
    * quantizer's fit, as in [[SimilarityOps.clusteredRecall]]. */
  def semDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // k ∝ N probe knob (the paper's scale contract): with a per-cell
    // POPULATION target set, each store derives its own cell count, so one
    // ScaleProbe run sizes the quantizer per store (sf1.0 → 80 cells,
    // sf10 → 800 at target 250). The oracle gate never sets it → the gated
    // query stays at the fixture's 8 generator cells.
    val cells = sys.env.get("SPARK_GRAFT_SEM_TARGET") match {
      case None => 8
      case Some(t) =>
        val target =
          try t.trim.toLong
          catch {
            case e: NumberFormatException => throw new IllegalArgumentException(
              s"env SPARK_GRAFT_SEM_TARGET must be an integer, got '$t'", e)
          }
        val n = Tables.embeddings(spark, sfDir).count()
        val raw = math.max(8L, n / target)
        (((raw + 7) / 8) * 8).toInt // multiple of 8 → refines generator cells
    }
    semDedupAt(spark, sfDir, cells)
  }

  /** Cell-count-parameterized [[semDedup]]: the quantizer key is
    * `vec_id % cells`. Any multiple of 8 REFINES the fixture generator's 8
    * clusters (x % 8k determines x % 8), so semantic duplicates still share
    * a cell; per-cell population — and thus the bounded quadratic — shrinks
    * ∝ 1/cells. cells=8 is bit-identical to the gated query. */
  def semDedupAt(spark: SparkSession, sfDir: String, cells: Int): DataFrame = {
    require(cells >= 8 && cells % 8 == 0, s"cells must be a positive multiple of 8: $cells")
    val e = SimilarityOps.clusteredEmbeddings(spark, sfDir)
      .withColumn("qcl", col("vec_id") % cells)
      .withColumn("norm", Vec.norm(col("embedding")))
    val a = e.select(col("qcl"), col("vec_id").as("a_id"),
      col("embedding").as("ae"), col("norm").as("an"))
    val b = e.select(col("qcl"), col("vec_id").as("b_id"),
      col("embedding").as("be"), col("norm").as("bn"))
    val dropped = a.join(b, Seq("qcl"))
      .where(col("a_id") < col("b_id"))
      .where(Vec.dot(col("ae"), col("be")) / (col("an") * col("bn")) >= SemDedupTau)
      .select(col("b_id").as("vec_id")).distinct()
    e.join(dropped.withColumn("__dup", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cl"), col("__dup").isNull.as("keep"))
      .orderBy("vec_id")
  }

  private val semDedupSql =
    s"""WITH ce AS (
       |  SELECT vec_id, vec_id % 8 AS cl, ${SimilarityOps.clusteredEmbSql} AS embedding
       |  FROM embeddings),
       |e AS (SELECT vec_id, cl, embedding,
       |    sqrt(${SimilarityOps.dotSql("embedding", "embedding")}) AS norm FROM ce),
       |dropped AS (SELECT DISTINCT b.vec_id
       |  FROM e a JOIN e b ON a.cl = b.cl AND a.vec_id < b.vec_id
       |  WHERE ${SimilarityOps.dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm)
       |        >= $SemDedupTau)
       |SELECT e.vec_id, e.cl, d.vec_id IS NULL AS keep
       |FROM e LEFT JOIN dropped d ON e.vec_id = d.vec_id
       |ORDER BY e.vec_id""".stripMargin

  /** [[semDedup]] with the quantizer's cells TRAINED — the last leg of the
    * r6 verdict's "wire kmeansTrain into the quantizing read paths" (PQ and
    * IVF closed in [[SimilarityOps.pqTrained]]/[[SimilarityOps.ivfTrained]]).
    * The cell key is no longer fixture arithmetic (`vec_id % 8`) but the
    * Lloyd codebook's argmin assignment ([[SimilarityOps]]'
    * trainedAssignment); the within-cell pairwise compare, τ, and the
    * keep/drop contract are bit-identical to [[semDedup]]. Scale shape is
    * unchanged — the trained cell id is the one shuffle key, the centroids
    * ship as literals, and the bounded per-cell quadratic follows the k ∝ N
    * contract with k now the TRAINER's knob rather than the fixture's. The
    * DuckDB oracle re-derives the same training (unrolled Lloyd CTEs) and
    * hash-matches, so trained provenance is gate-checked end-to-end. */
  def semDedupTrained(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = SimilarityOps.trainedAssignment(spark, sfDir)
      .select(col("vec_id"), col("cell"))
    val e = SimilarityOps.clusteredEmbeddings(spark, sfDir)
      .join(cells, Seq("vec_id"))
      .withColumn("norm", Vec.norm(col("embedding")))
    val a = e.select(col("cell"), col("vec_id").as("a_id"),
      col("embedding").as("ae"), col("norm").as("an"))
    val b = e.select(col("cell"), col("vec_id").as("b_id"),
      col("embedding").as("be"), col("norm").as("bn"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("a_id") < col("b_id"))
      .where(Vec.dot(col("ae"), col("be")) / (col("an") * col("bn")) >= SemDedupTau)
      .select(col("b_id").as("vec_id")).distinct()
    e.join(dropped.withColumn("__dup", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("__dup").isNull.as("keep"))
      .orderBy("vec_id")
  }

  private val semDedupTrainedSql =
    s"""WITH ${SimilarityOps.trainedAssignmentCtes},
       |e AS (SELECT a.vec_id, a.cell, ce.embedding,
       |    sqrt(${SimilarityOps.dotSql("ce.embedding", "ce.embedding")}) AS norm
       |  FROM assigned a JOIN ce ON ce.vec_id = a.vec_id),
       |dropped AS (SELECT DISTINCT b.vec_id
       |  FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${SimilarityOps.dotSql("a.embedding", "b.embedding")} / (a.norm * b.norm)
       |        >= $SemDedupTau)
       |SELECT e.vec_id, e.cell, d.vec_id IS NULL AS keep
       |FROM e LEFT JOIN dropped d ON e.vec_id = d.vec_id
       |ORDER BY e.vec_id""".stripMargin

  /** Paragraph width for [[paragraphDedup]] on the newline-free synthetic
    * corpus: aligned 20-word chunks stand in for `\n\n`-delimited paragraphs
    * (a real corpus passes its delimiter split instead — the pipeline from
    * the split onward is identical). */
  private val ParaWords = 20

  /** Paragraph-level EXACT dedup — the RefinedWeb/MassiveText pass that
    * whole-document dedup cannot replace: a paragraph occurring in ≥ 2
    * distinct documents (navigation chrome, license blocks, boilerplate
    * headers) is removed from ALL of them, and each document's remaining
    * paragraphs are reassembled in order. Distinct from
    * [[TextOps.boilerplateNgrams]] (which only REPORTS shared n-grams) and
    * `text_dup_spans` (overlapping window spans): this op performs the
    * REMOVAL and re-emits the document. Within-doc repeats are deliberately
    * exempt (that is `text_repetition`'s signal) — the frequency key is
    * distinct-document count.
    *
    * Scale shape: the corpus text moves through exactly two keyed shuffles —
    * (1) paragraph rows keyed on the 128-bit md5 digest, where an
    * O(1)-state min≠max window marks cross-doc duplicates (no countDistinct
    * aggregate, no anti-join, no recompute of the explode subtree), and
    * (2) rows keyed on doc_id for the conditional ordered reassembly. No
    * broadcast of anything corpus-sized; duplicate-paragraph cardinality
    * never materializes on the driver. Output is verification-friendly:
    * per-doc paragraph counts plus
    * an md5 of the reassembled text, so the oracle proves the exact
    * reconstruction without shipping the text through the hash compare. */
  def paragraphDedup(spark: SparkSession, sfDir: String): DataFrame =
    paragraphDedupOf(Tables.documents(spark, sfDir))

  private[graft] def paragraphDedupOf(
      documents: DataFrame, chunkWords: Int = ParaWords): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(chunkWords > 0, s"paragraphDedup: chunkWords must be positive, got $chunkWords")
    val docs = documents.select(col("doc_id"),
      expr("filter(split(lower(text), ' '), t -> t != '')").as("toks"))
    val nParas = expr(s"cast(ceil(size(toks) / $chunkWords.0) as bigint)")
    val totals = docs.select(col("doc_id"), nParas.as("n_paras"))
    // aligned chunk texts; empty docs explode to zero rows (totals keep them)
    val parasArr = expr(
      s"""case when size(toks) = 0 then cast(array() as array<string>)
         |else transform(sequence(0, cast(ceil(size(toks) / $chunkWords.0) as int) - 1),
         |       i -> array_join(slice(toks, i * $chunkWords + 1, $chunkWords), ' '))
         |end""".stripMargin)
    val paras = docs
      .select(col("doc_id"), posexplode(parasArr).as(Seq("idx", "para")))
      .withColumn("ph", md5(col("para")))
    // "≥ 2 distinct docs" ⟺ min(doc_id) ≠ max(doc_id) over the digest —
    // O(1)-state window instead of countDistinct + anti-join, so every
    // paragraph row passes the pipeline exactly once (see cdcChunkDedupOf)
    val wDup = Window.partitionBy("ph")
    val marked = paras.withColumn("multi_doc",
      min("doc_id").over(wDup) =!= max("doc_id").over(wDup))
    val keptStruct = when(!col("multi_doc"), struct(col("idx"), col("para")))
    val agg = marked.groupBy("doc_id").agg(
      sum(when(!col("multi_doc"), 1L).otherwise(0L)).as("kept_paras"),
      coalesce(sum(when(!col("multi_doc"), expr("size(split(para, ' '))").cast("long"))),
        lit(0L)).as("kept_tokens"),
      // collect_list skips the nulls `when` leaves for removed paragraphs;
      // an all-removed doc reassembles "" → md5("")
      md5(array_join(
        transform(array_sort(collect_list(keptStruct)), x => x.getField("para")),
        " ")).as("kept_hash"))
    // left join keeps zero-token docs (no paragraphs) in the output
    totals.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        (col("n_paras") - coalesce(col("kept_paras"), lit(0L))).as("n_removed"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("kept_hash"), md5(lit(""))).as("kept_hash"))
      .orderBy("doc_id")
  }

  private val paragraphDedupSql =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |n AS (SELECT doc_id, CAST(ceil(len(toks) / $ParaWords.0) AS BIGINT) AS n_paras FROM t),
       |e AS (SELECT doc_id, toks,
       |        unnest(range(0, CAST(ceil(len(toks) / $ParaWords.0) AS BIGINT))) AS i
       |      FROM t),
       |p AS (SELECT doc_id, i,
       |        array_to_string(toks[(i * $ParaWords + 1):(i * $ParaWords + $ParaWords)], ' ') AS para
       |      FROM e),
       |dup AS (SELECT para FROM p GROUP BY para HAVING count(DISTINCT doc_id) >= 2),
       |k AS (SELECT p.doc_id, p.i, p.para FROM p ANTI JOIN dup d ON p.para = d.para),
       |a AS (SELECT doc_id, count(*) AS kept_paras,
       |        CAST(sum(len(string_split(para, ' '))) AS BIGINT) AS kept_tokens,
       |        md5(string_agg(para, ' ' ORDER BY i)) AS kept_hash
       |      FROM k GROUP BY doc_id)
       |SELECT n.doc_id, n.n_paras,
       |  n.n_paras - coalesce(a.kept_paras, 0) AS n_removed,
       |  coalesce(a.kept_tokens, 0) AS kept_tokens,
       |  coalesce(a.kept_hash, md5('')) AS kept_hash
       |FROM n LEFT JOIN a USING (doc_id)
       |ORDER BY n.doc_id""".stripMargin

  /** Gear-hash modulus for [[cdcChunkDedup]]: a token ends a chunk when its
    * content hash ≡ 0 (mod CdcMod) → expected chunk length ≈ CdcMod words. */
  private val CdcMod = 8L

  /** Content-defined-chunking (CDC) dedup — the rolling-boundary answer to
    * [[paragraphDedup]]'s structural blind spot: ALIGNED chunking breaks
    * under insertion (one word prepended to a copied document shifts every
    * fixed-width chunk, so no chunk matches and the duplicate text
    * survives). CDC instead cuts a chunk wherever a token's CONTENT hash
    * hits the gear condition (31-poly-mod-1e9+7 of the word ≡ 0 mod 8 — the
    * same parity hash idiom as `text_fingerprint`), so boundaries are a
    * function of the text itself and RESYNCHRONIZE right after any edit —
    * the storage-dedup trick (LBFS/Venti lineage) applied to corpus
    * curation. Chunks occurring in ≥ 2 distinct docs are removed from all
    * of them, docs reassembled in order, reconstruction md5-verified —
    * identical removal semantics to [[paragraphDedupOf]], different
    * boundary discipline (the QueriesSpec fixture pins the divergence: a
    * one-word prepend defeats aligned chunking but not CDC).
    *
    * Scale shape: ONE linear chain, every row passes once — token rows
    * shuffle by doc_id (boundary prefix count; the chunk assembly
    * groupBy(doc_id, chunk_id) reuses that exchange), chunk rows shuffle by
    * digest (the min≠max dup-marking window — O(1) state per group, no
    * countDistinct aggregate, no self-join, no subtree recompute), then
    * back by doc_id for the conditional reassembly aggregate. Same family
    * as `text_dup_spans`; nothing corpus-sized broadcasts. A viral chunk
    * makes a hot digest group either way (join or window) — the window
    * buffer spills rather than OOMs. Docs are emitted per tokenized doc
    * (an empty doc has no chunks and no row — both engines agree). */
  def cdcChunkDedup(spark: SparkSession, sfDir: String): DataFrame =
    cdcChunkDedupOf(Tables.documents(spark, sfDir))

  private[graft] def cdcChunkDedupOf(
      documents: DataFrame, gearMod: Long = CdcMod): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gearMod >= 2, s"cdcChunkDedup: gearMod $gearMod cuts a chunk per token")
    // per-token (word, gear-hash) pairs via the compiled kernel (r17,
    // guide §4: the HOF form interpreted a lambda per CHARACTER — a
    // triple-nested transform/aggregate/transform — and computed it all
    // inside the single input split); boundary AFTER a gear-hit token.
    // Guarded spread before the kernel, the docShingles discipline.
    val hashed = graft.util.Spread
      .byCols(documents.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"),
        posexplode(graft.functions.TextFns.cdcGearTokens(col("text")))
          .as(Seq("pos", "tg")))
      .select(col("doc_id"), col("pos"), col("tg.w").as("w"),
        (col("tg.g") % gearMod === 0).cast("int").as("b"))
    val wCh = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = hashed
      .withColumn("chunk_id", coalesce(sum("b").over(wCh), lit(0L)))
      .groupBy("doc_id", "chunk_id")
      .agg(min("pos").as("cpos"),
        count(lit(1)).cast("long").as("c_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ").as("chunk"))
      .withColumn("ch", md5(col("chunk")))
    // "≥ 2 distinct docs" ⟺ min(doc_id) ≠ max(doc_id) over the digest — an
    // O(1)-state window instead of a countDistinct aggregate + self-join:
    // every chunk row passes the pipeline ONCE (the naive three-reference
    // form recomputed the whole explode+window+agg subtree per branch)
    val wDup = Window.partitionBy("ch")
    val marked = chunks.withColumn("multi_doc",
      min("doc_id").over(wDup) =!= max("doc_id").over(wDup))
    val keptStruct = when(!col("multi_doc"), struct(col("cpos"), col("chunk")))
    marked.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      sum(when(col("multi_doc"), 1L).otherwise(0L)).as("n_removed"),
      coalesce(sum(when(!col("multi_doc"), col("c_tokens"))), lit(0L)).as("kept_tokens"),
      // collect_list skips the nulls the `when` leaves for removed chunks;
      // an all-removed doc reassembles "" → md5("") like the oracle
      md5(array_join(
        transform(array_sort(collect_list(keptStruct)), x => x.getField("chunk")),
        " ")).as("kept_hash"))
      .select("doc_id", "n_chunks", "n_removed", "kept_tokens", "kept_hash")
      .orderBy("doc_id")
  }

  private val cdcChunkDedupSql =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents WHERE len($toksSql) > 0),
       |x AS (SELECT doc_id, unnest(toks) AS w, unnest(range(0, len(toks))) AS pos FROM t),
       |h AS (SELECT doc_id, pos, w,
       |        CASE WHEN list_reduce(
       |          list_prepend(CAST(0 AS BIGINT),
       |            list_transform(range(1, length(w) + 1),
       |                           i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),
       |          (h, c) -> (h * 31 + c) % 1000000007) % $CdcMod = 0
       |        THEN 1 ELSE 0 END AS b
       |      FROM x),
       |c AS (SELECT doc_id, pos, w,
       |        coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
       |      FROM h),
       |ch AS (SELECT doc_id, chunk_id, min(pos) AS cpos, count(*) AS c_tokens,
       |         string_agg(w, ' ' ORDER BY pos) AS chunk
       |       FROM c GROUP BY doc_id, chunk_id),
       |dup AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(DISTINCT doc_id) >= 2),
       |k AS (SELECT ch.doc_id, ch.cpos, ch.c_tokens, ch.chunk
       |      FROM ch ANTI JOIN dup d ON ch.chunk = d.chunk),
       |n AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id),
       |a AS (SELECT doc_id, count(*) AS kept_chunks,
       |        CAST(sum(c_tokens) AS BIGINT) AS kept_tokens,
       |        md5(string_agg(chunk, ' ' ORDER BY cpos)) AS kept_hash
       |      FROM k GROUP BY doc_id)
       |SELECT n.doc_id, n.n_chunks,
       |  n.n_chunks - coalesce(a.kept_chunks, 0) AS n_removed,
       |  coalesce(a.kept_tokens, 0) AS kept_tokens,
       |  coalesce(a.kept_hash, md5('')) AS kept_hash
       |FROM n LEFT JOIN a USING (doc_id)
       |ORDER BY n.doc_id""".stripMargin

  /** The split rule of [[SamplingOps.trainValTestSplit]] as a per-row
    * expression: bucket = first two md5 hex chars of (seed|doc_id) mod 10;
    * 0-7 train, 8 val, 9 test. Same seed, same arithmetic — so this op
    * composes with that split, not a parallel notion of it. */
  private def splitOf(id: Column): Column = {
    val bucket = conv(substring(md5(concat(lit(SamplingOps.Seed + "|"), id.cast("string"))), 1, 2),
      16, 10).cast("long") % 10
    when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
  }

  private def splitSql(idCol: String): String = {
    def nib(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5('${SamplingOps.Seed}|' || CAST($idCol AS VARCHAR)), $i, 1)) - 1)"
    s"CASE WHEN (16 * ${nib(1)} + ${nib(2)}) % 10 < 8 THEN 'train' " +
      s"WHEN (16 * ${nib(1)} + ${nib(2)}) % 10 = 8 THEN 'val' ELSE 'test' END"
  }

  /** Cross-split near-duplicate leakage purge — the eval-integrity pass a
    * train/val/test split needs AFTER near-dup detection: an eval document
    * whose near-duplicate sits in train leaks the benchmark into the
    * training set (Brown et al. 2020 §C measure exactly this contamination;
    * Lee et al. 2021 §6.2 find ~1% of eval sets duplicated in common
    * training corpora). Candidates come from the SAME MinHash band index as
    * [[minhashLsh]]; the split label is the SAME md5-bucket rule as
    * [[SamplingOps.trainValTestSplit]] (seed, nibble math, 80/10/10), so
    * the purge list composes exactly with both existing ops. Output: each
    * (train_doc, eval_doc) candidate pair crossing the split, with the eval
    * side's split — the train docs to drop, with the evidence.
    *
    * Scale shape: the split label is derived per-row from the doc id (a
    * pure projection on the pair stream — NO join against a split table, no
    * extra shuffle); the only shuffle remains the band-bucket self-join
    * that candidate generation already pays. */
  def splitLeakagePurge(spark: SparkSession, sfDir: String): DataFrame = {
    // eagerly materialized: candidatePairs' self-join consumes the band
    // frame twice, and the NumPerm-md5 signature kernel is the CPU cost of
    // the whole op — same discipline as [[minhashLsh]] (uncached probed
    // 11.7× on 10× rows, SCALING.md r7; lazy-cached, the two join sides
    // race into concurrent recomputes — r10.1); r17: via the shared memo
    val band = bandIndex(spark, sfDir)
    candidatePairs(band)
      .withColumn("split1", splitOf(col("doc1")))
      .withColumn("split2", splitOf(col("doc2")))
      .where((col("split1") === "train" && col("split2") =!= "train")
        || (col("split1") =!= "train" && col("split2") === "train"))
      .select(
        when(col("split1") === "train", col("doc1")).otherwise(col("doc2")).as("train_doc"),
        when(col("split1") === "train", col("doc2")).otherwise(col("doc1")).as("eval_doc"),
        when(col("split1") === "train", col("split2")).otherwise(col("split1")).as("eval_split"))
      .orderBy("train_doc", "eval_doc")
  }

  private val splitLeakagePurgeSql =
    s"""WITH $shinglesCte,
       |$signaturesCte,
       |$bandedCte,
       |$pairsCte,
       |sp AS (SELECT doc1, doc2,
       |         ${splitSql("doc1")} AS split1,
       |         ${splitSql("doc2")} AS split2
       |       FROM pairs)
       |SELECT
       |  CASE WHEN split1 = 'train' THEN doc1 ELSE doc2 END AS train_doc,
       |  CASE WHEN split1 = 'train' THEN doc2 ELSE doc1 END AS eval_doc,
       |  CASE WHEN split1 = 'train' THEN split2 ELSE split1 END AS eval_split
       |FROM sp
       |WHERE (split1 = 'train') <> (split2 = 'train')
       |ORDER BY train_doc, eval_doc""".stripMargin

  /** Detector-agreement report — the observability artifact for CHOOSING a
    * near-dup detector: the three pair-level detectors this library ships
    * (MinHash-LSH at est ≥ 0.5, exact-SimHash collision, winnowing-index
    * at jaccard ≥ 0.5) run over the same corpus and the report counts each
    * pair set, every pairwise intersection, and the set-level Jaccard
    * agreement. Low agreement between two detectors on YOUR corpus is the
    * signal to audit thresholds before trusting either's drop list.
    *
    * Scale shape: each detector keeps its own (already scale-audited)
    * plan; the agreement stage unions bare (doc1, doc2, detector) triples
    * — 20 bytes/pair — into ONE groupBy on the pair key and ONE global
    * conditional-count rollup to 3 output rows. No detector's internals
    * are re-shuffled. */
  def detectorAgreement(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mh = minhashLsh(spark, sfDir).where(col("est_jaccard") >= 0.5)
      .select(col("doc1"), col("doc2"), lit("minhash").as("det"))
    val sh0 = simhash(spark, sfDir).select("doc_id", "simhash")
    val sh = sh0.select(col("doc_id").as("doc1"), col("simhash"))
      .join(sh0.select(col("doc_id").as("doc2"), col("simhash")), Seq("simhash"))
      .where(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"), lit("simhash").as("det"))
    val wn = TextOps.winnowPairs(spark, sfDir).where(col("jaccard") >= 0.5)
      .select(col("doc1"), col("doc2"), lit("winnow").as("det"))
    val flags = mh.unionByName(sh).unionByName(wn)
      .groupBy("doc1", "doc2")
      .agg(expr("bool_or(det = 'minhash')").as("m"),
        expr("bool_or(det = 'simhash')").as("s"),
        expr("bool_or(det = 'winnow')").as("w"))
    val agg = flags.agg(
      count(when(col("m"), 1)).as("pm"),
      count(when(col("s"), 1)).as("ps"),
      count(when(col("w"), 1)).as("pw"),
      count(when(col("m") && col("s"), 1)).as("ms"),
      count(when(col("m") && col("w"), 1)).as("mw"),
      count(when(col("s") && col("w"), 1)).as("sw"))
    agg.select(expr(
      """stack(3,
        |  'minhash', 'simhash', pm, ps, ms,
        |  'minhash', 'winnow', pm, pw, mw,
        |  'simhash', 'winnow', ps, pw, sw)
        |AS (det_a, det_b, pairs_a, pairs_b, shared)""".stripMargin))
      .withColumn("agreement", col("shared").cast("double") /
        (col("pairs_a") + col("pairs_b") - col("shared")).cast("double"))
      .orderBy("det_a", "det_b")
  }

  private def detectorAgreementSql =
    s"""WITH mh AS (SELECT doc1, doc2 FROM ($minhashLshSql) WHERE est_jaccard >= 0.5),
       |sh0 AS (SELECT doc_id, simhash FROM ($simhashSql)),
       |shp AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2
       |        FROM sh0 a JOIN sh0 b ON a.simhash = b.simhash AND a.doc_id < b.doc_id),
       |wnp AS (SELECT doc1, doc2 FROM (${TextOps.winnowPairsSql}) WHERE jaccard >= 0.5),
       |u AS (SELECT doc1, doc2, 'minhash' AS det FROM mh
       |      UNION ALL SELECT doc1, doc2, 'simhash' FROM shp
       |      UNION ALL SELECT doc1, doc2, 'winnow' FROM wnp),
       |f AS (SELECT doc1, doc2,
       |        bool_or(det = 'minhash') AS m, bool_or(det = 'simhash') AS s,
       |        bool_or(det = 'winnow') AS w
       |      FROM u GROUP BY doc1, doc2),
       |a AS (SELECT
       |        count(*) FILTER (WHERE m) AS pm, count(*) FILTER (WHERE s) AS ps,
       |        count(*) FILTER (WHERE w) AS pw,
       |        count(*) FILTER (WHERE m AND s) AS ms,
       |        count(*) FILTER (WHERE m AND w) AS mw,
       |        count(*) FILTER (WHERE s AND w) AS sw
       |      FROM f),
       |r AS (SELECT 'minhash' AS det_a, 'simhash' AS det_b, pm AS pairs_a, ps AS pairs_b, ms AS shared FROM a
       |      UNION ALL SELECT 'minhash', 'winnow', pm, pw, mw FROM a
       |      UNION ALL SELECT 'simhash', 'winnow', ps, pw, sw FROM a)
       |SELECT det_a, det_b, pairs_a, pairs_b, shared,
       |  CAST(shared AS DOUBLE) / (pairs_a + pairs_b - shared) AS agreement
       |FROM r ORDER BY det_a, det_b""".stripMargin

  /** Stacked (doc_id, band_idx, bk) band rows over an ARBITRARY documents
    * frame — the per-batch half of streaming index maintenance
    * ([[graft.streaming.Streams]] `stream_index_upsert`): same compiled
    * shingle/minhash kernels and band construction as the batch pipeline,
    * so the streamed index is bit-identical to what a batch build writes.
    * Null buckets (docs under [[K]] tokens) are dropped here, mirroring
    * the join-never-matches-null semantics both engines share. */
  private[graft] def bandRowsOf(
      documents: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    // `carry` rides extra columns through unchanged (r16): the streamed
    // index keeps its batch's `__shard` as DATA instead of re-attaching it
    // as a per-batch literal — a literal bakes the shard VALUE into the
    // generated code, so every micro-batch's probe/append plans missed the
    // codegen cache and re-ran Janino (thread dumps: 38/177 executor
    // samples waiting in CodeGenerator.compile).
    val sig = graft.util.Spread.byCols(
        documents.select(Seq(col("doc_id"), col("text")) ++ carry.map(col): _*),
        col("doc_id"))
      .select(Seq(col("doc_id"), TextFns.wordShingles(col("text"), K).as("shs")) ++
        carry.map(col): _*)
      .withColumn("sigs", TextFns.minhashSignature(col("shs"), NumPerm))
      .select((Seq(col("doc_id")) ++ (0 until NumPerm).map(i =>
        element_at(col("sigs"), i + 1).as(s"mh$i")) ++ carry.map(col)): _*)
    banded(sig).select(Seq(col("doc_id")) ++ carry.map(col) :+
      posexplode(array((0 until Bands).map(b => col(s"b$b")): _*)).as(Seq("band_idx", "bk")): _*)
      .where(col("bk").isNotNull)
  }

  /** Oracle CTE chain ending in `stk` = the same stacked band rows. */
  private[graft] val bandStackCtes =
    s"""$shinglesCte,
       |$signaturesCte,
       |$bandedCte,
       |stk AS (SELECT doc_id, band_idx, bk FROM (${(0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band_idx, b$b AS bk FROM band")
      .mkString(" UNION ALL ")}) WHERE bk IS NOT NULL)""".stripMargin

  /** Title length, segment width, and edit-distance threshold for
    * [[fuzzyTitle]]. 4 segments of [[SegW]] cover the 4·SegW-char
    * title; by pigeonhole, two titles within substitution distance 3 agree
    * on at least one aligned segment, so segment-equality blocking is
    * EXACT for that edit model (insertions/deletions that shift alignment
    * are best-effort, like any blocked fuzzy join — the LSH recall-contract
    * discipline). */
  private val SegW = 12
  private val FuzzyMaxDist = 3

  /** Fuzzy-title near-dup pairs via PassJoin-style segment blocking + exact
    * edit distance (Li et al., PVLDB 2011 — ICDE "PassJoin" family; the
    * ed-join pattern dedup pipelines use for titles/URLs where token
    * shingles are too coarse).
    *
    * Scale shape: the ONLY shuffle keyed on pair identity is the
    * (si, sv) segment equi-join — never all pairs. Segment width is the
    * selectivity knob (12 lowercase chars ≈ 2 words): identical windows
    * across unrelated docs are rare, so buckets stay near-dup-sized
    * (measured max 13 docs at sf0.1); widen SegW with corpus growth the
    * way LSH widens b ∝ log N — MEASURED over two decades: the
    * fixture-pinned segw=12 candidate volume grew 33× on 10× docs (common
    * first-words pile up ∝ N, pairs ∝ N²/V) while at-contract widths stay
    * linear — segw=18 at 10× is 36k pairs (≈ 4× the sf0.1 9k, max bucket
    * 11) and segw=24 at 100× measures 1.9× wall per decade (SCALING.md
    * r9.2/r9.3). The O(len²) Levenshtein DP runs ONCE per DISTINCT
    * candidate pair, after the dedup, never per segment match. Both
    * engines' `levenshtein` is the standard unit-cost DP — exact integer
    * parity. */
  def fuzzyTitle(spark: SparkSession, sfDir: String): DataFrame =
    fuzzyTitleAt(spark, sfDir,
      sys.env.get("SPARK_GRAFT_FUZZY_SEGW").map { v =>
        try v.trim.toInt
        catch {
          case e: NumberFormatException => throw new IllegalArgumentException(
            s"env SPARK_GRAFT_FUZZY_SEGW must be an integer, got '$v'", e)
        }
      }.getOrElse(SegW))

  /** [[fuzzyTitle]] with the segment width (= title/4) as the scale knob;
    * the oracle gate stays pinned at the fixture's [[SegW]]. */
  def fuzzyTitleAt(spark: SparkSession, sfDir: String, segw: Int): DataFrame =
    fuzzyTitleOf(Tables.documents(spark, sfDir), segw)

  private[graft] def fuzzyTitleOf(documents: DataFrame, segw: Int): DataFrame = {
    require(segw >= 4 && segw <= 64, s"segment width out of range: $segw")
    val titleLen = 4 * segw
    // EAGER title materialization (localCheckpoint, the round-7 broadcast
    // -race fix): a lazily-cached frame feeding both sides of a self-join
    // gets computed CONCURRENTLY by the two shuffle stages — each side
    // re-scans the full `text` column (the dominant I/O, ~1 KB/doc) and
    // re-lowercases it. Checkpointing the ~100 B/doc (doc_id, title)
    // projection scans text ONCE; everything downstream derives from the
    // narrow checkpoint.
    val t = documents
      .select(col("doc_id"), substring(lower(col("text")), 1, titleLen).as("title"))
      .localCheckpoint()
    // The self-join ships only (doc_id, si, sv) — titles do NOT ride the
    // segment shuffle (4 copies of a 4·segw-char title per doc, the widest
    // column, for a join that only needs the segment key). Candidates fetch
    // their two titles back by doc_id equi-join afterwards — pair volume is
    // near-dup-sized, so two narrow joins beat one wide shuffle.
    val segs = (1 to 4).map { i =>
      t.select(col("doc_id"), lit(i).as("si"),
        substring(col("title"), (i - 1) * segw + 1, segw).as("sv"))
    }.reduce(_ unionAll _)
      // short docs yield truncated trailing segments; a full-width block
      // key is the contract (an 11-char tail would bucket every 47-char
      // doc together) — drop them, mirrored in the oracle
      .where(length(col("sv")) === segw)
    val cand = segs.as("a").join(segs.as("b"),
        col("a.si") === col("b.si") && col("a.sv") === col("b.sv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct() // pairs agreeing on several segments DP once
    cand
      .join(t.select(col("doc_id").as("doc_a"), col("title").as("ta")), Seq("doc_a"))
      .join(t.select(col("doc_id").as("doc_b"), col("title").as("tb")), Seq("doc_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
      .where(col("dist") <= FuzzyMaxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy("doc_a", "doc_b")
  }

  private val fuzzyTitleSql = {
    val segCtes = (1 to 4).map { i =>
      s"SELECT doc_id, title, $i AS si, substr(title, ${(i - 1) * SegW + 1}, $SegW) AS sv FROM t"
    }.mkString("\n      UNION ALL ")
    s"""WITH t AS (SELECT doc_id, substr(lower(text), 1, ${4 * SegW}) AS title FROM documents),
       |s AS (SELECT * FROM ($segCtes) WHERE len(sv) = $SegW),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           a.title AS ta, b.title AS tb
       |         FROM s a JOIN s b ON a.si = b.si AND a.sv = b.sv
       |           AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist
       |FROM cand WHERE levenshtein(ta, tb) <= $FuzzyMaxDist
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "report_detector_agreement" -> (detectorAgreement _),
    "split_leakage_purge" -> (splitLeakagePurge _),
    "report_lsh_tuning" -> (lshTuningReport _),
    "dedup_cdc_chunks" -> (cdcChunkDedup _),
    "dedup_paragraph" -> (paragraphDedup _),
    "dedup_semantic" -> (semDedup _),
    "dedup_semantic_trained" -> (semDedupTrained _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_ngram_containment" -> (ngramContainment _),
    "dedup_simhash" -> (simhash _),
    "dedup_embedding_cosine" -> (embeddingCosine _),
    "dedup_embedding_incremental" -> (embeddingIncremental _),
    "dedup_cluster_canonical" -> (clusterCanonical _),
    "dedup_best_survivor" -> (bestSurvivor _),
    "curation_pipeline" -> (curationPipeline _),
    "dedup_incremental" -> (incrementalDedup _),
    "dedup_fuzzy_title" -> (fuzzyTitle _),
  )

  val oracles: Map[String, String] = Map(
    "report_detector_agreement" -> detectorAgreementSql,
    "split_leakage_purge" -> splitLeakagePurgeSql,
    "report_lsh_tuning" -> lshTuningReportSql,
    "dedup_cdc_chunks" -> cdcChunkDedupSql,
    "dedup_paragraph" -> paragraphDedupSql,
    "dedup_semantic" -> semDedupSql,
    "dedup_semantic_trained" -> semDedupTrainedSql,
    "dedup_minhash_lsh" -> minhashLshSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_ngram_containment" -> ngramContainmentSql,
    "dedup_simhash" -> simhashSql,
    "dedup_embedding_cosine" -> embeddingCosineSql,
    "dedup_embedding_incremental" -> embeddingIncrementalSql,
    "dedup_cluster_canonical" -> clusterCanonicalSql,
    "dedup_best_survivor" -> bestSurvivorSql,
    "curation_pipeline" -> curationPipelineSql,
    "dedup_incremental" -> incrementalDedupSql,
    "dedup_fuzzy_title" -> fuzzyTitleSql,
  )
}
