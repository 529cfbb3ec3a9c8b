package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Single-split spread guard, shared by every "spread rows across cores
  * before a CPU-heavy kernel" site (guide §2.5 input skew, §5 spill safety).
  *
  * The driver's store keeps each table as ONE parquet file with one row
  * group, so a scan arrives as ONE input split and a per-row kernel
  * (minhash/simhash md5, BigInteger ABI decode, PNG/WAV codecs, tokenize +
  * explode) runs on one core no matter how many the session has. The r16
  * fix repartitioned unconditionally to `defaultParallelism`; this helper
  * adds the two scale guards the r16 verdict asked for:
  *
  *  - **Skip entirely on multi-split stores** (input files ≥ session
  *    parallelism): there the kernels parallelize with the scan and the
  *    repartition would be a full-corpus exchange into exactly
  *    `defaultParallelism` partitions — at 1000 cores over 100 TB that is
  *    ~100 GB/partition, a guaranteed spill, to perform a shuffle the scan
  *    already made unnecessary. `inputFiles` is metadata-only (no job, no
  *    QueryExecution.toRdd — the r16 `df.rdd.getNumPartitions` probe built
  *    a separate QueryExecution and, under AQE, could materialize upstream
  *    query stages just to inspect partitioning).
  *  - **Byte-aware partition count** when the spread does run:
  *    `max(defaultParallelism, inputBytes / 256 MB)` — a FEW huge files
  *    (1 ≤ files < cores) still spread, but into enough partitions to stay
  *    spill-safe instead of being pinned to the core count. Locally (KB-MB
  *    inputs) this is exactly `defaultParallelism`, the r16 behavior, so
  *    the driver's bench at either core count measures the same plan.
  *
  * The explicit partition count matters: AQE coalesces a bare
  * `repartition(col)` back to ONE partition at bench data sizes (measured
  * r16: getNumPartitions == 1), silently re-serializing the kernel —
  * `repartition(n, col)` (REPARTITION_BY_NUM) is exempt from coalescing.
  *
  * Streaming frames pass through untouched: micro-batch plans pick
  * partitioning at the sink, AQE is disabled there, and `inputFiles` is
  * illegal on them.
  */
object Spread {
  /** Spill-safe advisory bytes per spread partition (guide §5): matches the
    * 256 MB advisory shuffle-partition size a production session runs with. */
  private val BytesPerPartition: Long = 256L << 20

  /** Stats above this are Catalyst's "unknown size" sentinels, not real
    * sizes (LogicalRDD and other stat-less plans report
    * spark.sql.defaultSizeInBytes = Long.MaxValue): fall back to the core
    * count there. 1 PiB is comfortably above any real single-digit-file
    * input (the guard above already skipped multi-split stores) and far
    * below the sentinel. */
  private val UnknownStatsFloor: BigInt = BigInt(1L << 50)

  def byCols(df: DataFrame, keys: Column*): DataFrame = {
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length >= p) return df // multi-split: scan parallelizes
    // size estimate straight off the optimized plan's file statistics —
    // driver-side metadata, no job
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target =
      if (bytes >= UnknownStatsFloor) p
      else ((bytes + BytesPerPartition - 1) / BytesPerPartition)
        .max(BigInt(p)).min(BigInt(1 << 20)).toInt
    df.repartition(target, keys: _*)
  }
}
