package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the PER-BATCH cost curve of `stream_index_upsert` across
  * micro-batches (round-13 verdict item 2's done-criterion): with the
  * at-rest index landed as a (band_idx, bk)-bucketed table, the probe
  * shuffles only the arriving batch — so per-batch wall time should sit
  * FLAT as the index accumulates shards, instead of growing with the
  * index as the r12 plain-parquet re-shuffle did. Batch times print when
  * SPARK_GRAFT_IDX_LOG is set in the environment; the run is the shipped
  * [[graft.streaming.Streams.indexUpsertStreamOf]] at a caller-chosen
  * shard count so the curve has enough points to read a slope from.
  *
  * Usage: `runMain graft.tools.IdxBatches <storeDir> [shards]`
  */
object IdxBatches {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IdxBatches <storeDir> [shards]")
    val shards = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      // report bucketed-scan sort order (guarded inside Spark by a
      // single-file-per-bucket check): compacted index/model tables feed
      // sort-merge joins with NO re-sort of the at-rest side
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // subset co-partitioning for the prefix-bucketed kn5 q/d pairs: one
      // corpus exchange per landed order serves BOTH joins (pre-3.3
      // default; the only subset-partitioned sources here are the LM
      // tables, whose n-gram prefixes are far past any skew concern)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, args(0))
    val t0 = System.nanoTime()
    val cb0 = graft.streaming.Streams.idxCompactionBytes.get()
    val cn0 = graft.streaming.Streams.idxCompactions.get()
    val ab0 = graft.streaming.Streams.idxAppendBytes.get()
    val out = graft.streaming.Streams.indexUpsertStreamOf(spark, docs, shards)
    val matches = out.count()
    // write-amplification meters (r15): at a FIXED store, doubling the
    // shard count must leave size-triggered total rewrite bytes ~flat
    // (each row rewritten O(log) times), where the r14 fixed cadence
    // rewrote the whole index every 16 appends — linear in batch count
    val cBytes = graft.streaming.Streams.idxCompactionBytes.get() - cb0
    val cN = graft.streaming.Streams.idxCompactions.get() - cn0
    val aBytes = graft.streaming.Streams.idxAppendBytes.get() - ab0
    println(f"IDX ${args(0)}: shards=$shards matches=$matches " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs compactions=$cN " +
      f"compactBytes=${cBytes / 1048576.0}%.1fMiB " +
      f"appendBytes=${aBytes / 1048576.0}%.1fMiB (per-batch lines above, " +
      "SPARK_GRAFT_IDX_LOG)")
    spark.stop()
  }
}
