package graft

import org.apache.spark.sql.SparkSession

/** The planning confs the bucketed-layout operators depend on, made
  * SELF-CARRYING (round-15, r14 verdict item 1).
  *
  * Round 14's defining find was that the kn5 subset-bucketed
  * co-partitioning had silently not executed since round 11 because
  * Spark 3.3 flipped `requireAllClusterKeysForCoPartition` to true — and
  * the fix landed the two contract entries only in the repo's OWN session
  * builders (Verify/Bench/tools/SparkSpec). A library consumer calling
  * [[graft.ext.TextOps.kn5ScoreBucketed]] or
  * [[graft.ext.Relational.layoutBucketedJoin]] on a vanilla SparkSession
  * was therefore in exactly the pre-fix state: the documented one-exchange
  * plan silently regressed to the three-exchange shape. The operators now
  * obtain their planning session HERE: the caller's session when it
  * already carries the contract, else an isolated full clone (shared
  * context and catalog, own SQLConf — the compactIdxTable isolation
  * discipline) with exactly the two entries overridden. The clone copies
  * the caller's runtime confs (broadcast thresholds, AQE, shuffle
  * partitions stay whatever the deployment chose); only the two layout
  * entries are forced.
  *
  * Both entries are pure PLAN-SHAPE switches, never semantics:
  *  - `requireAllClusterKeysForCoPartition=false` lets a join whose keys
  *    are a superset of a bucketed table's cluster keys consume the
  *    buckets co-partitioned (the kn5 shared-prefix layout; upstream
  *    default true since SPARK-41413 out of shuffle-size caution).
  *  - `legacy.bucketedTableScan.outputOrdering=true` lets a
  *    one-file-per-bucket scan report its written sortBy order so the
  *    sort-merge join above it drops the table-side Sort (upstream
  *    default false since 3.0 because MULTI-file buckets would need a
  *    merge-sort read; every landing here compacts to one sorted file
  *    per bucket — and BucketingSpec pins that multi-file buckets still
  *    re-sort, so the entry never fakes an ordering).
  */
object BucketedPlan {
  private[graft] val Confs = Seq(
    "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
    "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")

  /** The session to PLAN a bucketed-layout query on: `spark` itself when
    * its conf already carries the contract (the repo's gate builders — the
    * zero-overhead fast path, and plans stay byte-identical to r14), else
    * a fresh clone with the two entries set. Clones are per-call and not
    * memoized: the caller's runtime confs may change between calls (the
    * specs flip broadcast thresholds), and a clone is a driver-side
    * session-state copy, costless next to any query it plans. Landing
    * memos stay bounded because the model caches adopt entries across
    * sibling sessions of one context instead of recording one entry per
    * clone ([[graft.ext.TextOps]] adoptSibling). */
  def sessionFor(spark: SparkSession): SparkSession =
    if (Confs.forall { case (k, v) => spark.conf.getOption(k).contains(v) }) spark
    else {
      val c = org.apache.spark.sql.graft.shim.cloneSession(spark)
      Confs.foreach { case (k, v) => c.conf.set(k, v) }
      c
    }
}
