package graft.ext

import graft.{BucketedPlan, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational extension operators (SURVEY §2.6): everything the reference
  * left on its roadmap — aggregations (ROADMAP.md:77), joins, windows, sorts,
  * set ops — as built-in Catalyst plans.
  *
  * Oracle-parity rules used throughout (see also the other ext modules):
  * money sums go through exact decimals (double sums are
  * non-associative ⇒ nondeterministic across partitionings — at any scale,
  * not just 100 TB); pass-through doubles stay untouched; every query ends
  * in a total ORDER BY.
  */
object Relational {

  // Width-controlled exact decimals: fact values fit (12,4); (1±rate) fits
  // (6,4). Keeps every product within DECIMAL(38) so neither engine rounds
  // or promotes: (12,4)×(6,4)=(19,8); ×(6,4)=(26,12) — all exact.
  private def dec(c: Column): Column = c.cast("decimal(12,4)")
  private def rate1m(c: Column): Column = (lit(1.0) - c).cast("decimal(6,4)")
  private def rate1p(c: Column): Column = (lit(1.0) + c).cast("decimal(6,4)")

  // Output boundary: wide decimals hash differently across engines in the
  // driver's compare (r1: all 12 hash-fails were exactly the DECIMAL(38,x)
  // output columns). Internal accumulation stays exact-decimal; outputs are
  // rounded to scale 4 and cast to DOUBLE. The "single correctly-rounded
  // conversion in BOTH engines" argument holds while the rounded unscaled
  // value stays < 2^53, i.e. |sum| < ~9.2e11 at scale 4 — true for every
  // testbed SF, but NOT for a DECIMAL(38,4) at full 100 TB corpus sums,
  // where DuckDB's int128/10^scale float division and Java's
  // BigDecimal.doubleValue may round differently; at that magnitude compare
  // as strings or widen the rounding scale instead. Oracle SQL mirrors with
  // CAST(CAST(x AS DECIMAL(38,4)) AS DOUBLE).
  private def decOut(c: Column): Column = c.cast("decimal(38,4)").cast("double")

  /** TPC-H Q1-style pricing summary. Partial (map-side) aggregation + one
    * shuffle of 4 groups — the canonical scale-safe aggregate. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).where(col("l_shipdate") <= lit("1998-09-02"))
    val discPrice = dec(col("l_extendedprice")) * rate1m(col("l_discount"))
    val charge = discPrice * rate1p(col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decOut(sum(dec(col("l_quantity")))).as("sum_qty"),
        decOut(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        decOut(sum(discPrice)).as("sum_disc_price"),
        decOut(sum(charge)).as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4)) * CAST(1 + l_tax AS DECIMAL(6,4))), 4) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style: filter → join → aggregate → top-k. The orders side is
    * filtered before the join (pushdown) and the join shuffles on the key
    * both sides are already aggregated by. */
  def q3ShippingTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sfDir).where(col("o_orderdate") < lit("1998-03-15"))
    val li = Tables.lineitem(spark, sfDir).where(col("l_shipdate") > lit("1998-03-15"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(decOut(sum(dec(col("l_extendedprice")) * rate1m(col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-style: revenue by nation for one region/year. nation+region
    * are broadcast; the fact pipeline shuffles once per key change. */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val nr = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .select(col("n_nationkey"), col("n_name"))
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    Tables.lineitem(spark, sfDir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(decOut(sum(dec(col("l_extendedprice")) * rate1m(col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Ranking window: top-3 orders per customer (deterministic tiebreak). */
  def winTopkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  private val winTopkSql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Grouped top-k via the bounded [[graft.functions.TopKByDesc]]
    * aggregate — the SCALE-correct complement of [[winTopkPerGroup]]'s
    * window form. The window must shuffle and sort every order row per
    * customer before discarding all but 3; the aggregate reduces each map
    * partition to ≤ 3 entries per customer BEFORE the exchange (map-side
    * partial ObjectHashAggregate, heap maintenance O(log k) per row), so
    * the shuffle carries O(k) rows per (customer, partition) and nothing
    * sorts globally — the shape that survives a 100 TB fact table.
    * Ordering key is the price as a double (exact conversion —
    * DECIMAL(12,2) unscaled < 2^53) with the unique orderkey as tie, so
    * the kept set is value-deterministic under any partitioning and merge
    * order; the oracle mirrors the same (double DESC, orderkey) order.
    * PlanSpec pins the no-Window, partial-aggregate plan shape. */
  def topkAggPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Vec
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(Vec.topkBy(col("o_totalprice").cast("double"), col("o_orderkey"),
        struct(col("o_orderkey"), col("o_totalprice")), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("o_custkey"), (col("i") + 1).cast("long").as("rn"),
        col("s.o_orderkey").as("o_orderkey"), col("s.o_totalprice").as("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  private val topkAggSql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Running-sum window (exact decimal accumulation — deterministic under
    * any partitioning). */
  def winRunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    // l_quantity joins the tiebreak: the synthetic lineitem carries duplicate
    // (orderkey, linenumber) pairs (found at sf0.1 — suppkey 707 has two
    // 45185/7 rows), and without it the two engines accumulate the tied rows
    // in different orders, differing on ONE intermediate run_qty. Rows tied
    // on all four columns are interchangeable (same addend ⇒ same prefix
    // sums), so this order is value-deterministic.
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, sfDir)
      .withColumn("run_qty", decOut(sum(dec(col("l_quantity"))).over(w)))
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("run_qty"))
      // run_qty completes the total order: duplicate-PK rows tie on the
      // first four keys but carry distinct prefix sums
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "run_qty")
  }

  /** Time-RANGE window frame — the interval form rows-based frames can't
    * express: per user, the trailing-hour event count and value sum at
    * every event. RANGE frames are value-deterministic by construction
    * (every row with the same ordering value is in every frame that
    * includes the boundary — no tie-order sensitivity to break), and the
    * sum runs through exact decimals. One shuffle by user, one sort —
    * the standard sliding-profile shape (fraud velocity checks, rate
    * profiles) at any scale. */
  def winTrailingRange(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600L, 0L)
    Tables.events(spark, sfDir)
      .withColumn("ts_s", unix_timestamp(col("ts")))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", decOut(sum(dec(col("value"))).over(w)))
      .select("event_id", "user_id", "ts_s", "n_1h", "sum_1h")
      .orderBy("event_id")
  }

  private val winTrailingRangeSql =
    """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) OVER w AS DECIMAL(38,4)) AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  private val winRunningSumSql =
    """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,4)) AS DOUBLE) AS run_qty
      |FROM lineitem
      |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, run_qty""".stripMargin

  /** Tumbling event-time windows (the streaming-unified batch form —
    * identical groupBy works under readStream + watermark, see
    * [[graft.streaming.Streams]]). */
  def timeWindowTumbling(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        decOut(sum(dec(col("value")))).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("day", "event_type")

  private val timeWindowSql =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** HOPPING (sliding) event-time windows — 1-day windows every 6 hours, so
    * each event lands in exactly 4 overlapping windows. Same
    * streaming-unified groupBy as [[timeWindowTumbling]] (identical under
    * readStream + watermark); Spark materializes the per-event window list
    * inside the aggregate, so the only shuffle is the (window, type) key —
    * the 4× row expansion happens map-side with partial aggregation, never
    * as a standalone explode. Window starts emit as epoch SECONDS (BIGINT)
    * — the engines' timestamp-vs-timestamptz dtypes don't round-trip the
    * hash compare, epoch integers do. Oracle reproduces Spark's epoch-0
    * window alignment: latest start = floor(t/slide)·slide, minus k·slide
    * for k in 0..3. */
  def timeWindowHopping(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        decOut(sum(dec(col("value")))).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start_s", "event_type")

  private val timeWindowHoppingSql =
    """WITH e AS (
      |  SELECT event_type, value,
      |    CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 AS base
      |  FROM events),
      |w AS (SELECT event_type, value,
      |        base - unnest(range(0, 4)) * 21600 AS win_start_s FROM e)
      |SELECT win_start_s, event_type, count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY win_start_s, event_type""".stripMargin

  /** Session windows (30-min gap) per user. Oracle is the classic
    * gaps-and-islands rewrite; session end = last event + gap, matching
    * Spark's session_window semantics. */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        decOut(sum(dec(col("value")))).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  private[graft] val sessionWindowsSql =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** Set operators (absent from the reference): users who purchased AND
    * errored, excluding the 10 most-active users (deterministic top-N
    * subquery). */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def users(t: String) = ev.where(col("event_type") === t).select("user_id")
    val topActive = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(10).select("user_id")
    users("purchase").intersect(users("error")).except(topActive)
      .orderBy("user_id")
  }

  private val setOpsSql =
    """SELECT user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'error'
      |  EXCEPT
      |  SELECT user_id FROM (
      |    SELECT user_id FROM events GROUP BY 1
      |    ORDER BY count(*) DESC, user_id LIMIT 10))
      |ORDER BY user_id""".stripMargin

  /** Exact dedup with a deterministic survivor (first block wins) — the
    * deterministic form of dropDuplicates. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy("user_id", "event_type")
  }

  private val dedupExactSql =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** ROLLUP over two grouping levels with grouping_id. */
  def aggRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        decOut(sum(dec(col("l_quantity")))).as("sum_qty"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val aggRollupSql =
    """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Global sort + limit (reference has no ORDER BY at all). */
  def topkOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val topkOrdersSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin

  /** Sketch aggregate: HLL distinct estimate next to the exact count. The
    * raw estimate is engine-specific (DuckDB's HLL differs) so it can't be
    * hashed — instead the ESTIMATE QUALITY is the oracle-gated value:
    * `within_5pct` must come out true (the oracle pins it to literal TRUE),
    * so an HLL drifting past ±5% of exact fails the gate instead of
    * sliding through a rows-only handshake. */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    // guarded spread (r17, guide §2.5): the single-file store arrives as
    // ONE split, serializing both the scan and the partial aggregates; the
    // exchange carries two narrow columns and is skipped on multi-split
    // stores (graft.util.Spread)
    val ev = graft.util.Spread.byCols(
      Tables.events(spark, sfDir).select(col("event_type"), col("user_id")),
      col("event_type"), col("user_id"))
    // approx and exact aggregated SEPARATELY (r17, guide §2.3): fused,
    // Catalyst's one-distinct rewrite evaluates the HLL partial per
    // (event_type, user_id) group — the rsd=1% sketch is a 1639-column
    // LONG buffer, so the rewrite built and merged ~7.5k of them through
    // a 1641-wide row (the r16 plan dump), one serial ~1 s merge stage.
    // Split, the HLL sees one buffer per (event_type, partition) and the
    // exact side ships bare (event_type, user_id) pairs. Identical
    // values: HLL registers are max-merged, so any aggregation tree over
    // the same multiset yields the same estimate, and countDistinct is
    // exact under either shape.
    // rsd = 1%: the default 5% rsd is a STANDARD deviation, so individual
    // estimates land outside a 5% bound routinely (caught at sf0.1 where
    // 1500 distinct users drifted 6-8%); at 1% rsd the 5% gate is ~5σ —
    // deterministic-in-practice while still exercising the sketch path
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    approx.join(exact, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users").cast("double") - col("exact_users").cast("double")) /
          col("exact_users").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("event_type")
  }

  private val approxDistinctSql =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS within_5pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Approximate percentiles via Spark's native quantile sketch
    * (`approx_percentile`, Greenwald-Khanna): the one-pass mergeable-state
    * path a 100 TB percentile wants — the exact interpolated form
    * ([[aggPercentiles]]) needs the full sorted column per group, the
    * sketch streams it in bounded memory with partial merge. Gated like
    * `approx_distinct`: the sketch value is engine-specific, so the oracle
    * pins the EXACT per-group percentile next to a within-tolerance
    * boolean. accuracy=10000 bounds rank error at 1/10000 of the group —
    * on sf groups that means the sketch must land within a few neighboring
    * values of the true quantile; the 2% value-tolerance gate is then
    * deterministic in practice while still exercising the sketch.
    *
    * The GATE query pays for both paths, but the exact side goes through a
    * WEIGHTED percentile over the (flag, price) histogram instead of
    * buffering raw rows: `l_extendedprice` has bounded distinct values
    * (594k at every probe store — TPC-H prices are qty × part price), so
    * the rollup is a linear map-side-combined aggregate and the exact
    * order statistic then buffers distinct values, NOT rows —
    * scale-INDEPENDENT exact percentiles wherever value cardinality is
    * bounded. (The raw-buffer form measured 45.8 s at the 100× store with
    * ~all of it the 3-reducer value buffer, r9.4; the histogram form
    * re-reads as two linear scans + a constant-size exact step.)
    * `percentile(col, p, freq)` is the same interpolated order statistic,
    * so exactness is unchanged. Production calls `approx_percentile`
    * only. */
  def approxPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
    // exact side = the SAME weighted order statistic `percentile(price,
    // p, freq)` computes, reconstructed over the histogram with a
    // cumulative-frequency window (r17, guide §2/§4): the built-in
    // aggregate buffers every (value, freq) pair in one OpenHashMap per
    // group and sorts it inside THREE reducer tasks (l_returnflag has 3
    // values) — ~2.3 CPU-s serial at sf0.1 and group-sized memory at any
    // scale. The window form sorts (flag, price) with the codegen sort,
    // prefix-sums freq, and picks the two bracketing rows per Spark's
    // Percentile semantics: pos = p·(N−1); v_lo/v_hi = first value whose
    // cumulative count reaches ⌊pos⌋+1 / ⌈pos⌉+1; result = v_lo when
    // ⌊pos⌋=⌈pos⌉ else (⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi in double —
    // the gate's 2% tolerance is indifferent to sub-ulp drift, and the
    // output carries only the booleans.
    val hist = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    // per-group total via a whole-partition window over the SAME
    // partitioning as the running sum — one histogram pass, one sort
    // (a separate groupBy + broadcast join re-aggregated `hist` twice)
    val wN = Window.partitionBy("l_returnflag")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("cum", sum(col("freq")).over(w))
      .withColumn("n", sum(col("freq")).over(wN))
    def pick(p: Double, out: String): Seq[org.apache.spark.sql.Column] = {
      val pos = lit(p) * (col("n") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      Seq(
        min(when(col("cum") >= lo + 1, col("l_extendedprice"))).as(s"${out}_lo"),
        min(when(col("cum") >= hi + 1, col("l_extendedprice"))).as(s"${out}_hi"),
        max(pos).as(s"${out}_pos"))
    }
    def interp(out: String) = {
      val pos = col(s"${out}_pos")
      val lo = floor(pos).cast("double")
      val hi = ceil(pos).cast("double")
      val vLo = col(s"${out}_lo").cast("double")
      val vHi = col(s"${out}_hi").cast("double")
      when(lo === hi || col(s"${out}_lo") === col(s"${out}_hi"), vLo)
        .otherwise((hi - pos) * vLo + (pos - lo) * vHi)
    }
    val aggs = pick(0.5, "e50") ++ pick(0.95, "e95")
    val exact = cum.groupBy("l_returnflag")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("l_returnflag"),
        interp("e50").as("exact_p50"), interp("e95").as("exact_p95"))
    val approx = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").cast("double").as("approx_p50"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").cast("double").as("approx_p95"))
    approx.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        (abs(col("approx_p50") - col("exact_p50")) / col("exact_p50") <= 0.02).as("p50_within_2pct"),
        (abs(col("approx_p95") - col("exact_p95")) / col("exact_p95") <= 0.02).as("p95_within_2pct"))
      .orderBy("l_returnflag")
  }

  private val approxPercentilesSql =
    """SELECT l_returnflag, TRUE AS p50_within_2pct, TRUE AS p95_within_2pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q4-style EXISTS: orders having at least one deep-discount line,
    * counted by priority — a left-semi join (no row multiplication, the
    * probe side streams). */
  def q4SemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val deep = Tables.lineitem(spark, sfDir).where(col("l_discount") > 0.09)
      .select(col("l_orderkey"))
    Tables.orders(spark, sfDir)
      .join(deep, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4SemiJoinSql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** NOT EXISTS via left-anti join: customers with no 1997 order. */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o97 = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_custkey"))
    Tables.customer(spark, sfDir)
      .join(o97, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val antiJoinSql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      |                    AND o.o_orderdate < TIMESTAMP '1998-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q14-style promo share: conditional aggregate ratio. Both sums are
    * exact decimals; the final ratio divides their double images — the same
    * two IEEE ops on both engines. */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val revenue = dec(col("l_extendedprice")) * rate1m(col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .agg(
        decOut(sum(when(col("p_type").startsWith("PROMO"), revenue)
          .otherwise(lit(0).cast("decimal(12,4)")))).as("promo_revenue"),
        decOut(sum(revenue)).as("total_revenue"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  private val q14PromoShareSql =
    """SELECT promo_revenue, total_revenue,
      |  100.0 * promo_revenue / total_revenue AS promo_share
      |FROM (SELECT
      |  CAST(round(sum(CASE WHEN p_type LIKE 'PROMO%'
      |        THEN CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4))
      |        ELSE CAST(0 AS DECIMAL(12,4)) END), 4) AS DOUBLE) AS promo_revenue,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey)""".stripMargin

  /** Exact interpolated percentiles per group (both engines use linear
    * interpolation a + (b-a)·f over the sorted values → bit-identical
    * doubles). */
  def aggPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"),
        min("value").as("vmin"), max("value").as("vmax"))
      .orderBy("event_type")

  private val aggPercentilesSql =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  quantile_cont(value, 0.99) AS p99,
      |  min(value) AS vmin, max(value) AS vmax
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Fixed-width histogram over [0,100) in 20 bins (explicit bucket formula
    * — identical arithmetic on both engines; DuckDB has no width_bucket). */
  def aggHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("bucket", expr(
        "CASE WHEN value < 0 THEN 0 WHEN value >= 100 THEN 21 " +
          "ELSE CAST(floor(value / 5.0) AS BIGINT) + 1 END"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        decOut(sum(dec(col("value")))).as("sum_value"))
      .orderBy("bucket")

  private val aggHistogramSql =
    """SELECT CASE WHEN value < 0 THEN 0 WHEN value >= 100 THEN 21
      |       ELSE CAST(floor(value / 5.0) AS BIGINT) + 1 END AS bucket, count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin

  /** CUBE over two grouping dimensions (all 4 grouping sets). */
  def aggCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        decOut(sum(dec(col("o_totalprice")))).as("sum_price"))
      .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"), col("n"), col("sum_price"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val aggCubeSql =
    """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      |  o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Deterministic variance/stddev: raw double accumulation order is
    * engine/partitioning-dependent, so the moments are accumulated as EXACT
    * decimals (sum, sum of squares) and the variance assembled from their
    * double images with one fixed IEEE formula — identical on both engines.
    */
  def aggVariance(spark: SparkSession, sfDir: String): DataFrame = {
    val v = dec(col("value")) // (12,4) exact
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        decOut(sum(v)).as("sum_v"),
        decOut(sum(v * v)).as("sum_v2"))
      .withColumn("mean", col("sum_v") / col("n"))
      .withColumn("var_pop",
        col("sum_v2") / col("n") - col("mean") * col("mean"))
      .withColumn("stddev_pop", sqrt(col("var_pop")))
      .orderBy("event_type")
  }

  private val aggVarianceSql =
    """WITH m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_v,
      |    CAST(round(sum(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4))), 4) AS DOUBLE) AS sum_v2
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n, sum_v, sum_v2,
      |  sum_v / n AS mean,
      |  sum_v2 / n - (sum_v / n) * (sum_v / n) AS var_pop,
      |  sqrt(sum_v2 / n - (sum_v / n) * (sum_v / n)) AS stddev_pop
      |FROM m ORDER BY event_type""".stripMargin

  /** Skew-safe two-phase aggregation: salt the hot key, partially aggregate
    * per (key, salt), then combine. With exact decimal sums the result is
    * identical to the direct groupBy (associativity), so the oracle is the
    * plain GROUP BY — which is the point: salting changes the shuffle
    * profile, never the answer. At 100 TB this is the pattern for keys whose
    * fan-in exceeds one reducer (AQE skew-join handles joins; salting
    * handles aggregations). */
  def skewSaltedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val salted = Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("ps"))
    salted.groupBy("event_type")
      .agg(sum(col("pn")).as("n"), decOut(sum(col("ps"))).as("sum_value"))
      .orderBy("event_type")
  }

  private val skewSaltedAggSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Skew STRESS: a deliberately pathological key distribution — every
    * user_id not divisible by 10 folds into one hot key (-1), so ~90% of all
    * rows share a single group. A direct groupBy sends the hot key's every
    * row to ONE reducer — the single-task straggler that kills 100 TB jobs.
    * The two-phase salted plan shuffles by (skew_key, salt) first (32-way
    * spread of the hot key, map-side partials), then combines 32 partial
    * rows per key; PlanSpec asserts the first exchange partitions on the
    * salt. Exact decimal partials keep the result identical to the direct
    * groupBy, which is the oracle.
    */
  def skewHotKeyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val keyed = Tables.events(spark, sfDir)
      .withColumn("skew_key",
        when(col("user_id") % 10 =!= 0, lit(-1L)).otherwise(col("user_id")))
    val salted = keyed
      .withColumn("salt", pmod(col("event_id"), lit(32)))
      .groupBy(col("skew_key"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("ps"))
    salted.groupBy("skew_key")
      .agg(sum(col("pn")).as("n"), decOut(sum(col("ps"))).as("sum_value"))
      .orderBy("skew_key")
  }

  private val skewHotKeyAggSql =
    """SELECT CASE WHEN user_id % 10 <> 0 THEN -1 ELSE user_id END AS skew_key,
      |  count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY skew_key""".stripMargin

  /** Hot-key as-of enrichment through the TIME-SLICED join
    * ([[graft.engine.Enrich.asOfJoinSliced]]): ~90% of probe AND state rows
    * fold onto one key, and the sliced plan spreads that key's sort over
    * (key, slice) partitions while producing exactly the plain as-of answer
    * — which is what the (windowed, slice-free) oracle asserts. */
  def skewAsofSliced(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.engine.Enrich
    val hot = when(col("event_id") % 10 < 9, lit(0L)).otherwise(col("user_id"))
    val ev = Tables.events(spark, sfDir).withColumn("k", hot)
    val probes = ev.where(col("event_type") === "purchase")
      .select(col("k"), col("event_id"), col("value"))
    val state = ev.where(col("event_type") === "click")
      .select(col("k"), col("event_id"), col("value"))
    val bounds = probes.stat.approxQuantile("event_id", Array(0.25, 0.5, 0.75), 0.0)
      .map(_.toLong).distinct.sorted.toSeq
    Enrich.asOfJoinSliced(probes, state,
      key = "k", leftTime = "event_id", rightTime = "event_id",
      tieBreaker = "event_id", valueCols = Seq("value"), boundaries = bounds)
      .select(col("event_id").as("blocknumber"), col("k"), col("value"),
        col("asof_value").as("last_click"))
      .orderBy("blocknumber")
  }

  private val skewAsofSlicedSql =
    """WITH e AS (
      |  SELECT CASE WHEN event_id % 10 < 9 THEN 0 ELSE user_id END AS k,
      |         event_id, event_type, value
      |  FROM events),
      |un AS (
      |  SELECT k, event_id AS t, 1 AS side, CAST(NULL AS BIGINT) AS tie,
      |    event_id AS blocknumber, value, CAST(NULL AS DOUBLE) AS sv
      |  FROM e WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT k, event_id, 0, event_id, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), value
      |  FROM e WHERE event_type = 'click'),
      |w AS (
      |  SELECT *, last_value(sv IGNORE NULLS) OVER (
      |    PARTITION BY k ORDER BY t, side, tie
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
      |  FROM un)
      |SELECT blocknumber, k, value, last_click
      |FROM w WHERE side = 1 ORDER BY blocknumber""".stripMargin

  /** Hive-partitioned layout + partition-pruned read — the 100 TB data
    * layout story the bucketing spec covers for joins, stated for SCANS: a
    * corpus written `partitionBy(lang)` turns a per-language read into a
    * directory prune (the scan's PartitionFilters — zero data files from
    * other languages are even listed), where the flat layout reads and
    * filters everything. `lang` is low-cardinality and stable — the
    * partition-key discipline; `source` (20 values) stays a data column
    * filtered by parquet row-group stats. The query writes the layout then
    * reads back one (lang, source) slice, so the gate covers round-trip
    * fidelity through the partitioned layout including the
    * partition-column type restore; PlanSpec pins the pruned scan shape
    * (partition filters present, no lang data-filter). */
  def layoutPrunedScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_layout_${new java.io.File(sfDir).getName}").getAbsolutePath
    Tables.documents(spark, sfDir)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    spark.read.parquet(dir)
      .where(col("lang") === "en" && col("source") === "src3")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  private val layoutPrunedScanSql =
    """SELECT doc_id, source, lang, n_chars FROM documents
      |WHERE lang = 'en' AND source = 'src3' ORDER BY doc_id""".stripMargin

  /** Lands `df` as a bucketed+sorted catalog table holding ONE sorted
    * file per bucket (r14, shared by every model/layout landing): the
    * repartition on the bucket columns uses the same Murmur3 hash as the
    * bucket layout, so each write task holds exactly one bucket — the
    * shape under which the scan reports its sortBy order (Spark's
    * single-file-per-bucket guard) and downstream sort-merge joins
    * consume the table exchange-free AND sort-free. One extra table-sized
    * exchange paid once at landing; an O(table log table) sort saved on
    * every subsequent join. */
  private[ext] def landBucketedSorted(df: DataFrame, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String], table: String): Unit =
    df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(table)

  /** Bucketed co-located fact-fact join — the 100 TB layout story for
    * JOINS (the complement of [[layoutPrunedScan]]'s partition pruning for
    * scans): lineitem and orders are written `bucketBy(orderkey)` +
    * `sortBy` ONCE, and every subsequent join on orderkey consumes the
    * buckets directly — no exchange and no per-query sort on either fact
    * side (BucketingSpec pins that plan shape on this exact query). At
    * 100 TB the write-time shuffle amortizes across every downstream join;
    * broadcast covers dims, bucketing covers fact-fact. The oracle gate
    * additionally covers round-trip fidelity through the bucketed layout
    * (saveAsTable + catalog read-back, all columns and types restored). */
  def layoutBucketedJoin(spark0: SparkSession, sfDir: String): DataFrame = {
    // plan on a session carrying the bucketed-layout contract (r15): the
    // sort-free consumption of the one-sorted-file-per-bucket landing
    // rides a plan-shape conf a vanilla consumer session doesn't set
    val spark = BucketedPlan.sessionFor(spark0)
    val db = s"graft_buckets_${new java.io.File(sfDir).getName.replace('.', '_')}"
    // The landing runs ONCE per (session, db): the bucketed layout is a
    // write-once artifact every downstream join consumes — that
    // amortization IS the technique — and the old land-on-every-call had
    // the exact hazard class the r12 advice flagged on kn3 (a later call's
    // DROP DATABASE invalidates an earlier caller's not-yet-evaluated lazy
    // frame), plus no lock at all against two concurrent callers racing
    // DROP vs saveAsTable. The memo REVALIDATES the catalog on every call,
    // so an externally-dropped landing re-lands instead of returning a
    // dangling handle (the spec's cleanup drops the db; a later same-JVM
    // call must survive that).
    bucketsLock.synchronized {
      bucketsLanded.filterInPlace { case (s, _, _) => !s.sparkContext.isStopped }
      // the memo is really per CATALOG, not per session (round-13 advice):
      // `newSession()` siblings share one catalog and warehouse, so a
      // sibling-keyed miss would run DROP DATABASE CASCADE under another
      // live session's outstanding lazy frames. A landing by ANY live
      // session on this context+warehouse counts — provided the catalog
      // still validates (external drops re-land, as before). Entries from
      // a PREVIOUS process never appear in the set, so cross-JVM warehouse
      // leftovers still take the full drop-and-reland path.
      def wh(s: SparkSession) = s.conf.get("spark.sql.warehouse.dir")
      val landed = bucketsLanded.exists { case (s, w, d) =>
        d == db && w == wh(spark) && (s.sparkContext eq spark.sparkContext)
      } && spark.catalog.tableExists(s"$db.li_b") && spark.catalog.tableExists(s"$db.ord_b")
      if (!landed) {
        // Cross-SESSION idempotency: the warehouse directory outlives the
        // (in-memory) catalog, so a fresh session's CREATE DATABASE would
        // hit LOCATION_ALREADY_EXISTS on the previous run's `$db.db` dir.
        // Drop any catalog entry AND the on-disk location before
        // recreating — overwrite mode only covers the case where the
        // catalog still knows the tables.
        spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
        val dbLoc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), s"$db.db")
        val fs = dbLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(dbLoc)) fs.delete(dbLoc, true)
        spark.sql(s"CREATE DATABASE $db")
        // one sorted file per bucket ([[landBucketedSorted]]): with BOTH
        // sides aligned, the bucketed join needs no exchange AND no sort
        landBucketedSorted(Tables.lineitem(spark, sfDir), 8,
          Seq("l_orderkey"), Seq("l_orderkey"), s"$db.li_b")
        landBucketedSorted(Tables.orders(spark, sfDir), 8,
          Seq("o_orderkey"), Seq("o_orderkey"), s"$db.ord_b")
        bucketsLanded.add((spark, spark.conf.get("spark.sql.warehouse.dir"), db))
        ()
      }
    }
    val discPrice = dec(col("l_extendedprice")) * rate1m(col("l_discount"))
    spark.table(s"$db.li_b")
      .join(spark.table(s"$db.ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        decOut(sum(discPrice)).as("revenue"))
      .orderBy("o_orderpriority")
  }

  private val bucketsLock = new Object
  private val bucketsLanded =
    scala.collection.mutable.Set.empty[(SparkSession, String, String)]

  private val layoutBucketedJoinSql =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Time-bucket width for [[joinRangeBucketed]], seconds. */
  private val RjBucket = 3600L

  /** Interval-CONTAINMENT join via time bucketing — point probes against an
    * interval table, the range-join shape Catalyst has no native operator
    * for (a raw `p.t BETWEEN s.lo AND s.hi` join plans as BNLJ; engines
    * that special-case it — Databricks range-join hints, DuckDB's IEJoin —
    * are doing this bucketization internally). Purchases are joined into
    * the CLICK session (30-min gap) of the same user that contains them:
    * attribution — "which browsing session did this purchase land in"
    * (purchases outside any click session drop, so containment is real,
    * not key-coequal).
    *
    * Scale shape: each interval EXPLODES to the [[RjBucket]]-wide buckets
    * it overlaps (bounded by session length, not corpus size); each probe
    * has exactly one bucket; the join is then a plain (user, bucket)
    * EQUI-join — shuffle-partitionable, AQE-skew-splittable, broadcastable
    * — with the exact containment predicate as a post-filter. Disjoint
    * per-user sessions mean ≤1 match per probe, no dedup step. Times
    * compare as epoch-second BIGINTs (the cross-engine timestamp rule). */
  def joinRangeBucketed(spark: SparkSession, sfDir: String): DataFrame =
    joinRangeBucketedOf(Tables.events(spark, sfDir))

  private[graft] def joinRangeBucketedOf(ev: DataFrame): DataFrame = {
    val sess = ev.where(col("event_type") === "click")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("s_start"),
        unix_timestamp(col("session_window.end")).as("s_end"),
        col("n_clicks"))
    val sessB = sess.withColumn("bucket",
        explode(sequence(expr(s"s_start div $RjBucket"), expr(s"(s_end - 1) div $RjBucket"))))
    val probes = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"),
        unix_timestamp(col("ts")).as("es"))
      .withColumn("bucket", expr(s"es div $RjBucket"))
    probes.join(sessB,
        probes("bucket") === sessB("bucket") && probes("p_user") === sessB("user_id") &&
          col("es") >= col("s_start") && col("es") < col("s_end"))
      .select(col("event_id"), col("p_user").as("user_id"), col("es"),
        col("s_start"), col("s_end"), col("n_clicks"))
      .orderBy("event_id")
  }

  private val joinRangeBucketedSql =
    """WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
      |marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess0 AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked),
      |sess AS (
      |  SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS s_start,
      |    CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS s_end,
      |    count(*) AS n_clicks
      |  FROM sess0 GROUP BY user_id, sid),
      |p AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.es, s.s_start, s.s_end, s.n_clicks
      |FROM p JOIN sess s ON p.user_id = s.user_id
      |  AND p.es >= s.s_start AND p.es < s.s_end
      |ORDER BY p.event_id""".stripMargin

  /** Bit width per dimension for [[zval]]: covers user_id < 2^11 = 2048 and
    * floor(value) < 2048 at every SF (max observed 1499 / 560). */
  private val ZBits = 11

  /** Morton (Z-order) key: interleave the low [[ZBits]] bits of two
    * dimensions — bit i of `u` lands at position 2i+1, bit i of `v` at 2i.
    * Pure bitwise Column arithmetic (shift/and/or), whole-stage codegen. */
  private[graft] def zval(u: Column, v: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(u, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(v, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Write `events` clustered by the Z-order of (user_id, floor(value)).
    * Each dimension is min/max-normalized to the full [[ZBits]] range
    * before interleaving (the Delta OPTIMIZE ZORDER range-id step):
    * raw-bit interleave aligns domains by BIT POSITION, so a 4-bit
    * user domain against a 9-bit value domain would degenerate into a
    * plain value sort. The z key shapes only the physical layout — it is
    * dropped before write and never enters a compared result, so double
    * scaling needs no cross-engine parity. */
  private[graft] def writeZorder(events: DataFrame, dir: String): Unit = {
    val r = events.agg(
      min(col("user_id")), max(col("user_id")),
      floor(min(col("value"))), floor(max(col("value")))).head()
    def norm(c: Column, lo: Long, hi: Long): Column =
      floor((c - lit(lo)).cast("double") * ((1 << ZBits) - 1) /
        math.max(hi - lo, 1L).toDouble).cast("long")
    events
      .withColumn("zv", zval(
        norm(col("user_id"), r.getLong(0), r.getLong(1)),
        norm(floor(col("value")).cast("long"), r.getLong(2), r.getLong(3))))
      .repartitionByRange(32, col("zv"))
      .sortWithinPartitions("zv")
      .drop("zv")
      .write.mode("overwrite").parquet(dir)
  }

  /** Z-ORDER clustered layout + a 2-D box read — the third leg of the
    * 100 TB layout story (partition pruning for low-cardinality scans
    * [[layoutPrunedScan]], bucketing for co-located joins
    * [[layoutBucketedJoin]], and Z-ordering for MULTI-dimensional range
    * predicates, the Delta/Iceberg OPTIMIZE ZORDER pattern). A single-column
    * sort gives perfect row-group stats on that column and NONE on any
    * other; interleaving the bits of both dimensions keeps every file's
    * (user_id, value) min/max box small, so parquet row-group stats prune
    * on EITHER dimension from one layout — PlanSpec measures exactly
    * that via per-file min/max: a value-only predicate touches every file
    * of a user-sorted layout but a bounded fraction of the Z-ordered one.
    * The gated query reads one 2-D box back through the layout (round-trip
    * fidelity; both predicates reach PushedFilters). */
  def layoutZorderScan(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_zorder_${new java.io.File(sfDir).getName}").getAbsolutePath
    val ev = Tables.events(spark, sfDir)
    writeZorder(ev, dir)
    // the user_id domain scales with SF — the box is a fixed FRACTION of
    // it, derived by one bounded driver scalar (the slice-bounds
    // precedent) in exact integer arithmetic mirrored by the oracle's CTE
    val maxU = ev.agg(max(col("user_id"))).head().getLong(0)
    spark.read.parquet(dir)
      .where(col("user_id").between(maxU / 7, maxU / 4) &&
        col("value") >= 100.0 && col("value") < 164.0)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")
  }

  private val layoutZorderScanSql =
    """WITH m AS (SELECT max(user_id) AS mu FROM events)
      |SELECT event_id, user_id, value FROM events, m
      |WHERE user_id BETWEEN mu // 7 AND mu // 4 AND value >= 100 AND value < 164
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_pruned_scan" -> (layoutPrunedScan _),
    "layout_bucketed_join" -> (layoutBucketedJoin _),
    "layout_zorder_scan" -> (layoutZorderScan _),
    "join_range_bucketed" -> (joinRangeBucketed _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_topk" -> (q3ShippingTopk _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "win_topk_per_group" -> (winTopkPerGroup _),
    "agg_topk_bounded" -> (topkAggPerGroup _),
    "win_running_sum" -> (winRunningSum _),
    "win_trailing_range" -> (winTrailingRange _),
    "time_window_tumbling" -> (timeWindowTumbling _),
    "time_window_hopping" -> (timeWindowHopping _),
    "session_windows" -> (sessionWindows _),
    "set_ops" -> (setOps _),
    "dedup_exact" -> (dedupExact _),
    "agg_rollup" -> (aggRollup _),
    "topk_orders" -> (topkOrders _),
    "approx_distinct" -> (approxDistinct _),
    "approx_percentiles" -> (approxPercentiles _),
    "skew_salted_agg" -> (skewSaltedAgg _),
    "skew_hot_key_agg" -> (skewHotKeyAgg _),
    "skew_asof_sliced" -> (skewAsofSliced _),
    "q4_semi_join" -> (q4SemiJoin _),
    "anti_join" -> (antiJoin _),
    "q14_promo_share" -> (q14PromoShare _),
    "agg_percentiles" -> (aggPercentiles _),
    "agg_histogram" -> (aggHistogram _),
    "agg_variance" -> (aggVariance _),
    "agg_cube" -> (aggCube _),
  )

  val oracles: Map[String, String] = Map(
    "layout_pruned_scan" -> layoutPrunedScanSql,
    "layout_bucketed_join" -> layoutBucketedJoinSql,
    "layout_zorder_scan" -> layoutZorderScanSql,
    "join_range_bucketed" -> joinRangeBucketedSql,
    "q1_pricing_summary" -> q1Sql,
    "q3_shipping_topk" -> q3Sql,
    "q5_local_supplier" -> q5Sql,
    "win_topk_per_group" -> winTopkSql,
    "agg_topk_bounded" -> topkAggSql,
    "win_running_sum" -> winRunningSumSql,
    "win_trailing_range" -> winTrailingRangeSql,
    "time_window_tumbling" -> timeWindowSql,
    "time_window_hopping" -> timeWindowHoppingSql,
    "session_windows" -> sessionWindowsSql,
    "set_ops" -> setOpsSql,
    "dedup_exact" -> dedupExactSql,
    "agg_rollup" -> aggRollupSql,
    "topk_orders" -> topkOrdersSql,
    "approx_distinct" -> approxDistinctSql,
    "approx_percentiles" -> approxPercentilesSql,
    "skew_salted_agg" -> skewSaltedAggSql,
    "skew_hot_key_agg" -> skewHotKeyAggSql,
    "skew_asof_sliced" -> skewAsofSlicedSql,
    "q4_semi_join" -> q4SemiJoinSql,
    "anti_join" -> antiJoinSql,
    "q14_promo_share" -> q14PromoShareSql,
    "agg_percentiles" -> aggPercentilesSql,
    "agg_histogram" -> aggHistogramSql,
    "agg_variance" -> aggVarianceSql,
    "agg_cube" -> aggCubeSql,
  )
}
