package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row enrichment (SURVEY §2.1 S7/S8): the reference's only join-like ops.
  *
  * S7 — event-triggered method call: when a log matches, call methods at
  * `log.block + offset` and merge outputs into the event row
  * (/root/reference/chainservice/events.go:93-105, dsl/schema.go:298-311).
  * Relationally that is an as-of join: latest state row with
  * state.time <= event.time.
  *
  * S8 — block-metadata lookup: attach header fields per block
  * (/root/reference/chainservice/events.go:425-428, cached via LRU
  * cached_client.go:93-111). Relationally a broadcast join against a small
  * dimension.
  */
object Enrich {

  /** Scalable as-of join via union + running `last(ignoreNulls)`.
    *
    * Why not a range join: `l JOIN r ON l.key = r.key AND r.t <= l.t` then
    * max-per-row explodes quadratically per key (every left row pairs with
    * every earlier right row before the aggregate). The union formulation
    * costs exactly ONE shuffle of (left + right) by key and a per-key sort —
    * the same cost profile as a sort-merge join — and never materializes
    * pairs, so it survives 100 TB inputs. Skewed keys sort within a single
    * partition; if one key dominates, pre-split it by time range first.
    *
    * Ordering is made fully deterministic by (t, side, tieBreaker): right
    * (state) rows sort before left (probe) rows at equal t, so a state change
    * at exactly t is visible to a probe at t (the reference's offset-0
    * semantics, events.go:93-105 call at the event's own block).
    *
    * @param left       probe rows, keep all their columns
    * @param right      state rows: must contain key, rightTime, tieBreaker, valueCols
    * @param key        equality key (contract address / user_id)
    * @param leftTime   event-time column on left
    * @param rightTime  event-time column on right
    * @param tieBreaker unique right column ordering simultaneous states
    * @param valueCols  right columns to attach (null when no state yet)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      tieBreaker: String,
      valueCols: Seq[String],
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
    val r = right
      .select((Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        col(tieBreaker).cast("long").as("__tie")) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    enriched
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))): _*)
  }

  /** Skew-safe as-of join: [[asOfJoin]] semantics, with each key's timeline
    * SPLIT into `slices` time ranges so a hot key's per-key sort spreads
    * over `slices` partitions instead of landing on one reducer — the
    * documented residual risk of the plain union formulation ("skewed keys
    * sort within a single partition"), now closed the same way
    * [[graft.ext.Relational]] salts hot aggregation keys.
    *
    * Plan shape: the big shuffle is probes+state keyed (key, slice) with a
    * window per slice (the local prefix state); the per-(key, slice)
    * carry-in — per-column last non-null state of every EARLIER slice — is
    * a tiny keys×slices aggregate joined back co-partitioned. Each input is
    * read twice (window union + carry aggregates — Spark does not share
    * scan subtrees), both times map-side-reduced before any wide exchange.
    * Correctness: as-of(t) = the slice-local running last, or where the
    * slice has no state yet, the carry-in from previous slices; rows tied
    * on (t, side, tie) order identically to the plain form.
    *
    * `boundaries` are the slice split points, LITERALS in the time columns'
    * own domain (java.sql.Timestamp for timestamp columns, Long for block
    * heights), ascending — use equi-depth quantiles of the PROBE times so a
    * time-skewed hot key also splits evenly; they are plan-time constants,
    * so slicing is a codegen'd when-chain, not a join.
    */
  def asOfJoinSliced(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      tieBreaker: String,
      valueCols: Seq[String],
      boundaries: Seq[Any], // ascending; slice i = (-inf..b0], (b0..b1], ...
  ): DataFrame = {
    require(boundaries.nonEmpty, "asOfJoinSliced: at least one slice boundary required")
    val leftCols = left.columns.toSeq
    def sliceOf(t: Column): Column =
      boundaries.map(b => when(t > lit(b), 1).otherwise(0)).reduce(_ + _)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
    val r = right
      .select((Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        col(tieBreaker).cast("long").as("__tie")) ++
        valueCols.map(c => col(c).as(s"__v_$c"))): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__slice", sliceOf(col("__t")))
    // slice-local prefix state: window over (key, slice) — a hot key's rows
    // spread across `slices` window partitions
    val wLocal = Window.partitionBy(col(key), col("__slice"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__loc_$c", last(col(s"__v_$c"), ignoreNulls = true).over(wLocal))
    }
    // carry-in: PER-COLUMN last non-null state per (key, slice), carried
    // over the ORDERED slices per key shifted one slice forward. Per-column
    // (FILTER non-null), NOT the last row's whole struct — plain asOfJoin's
    // last(ignoreNulls) is per-column, and a slice whose final state row
    // holds a null column must not mask an earlier non-null value. The
    // carry domain must cover every (key, slice) holding probes (they need
    // earlier slices' carry even with no local state) AND every state-only
    // slice (its values must enter the carry chain) — probe-side distinct
    // FULL OUTER the state aggregate, so neither input is scanned a third
    // time for the domain.
    val lastAggs = valueCols.map(c =>
      expr(s"max_by(__v_$c, struct(__t, __tie)) FILTER (WHERE __v_$c IS NOT NULL)")
        .as(s"__last_$c"))
    val lastPerSlice = r.withColumn("__slice", sliceOf(col("__t")))
      .groupBy(col(key), col("__slice"))
      .agg(lastAggs.head, lastAggs.tail: _*)
    val probeDomain = l.withColumn("__slice", sliceOf(col("__t")))
      .select(col(key), col("__slice")).distinct()
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = valueCols.foldLeft(
      probeDomain.join(lastPerSlice, Seq(key, "__slice"), "full_outer")) { (df, c) =>
      df.withColumn(s"__carry_$c", last(col(s"__last_$c"), ignoreNulls = true).over(wCarry))
    }.select((Seq(col(key), col("__slice")) ++ valueCols.map(c => col(s"__carry_$c"))): _*)
    val joined = local.join(carry, Seq(key, "__slice"), "left")
    val resolved = valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", coalesce(col(s"__loc_$c"), col(s"__carry_$c")))
    }
    resolved
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))): _*)
  }

  /** S8 — broadcast dimension join (block headers, token metadata, …).
    * The reference's per-row `HeaderByNumber` + LRU cache becomes a broadcast
    * hash join: the dim ships once to every executor, no shuffle of the fact.
    */
  def withDim(
      fact: DataFrame,
      dim: DataFrame,
      joinKeys: Seq[(String, String)], // (factCol, dimCol)
      how: String = "left",
  ): DataFrame = {
    val cond = joinKeys
      .map { case (f, d) => fact(f) === dim(d) }
      .reduce(_ && _)
    fact.join(broadcast(dim), cond, how)
  }

  /** `is_contract(addr)` (reference ROADMAP v1.1 custom function): address
    * membership in a contract registry. Per-row `eth_getCode` in a live
    * deployment; relationally a broadcast left join against the registry
    * dim with a null-test — the fact side never shuffles.
    */
  def isContract(
      fact: DataFrame,
      registry: DataFrame,
      factAddr: String,
      regAddr: String,
      as: String,
  ): DataFrame = {
    // distinct: membership must not multiply fact rows on duplicate registry
    // keys; rename: keeps the join unambiguous when factAddr == regAddr.
    val reg = registry.select(col(regAddr).as("__reg_addr")).distinct()
    fact.join(broadcast(reg), fact(factAddr) === col("__reg_addr"), "left")
      .withColumn(as, col("__reg_addr").isNotNull)
      .drop("__reg_addr")
  }

  /** `get_price(from, to)` (reference dsl/functions.go:105-126 — designed
    * but commented out): price of a token pair from a per-token price dim,
    * computed as price(from)/price(to). Two broadcast joins against the same
    * dim — the reference would have made two RPC calls per row.
    */
  def pairPrice(
      fact: DataFrame,
      prices: DataFrame, // (keyCol, priceCol)
      fromCol: String,
      toCol: String,
      keyCol: String,
      priceCol: String,
      as: String,
  ): DataFrame = {
    // one price per token: duplicate keys would multiply fact rows
    val p1 = prices.select(col(keyCol), col(priceCol)).dropDuplicates(keyCol)
    val pf = p1.select(col(keyCol).as("__pk_f"), col(priceCol).as("__price_from"))
    val pt = p1.select(col(keyCol).as("__pk_t"), col(priceCol).as("__price_to"))
    fact
      .join(broadcast(pf), col(fromCol) === col("__pk_f"), "left")
      .join(broadcast(pt), col(toCol) === col("__pk_t"), "left")
      .withColumn(as, col("__price_from") / col("__price_to"))
      .drop("__pk_f", "__pk_t", "__price_from", "__price_to")
  }

  /** STATIC balance lookup (broadcast dim + scale) — correct only when the
    * balance cannot change inside the queried range (a genesis/snapshot
    * table). The reference's `balance(addr)` closes over the row's block
    * (dsl/schema.go:186-188; chainservice.go:244-259 calls
    * `BalanceAt(block)`) — for that per-block fidelity compose [[asOfJoin]]
    * over a balance-update state table, as
    * [[graft.queries.ApolloQueries.balanceLookup]] does.
    */
  def balanceLookup(
      fact: DataFrame,
      balances: DataFrame, // (addrCol, balCol)
      factAddr: String,
      balAddr: String,
      balCol: String,
      scaleDecimals: Int,
      as: String,
  ): DataFrame =
    withDim(fact, balances, Seq(factAddr -> balAddr))
      .withColumn(as, Functions.parseDecimals(col(balCol), scaleDecimals))
}
