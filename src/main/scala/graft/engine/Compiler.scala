package graft.engine

import graft.Tables
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compiles a [[graft.model.QuerySpec]] into a DataFrame pipeline:
  *
  *   source → withColumns(transforms) → filter(AND preds) → select(saves)
  *
  * This is the reference's whole per-row driver loop
  * (/root/reference/main.go:173-193 + dsl/schema.go:174-211) pushed into
  * Catalyst: transforms/filters/saves become plan expressions, so they run
  * distributed under whole-stage codegen and filters can be pushed down into
  * the scan instead of being evaluated after collection.
  */
object Compiler {

  /** Compile one query against the testbed event store. Dispatches on the
    * schema's `mode` exactly like the reference's chainservice
    * (/root/reference/chainservice/chainservice.go:167-215 routes one
    * DynamicSchema to the historical or the realtime handler):
    *
    *  - [[Mode.Historical]] — a batch plan. Three source shapes:
    *    event scan (S1/S2, contracts/globalEvents), contract-method sampling
    *    grid (S5, contracts(_).methods + blockInterval — reference
    *    RunMethodCaller, chainservice/methods.go:21-72), event-triggered
    *    method calls (S7, events(_).methods called at `log.block +
    *    blockOffset`, chainservice/events.go:93-105, merged into the row, R6).
    *  - [[Mode.Realtime]] — the SAME transform/filter/save pipeline over the
    *    streaming source (reference subscription mode, events.go:221-320).
    *    Event queries return an unstarted STREAMING DataFrame (start it with
    *    `writeStream`, or [[graft.streaming.Streams.runToTable]] for a
    *    bounded Trigger.AvailableNow run). Realtime method queries split on
    *    `endTime`: WITH an end, the bounded poll executes eagerly to
    *    `endTime` — the reference's ticker loop (chainservice.go:173-179) —
    *    returning the materialized grid; WITHOUT one, the open-ended live
    *    poller returns as an unstarted streaming frame
    *    ([[graft.streaming.Streams.methodPollerUnbounded]]).
    */
  def compile(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    q.validate()
    q.mode match {
      case Mode.Historical => compileBatch(spark, sfDir, q)
      case Mode.Realtime   => compileRealtime(spark, sfDir, q)
    }
  }

  private def compileBatch(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    val sourced =
      if (q.hasMethods) methodGridSource(spark, sfDir, q)
      else withEventMethods(spark, sfDir, q, standardColumns(eventSource(spark, sfDir, q)))
    pipeline(q, sourced)
  }

  /** Realtime: identical declarative surface, streaming execution. A user
    * declaring `mode = Realtime` gets the streaming engine — not silently a
    * batch plan. */
  private def compileRealtime(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    val hasEventMethods = q.contracts.exists(_.events.exists(_.methods.nonEmpty)) ||
      q.globalEvents.exists(_.methods.nonEmpty)
    if (q.hasMethods) {
      // S6 — realtime method poller. Bounded (end_time declared): streaming
      // pre-aggregation to tick granularity + grid finalization, eager.
      // Unbounded (no end_time): the reference's open-ended ticker — an
      // unstarted streaming frame polling current state per tick.
      if (q.endTime.isEmpty)
        pipeline(q, graft.streaming.Streams.methodPollerUnbounded(spark, sfDir, q))
      else
        pipeline(q, graft.streaming.Streams.methodGridRealtime(spark, sfDir, q))
    } else if (hasEventMethods) {
      // realtime S7 — event-triggered methods as streaming state (offset 0,
      // the reference's subscription-mode call-at-that-block semantics).
      pipeline(q, standardColumns(graft.streaming.Streams.eventMethodsStream(spark, sfDir, q)))
    } else {
      pipeline(q, standardColumns(streamEventSource(spark, sfDir, q)))
    }
  }

  /** Reference save-block context variables (schema.example.hcl:45) on an
    * event source — identical for the batch scan and the stream. Full
    * transaction context (`tx_sender`/`tx_receiver`, ROADMAP.md:75,
    * unimplemented there): the receiver of a log-emitting transaction is
    * the contract; the sender is an EOA the testbed store does not carry,
    * so it is a deterministic synthetic address (like the synthetic
    * tx_hash) — a live source supplies the real `from`. Unused context
    * columns are pruned by Catalyst, so queries not saving them pay
    * nothing. */
  private def standardColumns(events: DataFrame): DataFrame =
    events
      .withColumn("blocknumber", col("event_id"))
      .withColumn("timestamp", unix_timestamp(col("ts")))
      .withColumn("contract_address", col("user_id"))
      .withColumn("tx_receiver", col("user_id"))
      .withColumn("tx_sender", concat(lit("0x"), substring(
        md5(concat(col("event_id").cast("string"), lit("-"),
          col("user_id").cast("string"), lit("-from"))), 1, 40)))

  /** The shared declarative tail: transforms → AND-folded filters → saves →
    * optional aggregate. Works identically on a batch or streaming source —
    * this is the unified batch/stream claim made executable.
    *
    * The aggregate block is the reference's explicitly-unimplemented roadmap
    * item "Aggregation operations like group by, sum, avg"
    * (/root/reference/ROADMAP.md:77) — here it is one `groupBy().agg()` over
    * the saved rows (partial map-side aggregation + one shuffle on the group
    * keys; a grouped batch plan is codegen'd HashAggregate, a grouped
    * streaming plan runs under the state-store with update/complete output).
    */
  private def pipeline(q: QuerySpec, sourced: DataFrame): DataFrame = {
    val standard = sourced.withColumn("chain", lit(q.chain))
    val scoped = contractTransforms(q, standard)
    val transformed = q.transforms.foldLeft(scoped) { case (df, (name, e)) =>
      df.withColumn(name, e)
    }
    val filtered = transformed.where(Functions.allOf(q.filters))
    val saved =
      if (q.saves.isEmpty) filtered // raw passthrough / aggregate-only query
      else filtered.select(q.saves.map { case (name, e) => e.as(name) }: _*)
    if (q.aggregates.isEmpty) saved
    else {
      val aggs = q.aggregates.map { case (name, e) => e.as(name) }
      saved.groupBy(q.groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Contract-scoped transforms (dsl/schema.go:352-357): each name becomes
    * ONE column whose value is a CASE chain over the declaring contracts
    * (null on other contracts' rows) — per-contract semantics without
    * per-contract plans. Applied before query-level transforms so filters/
    * saves see the names (schema.example.hcl:41 semantics). */
  private def contractTransforms(q: QuerySpec, df: DataFrame): DataFrame = {
    val byName: Seq[(String, Seq[(Long, org.apache.spark.sql.Column)])] = q.contracts
      .flatMap(c => c.transforms.map { case (n, e) => (n, c.address, e) })
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toSeq.sortBy(_._1)
    byName.foldLeft(df) { case (d, (name, cases)) =>
      val chained = cases.tail.foldLeft(
        when(col("user_id") === cases.head._1, cases.head._2)) {
        case (acc, (a, e)) => acc.when(col("user_id") === a, e)
      }
      d.withColumn(name, chained)
    }
  }

  /** As-of-attach one method's outputs onto the probe frame, naming each
    * output "{method}_{output}" (the reference merges CallResult outputs
    * keyed by method into one row, apollotypes aggregateCallResults). */
  private def attachMethod(
      probe: DataFrame,
      state: DataFrame,
      m: MethodSpec,
      leftTime: String,
      rightTime: String,
  ): DataFrame = {
    val joined = Enrich.asOfJoin(probe, state,
      key = "user_id", leftTime = leftTime, rightTime = rightTime,
      tieBreaker = "event_id", valueCols = m.outputs)
    m.outputs.foldLeft(joined) { (df, o) =>
      df.withColumnRenamed(s"asof_$o", s"${m.name}_$o")
    }
  }

  /** S5 — contract methods sampled on the declared interval grid: one row
    * per (sample time, contract), each method's latest state as-of the tick.
    * The grid is tiny (samples × contracts) and is the probe side; the state
    * table shuffles ONCE per method by contract key inside the as-of join.
    * BlockOffset is ignored here — the reference only applies it to
    * event-triggered calls (dsl/schema.go:298-302).
    */
  private def methodGridSource(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    require(!q.hasEvents, s"query ${q.name}: a query declares methods or events, not both")
    val start = q.startTime.getOrElse(
      sys.error(s"query ${q.name}: method sampling requires start_time"))
    val end = q.endTime.getOrElse(
      sys.error(s"query ${q.name}: method sampling requires end_time"))
    val interval = q.blockInterval.getOrElse(
      sys.error(s"query ${q.name}: method sampling requires blockInterval"))
    val addrs = q.contracts.map(_.address).distinct.sorted
    val addrDf = spark.createDataFrame(addrs.map(Tuple1(_))).toDF("user_id")
    val grid = Sources.sampleGrid(spark, start, end, interval, addrDf)
    // Same method declared by several contracts shares ONE state scan with an
    // address-set predicate (as eventSource batches signatures).
    val attached = q.contractMethodScopes.foldLeft(grid) { case (df, (m, scope)) =>
      val state = Tables.events(spark, sfDir)
        .where(col("user_id").isin(scope: _*) && col("event_type") === m.name)
      attachMethod(df, state, m, leftTime = "sample_ts", rightTime = "ts")
    }
    attached.withColumn("timestamp", unix_timestamp(col("sample_ts")))
  }

  /** S7 — event-triggered method calls: for each method declared under an
    * event, attach its state as-of block `event.block + blockOffset`
    * (events.go:93-105 — the call happens at the log's block plus the
    * declared offset; offset 0 sees same-block state). One as-of window pass
    * per distinct method — no pair materialization, one shuffle by contract.
    */
  private def withEventMethods(
      spark: SparkSession, sfDir: String, q: QuerySpec, base: DataFrame): DataFrame = {
    // (method, declaring addresses (None = global), declaring event signature)
    val scoped: Seq[(MethodSpec, Option[Long], String)] =
      q.contracts.flatMap(c => c.events.flatMap(e =>
        e.methods.map(m => (m, Some(c.address): Option[Long], e.signature)))) ++
        q.globalEvents.flatMap(e => e.methods.map(m => (m, None, e.signature)))
    val byMethod: Seq[(MethodSpec, Option[Seq[Long]], Seq[String])] = scoped
      .groupBy(_._1).view
      .map { case (m, vs) =>
        val addrs = vs.map(_._2)
        val scope = if (addrs.contains(None)) None else Some(addrs.flatten.distinct.sorted)
        (m, scope, vs.map(_._3).distinct.sorted)
      }
      .toSeq.sortBy(_._1.name)
    // Output columns are keyed "{method}_{output}" — two method specs with
    // the same name but different offsets/outputs would collide silently.
    val dup = byMethod.groupBy(_._1.name).collect { case (n, ms) if ms.size > 1 => n }
    require(dup.isEmpty,
      s"query ${q.name}: method '${dup.head}' declared twice with different outputs/blockOffset")
    byMethod.foldLeft(base) { case (df, (m, scope, sigs)) =>
      val st0 = Tables.events(spark, sfDir).where(col("event_type") === m.name)
      val state = scope.fold(st0)(a => st0.where(col("user_id").isin(a: _*)))
      val probe = df.withColumn("__probe_block", col("blocknumber") + lit(m.blockOffset))
      val attached = attachMethod(probe, state, m,
        leftTime = "__probe_block", rightTime = "event_id")
        .drop("__probe_block")
      // The reference calls methods only for the TRIGGERING event's logs
      // (events.go:93-105) — rows of other declared events keep null outputs.
      m.outputs.foldLeft(attached) { (d, o) =>
        val c = s"${m.name}_$o"
        d.withColumn(c, when(col("event_type").isin(sigs: _*), col(c)))
      }
    }
  }

  /** Per-chain dispatch: each query's events come from ITS chain's store —
    * the reference resolves the RPC client per chain the same way
    * (config.go:18-31 + chainservice.go:127-131 one service per chain). */
  def compile(spark: SparkSession, registry: ChainRegistry, q: QuerySpec): DataFrame =
    compile(spark, registry.resolve(q.chain), q)

  /** Compile every query of a schema, keyed like the reference keys its
    * per-query channels (chainservice.go:127-131). */
  def compileAll(spark: SparkSession, sfDir: String, schema: SchemaSpec): Map[String, DataFrame] =
    compileAll(spark, ChainRegistry.single(sfDir), schema)

  /** Multi-chain compileAll: queries declaring different chains read
    * different stores, resolved per query through the registry. */
  def compileAll(spark: SparkSession, registry: ChainRegistry, schema: SchemaSpec): Map[String, DataFrame] = {
    schema.validate()
    schema.queries.map(q => q.name -> compile(spark, registry, q)).toMap
  }

  /** R8 — per-query demux as data: one unioned frame tagged with query_name,
    * ready for `write.partitionBy("query_name")` (one output dir per query,
    * the Spark analogue of the reference's per-query channels/sinks).
    */
  def demux(compiled: Map[String, DataFrame]): DataFrame =
    compiled.toSeq.sortBy(_._1).map { case (name, df) =>
      // Demuxed queries share a sink ⇒ align on the union of columns.
      df.withColumn("query_name", lit(name))
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

  private def eventSource(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    // Contracts declaring the same event signature share ONE scan with an
    // address-set predicate (pushed into the reader), instead of a scan per
    // contract — the reference batches the same way by passing all addresses
    // in a single eth_getLogs filter (chainservice/events.go:39).
    val bySignature = q.contracts
      .flatMap(c => c.events.map(ev => ev.signature -> c.address))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
    val scans =
      q.globalEvents.map(ev =>
        Sources.globalEvents(spark, sfDir, ev.signature, q.startTime, q.endTime)) ++
        bySignature.map { case (sig, addrs) =>
          Sources.contractEvents(spark, sfDir, addrs, sig, q.startTime, q.endTime)
        }
    require(scans.nonEmpty, s"query ${q.name}: no event source declared")
    scans.reduce(_ unionByName _)
  }

  /** Streaming twin of [[eventSource]]: the same signature-batched predicates
    * (contracts declaring the same event share ONE filtered stream — the
    * reference passes all addresses in a single subscription filter,
    * events.go:247-260) pushed per micro-batch into the file-source scan.
    * Time bounds are plain event-time predicates. */
  private def streamEventSource(spark: SparkSession, sfDir: String, q: QuerySpec): DataFrame = {
    val base = graft.streaming.Streams.eventStream(spark, sfDir)
    val bySignature = q.contracts
      .flatMap(c => c.events.map(ev => ev.signature -> c.address))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
    val scans =
      q.globalEvents.map(ev => base.where(col("event_type") === ev.signature)) ++
        bySignature.map { case (sig, addrs) =>
          base.where(col("event_type") === sig && col("user_id").isin(addrs: _*))
        }
    require(scans.nonEmpty, s"query ${q.name}: no event source declared")
    Sources.timeBound(scans.reduce(_ unionByName _), q.startTime, q.endTime)
  }
}
