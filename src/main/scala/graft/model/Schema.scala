package graft.model

import org.apache.spark.sql.Column

/** Scala-DSL mirror of the reference's HCL schema tree.
  *
  * Reference shapes: QuerySchema /root/reference/dsl/schema.go:61-82,
  * ContractSchema :276-292, EventSchema :321-338, MethodSchema :298-311,
  * Transform :352-357, Save :359-364, loop :427-442, variables :40,55-58.
  *
  * The reference defers transform/filter/save evaluation to per-row HCL
  * interpretation on the driver (dsl/schema.go:174-211); here they are
  * Catalyst `Column` expressions compiled once into the plan, so evaluation
  * happens distributed + codegen'd instead of row-at-a-time on the driver.
  */
sealed trait Mode
object Mode {
  case object Historical extends Mode
  case object Realtime extends Mode
}

/** One declared event capture: signature (event_type in the testbed) plus
  * the decoded output columns to keep, plus optional event-triggered method
  * calls (reference EventSchema.Methods, dsl/schema.go:321-338).
  */
final case class EventSpec(
    signature: String,
    outputs: Seq[String],
    methods: Seq[MethodSpec] = Nil,
)

/** One declared method call. In the reference this is an `eth_call` sampled
  * on a block cadence or triggered per event with a block offset
  * (dsl/schema.go:298-311). In the testbed it is an as-of lookup against a
  * state table keyed by (contract, time).
  */
final case class MethodSpec(
    name: String,
    outputs: Seq[String],
    blockOffset: Long = 0L,
)

/** Contract block: address (user_id in the testbed) + events/methods +
  * contract-scoped transforms — derived columns that apply only to THIS
  * contract's rows (e.g. per-token decimal scaling), visible to the
  * query-level filters/saves. Reference: dsl/schema.go:276-292 (Transforms
  * at :352-357; usage schema.example.hcl:23-33).
  */
final case class ContractSpec(
    address: Long,
    events: Seq[EventSpec] = Nil,
    methods: Seq[MethodSpec] = Nil,
    transforms: Seq[(String, Column)] = Nil,
)

/** One named query = one output pipeline (reference QuerySchema,
  * dsl/schema.go:61-82). `transforms` are named derived columns visible to
  * `filters` and `saves` (R3); `filters` AND-fold (R4); `saves` are the final
  * projection defining sink schema and column order (R5).
  */
final case class QuerySpec(
    name: String,
    chain: String,
    mode: Mode = Mode.Historical,
    contracts: Seq[ContractSpec] = Nil,
    globalEvents: Seq[EventSpec] = Nil,
    startTime: Option[String] = None, // inclusive, "yyyy-MM-dd HH:mm:ss" or date
    endTime: Option[String] = None,   // exclusive
    blockInterval: Option[Long] = None, // seconds between method samples
    transforms: Seq[(String, Column)] = Nil,
    filters: Seq[Column] = Nil,
    saves: Seq[(String, Column)] = Nil,
    groupBy: Seq[String] = Nil,             // aggregate-block group keys
    aggregates: Seq[(String, Column)] = Nil, // aggregate block (ROADMAP.md:77)
) {
  def hasMethods: Boolean =
    contracts.exists(_.methods.nonEmpty)
  def hasEvents: Boolean =
    globalEvents.nonEmpty || contracts.exists(_.events.nonEmpty)

  /** Distinct contract-level methods with their declaring-address scopes —
    * the single source of truth for S5/S6 method grouping (a method declared
    * by several contracts shares ONE state scan over the address set), used
    * by both the batch grid compiler and the realtime poller so their
    * semantics cannot drift apart. */
  def contractMethodScopes: Seq[(MethodSpec, Seq[Long])] =
    contracts.flatMap(c => c.methods.map(m => m -> c.address))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toSeq
      .sortBy(_._1.name)

  /** Validation parity with reference DynamicSchema.Validate
    * (dsl/schema.go:213-250): realtime method queries need an interval;
    * historical method queries need an interval when a range is set;
    * historical event queries must NOT set an interval.
    */
  def validate(): Unit = {
    if (hasMethods && mode == Mode.Realtime)
      require(blockInterval.isDefined, s"query $name: realtime method query requires blockInterval")
    if (hasMethods && mode == Mode.Historical && (startTime.isDefined || endTime.isDefined))
      require(blockInterval.isDefined, s"query $name: historical ranged method query requires blockInterval")
    if (hasEvents && !hasMethods && mode == Mode.Historical)
      require(blockInterval.isEmpty, s"query $name: historical event query must not set blockInterval")
    // A realtime EVENT query may omit both: the reference's latency-sensitive
    // raw-stream option — "just not have a save block and stream everything
    // as-is, let the application take care of decoding" (ROADMAP.md:72-74).
    val rawRealtime = mode == Mode.Realtime && hasEvents && !hasMethods
    require(saves.nonEmpty || aggregates.nonEmpty || rawRealtime,
      s"query $name: save or aggregate block required")
    require(groupBy.isEmpty || aggregates.nonEmpty,
      s"query $name: group_by requires an aggregate block")
  }
}

/** Per-chain source registry: chain name → event-store location, the
  * analogue of the reference's config mapping chain → RPC endpoint
  * (/root/reference/config.go:18-31 — `rpc { ethereum = "wss://..." }`).
  * A schema whose queries declare different chains (e.g. via loop items)
  * reads each query's events from that chain's OWN store; unknown chains
  * fall back to `default` (the single-store testbed behavior).
  */
final case class ChainRegistry(stores: Map[String, String], default: String) {
  def resolve(chain: String): String = stores.getOrElse(chain, default)
}

object ChainRegistry {
  /** Single-store registry — every chain reads `dir` (testbed default). */
  def single(dir: String): ChainRegistry = ChainRegistry(Map.empty, dir)
}

/** Top-level schema: variables (plan-time constants), optional loop items
  * stamping the template query per item (reference loop, dsl/schema.go:427-442;
  * non-unique names keyed "{i}-{name}", chainservice.go:127-131).
  */
final case class SchemaSpec(
    variables: Map[String, Any] = Map.empty,
    queries: Seq[QuerySpec] = Nil,
) {
  def validate(): Unit = queries.foreach(_.validate())
}

/** Loop expansion (R7): stamp a query per item with the item bound, exactly
  * the reference's template fan-out but at plan-construction time in Scala.
  */
object Loop {
  def expand[A](items: Seq[A])(f: (A, Int) => QuerySpec): Seq[QuerySpec] =
    items.zipWithIndex.map { case (item, i) =>
      val q = f(item, i)
      q.copy(name = s"$i-${q.name}")
    }
}
