package graft.queries

import graft.Tables
import graft.engine._
import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own operator surface (SURVEY §2.1-2.3) as named queries
  * over the testbed tables, each with a DuckDB oracle. Mapping (FIXTURES §C):
  * event_type ≙ event signature, user_id ≙ contract address, event_id ≙
  * block number, ts ≙ block timestamp.
  */
object ApolloQueries {

  private val FibAddrs = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L)

  /** Flagship: the `usdc_eth_swaps` pipeline (schema.example.hcl:10-54)
    * re-expressed through the schema model + compiler. Exercises S1 contract
    * scan, R3 transform, R4 filter list, R5 save, parse_decimals, ternary,
    * time bounds (S9-style declared range).
    */
  private def flagshipSpec: QuerySpec = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    QuerySpec(
      name = "usdc_eth_swaps",
      chain = "ethereum",
      contracts = FibAddrs.map(a => ContractSpec(a, events = Seq(EventSpec("purchase", Seq("value", "props"))))),
      startTime = Some("2024-01-05"),
      endTime = Some("2024-01-25"),
      transforms = Seq(
        "k" -> k,
        "amount" -> Functions.parseDecimals(col("value"), 2),
        "buy" -> (k % 2 === 0),
      ),
      filters = Seq(col("amount") =!= 0, col("k").isNotNull),
      saves = Seq(
        "chain" -> col("chain"),
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "contract" -> col("user_id"),
        "direction" -> Functions.ternary(col("buy"), lit("buy"), lit("sell")),
        "amount" -> col("amount"),
        "k" -> col("k"),
      ),
    )
  }

  def flagship(spark: SparkSession, sfDir: String): DataFrame =
    Compiler.compile(spark, sfDir, flagshipSpec).orderBy("blocknumber")

  /** S3/S4 through the COMPILED realtime surface: the flagship QuerySpec with
    * `mode = Realtime` compiles to a streaming pipeline (same transforms/
    * filters/saves — [[graft.engine.Compiler]] dispatches the source, the
    * declarative tail is shared code), runs to completion on the bounded
    * events table with Trigger.AvailableNow, and must hash-match the SAME
    * oracle as the batch flagship. This is the reference's one-schema
    * two-modes dispatch (chainservice/chainservice.go:167-215) made
    * executable + verifiable. */
  def compiledStreamParity(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = Compiler.compile(spark, sfDir, flagshipSpec.copy(mode = Mode.Realtime))
    assert(stream.isStreaming, "realtime compile must produce a streaming plan")
    graft.streaming.Streams.runToTable(stream, "s3_compiled_sink").orderBy("blocknumber")
  }

  private val flagshipSql =
    s"""SELECT 'ethereum' AS chain, event_id AS blocknumber,
       |  CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp", user_id AS contract,
       |  CASE WHEN CAST(json_extract_string(props, '$$.k') AS BIGINT) % 2 = 0
       |       THEN 'buy' ELSE 'sell' END AS direction,
       |  value / 100.0 AS amount,
       |  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
       |FROM events
       |WHERE event_type = 'purchase'
       |  AND user_id IN (${FibAddrs.mkString(",")})
       |  AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-25'
       |  AND value / 100.0 <> 0
       |  AND json_extract_string(props, '$$.k') IS NOT NULL
       |ORDER BY blocknumber""".stripMargin

  /** The HCL schema surface under the DRIVER's gate: a reference-dialect
    * .hcl document (contract blocks with scoped events + transforms, filter
    * list, save block) parses through [[graft.model.HclSchema]], compiles,
    * and must hash-match a plain-SQL oracle — proving the whole
    * HCL → JSON → QuerySpec → Catalyst chain end-to-end, not just in unit
    * tests. */
  def hclScopedSwaps(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val hcl =
      """start_time = "2024-01-05"
        |end_time = "2024-01-25"
        |query hcl_swaps {
        |  chain = "ethereum"
        |  contract {
        |    address = 1
        |    event purchase { outputs = ["value"] }
        |    transform { amount = parse_decimals(value, 2) }
        |  }
        |  contract {
        |    address = 2
        |    event purchase { outputs = ["value"] }
        |    transform { amount = parse_decimals(value, 3) }
        |  }
        |  filter = [ amount != 0 ]
        |  save {
        |    block = blocknumber
        |    contract = contract_address
        |    direction = amount > 1 ? "big" : "small"
        |    amount = amount
        |  }
        |}""".stripMargin
    Compiler.compile(spark, sfDir, HclSchema.parse(hcl).queries.head).orderBy("block")
  }

  private val hclScopedSwapsSql =
    """SELECT event_id AS block, user_id AS contract,
      |  CASE WHEN value / CASE WHEN user_id = 1 THEN 100.0 ELSE 1000.0 END > 1
      |       THEN 'big' ELSE 'small' END AS direction,
      |  value / CASE WHEN user_id = 1 THEN 100.0 ELSE 1000.0 END AS amount
      |FROM events
      |WHERE event_type = 'purchase' AND user_id IN (1, 2)
      |  AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-25'
      |  AND value / CASE WHEN user_id = 1 THEN 100.0 ELSE 1000.0 END <> 0
      |ORDER BY block""".stripMargin

  /** ROADMAP v1.1 custom function definitions (#DEFINE,
    * /root/reference/ROADMAP.md:58-61) under the DRIVER's gate: top-level
    * `function` blocks are declared once and called from transform/filter/
    * save expressions — including a function calling another function —
    * macro-expanded at schema load by [[graft.model.HclSchema.expandMacros]]
    * and compiled through the ordinary pipeline. */
  def hclCustomFn(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val hcl =
      """function "usd" {
        |  params = [x, d]
        |  body   = parse_decimals(x, d)
        |}
        |function "side" {
        |  params = [n]
        |  body   = n % 2 == 0 ? "buy" : "sell"
        |}
        |function "big_usd" {
        |  params = [x]
        |  body   = usd(x, 2) > 5   # nested user-function call
        |}
        |query "fn_swaps" {
        |  chain = "ethereum"
        |  contract {
        |    address = 3
        |    event purchase { outputs = ["value", "k"] }
        |  }
        |  filter = [ usd(value, 2) != 0 ]
        |  save {
        |    block = blocknumber
        |    amount = usd(value, 2)
        |    direction = side(k)
        |    is_big = big_usd(value)
        |  }
        |}""".stripMargin
    Compiler.compile(spark, sfDir, HclSchema.parse(hcl).queries.head).orderBy("block")
  }

  private val hclCustomFnSql =
    """SELECT event_id AS block, value / 100.0 AS amount,
      |  CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE) % 2 = 0
      |       THEN 'buy' ELSE 'sell' END AS direction,
      |  value / 100.0 > 5 AS is_big
      |FROM events
      |WHERE event_type = 'purchase' AND user_id = 3 AND value / 100.0 <> 0
      |ORDER BY block""".stripMargin

  /** The aggregate block (reference roadmap "Aggregation operations like
    * group by, sum, avg", /root/reference/ROADMAP.md:77 — explicitly
    * unimplemented there) under the DRIVER's gate: an HCL schema whose
    * `aggregate { group_by = [...] ... }` block compiles to one
    * `groupBy().agg()` over the saved rows (map-side partial aggregation +
    * one shuffle on the group keys). Sum goes through exact decimals per the
    * repo-wide output discipline (BUILDLOG round-2 finding 1). */
  private def dslAggregateHcl: String =
    """query "volume_by_side" {
      |  chain = "ethereum"
      |  event purchase { outputs = ["value", "k"] }
      |  transform { amount = parse_decimals(value, 2) }
      |  filter = [ k >= 0 ]
      |  save {
      |    side = k % 2 == 0 ? "buy" : "sell"
      |    amount = amount
      |  }
      |  aggregate {
      |    group_by = [side]
      |    n = count(1)
      |    total = cast(sum(cast(amount as decimal(12,4))) as double)
      |    max_amount = max(amount)
      |  }
      |}""".stripMargin

  def dslAggregate(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Compiler.compile(spark, sfDir, HclSchema.parse(dslAggregateHcl).queries.head)
      .orderBy("side")
  }

  /** The SAME aggregate schema through the realtime engine: `mode = Realtime`
    * compiles to a streaming grouped aggregation (state-store backed), runs
    * to completion on the bounded events table (Trigger.AvailableNow,
    * complete output), and must hash-match the batch oracle — the roadmap
    * aggregation item delivered in BOTH of the reference's modes. */
  def dslStreamAggregate(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val spec = HclSchema.parse(dslAggregateHcl).queries.head.copy(mode = Mode.Realtime)
    val stream = Compiler.compile(spark, sfDir, spec)
    assert(stream.isStreaming, "realtime aggregate must compile to a streaming plan")
    graft.streaming.Streams.runToTable(stream, "dsl_agg_sink", "complete").orderBy("side")
  }

  private val dslAggregateSql =
    """WITH s AS (
      |  SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE) % 2 = 0
      |              THEN 'buy' ELSE 'sell' END AS side,
      |         value / 100.0 AS amount
      |  FROM events
      |  WHERE event_type = 'purchase'
      |    AND CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 0)
      |SELECT side, count(*) AS n,
      |  CAST(CAST(sum(CAST(amount AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total,
      |  max(amount) AS max_amount
      |FROM s GROUP BY side ORDER BY side""".stripMargin

  /** Transaction monitoring (/root/reference/ROADMAP.md:67-69, unimplemented
    * there): every roadmap predicate class at once — value bounds, sender
    * set, receiver set, method selectors, and an input predicate — AND-folded
    * into one filtered scan ([[graft.engine.TxMonitor]]). */
  private def txMonitorSpec = graft.engine.TxFilterSpec(
    minValue = Some(20.0),
    maxValue = Some(180.0),
    senders = FibAddrs,
    receivers = (0L to 60L by 2).toSeq,
    methods = Seq("purchase", "error"),
    inputPredicates = Seq(get_json_object(col("props"), "$.k").cast("long") % 3 === 0))

  def txMonitor(spark: SparkSession, sfDir: String): DataFrame =
    graft.engine.TxMonitor.monitor(spark, sfDir, txMonitorSpec)
      .select("block", "sender", "receiver", "method", "value")
      .orderBy("block")

  /** Mempool monitoring (/root/reference/ROADMAP.md:69-70): the SAME
    * TxFilterSpec over the streaming source — the pending-tx feed is a
    * stream, the monitor is a per-row predicate, so the bounded run must
    * hash-match the batch monitor's oracle. */
  def mempoolMonitor(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = graft.engine.TxMonitor.monitorStream(spark, sfDir, txMonitorSpec)
      .select("block", "sender", "receiver", "method", "value")
    assert(stream.isStreaming, "mempool monitor must run the streaming engine")
    graft.streaming.Streams.runToTable(stream, "mempool_sink").orderBy("block")
  }

  private val txMonitorSql =
    s"""SELECT event_id AS block, user_id AS sender,
       |  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS receiver,
       |  event_type AS method, value
       |FROM events
       |WHERE value >= 20.0 AND value < 180.0
       |  AND user_id IN (${FibAddrs.mkString(",")})
       |  AND CAST(json_extract_string(props, '$$.k') AS BIGINT) IN (${(0L to 60L by 2).mkString(",")})
       |  AND event_type IN ('purchase', 'error')
       |  AND CAST(json_extract_string(props, '$$.k') AS BIGINT) % 3 = 0
       |ORDER BY block""".stripMargin

  /** Unverified events (/root/reference/ROADMAP.md:79 "Unverified methods
    * and events", unimplemented there): an event block with NO declared ABI
    * outputs — the contract's ABI is unknown/unverified — captures the raw
    * payload instead of decoded columns. The save block references the
    * native raw columns (`props`, `value`) directly; nothing is rewritten to
    * payload lookups because nothing was declared. A live source would land
    * raw topics/data hex the same way (decode-free passthrough is exactly
    * what "let the application take care of decoding", ROADMAP.md:74,
    * asks for). */
  def unverifiedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val hcl =
      """query "unverified" {
        |  chain = "ethereum"
        |  contract {
        |    address = 4
        |    event click {}
        |    event signup {}
        |  }
        |  save {
        |    block = blocknumber
        |    signature = event_type
        |    raw_data = props
        |    raw_value = value
        |  }
        |}""".stripMargin
    Compiler.compile(spark, sfDir, HclSchema.parse(hcl).queries.head).orderBy("block")
  }

  private val unverifiedEventsSql =
    """SELECT event_id AS block, event_type AS signature, props AS raw_data,
      |  value AS raw_value
      |FROM events
      |WHERE user_id = 4 AND event_type IN ('click', 'signup')
      |ORDER BY block""".stripMargin

  /** ROADMAP v1.1 custom templates ('uniswapv2',
    * /root/reference/ROADMAP.md:82-87) — a PACKAGED schema: declare the pair
    * contracts (+ per-token decimals) and get the standard v2 swaps query
    * (per-pair decimal scaling as contract-scoped transforms, zero-guarded
    * swap price, direction, standard save projection) without writing it.
    * Testbed analog of the two flows: `value` = token0 amount, props `k` =
    * token1 amount (a live source decodes amount0In/amount1In from the Swap
    * ABI — schema.example.hcl:18-33). */
  def templateUniswapV2(spark: SparkSession, sfDir: String): DataFrame =
    Compiler.compile(spark, sfDir, graft.model.Templates.uniswapv2(
      pairs = Seq(
        graft.model.Templates.UniV2Pair(address = 11L, decimals0 = 2, decimals1 = 0),
        graft.model.Templates.UniV2Pair(address = 12L, decimals0 = 3, decimals1 = 1)),
    )).orderBy("block")

  private val templateUniswapV2Sql =
    """SELECT CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp", event_id AS block,
      |  user_id AS contract,
      |  CASE WHEN value / CASE WHEN user_id = 11 THEN 100.0 ELSE 1000.0 END <> 0
      |       THEN (CAST(json_extract_string(props, '$.k') AS DOUBLE)
      |               / CASE WHEN user_id = 11 THEN 1.0 ELSE 10.0 END)
      |            / (value / CASE WHEN user_id = 11 THEN 100.0 ELSE 1000.0 END)
      |       ELSE NULL END AS swap_price,
      |  CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
      |       THEN 'buy' ELSE 'sell' END AS direction,
      |  CAST(json_extract_string(props, '$.k') AS DOUBLE)
      |    / CASE WHEN user_id = 11 THEN 1.0 ELSE 10.0 END AS size_token1
      |FROM events
      |WHERE event_type = 'purchase' AND user_id IN (11, 12)
      |  AND json_extract_string(props, '$.k') IS NOT NULL
      |ORDER BY block""".stripMargin

  /** ROADMAP v1.1 'uniswapv3' template: the v3 Swap surface, where price is
    * the pool's Q64.96 fixed-point sqrt price squared
    * (`(sqrtPriceX96/2^96)^2 × 10^(d0−d1)`) rather than v2's reserve ratio.
    * Same packaged-QuerySpec shape as the v2 template; the X96 arithmetic is
    * exact in doubles at testbed magnitudes so the oracle mirrors it
    * bit-for-bit. */
  def templateUniswapV3(spark: SparkSession, sfDir: String): DataFrame =
    Compiler.compile(spark, sfDir, graft.model.Templates.uniswapv3(
      pools = Seq(
        graft.model.Templates.UniV3Pool(address = 13L, decimals0 = 2, decimals1 = 0),
        graft.model.Templates.UniV3Pool(address = 21L, decimals0 = 1, decimals1 = 2)),
    )).orderBy("block")

  private val templateUniswapV3Sql =
    """WITH sw AS (
      |  SELECT ts, event_id, user_id, value,
      |    CAST(json_extract_string(props, '$.k') AS DOUBLE) * pow(2.0, 96) AS spx,
      |    CASE WHEN user_id = 13 THEN 100.0 ELSE 0.1 END AS mult,
      |    CASE WHEN user_id = 13 THEN 100.0 ELSE 10.0 END AS scale0
      |  FROM events
      |  WHERE event_type = 'purchase' AND user_id IN (13, 21)
      |    AND json_extract_string(props, '$.k') IS NOT NULL)
      |SELECT CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp", event_id AS block,
      |  user_id AS pool, spx AS sqrt_price_x96,
      |  ((spx / pow(2.0, 96)) * (spx / pow(2.0, 96))) * mult AS price,
      |  value / scale0 AS amount0
      |FROM sw ORDER BY block""".stripMargin

  /** The raw-stream output option (ROADMAP.md:72-74: for latency-sensitive
    * operations, "just not have a save block and stream everything as-is,
    * let the application take care of decoding"): a Realtime event query
    * with NO save block streams every source + context column unprojected.
    * The bounded run must match a bare SELECT of the same columns. */
  def rawStreamPassthrough(spark: SparkSession, sfDir: String): DataFrame = {
    val spec = QuerySpec(
      name = "raw_stream", chain = "ethereum", mode = Mode.Realtime,
      globalEvents = Seq(EventSpec("signup", Nil)))
    val stream = Compiler.compile(spark, sfDir, spec)
    assert(stream.isStreaming, "raw passthrough must run the streaming engine")
    graft.streaming.Streams.runToTable(stream, "raw_stream_sink").orderBy("event_id")
  }

  private val rawStreamPassthroughSql =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props,
      |  event_id AS blocknumber, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
      |  user_id AS contract_address, user_id AS tx_receiver,
      |  '0x' || substr(md5(CAST(event_id AS VARCHAR) || '-' || CAST(user_id AS VARCHAR) || '-from'), 1, 40) AS tx_sender,
      |  'ethereum' AS chain
      |FROM events WHERE event_type = 'signup' ORDER BY event_id""".stripMargin

  /** Full transaction context (ROADMAP.md:75 "Events: full transaction
    * context (tx_sender, tx_receiver)", unimplemented there): both are
    * save-block context variables on every event query — receiver = the
    * contract, sender = the deterministic synthetic EOA (testbed stand-in,
    * like tx_hash; a live source supplies the real `from`). Exercised
    * through the HCL surface so the native-column wiring is proven
    * end-to-end. */
  def txContextEvents(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val hcl =
      """query "tx_ctx" {
        |  chain = "ethereum"
        |  contract {
        |    address = 9
        |    event error { outputs = ["value"] }
        |  }
        |  save {
        |    block = blocknumber
        |    from_addr = tx_sender
        |    to_addr = tx_receiver
        |    hash = tx_hash
        |    value = value
        |  }
        |}""".stripMargin
    Compiler.compile(spark, sfDir, HclSchema.parse(hcl).queries.head).orderBy("block")
  }

  private val txContextEventsSql =
    """SELECT event_id AS block,
      |  '0x' || substr(md5(CAST(event_id AS VARCHAR) || '-' || CAST(user_id AS VARCHAR) || '-from'), 1, 40) AS from_addr,
      |  user_id AS to_addr,
      |  md5(CAST(event_id AS VARCHAR) || '-' || CAST(user_id AS VARCHAR)) AS hash,
      |  value
      |FROM events
      |WHERE user_id = 9 AND event_type = 'error'
      |ORDER BY block""".stripMargin

  /** ROADMAP v1.1 'aave' template (schema-ideas.hcl:30-41): the
    * lending-health method-grid template — two polled state methods per
    * declared account plus the derived collateral ratio, compiled through
    * the SAME S5 grid path as any hand-written method query. The oracle
    * nests both methods' as-of windows in one pass. */
  def templateAave(spark: SparkSession, sfDir: String): DataFrame =
    Compiler.compile(spark, sfDir, graft.model.Templates.aave(
      accounts = Seq(1L, 3L, 5L, 7L),
      startTime = "2024-01-02", endTime = "2024-01-28",
      intervalSeconds = 172800L,
    )).orderBy("sample_ts", "account")

  private val templateAaveSql =
    """WITH grid AS (
      |  SELECT g.t, u.user_id
      |  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-02', TIMESTAMP '2024-01-28', INTERVAL 2 DAY)) AS t) g
      |  CROSS JOIN (SELECT unnest(CAST([1, 3, 5, 7] AS BIGINT[])) AS user_id) u),
      |ev AS (SELECT user_id, ts AS t, event_id, value, event_type FROM events
      |       WHERE user_id IN (1, 3, 5, 7) AND event_type IN ('view', 'click')),
      |un AS (
      |  SELECT user_id, t, CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value,
      |    CAST(NULL AS VARCHAR) AS event_type, 1 AS side FROM grid
      |  UNION ALL
      |  SELECT user_id, t, event_id, value, event_type, 0 AS side FROM ev),
      |w AS (
      |  SELECT user_id, t, side,
      |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS) OVER win AS cv,
      |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS) OVER win AS bv
      |  FROM un
      |  WINDOW win AS (PARTITION BY user_id ORDER BY t, side, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT t AS sample_ts, CAST(floor(epoch(t)) AS BIGINT) AS "timestamp",
      |  user_id AS account, cv AS collateral_value, bv AS borrowed,
      |  CASE WHEN bv <> 0 THEN cv / bv END AS collateral_ratio
      |FROM w WHERE side = 1 ORDER BY sample_ts, account""".stripMargin

  /** ROADMAP v1.1 'makerdao' template (the reference's last unchecked
    * template box, ROADMAP.md:86): vault collateralization — the aave
    * grid+ratio shape with CDP semantics: per-vault ilk + liquidation-ratio
    * constants (contract-scoped, plan-time-folded) and the keeper predicate
    * `at_risk = collateralization < liquidation_ratio`. The oracle derives
    * the same per-vault constants as CASE maps over the as-of windows. */
  def templateMakerdao(spark: SparkSession, sfDir: String): DataFrame =
    Compiler.compile(spark, sfDir, graft.model.Templates.makerdao(
      vaults = Seq(
        graft.model.Templates.MakerVault(address = 2L, ilk = "ETH-A", liquidationRatio = 1.45),
        graft.model.Templates.MakerVault(address = 4L, ilk = "WBTC-A", liquidationRatio = 1.4),
        graft.model.Templates.MakerVault(address = 6L, ilk = "ETH-B", liquidationRatio = 1.3)),
      startTime = "2024-01-02", endTime = "2024-01-28",
      intervalSeconds = 172800L,
    )).orderBy("sample_ts", "vault")

  private val templateMakerdaoSql =
    """WITH grid AS (
      |  SELECT g.t, u.user_id
      |  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-02', TIMESTAMP '2024-01-28', INTERVAL 2 DAY)) AS t) g
      |  CROSS JOIN (SELECT unnest(CAST([2, 4, 6] AS BIGINT[])) AS user_id) u),
      |ev AS (SELECT user_id, ts AS t, event_id, value, event_type FROM events
      |       WHERE user_id IN (2, 4, 6) AND event_type IN ('view', 'click')),
      |un AS (
      |  SELECT user_id, t, CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value,
      |    CAST(NULL AS VARCHAR) AS event_type, 1 AS side FROM grid
      |  UNION ALL
      |  SELECT user_id, t, event_id, value, event_type, 0 AS side FROM ev),
      |w AS (
      |  SELECT user_id, t, side,
      |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS) OVER win AS cv,
      |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS) OVER win AS dv
      |  FROM un
      |  WINDOW win AS (PARTITION BY user_id ORDER BY t, side, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |g AS (
      |  SELECT t AS sample_ts, CAST(floor(epoch(t)) AS BIGINT) AS "timestamp",
      |    user_id AS vault,
      |    CASE user_id WHEN 2 THEN 'ETH-A' WHEN 4 THEN 'WBTC-A' ELSE 'ETH-B' END AS ilk,
      |    cv AS collateral_value, dv AS debt,
      |    CASE WHEN dv <> 0 THEN cv / dv END AS collateralization,
      |    CAST(CASE user_id WHEN 2 THEN 1.45 WHEN 4 THEN 1.4 ELSE 1.3 END AS DOUBLE) AS liquidation_ratio
      |  FROM w WHERE side = 1)
      |SELECT sample_ts, "timestamp", vault, ilk, collateral_value, debt,
      |  collateralization, liquidation_ratio,
      |  collateralization < liquidation_ratio AS at_risk
      |FROM g ORDER BY sample_ts, vault""".stripMargin

  /** ROADMAP v1.1 'compound' template: exchange-rate accrual — cToken
    * balances convert to the underlying via the market's polled
    * exchangeRate, and the per-sample rate growth (a lag window OVER the
    * method grid) is the supply-yield series. Exercises a mechanic none of
    * the other templates do: a window over grid samples. */
  def templateCompound(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = Compiler.compile(spark, sfDir, graft.model.Templates.compound(
      markets = Seq(
        graft.model.Templates.CompoundMarket(address = 2L, rateScale = 2),
        graft.model.Templates.CompoundMarket(address = 8L, rateScale = 3)),
      startTime = "2024-01-03", endTime = "2024-01-27",
      intervalSeconds = 172800L,
    ))
    val w = Window.partitionBy("market").orderBy("sample_ts")
    val prev = lag(col("exchange_rate"), 1).over(w)
    grid
      .withColumn("rate_growth",
        when(prev =!= 0, col("exchange_rate") / prev - 1))
      .orderBy("sample_ts", "market")
  }

  private val templateCompoundSql =
    """WITH grid AS (
      |  SELECT g.t, u.user_id
      |  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-03', TIMESTAMP '2024-01-27', INTERVAL 2 DAY)) AS t) g
      |  CROSS JOIN (SELECT unnest(CAST([2, 8] AS BIGINT[])) AS user_id) u),
      |ev AS (SELECT user_id, ts AS t, event_id, value, event_type FROM events
      |       WHERE user_id IN (2, 8) AND event_type IN ('view', 'click')),
      |un AS (
      |  SELECT user_id, t, CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value,
      |    CAST(NULL AS VARCHAR) AS event_type, 1 AS side FROM grid
      |  UNION ALL
      |  SELECT user_id, t, event_id, value, event_type, 0 AS side FROM ev),
      |w AS (
      |  SELECT user_id, t, side,
      |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS) OVER win AS rate,
      |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS) OVER win AS ct
      |  FROM un
      |  WINDOW win AS (PARTITION BY user_id ORDER BY t, side, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |g AS (
      |  SELECT t AS sample_ts, user_id AS market, rate AS exchange_rate, ct AS ctokens,
      |    (rate * ct) / CASE WHEN user_id = 2 THEN 100.0 ELSE 1000.0 END AS underlying
      |  FROM w WHERE side = 1)
      |SELECT sample_ts, market, exchange_rate, ctokens, underlying,
      |  CASE WHEN lag(exchange_rate) OVER mw <> 0
      |       THEN exchange_rate / lag(exchange_rate) OVER mw - 1 END AS rate_growth
      |FROM g
      |WINDOW mw AS (PARTITION BY market ORDER BY sample_ts)
      |ORDER BY sample_ts, market""".stripMargin

  /** ROADMAP v1.1 cross-chain address monitoring
    * (/root/reference/ROADMAP.md:80): ONE address watched on every
    * configured chain — the monitor stamps the same contract-scoped spec per
    * chain, compiles each against that chain's registry store
    * (chainservice.go:127-131 one service per chain), and unions with the
    * chain column distinguishing origin. Single-store testbed: both chains
    * resolve to the same store (distinct-store routing is spec-asserted in
    * FixturesSpec); multiple event signatures on one contract exercise the
    * per-signature batched scans. */
  def crossChainMonitor(spark: SparkSession, sfDir: String): DataFrame = {
    val registry = graft.model.ChainRegistry(
      Map("ethereum" -> sfDir, "arbitrum" -> sfDir), default = sfDir)
    val monitored = 7L
    val frames = Seq("ethereum", "arbitrum").map { chain =>
      Compiler.compile(spark, registry, QuerySpec(
        name = "addr_monitor", chain = chain,
        contracts = Seq(ContractSpec(monitored, events = Seq(
          EventSpec("purchase", Seq("value")),
          EventSpec("error", Seq("value"))))),
        saves = Seq(
          "chain" -> col("chain"),
          "block" -> col("blocknumber"),
          "event" -> col("event_type"),
          "value" -> col("value"))))
    }
    frames.reduce(_ unionByName _).orderBy("chain", "block", "event")
  }

  private val crossChainMonitorSql =
    """SELECT c.chain, e.event_id AS block, e.event_type AS event, e.value
      |FROM events e, (VALUES ('ethereum'), ('arbitrum')) AS c(chain)
      |WHERE e.user_id = 7 AND e.event_type IN ('purchase', 'error')
      |ORDER BY chain, block, event""".stripMargin

  /** The config.yml + multi-chain surface under the DRIVER's gate: a
    * reference-shaped config (config.go:13-16 `rpc` map) parses through
    * [[graft.model.ConfigFile]], its registry routes each chain's queries
    * to that chain's store ([[graft.model.ChainRegistry]] ≙
    * chainservice.go:127-131 one service per chain), a loop-expanded
    * two-chain schema compiles against it, and the demuxed union must
    * hash-match a plain-SQL oracle — the whole config → registry →
    * compile → demux chain end-to-end. On the single-store testbed both
    * chains resolve to the same store; the routing itself is
    * spec-asserted against distinct stores in FixturesSpec. */
  def configRoutedScan(spark: SparkSession, sfDir: String): DataFrame = {
    val conf = graft.model.ConfigFile.parse(
      """rpc:
        |  ethereum: wss://test-eth.invalid/ws
        |  arbitrum: wss://test-arb.invalid/ws
        |""".stripMargin)
    assert(conf.rpc.size == 2)
    // testbed resolution: every declared chain's endpoint → this SF's store
    val registry = conf.registry((_, _) => sfDir, default = sfDir)
    val specs = Loop.expand(Seq("ethereum", "arbitrum")) { (chain, _) =>
      QuerySpec(
        name = "signups", chain = chain,
        globalEvents = Seq(EventSpec("signup", Seq("value"))),
        saves = Seq(
          "chain" -> col("chain"),
          "block" -> col("blocknumber"),
          "value" -> col("value")))
    }
    val compiled = specs.map(q => q.name -> Compiler.compile(spark, registry, q)).toMap
    Compiler.demux(compiled).orderBy("query_name", "block")
  }

  private val configRoutedScanSql =
    """SELECT q || '-signups' AS query_name, c AS chain, event_id AS block, value
      |FROM events, (VALUES ('0', 'ethereum'), ('1', 'arbitrum')) AS chains(q, c)
      |WHERE event_type = 'signup'
      |ORDER BY query_name, block""".stripMargin

  /** S2 — global event scan: signature-only predicate, no address filter. */
  def globalScan(spark: SparkSession, sfDir: String): DataFrame =
    Sources.globalEvents(spark, sfDir, "signup")
      .select(
        col("event_id").as("blocknumber"),
        unix_timestamp(col("ts")).as("timestamp"),
        col("user_id").as("address"),
        col("value"))
      .orderBy("blocknumber")

  private val globalScanSql =
    """SELECT event_id AS blocknumber, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
      |  user_id AS address, value
      |FROM events WHERE event_type = 'signup' ORDER BY blocknumber""".stripMargin

  /** S5+R6 — historical method time-series: daily sample grid over declared
    * [start,end] × 10 contracts, each sample as-of joined to the latest state
    * row (the reference's `eth_call` per (block, contract),
    * chainservice/methods.go:21-72). Null value ≙ reference's CallResult.Err
    * rows for blocks before the contract existed.
    */
  def methodTimeseries(spark: SparkSession, sfDir: String): DataFrame = {
    val grid = Sources.sampleGrid(spark, "2024-01-01", "2024-01-30", 86400L,
      spark.range(0, 10).toDF("user_id"))
    val state = Tables.events(spark, sfDir).where(col("user_id") < 10)
    Enrich.asOfJoin(
      grid, state,
      key = "user_id", leftTime = "sample_ts", rightTime = "ts",
      tieBreaker = "event_id", valueCols = Seq("value", "event_id"))
      .select(col("sample_ts"), col("user_id"),
        col("asof_value").as("last_value"), col("asof_event_id").as("last_block"))
      .orderBy("sample_ts", "user_id")
  }

  private val methodTimeseriesSql =
    """WITH grid AS (
      |  SELECT g.t, u.user_id
      |  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS t) g
      |  CROSS JOIN (SELECT unnest(range(0, 10)) AS user_id) u),
      |ev AS (SELECT user_id, ts AS t, event_id, value FROM events WHERE user_id < 10),
      |un AS (
      |  SELECT user_id, t, CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value, 1 AS side FROM grid
      |  UNION ALL
      |  SELECT user_id, t, event_id, value, 0 AS side FROM ev),
      |w AS (
      |  SELECT user_id, t, side,
      |    last_value(value IGNORE NULLS) OVER win AS last_value,
      |    last_value(event_id IGNORE NULLS) OVER win AS last_block
      |  FROM un
      |  WINDOW win AS (PARTITION BY user_id ORDER BY t, side, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT t AS sample_ts, user_id, last_value, last_block
      |FROM w WHERE side = 1 ORDER BY sample_ts, user_id""".stripMargin

  /** S7 — event-triggered enrichment: each `purchase` row carries the value
    * of the latest prior-or-same-block `click` of the same contract (the
    * reference's per-event method call at log.block + offset,
    * chainservice/events.go:93-105). Single window pass — no join, no pair
    * explosion; one shuffle by contract key.
    */
  def eventAsOfEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("last_click",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("blocknumber"), unix_timestamp(col("ts")).as("timestamp"),
        col("user_id"), col("value"), col("last_click"))
      .orderBy("blocknumber")
  }

  private val eventAsOfEnrichSql =
    """SELECT event_id AS blocknumber, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
      |  user_id, value, last_click
      |FROM (
      |  SELECT *, last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
      |  FROM events)
      |WHERE event_type = 'purchase' ORDER BY blocknumber""".stripMargin

  /** S7 through the declarative surface with `block_offset != 0`: each
    * `purchase` carries the latest `click` value as-of block
    * `purchase.block - 1` (the reference calls the method at
    * `log.BlockNumber + method.BlockOffset`, chainservice/events.go:93-105;
    * offset -1 ≙ "state at the block before the event"). Compiled via
    * [[graft.engine.Compiler]] from a QuerySpec — exercising
    * EventSpec.methods end-to-end, not a hand-built pipeline.
    */
  def methodOffset(spark: SparkSession, sfDir: String): DataFrame = {
    val spec = QuerySpec(
      name = "purchases_with_prior_click",
      chain = "ethereum",
      contracts = FibAddrs.map(a => ContractSpec(a, events = Seq(EventSpec(
        "purchase", Seq("value"),
        methods = Seq(MethodSpec("click", Seq("value"), blockOffset = -1L)))))),
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "contract" -> col("user_id"),
        "value" -> col("value"),
        "click_value" -> col("click_value")),
    )
    Compiler.compile(spark, sfDir, spec).orderBy("blocknumber")
  }

  /** Realtime S7 through the COMPILED surface: the same event-triggered
    * method declaration at blockOffset 0 with `mode = Realtime` routes
    * through [[graft.streaming.Streams.eventMethodsStream]] (per-contract
    * GroupState folding each method's latest state forward, subscription-mode
    * call-at-that-block semantics, events.go:285-296), runs bounded with
    * AvailableNow, and must hash-match the batch as-of oracle. */
  def realtimeEventMethods(spark: SparkSession, sfDir: String): DataFrame = {
    val spec = QuerySpec(
      name = "purchases_with_click_rt",
      chain = "ethereum",
      contracts = FibAddrs.map(a => ContractSpec(a, events = Seq(EventSpec(
        "purchase", Seq("value"),
        methods = Seq(MethodSpec("click", Seq("value"), blockOffset = 0L)))))),
      mode = Mode.Realtime,
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "contract" -> col("user_id"),
        "value" -> col("value"),
        "click_value" -> col("click_value")),
    )
    val stream = Compiler.compile(spark, sfDir, spec)
    assert(stream.isStreaming, "realtime event-method compile must produce a streaming plan")
    graft.streaming.Streams.runToTable(stream, "s7_rt_sink").orderBy("blocknumber")
  }

  /** Realtime S7 with a NEGATIVE block offset: the reference's subscription
    * mode calls at `log.BlockNumber + method.BlockOffset`
    * (events.go:287-288) — look-backs run live here via the bounded
    * per-key state ring in
    * [[graft.streaming.Streams.eventMethodsStream]]. Same declaration as
    * the batch `s7_method_offset` but `mode = Realtime`; must hash-match
    * that batch as-of oracle (a latest-state-only stream would return the
    * same-block click instead of the prior-block one and fail it). */
  def realtimeNegativeOffset(spark: SparkSession, sfDir: String): DataFrame = {
    val spec = QuerySpec(
      name = "purchases_with_prior_click_rt",
      chain = "ethereum",
      contracts = FibAddrs.map(a => ContractSpec(a, events = Seq(EventSpec(
        "purchase", Seq("value"),
        methods = Seq(MethodSpec("click", Seq("value"), blockOffset = -1L)))))),
      mode = Mode.Realtime,
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "contract" -> col("user_id"),
        "value" -> col("value"),
        "click_value" -> col("click_value")),
    )
    val stream = Compiler.compile(spark, sfDir, spec)
    assert(stream.isStreaming, "realtime event-method compile must produce a streaming plan")
    graft.streaming.Streams.runToTable(stream, "s7_rt_neg_sink").orderBy("blocknumber")
  }

  private val realtimeEventMethodsSql =
    s"""WITH probe AS (
       |  SELECT user_id, event_id, ts, value FROM events
       |  WHERE event_type = 'purchase' AND user_id IN (${FibAddrs.mkString(",")})),
       |st AS (
       |  SELECT user_id, event_id, value FROM events
       |  WHERE event_type = 'click' AND user_id IN (${FibAddrs.mkString(",")})),
       |un AS (
       |  SELECT user_id, event_id AS t, 1 AS side, CAST(NULL AS BIGINT) AS tie,
       |    event_id AS blocknumber, ts, value, CAST(NULL AS DOUBLE) AS sv
       |  FROM probe
       |  UNION ALL
       |  SELECT user_id, event_id AS t, 0 AS side, event_id AS tie,
       |    CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE), value
       |  FROM st),
       |w AS (
       |  SELECT *, last_value(sv IGNORE NULLS) OVER (
       |    PARTITION BY user_id ORDER BY t, side, tie
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_value
       |  FROM un)
       |SELECT blocknumber, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
       |  user_id AS contract, value, click_value
       |FROM w WHERE side = 1 ORDER BY blocknumber""".stripMargin

  /** Realtime S7 with a POSITIVE block offset: a look-AHEAD. The stream
    * buffers each probe until the key's seen-block high-water mark strictly
    * passes `block + offset` (the live "wait for block b + k, then call"),
    * then answers with the exact batch as-of. Probes whose target the data
    * never reaches are still waiting at shutdown, so the oracle is the
    * batch as-of RESTRICTED to probes with a later same-key event — the
    * resolution rule stated in SQL, like the LSH bucket cap. */
  def realtimePositiveOffset(spark: SparkSession, sfDir: String): DataFrame = {
    val spec = QuerySpec(
      name = "purchases_with_next_click_rt",
      chain = "ethereum",
      contracts = FibAddrs.map(a => ContractSpec(a, events = Seq(EventSpec(
        "purchase", Seq("value"),
        methods = Seq(MethodSpec("click", Seq("value"), blockOffset = 1L)))))),
      mode = Mode.Realtime,
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "contract" -> col("user_id"),
        "value" -> col("value"),
        "click_value" -> col("click_value")),
    )
    val stream = Compiler.compile(spark, sfDir, spec)
    assert(stream.isStreaming, "realtime event-method compile must produce a streaming plan")
    graft.streaming.Streams.runToTable(stream, "s7_rt_pos_sink").orderBy("blocknumber")
  }

  private val realtimePositiveOffsetSql =
    s"""WITH probe AS (
       |  SELECT user_id, event_id, ts, value FROM events
       |  WHERE event_type = 'purchase' AND user_id IN (${FibAddrs.mkString(",")})),
       |st AS (
       |  SELECT user_id, event_id, value FROM events
       |  WHERE event_type = 'click' AND user_id IN (${FibAddrs.mkString(",")})),
       |un AS (
       |  SELECT user_id, event_id + 1 AS t, 1 AS side, CAST(NULL AS BIGINT) AS tie,
       |    event_id AS blocknumber, ts, value, CAST(NULL AS DOUBLE) AS sv, event_id AS ev
       |  FROM probe
       |  UNION ALL
       |  SELECT user_id, event_id AS t, 0 AS side, event_id AS tie,
       |    CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE), value, event_id
       |  FROM st),
       |w AS (
       |  SELECT *, last_value(sv IGNORE NULLS) OVER (
       |    PARTITION BY user_id ORDER BY t, side, tie
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_value,
       |  max(ev) OVER (PARTITION BY user_id) AS key_max
       |  FROM un)
       |SELECT blocknumber, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
       |  user_id AS contract, value, click_value
       |FROM w WHERE side = 1 AND key_max > blocknumber + 1 ORDER BY blocknumber""".stripMargin

  private val methodOffsetSql =
    s"""WITH probe AS (
       |  SELECT user_id, event_id, ts, value FROM events
       |  WHERE event_type = 'purchase' AND user_id IN (${FibAddrs.mkString(",")})),
       |st AS (
       |  SELECT user_id, event_id, value FROM events
       |  WHERE event_type = 'click' AND user_id IN (${FibAddrs.mkString(",")})),
       |un AS (
       |  SELECT user_id, event_id - 1 AS t, 1 AS side, CAST(NULL AS BIGINT) AS tie,
       |    event_id AS blocknumber, ts, value, CAST(NULL AS DOUBLE) AS sv
       |  FROM probe
       |  UNION ALL
       |  SELECT user_id, event_id AS t, 0 AS side, event_id AS tie,
       |    CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE), value
       |  FROM st),
       |w AS (
       |  SELECT *, last_value(sv IGNORE NULLS) OVER (
       |    PARTITION BY user_id ORDER BY t, side, tie
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_value
       |  FROM un)
       |SELECT blocknumber, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
       |  user_id AS contract, value, click_value
       |FROM w WHERE side = 1 ORDER BY blocknumber""".stripMargin

  /** S5 through the declarative surface: contract-level method blocks +
    * block_interval compile to the sampling-grid + as-of plan (reference
    * RunMethodCaller on the generated block cadence, methods.go:21-72 +
    * chainservice.go:180-188).
    */
  private val dailyPurchaseSpec = QuerySpec(
    name = "daily_purchase_state",
    chain = "ethereum",
    contracts = (0L until 10L).map(a =>
      ContractSpec(a, methods = Seq(MethodSpec("purchase", Seq("value", "event_id"))))),
    startTime = Some("2024-01-01"),
    endTime = Some("2024-01-30"),
    blockInterval = Some(86400L),
    saves = Seq(
      "sample_ts" -> col("sample_ts"),
      "timestamp" -> col("timestamp"),
      "contract" -> col("user_id"),
      "last_value" -> col("purchase_value"),
      "last_block" -> col("purchase_event_id")),
  )

  def methodGridCompiled(spark: SparkSession, sfDir: String): DataFrame =
    Compiler.compile(spark, sfDir, dailyPurchaseSpec).orderBy("sample_ts", "contract")

  /** S6 — realtime method poller, compiled: the SAME method QuerySpec with
    * `mode = Realtime` routes through the streaming poller
    * ([[graft.streaming.Streams.methodGridRealtime]]: streaming bucketed
    * last-state aggregation run to completion, then grid as-of alignment) and
    * must hash-match the batch S5 grid oracle — closing the last §2.1 source
    * without an oracle row. Reference ticker loop:
    * chainservice/chainservice.go:173-179. */
  def methodPollerRealtime(spark: SparkSession, sfDir: String): DataFrame =
    Compiler.compile(spark, sfDir,
      dailyPurchaseSpec.copy(name = "daily_purchase_state_rt", mode = Mode.Realtime))
      .orderBy("sample_ts", "contract")

  private val methodGridCompiledSql =
    """WITH grid AS (
      |  SELECT g.t, u.user_id
      |  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS t) g
      |  CROSS JOIN (SELECT unnest(range(0, 10)) AS user_id) u),
      |ev AS (SELECT user_id, ts AS t, event_id, value FROM events
      |       WHERE user_id < 10 AND event_type = 'purchase'),
      |un AS (
      |  SELECT user_id, t, CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value, 1 AS side FROM grid
      |  UNION ALL
      |  SELECT user_id, t, event_id, value, 0 AS side FROM ev),
      |w AS (
      |  SELECT user_id, t, side,
      |    last_value(value IGNORE NULLS) OVER win AS last_value,
      |    last_value(event_id IGNORE NULLS) OVER win AS last_block
      |  FROM un
      |  WINDOW win AS (PARTITION BY user_id ORDER BY t, side, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT t AS sample_ts, CAST(floor(epoch(t)) AS BIGINT) AS "timestamp",
      |  user_id AS contract, last_value, last_block
      |FROM w WHERE side = 1 ORDER BY sample_ts, contract""".stripMargin

  /** S8 — block-metadata lookup: per-day "header" dimension broadcast-joined
    * to the fact scan (the reference's LRU-cached HeaderByNumber,
    * cached_client.go:93-111, as a broadcast hash join — dim ships once, the
    * 100 TB fact never shuffles).
    */
  def blockMetadataJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val headers = ev.groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(min("event_id").as("day_first_block"), count(lit(1)).as("day_events"))
    val fact = ev.where(col("event_type") === "purchase")
      .withColumn("day", date_trunc("DAY", col("ts")))
    Enrich.withDim(fact, headers, Seq("day" -> "day"))
      .select(fact("event_id").as("blocknumber"), fact("user_id"), fact("day"),
        col("day_first_block"), col("day_events"))
      .orderBy("blocknumber")
  }

  private val blockMetadataJoinSql =
    """WITH headers AS (
      |  SELECT date_trunc('day', ts) AS day, min(event_id) AS day_first_block,
      |         count(*) AS day_events
      |  FROM events GROUP BY 1)
      |SELECT e.event_id AS blocknumber, e.user_id, CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day,
      |       h.day_first_block, h.day_events
      |FROM events e LEFT JOIN headers h ON date_trunc('day', e.ts) = h.day
      |WHERE e.event_type = 'purchase' ORDER BY blocknumber""".stripMargin

  /** S9 — BlockDater: timestamp → first block at-or-after, one aggregate
    * pass for all targets (reference binary-searches per target over RPC,
    * block_dater.go:48-79).
    */
  def blockDater(spark: SparkSession, sfDir: String): DataFrame =
    Sources.blockDater(
      Tables.events(spark, sfDir),
      Seq("2024-01-05 12:00:00", "2024-01-15 00:00:00", "2024-01-25 18:30:00"))
      .orderBy("target_ts")

  private val blockDaterSql =
    """SELECT t.target_ts, min(e.event_id) AS first_block
      |FROM (SELECT TIMESTAMP '2024-01-05 12:00:00' AS target_ts
      |      UNION ALL SELECT TIMESTAMP '2024-01-15 00:00:00'
      |      UNION ALL SELECT TIMESTAMP '2024-01-25 18:30:00') t
      |JOIN events e ON e.ts >= t.target_ts
      |GROUP BY t.target_ts ORDER BY target_ts""".stripMargin

  /** R7 — loop expansion: `loop { items = [ethereum, arbitrum] }` stamps the
    * template per item with unique "{i}-{name}" keys (dsl/schema.go:427-442,
    * chainservice.go:127-131).
    */
  def loopExpansion(spark: SparkSession, sfDir: String): DataFrame = {
    val specs = Loop.expand(Seq("ethereum", "arbitrum")) { (chain, _) =>
      QuerySpec(
        name = "views", chain = chain,
        globalEvents = Seq(EventSpec("view", Seq("value"))),
        saves = Seq(
          "chain" -> col("chain"),
          "blocknumber" -> col("blocknumber"),
          "timestamp" -> col("timestamp"),
          "user_id" -> col("user_id"),
          "value" -> col("value")))
    }
    Compiler.demux(specs.map(q => q.name -> Compiler.compile(spark, sfDir, q)).toMap)
      .orderBy("query_name", "blocknumber")
  }

  private val loopExpansionSql =
    """SELECT * FROM (
      |  SELECT '0-views' AS query_name, 'ethereum' AS chain, event_id AS blocknumber,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp", user_id, value
      |  FROM events WHERE event_type = 'view'
      |  UNION ALL
      |  SELECT '1-views', 'arbitrum', event_id, CAST(floor(epoch(ts)) AS BIGINT), user_id, value
      |  FROM events WHERE event_type = 'view')
      |ORDER BY query_name, blocknumber""".stripMargin

  /** R3 contract-SCOPED transforms (dsl/schema.go:352-357,
    * schema.example.hcl:23-33): each contract derives the same column names
    * with its own expressions (per-token decimal scaling in the reference's
    * flagship), and the query-level save sees them — null on contracts that
    * don't define them.
    */
  def contractTransforms(spark: SparkSession, sfDir: String): DataFrame = {
    val spec = QuerySpec(
      name = "scoped_transforms",
      chain = "ethereum",
      contracts = Seq(
        ContractSpec(1L, events = Seq(EventSpec("purchase", Seq("value"))),
          transforms = Seq(
            "amount" -> (col("value") / 100.0),
            "token" -> lit("usdc"))),
        ContractSpec(2L, events = Seq(EventSpec("purchase", Seq("value"))),
          transforms = Seq(
            "amount" -> (col("value") / 1000.0),
            "token" -> lit("weth")))),
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "contract" -> col("user_id"),
        "token" -> col("token"),
        "amount" -> col("amount")),
    )
    Compiler.compile(spark, sfDir, spec).orderBy("blocknumber")
  }

  private val contractTransformsSql =
    """SELECT event_id AS blocknumber, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
      |  user_id AS contract,
      |  CASE WHEN user_id = 1 THEN 'usdc' WHEN user_id = 2 THEN 'weth' END AS token,
      |  CASE WHEN user_id = 1 THEN value / 100.0 WHEN user_id = 2 THEN value / 1000.0 END AS amount
      |FROM events
      |WHERE event_type = 'purchase' AND user_id IN (1, 2)
      |ORDER BY blocknumber""".stripMargin

  /** R7 with OBJECT loop items + a typed object variable, end-to-end through
    * the JSON surface: each item binds `${item.chain}`/`${item.sig}` and the
    * filter reads `${net.min_value}` (reference object items with attribute
    * access, dsl/schema.go:427-442 + schema-ideas.hcl:111-122). Parse →
    * compile → demux, oracle-checked.
    */
  def loopObjects(spark: SparkSession, sfDir: String): DataFrame = {
    val doc =
      """{
        |  "variables": {"net": {"min_value": 10}},
        |  "loop": [
        |    {"chain": "ethereum", "sig": "purchase"},
        |    {"chain": "arbitrum", "sig": "click"}
        |  ],
        |  "queries": [{
        |    "name": "evts",
        |    "chain": "${item.chain}",
        |    "events": [{"signature": "${item.sig}", "outputs": ["value"]}],
        |    "filters": ["value >= ${net.min_value}"],
        |    "saves": {"chain": "chain", "blocknumber": "blocknumber",
        |              "timestamp": "timestamp", "user_id": "user_id", "value": "value"}
        |  }]
        |}""".stripMargin
    val schema = JsonSchema.parse(doc)
    Compiler.demux(Compiler.compileAll(spark, sfDir, schema))
      .orderBy("query_name", "blocknumber")
  }

  private val loopObjectsSql =
    """SELECT * FROM (
      |  SELECT '0-evts' AS query_name, 'ethereum' AS chain, event_id AS blocknumber,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp", user_id, value
      |  FROM events WHERE event_type = 'purchase' AND value >= 10
      |  UNION ALL
      |  SELECT '1-evts', 'arbitrum', event_id, CAST(floor(epoch(ts)) AS BIGINT), user_id, value
      |  FROM events WHERE event_type = 'click' AND value >= 10)
      |ORDER BY query_name, blocknumber""".stripMargin

  /** R8 — per-query demux: two queries with different save schemas fan into
    * one frame tagged query_name (columns union, nulls where absent), ready
    * for `partitionBy("query_name")` writes — the reference's per-query
    * channels (chainservice.go:85-152) as data.
    */
  def queryDemux(spark: SparkSession, sfDir: String): DataFrame = {
    val clicks = QuerySpec(
      name = "clicks", chain = "ethereum",
      globalEvents = Seq(EventSpec("click", Seq("value"))),
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "user_id" -> col("user_id"),
        "click_value" -> col("value")))
    val errors = QuerySpec(
      name = "errors", chain = "ethereum",
      globalEvents = Seq(EventSpec("error", Seq("props"))),
      transforms = Seq("err_k" -> get_json_object(col("props"), "$.k").cast("long")),
      saves = Seq(
        "blocknumber" -> col("blocknumber"),
        "timestamp" -> col("timestamp"),
        "user_id" -> col("user_id"),
        "err_k" -> col("err_k")))
    Compiler.demux(Map(
      "clicks" -> Compiler.compile(spark, sfDir, clicks),
      "errors" -> Compiler.compile(spark, sfDir, errors)))
      .orderBy("query_name", "blocknumber")
  }

  private val queryDemuxSql =
    """SELECT * FROM (
      |  SELECT event_id AS blocknumber, CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
      |    user_id, value AS click_value, CAST(NULL AS BIGINT) AS err_k,
      |    'clicks' AS query_name
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT), user_id,
      |    CAST(NULL AS DOUBLE), CAST(json_extract_string(props, '$.k') AS BIGINT),
      |    'errors'
      |  FROM events WHERE event_type = 'error')
      |ORDER BY query_name, blocknumber""".stripMargin

  /** R1/R2 — ABI word decode under the oracle gate: 64-hex words are
    * synthesized from the testbed's integer columns identically in both
    * engines, decoded with the codegen'd evm_* kernels, and compared to
    * DuckDB arithmetic. Covers: uint/int/address/bool decode, the short-data
    * left-pad path (HandleLog pads sub-32-byte data,
    * /root/reference/chainservice/events.go:451-456), word extraction from a
    * concatenated data blob, and an encode→decode round-trip through a value
    * ≥ 2^63 (1e18-scaled) exercising the arbitrary-precision
    * [[graft.functions.EvmKernels.encodeUint]] packing.
    */
  def abiDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Evm
    // The test parquet arrives as ONE split and the decode is
    // BigInteger-bound, so spread rows across cores before the kernels (a
    // real multi-split source parallelizes with the scan and doesn't need
    // this — same note as DedupOps.docShingles).
    // guarded spread (r17, graft.util.Spread): skipped on multi-split
    // stores, byte-aware count otherwise; projected to the two columns the
    // decode reads before the exchange
    val ev = graft.util.Spread.byCols(
      Tables.events(spark, sfDir).select(col("event_id"), col("user_id")),
      col("event_id"))
    val wUint = lpad(lower(hex(col("event_id"))), 64, "0")
    val wAddr = lpad(lower(hex(col("user_id"))), 64, "0")
    val wShort = lower(hex(col("event_id") % 256)) // unpadded → left-pad path
    val wBool = lpad(lower(hex(col("event_id") % 2)), 64, "0")
    val blob = concat(wUint, wAddr) // two-word data payload
    val big = col("event_id").cast("decimal(18,0)") *
      lit("1000000000000000000").cast("decimal(19,0)") // ≥ 2^63 for event_id ≥ 10
    // event_id's 16-hex repeated over all four 64-bit lanes: a 256-bit value
    // ≥ 2^192 (≥ 58 decimal digits) — Evm.uint nulls it, the hex companion
    // must carry it losslessly (reference cty string path, dsl/schema.go:488-512).
    val rep = lpad(lower(hex(col("event_id"))), 16, "0")
    val wBig = concat(rep, rep, rep, rep)
    ev.select(
      col("event_id"),
      Evm.uint(wUint).cast("long").as("dec_uint"),
      Evm.int(wUint).cast("long").as("dec_int"),
      Evm.address(wAddr).as("dec_address"),
      Evm.bool(wBool).as("dec_bool"),
      Evm.uint(wShort).cast("long").as("dec_short"),
      Evm.address(Evm.word(blob, 1)).as("dec_word1"),
      Evm.uint(Evm.encodeUint(big)).cast("string").as("big_roundtrip"),
      Evm.uint(wBig).cast("string").as("big_dec_nulled"),
      Evm.uintHex(wBig).as("big_hex"))
      .orderBy("event_id")
  }

  private val abiDecodeSql =
    """SELECT event_id,
      |  event_id AS dec_uint,
      |  event_id AS dec_int,
      |  '0x' || lpad(printf('%x', user_id), 40, '0') AS dec_address,
      |  (event_id % 2) <> 0 AS dec_bool,
      |  event_id % 256 AS dec_short,
      |  '0x' || lpad(printf('%x', user_id), 40, '0') AS dec_word1,
      |  CAST(CAST(event_id AS HUGEINT) * 1000000000000000000 AS VARCHAR) AS big_roundtrip,
      |  CASE WHEN event_id = 0 THEN '0' END AS big_dec_nulled,
      |  '0x' || CASE WHEN ltrim(repeat(lpad(printf('%x', event_id), 16, '0'), 4), '0') = ''
      |               THEN '0'
      |               ELSE ltrim(repeat(lpad(printf('%x', event_id), 16, '0'), 4), '0') END AS big_hex
      |FROM events ORDER BY event_id""".stripMargin

  /** §2.3 — the DSL scalar-function surface in one projection: upper/lower/
    * abs/parse_decimals/format_date/date rendering/ternary, all as codegen'd
    * column expressions (the reference interprets these per row on the
    * driver via cty, dsl/functions.go:15-21).
    */
  def scalarSuite(spark: SparkSession, sfDir: String): DataFrame =
    // guarded spread (r17, guide §2.5): the scan arrives as 3 splits and
    // the date-format/unix-timestamp projection is evaluated over EVERY
    // row twice (the orderBy's range-partition sampling pass + the write
    // pass) — measured 2×~0.9 s of 3-way stages for a 60k-row output.
    // Spread first, the projection parallelizes in both passes; skipped
    // on multi-split stores like every Spread site.
    graft.util.Spread.byCols(
      Tables.lineitem(spark, sfDir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"), col("l_shipdate"),
        col("l_extendedprice")),
      col("l_orderkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        upper(col("l_returnflag")).as("flag_upper"),
        lower(col("l_linestatus")).as("status_lower"),
        abs(col("l_quantity") - 30.0).as("qty_abs"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_str"),
        unix_timestamp(col("l_shipdate")).as("ship_unix"),
        Functions.parseDecimals(col("l_extendedprice"), 3).as("price_kilo"),
        Functions.ternary(col("l_quantity") > 25, lit("big"), lit("small")).as("size_class"),
        Functions.formatDate("2006-01-02", lit("2024-01-15")).as("fd_const"))
      .orderBy("l_orderkey", "l_linenumber")

  private val scalarSuiteSql =
    """SELECT l_orderkey, l_linenumber,
      |  upper(l_returnflag) AS flag_upper, lower(l_linestatus) AS status_lower,
      |  abs(l_quantity - 30.0) AS qty_abs,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_str,
      |  CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ship_unix,
      |  l_extendedprice / 1000.0 AS price_kilo,
      |  CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS size_class,
      |  CAST(floor(epoch(TIMESTAMP '2024-01-15')) AS BIGINT) AS fd_const
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** `balance(addr)` (dsl/functions.go:71-85): I/O-per-row in the reference,
    * broadcast dim join + parse_decimals here. */
  /** `balance(addr)` at the ROW'S block — the reference's balance closes
    * over the row's block (dsl/schema.go:186-188) and the chain service
    * calls `BalanceAt(block)` (chainservice.go:244-259), NOT a snapshot.
    * Balance updates (signup events) fold forward per address via the
    * scalable as-of join, so a purchase between two updates sees the
    * earlier one; the customer dim is the genesis balance before an
    * address's first update. A static snapshot join returns one balance
    * per address and FAILS this oracle (balances change mid-range —
    * [[graft.QueriesSpec]] asserts the divergence). */
  def balanceLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.events(spark, sfDir).where(col("event_type") === "purchase")
    val updates = Tables.events(spark, sfDir).where(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"), col("value").as("bal_update"))
    val asOf = Enrich.asOfJoin(fact, updates,
      key = "user_id", leftTime = "event_id", rightTime = "event_id",
      tieBreaker = "event_id", valueCols = Seq("bal_update"))
    Enrich.withDim(asOf, Tables.customer(spark, sfDir), Seq("user_id" -> "c_custkey"))
      .withColumn("balance",
        coalesce(col("asof_bal_update"), col("c_acctbal").cast("double")) / 100.0)
      .select(col("event_id").as("blocknumber"), col("user_id"), col("value"), col("balance"))
      .orderBy("blocknumber")
  }

  private val balanceLookupSql =
    """WITH probe AS (
      |  SELECT user_id, event_id, value FROM events WHERE event_type = 'purchase'),
      |st AS (
      |  SELECT user_id, event_id, value AS bal_update FROM events WHERE event_type = 'signup'),
      |un AS (
      |  SELECT user_id, event_id AS t, 1 AS side, CAST(NULL AS BIGINT) AS tie,
      |    event_id AS blocknumber, value, CAST(NULL AS DOUBLE) AS sv
      |  FROM probe
      |  UNION ALL
      |  SELECT user_id, event_id AS t, 0 AS side, event_id AS tie,
      |    CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), bal_update
      |  FROM st),
      |w AS (
      |  SELECT *, last_value(sv IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY t, side, tie
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
      |  FROM un)
      |SELECT w.blocknumber, w.user_id, w.value,
      |  COALESCE(w.bal, CAST(c.c_acctbal AS DOUBLE)) / 100.0 AS balance
      |FROM w LEFT JOIN customer c ON w.user_id = c.c_custkey
      |WHERE w.side = 1 ORDER BY blocknumber""".stripMargin

  /** `token_balance(addr, token)` at the ROW'S block (dsl/functions.go:
    * 87-103 — like `balance` it runs `BalanceAt` per row,
    * chainservice.go:252-259): raw balance updates (view events keyed by
    * token) fold forward per token, scaled by the token's on-chain
    * `decimals()` from the dim (the cached immutable call,
    * cached_client.go:59-70); the dim's s_acctbal is the genesis balance.
    *
    * Only 10 distinct tokens exist — at 100 TB every purchase lands on 10
    * as-of reducer keys, so this query runs the SLICED as-of
    * ([[Enrich.asOfJoinSliced]]) with equi-depth probe-quantile
    * boundaries: the shuffle key is (token, slice), hash-identical to the
    * plain form (skew_asof_sliced proves the equivalence under 90% skew).
    */
  def tokenBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.events(spark, sfDir).where(col("event_type") === "purchase")
      .withColumn("token", col("event_id") % 10 + 1)
    val updates = Tables.events(spark, sfDir).where(col("event_type") === "view")
      .select((col("user_id") % 10 + 1).as("token"), col("event_id"),
        col("value").as("tb_update"))
    // slice boundaries: even cuts of the probe id range — one cheap min/max
    // aggregate (event_ids are dense, so range cuts ≈ equi-depth; and
    // correctness never depends on where the cuts land, only balance does)
    val mm = fact.agg(min("event_id"), max("event_id")).head()
    val bounds =
      if (mm.isNullAt(0)) Seq.empty[Any]
      else {
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        (1 to 3).map(i => (lo + (hi - lo) * i / 4): Any).distinct.filter(_ != hi)
      }
    val asOf =
      if (bounds.nonEmpty)
        Enrich.asOfJoinSliced(fact, updates,
          key = "token", leftTime = "event_id", rightTime = "event_id",
          tieBreaker = "event_id", valueCols = Seq("tb_update"),
          boundaries = bounds)
      else
        Enrich.asOfJoin(fact, updates,
          key = "token", leftTime = "event_id", rightTime = "event_id",
          tieBreaker = "event_id", valueCols = Seq("tb_update"))
    Enrich.withDim(asOf, Tables.supplier(spark, sfDir), Seq("token" -> "s_suppkey"))
      .withColumn("token_balance",
        coalesce(col("asof_tb_update"), col("s_acctbal").cast("double")) /
          pow(lit(10.0), col("s_nationkey") % 4))
      .select(col("event_id").as("blocknumber"), col("token"), col("value"), col("token_balance"))
      .orderBy("blocknumber")
  }

  private val tokenBalanceSql =
    """WITH probe AS (
      |  SELECT event_id, event_id % 10 + 1 AS token, value FROM events
      |  WHERE event_type = 'purchase'),
      |st AS (
      |  SELECT user_id % 10 + 1 AS token, event_id, value AS tb_update FROM events
      |  WHERE event_type = 'view'),
      |un AS (
      |  SELECT token, event_id AS t, 1 AS side, CAST(NULL AS BIGINT) AS tie,
      |    event_id AS blocknumber, value, CAST(NULL AS DOUBLE) AS sv
      |  FROM probe
      |  UNION ALL
      |  SELECT token, event_id AS t, 0 AS side, event_id AS tie,
      |    CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), tb_update
      |  FROM st),
      |w AS (
      |  SELECT *, last_value(sv IGNORE NULLS) OVER (
      |    PARTITION BY token ORDER BY t, side, tie
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tb
      |  FROM un)
      |SELECT w.blocknumber, w.token, w.value,
      |  COALESCE(w.tb, CAST(s.s_acctbal AS DOUBLE)) / pow(10.0, s.s_nationkey % 4) AS token_balance
      |FROM w LEFT JOIN supplier s ON w.token = s.s_suppkey
      |WHERE w.side = 1 ORDER BY blocknumber""".stripMargin

  /** `is_contract(addr)` (ROADMAP v1.1): registry membership as a broadcast
    * left join + null-test; testbed registry = supplier keys. */
  def isContract(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.events(spark, sfDir).where(col("event_type") === "view")
    Enrich.isContract(fact, Tables.supplier(spark, sfDir),
      factAddr = "user_id", regAddr = "s_suppkey", as = "is_contract")
      .select(col("event_id").as("blocknumber"), col("user_id"), col("is_contract"))
      .orderBy("blocknumber")
  }

  private val isContractSql =
    """SELECT e.event_id AS blocknumber, e.user_id,
      |  (s.s_suppkey IS NOT NULL) AS is_contract
      |FROM events e LEFT JOIN supplier s ON e.user_id = s.s_suppkey
      |WHERE e.event_type = 'view' ORDER BY blocknumber""".stripMargin

  /** `get_price(from, to)` (designed-but-disabled in the reference,
    * dsl/functions.go:105-126): pair price = price(from)/price(to) over a
    * per-token price dim (part retail prices), two broadcast joins. */
  def getPrice(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.events(spark, sfDir).where(col("event_type") === "purchase")
      .withColumn("from_token", col("event_id") % 200 + 1)
      .withColumn("to_token", col("event_id") % 100 + 1)
    Enrich.pairPrice(fact, Tables.part(spark, sfDir),
      fromCol = "from_token", toCol = "to_token",
      keyCol = "p_partkey", priceCol = "p_retailprice", as = "price")
      .select(col("event_id").as("blocknumber"), col("from_token"), col("to_token"),
        col("value"), col("price"))
      .orderBy("blocknumber")
  }

  private val getPriceSql =
    """SELECT e.event_id AS blocknumber,
      |  e.event_id % 200 + 1 AS from_token, e.event_id % 100 + 1 AS to_token,
      |  e.value, pf.p_retailprice / pt.p_retailprice AS price
      |FROM events e
      |LEFT JOIN part pf ON e.event_id % 200 + 1 = pf.p_partkey
      |LEFT JOIN part pt ON e.event_id % 100 + 1 = pt.p_partkey
      |WHERE e.event_type = 'purchase' ORDER BY blocknumber""".stripMargin

  /** HCL `for` expressions + `[*]` splat (hclsyntax full dialect,
    * dsl/schema.go:388) driving loop fan-out end-to-end: an object-list
    * variable is splatted into a uid list, a for-expression filters it,
    * and the loop stamps one query per surviving item — all evaluated at
    * plan-construction time, exactly where the reference's cty evaluation
    * runs. The previous behavior (loud rejection with line/col) is kept
    * for every OTHER context (FixturesSpec pins both). */
  def hclForSplat(spark: SparkSession, sfDir: String): DataFrame = {
    val hcl =
      """variables = {
        |  contracts = [
        |    { uid = 2, tag = "alpha" },
        |    { uid = 3, tag = "beta" },
        |    { uid = 4, tag = "gamma" },
        |    { uid = 9, tag = "omega" },
        |  ]
        |  uids = contracts[*].uid
        |  small_uids = [for u in uids : u if u <= 4]
        |}
        |loop {
        |  items = small_uids
        |  query uid_swaps {
        |    chain = "ethereum"
        |    contract {
        |      address = "${item}"
        |      event purchase { outputs = ["value"] }
        |    }
        |    save {
        |      uid = item
        |      block = blocknumber
        |      amount = value
        |    }
        |  }
        |}""".stripMargin
    val schema = HclSchema.parse(hcl)
    Compiler.demux(schema.queries.map(q => q.name -> Compiler.compile(spark, sfDir, q)).toMap)
      .orderBy("query_name", "block")
  }

  private val hclForSplatSql =
    """SELECT * FROM (
      |  SELECT '0-uid_swaps' AS query_name, 2 AS uid, event_id AS block, value AS amount
      |  FROM events WHERE event_type = 'purchase' AND user_id = 2
      |  UNION ALL
      |  SELECT '1-uid_swaps', 3, event_id, value
      |  FROM events WHERE event_type = 'purchase' AND user_id = 3
      |  UNION ALL
      |  SELECT '2-uid_swaps', 4, event_id, value
      |  FROM events WHERE event_type = 'purchase' AND user_id = 4)
      |ORDER BY query_name, block""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "apollo_flagship_swaps" -> (flagship _),
    "hcl_scoped_swaps" -> (hclScopedSwaps _),
    "hcl_custom_fn" -> (hclCustomFn _),
    "hcl_for_splat" -> (hclForSplat _),
    "dsl_aggregate" -> (dslAggregate _),
    "dsl_stream_aggregate" -> (dslStreamAggregate _),
    "tx_monitor" -> (txMonitor _),
    "mempool_monitor" -> (mempoolMonitor _),
    "unverified_events" -> (unverifiedEvents _),
    "template_uniswapv2" -> (templateUniswapV2 _),
    "template_uniswapv3" -> (templateUniswapV3 _),
    "template_aave" -> (templateAave _),
    "template_compound" -> (templateCompound _),
    "template_makerdao" -> (templateMakerdao _),
    "tx_context_events" -> (txContextEvents _),
    "raw_stream_passthrough" -> (rawStreamPassthrough _),
    "cross_chain_monitor" -> (crossChainMonitor _),
    "config_routed_scan" -> (configRoutedScan _),
    "s3_compiled_stream_parity" -> (compiledStreamParity _),
    "s6_method_poller" -> (methodPollerRealtime _),
    "s2_global_event_scan" -> (globalScan _),
    "s5_method_timeseries" -> (methodTimeseries _),
    "s5_method_grid_compiled" -> (methodGridCompiled _),
    "s7_event_asof_enrich" -> (eventAsOfEnrich _),
    "s7_method_offset" -> (methodOffset _),
    "s7_realtime_event_methods" -> (realtimeEventMethods _),
    "s7_realtime_negative_offset" -> (realtimeNegativeOffset _),
    "s7_realtime_positive_offset" -> (realtimePositiveOffset _),
    "s8_block_metadata_join" -> (blockMetadataJoin _),
    "s9_block_dater" -> (blockDater _),
    "r1_abi_decode" -> (abiDecode _),
    "r3_contract_transforms" -> (contractTransforms _),
    "r7_loop_expansion" -> (loopExpansion _),
    "r7_loop_objects" -> (loopObjects _),
    "r8_query_demux" -> (queryDemux _),
    "fn_scalar_suite" -> (scalarSuite _),
    "fn_balance_lookup" -> (balanceLookup _),
    "fn_token_balance" -> (tokenBalance _),
    "fn_is_contract" -> (isContract _),
    "fn_get_price" -> (getPrice _),
  )

  val oracles: Map[String, String] = Map(
    "apollo_flagship_swaps" -> flagshipSql,
    "hcl_scoped_swaps" -> hclScopedSwapsSql,
    "hcl_custom_fn" -> hclCustomFnSql,
    "hcl_for_splat" -> hclForSplatSql,
    "dsl_aggregate" -> dslAggregateSql,
    "dsl_stream_aggregate" -> dslAggregateSql,
    "tx_monitor" -> txMonitorSql,
    "mempool_monitor" -> txMonitorSql,
    "unverified_events" -> unverifiedEventsSql,
    "template_uniswapv2" -> templateUniswapV2Sql,
    "template_uniswapv3" -> templateUniswapV3Sql,
    "template_aave" -> templateAaveSql,
    "template_compound" -> templateCompoundSql,
    "template_makerdao" -> templateMakerdaoSql,
    "tx_context_events" -> txContextEventsSql,
    "raw_stream_passthrough" -> rawStreamPassthroughSql,
    "cross_chain_monitor" -> crossChainMonitorSql,
    "config_routed_scan" -> configRoutedScanSql,
    "s3_compiled_stream_parity" -> flagshipSql,
    "s6_method_poller" -> methodGridCompiledSql,
    "s2_global_event_scan" -> globalScanSql,
    "s5_method_timeseries" -> methodTimeseriesSql,
    "s5_method_grid_compiled" -> methodGridCompiledSql,
    "s7_event_asof_enrich" -> eventAsOfEnrichSql,
    "s7_method_offset" -> methodOffsetSql,
    "s7_realtime_event_methods" -> realtimeEventMethodsSql,
    "s7_realtime_negative_offset" -> methodOffsetSql,
    "s7_realtime_positive_offset" -> realtimePositiveOffsetSql,
    "s8_block_metadata_join" -> blockMetadataJoinSql,
    "s9_block_dater" -> blockDaterSql,
    "r1_abi_decode" -> abiDecodeSql,
    "r3_contract_transforms" -> contractTransformsSql,
    "r7_loop_expansion" -> loopExpansionSql,
    "r7_loop_objects" -> loopObjectsSql,
    "r8_query_demux" -> queryDemuxSql,
    "fn_scalar_suite" -> scalarSuiteSql,
    "fn_balance_lookup" -> balanceLookupSql,
    "fn_token_balance" -> tokenBalanceSql,
    "fn_is_contract" -> isContractSql,
    "fn_get_price" -> getPriceSql,
  )
}
