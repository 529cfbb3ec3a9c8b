package graft.model

import graft.engine.Functions
import org.apache.spark.sql.functions._

/** Packaged query templates — the reference's ROADMAP v1.1 "Custom
  * templates: uniswapv2 / uniswapv3 / compound / aave / makerdao"
  * (/root/reference/ROADMAP.md:82-87): instead of hand-writing the swap
  * schema (/root/reference/schema.example.hcl), declare the pair contracts
  * and get the standard QuerySpec. All five are built out: v2/v3 (event
  * queries; v3 adds the sqrtPriceX96 fixed-point price math), aave (method
  * grid + same-sample ratio), compound (grid + exchange-rate accrual
  * window), makerdao (grid + CDP liquidation predicate).
  */
object Templates {

  /** One Uniswap-v2-style pair: contract address + the two tokens'
    * decimals (USDC=6, WETH=18 on a live chain; small values on the
    * testbed fixture). */
  final case class UniV2Pair(address: Long, decimals0: Int, decimals1: Int)

  /** The standard v2 swaps query over the declared pairs: per-pair decimal
    * scaling as CONTRACT-scoped transforms (exactly where
    * schema.example.hcl:23-33 puts them), zero-guarded swap price and
    * direction via the ternary (schema.example.hcl:48-51), standard save
    * projection. Testbed column mapping: `value` carries the token0 flow
    * and props `$.k` the token1 flow (a live source decodes
    * amount0In/amount1Out/... from the Swap event ABI). */
  def uniswapv2(
      pairs: Seq[UniV2Pair],
      name: String = "uniswapv2_swaps",
      chain: String = "ethereum",
      startTime: Option[String] = None,
      endTime: Option[String] = None,
  ): QuerySpec = {
    require(pairs.nonEmpty, "uniswapv2 template: declare at least one pair")
    val k = get_json_object(col("props"), "$.k")
    QuerySpec(
      name = name,
      chain = chain,
      contracts = pairs.map(p => ContractSpec(p.address,
        events = Seq(EventSpec("purchase", Seq("value", "props"))),
        transforms = Seq(
          "amount0" -> Functions.parseDecimals(col("value"), p.decimals0),
          "amount1" -> Functions.parseDecimals(k, p.decimals1)))),
      startTime = startTime,
      endTime = endTime,
      transforms = Seq("buy" -> (k.cast("long") % 2 === 0)),
      filters = Seq(k.isNotNull),
      saves = Seq(
        "timestamp" -> col("timestamp"),
        "block" -> col("blocknumber"),
        "contract" -> col("contract_address"),
        "swap_price" -> Functions.ternary(col("amount0") =!= 0,
          col("amount1") / col("amount0"), lit(null).cast("double")),
        "direction" -> Functions.ternary(col("buy"), lit("buy"), lit("sell")),
        "size_token1" -> col("amount1"),
      ),
    )
  }

  /** Aave-style lending-health template (the schema-ideas.hcl sketch,
    * /root/reference/schema-ideas.hcl:30-41: `template = "aave"` provides
    * `collateral_ratio` / `borrowed` / `collateral_value` over declared
    * accounts): a METHOD-grid template — unlike v2/v3 (event queries), this
    * packages the S5 sampling-grid shape: two state methods polled on the
    * declared cadence per account, plus the derived health ratio. Testbed
    * mapping: `view` state ≙ getCollateralValue, `click` state ≙
    * getBorrowed (a live source calls the pool contract's ABI). The ratio
    * is null until both sides have state, and null on zero debt — the
    * zero-guard discipline every template here uses. */
  def aave(
      accounts: Seq[Long],
      name: String = "aave_loan_healths",
      chain: String = "polygon",
      startTime: String,
      endTime: String,
      intervalSeconds: Long = 86400L,
  ): QuerySpec = {
    require(accounts.nonEmpty, "aave template: declare at least one account")
    QuerySpec(
      name = name,
      chain = chain,
      contracts = accounts.map(a => ContractSpec(a, methods = Seq(
        MethodSpec("view", Seq("value")),   // ≙ getCollateralValue(account)
        MethodSpec("click", Seq("value"))))), // ≙ getBorrowed(account)
      startTime = Some(startTime),
      endTime = Some(endTime),
      blockInterval = Some(intervalSeconds),
      transforms = Seq(
        "collateral_value" -> col("view_value"),
        "borrowed" -> col("click_value"),
        "collateral_ratio" -> Functions.ternary(col("click_value") =!= 0,
          col("view_value") / col("click_value"), lit(null).cast("double"))),
      saves = Seq(
        "sample_ts" -> col("sample_ts"),
        "timestamp" -> col("timestamp"),
        "account" -> col("user_id"),
        "collateral_value" -> col("collateral_value"),
        "borrowed" -> col("borrowed"),
        "collateral_ratio" -> col("collateral_ratio"),
      ),
    )
  }

  /** Compound-style cToken template (ROADMAP.md:82-87): the distinguishing
    * mechanic is EXCHANGE-RATE ACCRUAL — a cToken balance converts to the
    * underlying via the market's monotonically-growing exchangeRate
    * (`underlying = cTokens × exchangeRate / 10^scale`), and the per-sample
    * rate growth IS the supply yield. The template packages the S5 method
    * grid polling the rate per market plus a window over the grid for the
    * growth series — a mechanic neither the swap templates (per-event
    * math) nor aave (same-sample ratio) exercise. Testbed mapping: `view` state ≙
    * exchangeRateStored, `click` state ≙ the account's cToken balance. */
  final case class CompoundMarket(address: Long, rateScale: Int)

  def compound(
      markets: Seq[CompoundMarket],
      name: String = "compound_positions",
      chain: String = "ethereum",
      startTime: String,
      endTime: String,
      intervalSeconds: Long = 86400L,
  ): QuerySpec = {
    require(markets.nonEmpty, "compound template: declare at least one market")
    QuerySpec(
      name = name,
      chain = chain,
      contracts = markets.map(m => ContractSpec(m.address,
        methods = Seq(
          MethodSpec("view", Seq("value")),    // ≙ exchangeRateStored()
          MethodSpec("click", Seq("value"))),  // ≙ balanceOf(account) in cTokens
        transforms = Seq(
          "rate_scale" -> lit(math.pow(10.0, m.rateScale.toDouble))))),
      startTime = Some(startTime),
      endTime = Some(endTime),
      blockInterval = Some(intervalSeconds),
      transforms = Seq(
        "exchange_rate" -> col("view_value"),
        "ctokens" -> col("click_value"),
        "underlying" -> col("view_value") * col("click_value") / col("rate_scale")),
      saves = Seq(
        "sample_ts" -> col("sample_ts"),
        "market" -> col("user_id"),
        "exchange_rate" -> col("exchange_rate"),
        "ctokens" -> col("ctokens"),
        "underlying" -> col("underlying"),
      ),
    )
  }

  /** One MakerDAO-style vault: contract address + its collateral type
    * (ilk) and that ilk's liquidation ratio (e.g. ETH-A = 1.45 on mainnet:
    * a vault is safe while collateral/debt stays above it). */
  final case class MakerVault(address: Long, ilk: String, liquidationRatio: Double)

  /** MakerDAO vault-collateralization template (ROADMAP.md:82-87, the last
    * of the reference's five declared templates): CDP health is the aave
    * grid+ratio shape — two polled state methods per vault plus the derived
    * ratio — with CDP semantics on top: each vault carries its ilk and that
    * ilk's LIQUIDATION RATIO as plan-time constants (contract-scoped
    * transforms, folded like v2's decimal scaling), and the template derives
    * `at_risk = collateralization < liquidation_ratio` — the predicate a
    * keeper bot watches. Testbed mapping: `view` state ≙ the vault's
    * collateral value (ink × spot), `click` state ≙ its debt (art × rate);
    * a live source calls the Vat/Spot contracts' ABI. Ratio is null until
    * both sides have state and null on zero debt (the template zero-guard
    * discipline); at_risk inherits null through the comparison. */
  def makerdao(
      vaults: Seq[MakerVault],
      name: String = "makerdao_vaults",
      chain: String = "ethereum",
      startTime: String,
      endTime: String,
      intervalSeconds: Long = 86400L,
  ): QuerySpec = {
    require(vaults.nonEmpty, "makerdao template: declare at least one vault")
    QuerySpec(
      name = name,
      chain = chain,
      contracts = vaults.map(v => ContractSpec(v.address,
        methods = Seq(
          MethodSpec("view", Seq("value")),    // ≙ collateral value (ink × spot)
          MethodSpec("click", Seq("value"))),  // ≙ vault debt (art × rate)
        transforms = Seq(
          "ilk" -> lit(v.ilk),
          "liquidation_ratio" -> lit(v.liquidationRatio)))),
      startTime = Some(startTime),
      endTime = Some(endTime),
      blockInterval = Some(intervalSeconds),
      transforms = Seq(
        "collateral_value" -> col("view_value"),
        "debt" -> col("click_value"),
        "collateralization" -> Functions.ternary(col("click_value") =!= 0,
          col("view_value") / col("click_value"), lit(null).cast("double")),
        // sequential transform fold: references the ratio derived above
        "at_risk" -> (col("collateralization") < col("liquidation_ratio"))),
      saves = Seq(
        "sample_ts" -> col("sample_ts"),
        "timestamp" -> col("timestamp"),
        "vault" -> col("user_id"),
        "ilk" -> col("ilk"),
        "collateral_value" -> col("collateral_value"),
        "debt" -> col("debt"),
        "collateralization" -> col("collateralization"),
        "liquidation_ratio" -> col("liquidation_ratio"),
        "at_risk" -> col("at_risk"),
      ),
    )
  }

  /** One Uniswap-v3-style pool: contract address + token decimals. */
  final case class UniV3Pool(address: Long, decimals0: Int, decimals1: Int)

  /** The standard v3 swaps query: price comes from the pool's Q64.96
    * fixed-point sqrt price — `price = (sqrtPriceX96 / 2^96)^2 ×
    * 10^(decimals0 − decimals1)` — instead of v2's reserve ratio. Testbed
    * mapping: props `$.k` carries the sqrt-price mantissa (a live source
    * decodes the uint160 from the Swap ABI), so sqrtPriceX96 = k · 2^96;
    * `value` carries the token0 amount. 2^96 and the squaring are exact in
    * IEEE doubles for testbed magnitudes, so the oracle reproduces the same
    * arithmetic bit-for-bit; the per-pool decimal multiplier is a
    * plan-time-folded CASE like v2's scaling. */
  def uniswapv3(
      pools: Seq[UniV3Pool],
      name: String = "uniswapv3_swaps",
      chain: String = "ethereum",
      startTime: Option[String] = None,
      endTime: Option[String] = None,
  ): QuerySpec = {
    require(pools.nonEmpty, "uniswapv3 template: declare at least one pool")
    val q96 = pow(lit(2.0), lit(96))
    val k = get_json_object(col("props"), "$.k").cast("double")
    QuerySpec(
      name = name,
      chain = chain,
      contracts = pools.map(p => ContractSpec(p.address,
        events = Seq(EventSpec("purchase", Seq("value", "props"))),
        transforms = Seq(
          "amount0" -> Functions.parseDecimals(col("value"), p.decimals0),
          "px_mult" -> lit(math.pow(10.0, (p.decimals0 - p.decimals1).toDouble))))),
      startTime = startTime,
      endTime = endTime,
      transforms = Seq(
        "sqrt_price_x96" -> (k * q96),
        "price_ratio" -> {
          val s = col("sqrt_price_x96") / q96
          s * s
        }),
      filters = Seq(k.isNotNull),
      saves = Seq(
        "timestamp" -> col("timestamp"),
        "block" -> col("blocknumber"),
        "pool" -> col("contract_address"),
        "sqrt_price_x96" -> col("sqrt_price_x96"),
        "price" -> col("price_ratio") * col("px_mult"),
        "amount0" -> col("amount0"),
      ),
    )
  }
}
