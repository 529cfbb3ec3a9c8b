package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * In the reference the "source" is an EVM JSON-RPC endpoint
  * (`/root/reference/chainservice/events.go:23-118`); here every source is a
  * parquet scan so Catalyst can push filters/projections into the reader.
  */
object Tables {
  /** Inferred-schema memo keyed on (canonical path, mtime, length): every
    * bare `spark.read.parquet` runs a one-task schema-inference JOB to read
    * the footer (~40-65 ms), and the bench/gate inventory re-reads the same
    * handful of store tables hundreds of times per run — a metastore-backed
    * deployment reads the schema from the catalog instead, which is what
    * this memo reproduces (r16, guide §1/§6). The mtime+length key
    * invalidates on any rewrite/append (spec fixtures re-land stores under
    * one path), so a drifted store re-infers; results are byte-identical —
    * the memoized schema IS the footer's. Metadata only: no rows, plans,
    * or results are cached. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val st =
      try fs.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException =>
        return spark.read.parquet(path) } // keep the reader's own error text
    // directory-backed stores are NOT memoized (ADVICE r16): a directory's
    // length is 0 and its mtime does not change when an existing part file
    // is rewritten in place, so (mtime, len) cannot witness a re-land —
    // fall through to the reader's own inference there
    if (st.isDirectory) return spark.read.parquet(path)
    // every inference-affecting session conf is part of the key (ADVICE
    // r16): nanosAsLong changes what the SAME footer infers to (events'
    // legacy TIMESTAMP(NANOS) layout), and mergeSchema / inferTimestampNTZ /
    // caseSensitive likewise change inference — flipping one mid-process
    // must not serve a schema inferred under the old setting
    def conf(k: String, dflt: String) = spark.conf.getOption(k).getOrElse(dflt)
    val confSig = Seq(
      "nanos=" + conf("spark.sql.legacy.parquet.nanosAsLong", "false"),
      "merge=" + conf("spark.sql.parquet.mergeSchema", "false"),
      "ntz=" + conf("spark.sql.parquet.inferTimestampNTZ.enabled", "true"),
      "case=" + conf("spark.sql.caseSensitive", "false")).mkString(",")
    val key = (s"${fs.makeQualified(p)}#$confSig",
      st.getModificationTime, st.getLen)
    val schema = Option(schemaCache.get(key)).getOrElse {
      val s = spark.read.parquet(path).schema
      schemaCache.putIfAbsent(key, s)
      s
    }
    spark.read.schema(schema).parquet(path)
  }

  /** events.ts has shipped in two physical layouts: TIMESTAMP(NANOS), which
    * Spark has no native type for (read as long nanos under the legacy flag
    * and truncate to microseconds — exactly what DuckDB's µs timestamps do,
    * so oracle values agree), and plain timestamp[us] with
    * isAdjustedToUTC=false, which Spark reads natively as TIMESTAMP_NTZ.
    * Both normalize to the same contract downstream code was built on:
    * `ts` is a TimestampType instant (sessions pin UTC, so the NTZ cast is
    * value-preserving and both layouts yield identical instants). */
  /** Store locators of the form `http(s)://…` are LIVE JSON-RPC endpoints
    * (the reference's config.yml `rpc:` values, config.go:13-16): route
    * them through the DSv2 connector's real transport instead of parquet.
    * Everything downstream — Sources, the Compiler, the CLI — works
    * unchanged because the live frame speaks the events-table contract. */
  def isRpcEndpoint(loc: String): Boolean =
    loc.startsWith("http://") || loc.startsWith("https://")

  /** Live-locator grammar: `http(s)://…[#k=v[&k=v…]]`. Fragment keys are
    * connector options — `parts` (the reference's `--log-parts` range
    * chunking), `rateLimit` (`--rate-limit`, requests/sec/process),
    * `fetchChunk`, `start`/`end` (block range; end defaults to the node
    * head), `blocksPerBatch` and `ws` (push offsets) for streaming.
    * Duplicate keys keep the LAST occurrence, so a caller prepending
    * defaults lets an operator's config fragment win. */
  private[graft] def parseLocator(loc: String): (String, Map[String, String]) =
    loc.split("#", 2) match {
      case Array(ep, frag) =>
        (ep, frag.split("&").iterator.filter(_.nonEmpty).map { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => k -> v
            case _ => kv -> ""
          }
        }.toMap)
      case _ => (loc, Map.empty)
    }

  /** The live chain as an events-shaped frame: blocknumber ≙ event_id
    * (monotone in ts — the S9 BlockDater contract), address ≙ user_id,
    * topic0 ≙ event_type, header time ≙ ts, the decoded word ≙ value, and
    * the raw payload (fixture cents codec) as the `props` JSON. Predicates
    * on the renamed columns push through the aliases into the connector
    * (address set / topic0 / block range inside eth_getLogs; pruning
    * `ts` away skips the header fetches entirely). The scan range is
    * [0, head] at plan time — the reference's FilterEvents full-history
    * default; time bounds then prune via the ts residual. */
  private def liveEvents(spark: SparkSession, locator: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val (endpoint, opts) = parseLocator(locator)
    val rate = opts.get("rateLimit").map(_.toDouble).getOrElse(0.0)
    val head = new graft.sources.JsonRpcClient(endpoint, rate).blockNumber()
    val passthrough = Seq("parts", "rateLimit", "fetchChunk", "retryBaseMs")
    passthrough.foldLeft(
      spark.read.format("graft.sources.EvmLogsProvider")
        .option("endpoint", endpoint)
        .option("start", opts.getOrElse("start", "0"))
        .option("end", opts.getOrElse("end", (head + 1).toString))) {
      (r, k) => opts.get(k).fold(r)(r.option(k, _))
    }.load()
      .select(
        col("blocknumber").as("event_id"),
        timestamp_seconds(col("timestamp")).as("ts"),
        col("address").as("user_id"),
        col("topic").as("event_type"),
        col("value"),
        to_json(struct(round(col("value") * 100).cast("long").as("k"))).as("props"))
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (isRpcEndpoint(sfDir)) return liveEvents(spark, sfDir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ→instant is only value-preserving when the session is UTC;
        // fail loud rather than silently shift every instant by host tz.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other " +
            "(expected TIMESTAMP(NANOS)-as-long, timestamp_ntz, or timestamp)")
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
