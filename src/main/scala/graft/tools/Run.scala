package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

import graft.engine.{Compiler, Metrics, Sinks}
import graft.model.{ConfigFile, HclSchema, Mode, SchemaSpec}

/** The reference's CLI surface (/root/reference/main.go + flags.go) as a
  * Spark driver program: `init` materializes a runnable config + schema
  * pair, and a plain invocation loads `config.yml` + `schema.hcl` from the
  * config dir, compiles every query, and routes each query's result to the
  * selected sinks — one distributed job per sink instead of the reference's
  * row-at-a-time driver loop (output/output.go:82-121).
  *
  * Flags (reference flags.go names kept):
  *   - `--realtime` / `-R`  compile every query as Mode.Realtime — in the
  *     reference the schema file has no mode, the FLAG decides (main.go /
  *     chainservice.go); same here.
  *   - `--stdout` / `--csv` / `--db`  sinks, combinable. Historical: show /
  *     one header'd csv directory per query under `--out` / one table per
  *     query at the config's postgres target. Realtime: console sink /
  *     demuxed csv file stream / per-query SQL tables via foreachBatch.
  *   - `--rate-limit N` / `--log-parts N`  tuning for the LIVE source seam:
  *     they bind to the DSv2 connector's rate limiting and `parts` block-
  *     range chunking ([[graft.sources]] EvmLogsSource options; reference
  *     SmartFilterLogs). A testbed store endpoint (a directory path) reads
  *     parquet and doesn't consume them.
  *   - `--log-level N`  zerolog-style int (≤0 debug, 1 info, ≥2 warn).
  *   - `--once`  realtime only: drain everything currently available and
  *     stop (Trigger.AvailableNow) — a checkpointed bounded backfill; the
  *     default runs until terminated, like the reference's ctrl+c loop.
  *   - `--data DIR`  stand-in store for chains whose config endpoint the
  *     engine cannot serve directly (`wss://`-only — ranged eth_getLogs
  *     needs HTTP). `http(s)://` endpoints dial the node for real
  *     ([[graft.Tables.events]] routes them through the DSv2 connector;
  *     append `#ws=ws://…` for push-driven realtime offsets); directory
  *     paths resolve to themselves (per-chain testbed stores).
  *
  * Endpoint resolution is the CLI's analogue of the reference dialing one
  * chainservice per configured chain (config.go:18-31 →
  * chainservice.go:127-131): each chain's queries read that chain's OWN
  * resolved store through [[graft.model.ChainRegistry]].
  */
object Run {

  final case class Opts(
      command: Option[String] = None,
      abiAddress: Option[String] = None, // `abi <address>` positional
      registry: Option[String] = None,   // local ABI registry dir (egress seam)
      configDir: Option[String] = None,
      data: Option[String] = None,
      out: Option[String] = None,
      realtime: Boolean = false,
      once: Boolean = false,
      stdout: Boolean = false,
      csv: Boolean = false,
      db: Boolean = false,
      sse: Option[(String, Int)] = None, // realtime-only latency sink
      schema: Option[String] = None,     // explicit schema path (ROADMAP.md:62-64)

      rateLimit: Int = 100,
      logParts: Int = 50,
      logLevel: Int = 1)

  private[graft] def parseArgs(args: Array[String]): Opts = {
    var o = Opts()
    var i = 0
    def value(flag: String): String = {
      i += 1
      require(i < args.length, s"flag $flag needs a value")
      args(i)
    }
    while (i < args.length) {
      args(i) match {
        case "init" if o.command.isEmpty && i == 0 => o = o.copy(command = Some("init"))
        case "abi" if o.command.isEmpty && i == 0 => o = o.copy(command = Some("abi"))
        case addr if o.command.contains("abi") && o.abiAddress.isEmpty && !addr.startsWith("--") =>
          o = o.copy(abiAddress = Some(addr))
        case "--registry" => o = o.copy(registry = Some(value("--registry")))
        case "--config-dir" => o = o.copy(configDir = Some(value("--config-dir")))
        case "--data" => o = o.copy(data = Some(value("--data")))
        case "--out" => o = o.copy(out = Some(value("--out")))
        case "--schema" => o = o.copy(schema = Some(value("--schema")))
        case "--realtime" | "-R" => o = o.copy(realtime = true)
        case "--once" => o = o.copy(once = true)
        case "--stdout" => o = o.copy(stdout = true)
        case "--csv" => o = o.copy(csv = true)
        case "--db" => o = o.copy(db = true)
        case "--sse" =>
          val hp = value("--sse").split(":", 2)
          require(hp.length == 2 && hp(1).nonEmpty && hp(1).length <= 5 &&
            hp(1).forall(_.isDigit) && hp(1).toInt >= 1 && hp(1).toInt <= 65535,
            "--sse needs host:port (port 1-65535)")
          o = o.copy(sse = Some((hp(0), hp(1).toInt)))
        case "--rate-limit" => o = o.copy(rateLimit = value("--rate-limit").toInt)
        case "--log-parts" => o = o.copy(logParts = value("--log-parts").toInt)
        case "--log-level" => o = o.copy(logLevel = value("--log-level").toInt)
        case other => sys.error(s"unknown argument '$other' " +
          "(init | --config-dir D | --data D | --out D | --schema F | --realtime | --once | " +
          "--stdout | --csv | --db | --sse H:P | --rate-limit N | --log-parts N | --log-level N)")
      }
      i += 1
    }
    require(o.rateLimit > 0, "--rate-limit must be positive")
    require(o.logParts > 0, "--log-parts must be positive")
    o
  }

  /** `init` — the reference writes its embedded example config + schema
    * into the user config dir (main.go Init). The emitted pair is runnable
    * as-is against a testbed store. */
  private[graft] def init(dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, "config.yml"),
      """# apollo-style config (reference config.example.yml shape).
        |# rpc maps each chain to the endpoint serving its queries: a
        |# directory path reads that testbed store; an http(s):// URL dials
        |# that JSON-RPC node over the real transport (append #ws=ws://...
        |# for push-driven realtime offsets); wss://-only needs --data.
        |rpc:
        |  ethereum: /root/testdata/sf0.001
        |# --db sink target. `url` may name any JDBC database directly;
        |# without it the host/name/user/password DSN form is used.
        |postgres:
        |  host: localhost
        |  name: apollo
        |  user: apollo
        |  password: apollo
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "schema.hcl"),
      """# Example schema in the reference's HCL dialect, runnable on the
        |# testbed store: two purchase-event contracts with per-contract
        |# decimal scaling, a query-level filter, and a save projection.
        |start_time = "2024-01-05"
        |end_time = "2024-01-25"
        |
        |query testbed_swaps {
        |  chain = "ethereum"
        |
        |  contract {
        |    address = 1
        |    event purchase { outputs = ["value"] }
        |    transform { amount = parse_decimals(value, 2) }
        |  }
        |
        |  contract {
        |    address = 2
        |    event purchase { outputs = ["value"] }
        |    transform { amount = parse_decimals(value, 3) }
        |  }
        |
        |  filter = [ amount != 0 ]
        |
        |  save {
        |    block = blocknumber
        |    contract = contract_address
        |    amount = amount
        |  }
        |}
        |""".stripMargin)
    println(s"config written ${Paths.get(dir, "config.yml")}")
    println(s"schema written ${Paths.get(dir, "schema.hcl")}")
  }

  /** `abi <address>` — the reference roadmap's "subcommand for getting
    * ABIs from etherscan and the like" (ROADMAP.md:56), behind the same
    * egress seam as the event source: the zero-egress build resolves from
    * a LOCAL registry directory (`--registry <dir>`, one `<address>.json`
    * per contract — what an Etherscan `getabi` response body contains);
    * pointing the seam at an HTTP fetcher is the only live-network delta.
    * The fetched document is validated by the same parser the decode path
    * uses ([[graft.model.AbiSchema.parse]] — garbage in the registry fails
    * here, not mid-query), written to `<configDir>/abis/<address>.json`
    * (or `--out <file>`), and a contract block consumes it with
    * `abi = "<path>"` — [[graft.model.HclSchema]] then gates the block's
    * event signatures and outputs against it at schema-compile time. */
  private[graft] def fetchAbi(configDir: String, opts: Opts): Unit = {
    val addr = opts.abiAddress.getOrElse(sys.error(
      "abi subcommand needs a contract address: abi <address> --registry <dir|url>"))
    val reg = opts.registry.getOrElse(sys.error(
      "abi: no --registry <dir|url> — a directory resolves locally (one <address>.json " +
        "per contract); an http(s) URL fetches Etherscan-style (getabi)"))
    val body =
      if (reg.startsWith("http://") || reg.startsWith("https://")) fetchAbiHttp(reg, addr)
      else {
        val candidates =
          Seq(addr, addr.toLowerCase).distinct.map(a => Paths.get(reg, s"$a.json"))
        val src = candidates.find(Files.exists(_)).getOrElse(sys.error(
          s"abi: address $addr not in registry $reg (looked for " +
            s"${candidates.map(_.getFileName).mkString(", ")})"))
        Files.readString(src)
      }
    val events = graft.model.AbiSchema.parse(body)
    require(events.nonEmpty,
      s"abi: $reg/$addr parses but declares no events — not a usable ABI")
    val dest = opts.out.map(Paths.get(_)).getOrElse {
      Files.createDirectories(Paths.get(configDir, "abis"))
      Paths.get(configDir, "abis", s"${addr.toLowerCase}.json")
    }
    Option(dest.getParent).foreach(Files.createDirectories(_))
    Files.writeString(dest, body)
    println(s"abi written $dest")
    events.foreach(e => println(
      s"  event ${e.name}(${e.inputs.map(i => s"${i.solType} ${i.name}").mkString(", ")})"))
  }

  /** The Etherscan-style HTTP leg of the `abi` fetch (reference
    * ROADMAP.md:56 — "getting ABIs from etherscan and the like"): GET
    * `<url>?module=contract&action=getabi&address=<addr>`, bounded retry
    * on transport failures/5xx, and the standard response envelope
    * unwrapped ({"status":"1","result":"<abi-json-string>"}); a raw ABI
    * array body is accepted as-is (a plain file server works too). The
    * spec drives this against a loopback fixture; production points it at
    * the real explorer API — nothing here changes. */
  private def fetchAbiHttp(url: String, addr: String): String = {
    import org.json4s._
    val http = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(
      s"$url?module=contract&action=getabi&address=$addr")).GET().build()
    var attempt = 0
    var body: String = null
    while (body == null) {
      val resp: Either[Throwable, java.net.http.HttpResponse[String]] =
        try Right(http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()))
        catch { case e: java.io.IOException => Left(e) }
      resp match {
        case Right(r) if r.statusCode() == 200 => body = r.body()
        case failed =>
          attempt += 1
          if (attempt > 3) failed match {
            case Left(e) => throw e
            case Right(r) => sys.error(s"abi: $url answered HTTP ${r.statusCode()} " +
              s"for $addr after 3 retries")
          }
          Thread.sleep(50L << (attempt - 1))
      }
    }
    org.json4s.jackson.JsonMethods.parseOpt(body) match {
      case Some(o: JObject) => (o \ "result", o \ "status") match {
        case (JString(inner), JString("1")) => inner
        case (JString(msg), _) => sys.error(s"abi: registry rejected $addr: $msg")
        case _ => body
      }
      case _ => body
    }
  }

  /** Resolve one configured chain endpoint to an event-store location: a
    * directory (or file: URI) is a testbed store; an `http(s)://` URL is a
    * LIVE JSON-RPC endpoint and passes through verbatim — the engine's
    * event sources dial it over the real transport
    * ([[graft.Tables.events]] routes such locators through the DSv2
    * connector; append `#ws=ws://…` for push-driven realtime offsets).
    * A `wss://`-only endpoint cannot serve the historical fetch path
    * (ranged eth_getLogs is HTTP) — configure the https URL, or pass
    * `--data` as a stand-in store. */
  private[graft] def resolveEndpoint(
      data: Option[String], rpcDefaults: String = "")(chain: String, ep: String): String = {
    val path = if (ep.startsWith("file:")) ep.stripPrefix("file:") else ep
    if (new java.io.File(path).isDirectory) path
    else if (graft.Tables.isRpcEndpoint(ep)) {
      // attach the CLI's connector knobs (--log-parts/--rate-limit) as
      // locator-fragment DEFAULTS — a fragment already on the configured
      // endpoint wins (last occurrence wins in the locator grammar)
      if (rpcDefaults.isEmpty) ep
      else ep.split("#", 2) match {
        case Array(base, frag) => s"$base#$rpcDefaults&$frag"
        case _ => s"$ep#$rpcDefaults"
      }
    }
    else data.getOrElse(sys.error(
      s"chain '$chain' endpoint '$ep' is not a directory, http(s):// RPC URL, or file: URI; " +
        "a wss://-only endpoint cannot serve ranged eth_getLogs — configure the node's " +
        "https URL (append #ws=ws://… for push offsets) or pass --data <storeDir>"))
  }

  /** Run the loaded schema. Factored from [[main]] so specs can drive it
    * with their own SparkSession and intercept failures. */
  def run(args: Array[String], session: Option[SparkSession] = None): Unit = {
    val opts = parseArgs(args)
    val configDir = opts.configDir.getOrElse(
      Paths.get(sys.props("user.dir"), "apollo").toString)

    if (opts.command.contains("init")) { init(configDir); return }
    if (opts.command.contains("abi")) { fetchAbi(configDir, opts); return }

    require(opts.stdout || opts.csv || opts.db || opts.sse.isDefined,
      "no sink selected — pass at least one of --stdout / --csv / --db / --sse")
    require(opts.sse.isEmpty || opts.realtime,
      "--sse is a realtime latency sink (ROADMAP.md:72) — pass --realtime/-R with it")
    val confPath = Paths.get(configDir, "config.yml")
    // --schema overrides the conventional location (reference roadmap "CLI
    // options for schema path", ROADMAP.md:62-64) — config stays with the dir
    val schemaPath = opts.schema.map(Paths.get(_)).getOrElse(Paths.get(configDir, "schema.hcl"))
    require(Files.exists(confPath),
      s"$configDir needs config.yml (run `init --config-dir $configDir` first)")
    require(Files.exists(schemaPath), s"schema file not found: $schemaPath")

    val cfg = ConfigFile.parse(Files.readString(confPath))
    require(cfg.rpc.nonEmpty, "config: rpc section declares no chains")

    val parsed = HclSchema.parse(Files.readString(schemaPath))
    require(parsed.queries.nonEmpty, s"$schemaPath declares no queries")
    // every declared chain must be configured (the reference dials one
    // chainservice per CONFIGURED chain — an unconfigured chain cannot
    // silently succeed there, so it must not silently read some other
    // chain's store here); --data is the explicit opt-in default store
    val unconfigured = parsed.queries.map(_.chain).distinct.filterNot(cfg.rpc.contains)
    require(unconfigured.isEmpty || opts.data.isDefined,
      s"schema declares chains missing from config.yml rpc: ${unconfigured.mkString(", ")} — " +
        "add them to the config or pass --data as the default store")
    val registry = cfg.registry(
      resolveEndpoint(opts.data,
        s"parts=${opts.logParts}&rateLimit=${opts.rateLimit}"),
      // only reachable when --data is set (the require above); the orElse
      // keeps construction total without picking an arbitrary chain's store
      default = opts.data.getOrElse(""))
    // the --realtime FLAG picks the mode for the whole schema, exactly the
    // reference's opts.Realtime (the schema file itself carries no mode)
    val schema =
      if (opts.realtime) SchemaSpec(parsed.variables,
        parsed.queries.map(_.copy(mode = Mode.Realtime)))
      else parsed

    val spark = session.getOrElse {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors().toString)
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        // zstd shuffle: ~1.7x denser than lz4 on the big-store text
        // exchanges — the difference between crashing and finishing the
        // sf100 kn5 apply on one spindle (SCALING r12.2, code not lore:
        // round-12 verdict item 5). Env override for codec probes.
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
      // streaming-checkpoint manager + checksum parity with Bench (r16):
      // the FileContext-based default forks readlink/ls per state-store
      // delta rename on a no-native-Hadoop local FS — see Bench.scala.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_FM",
          "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager"))
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
      // local chmod without fork/exec (r16): no libhadoop on this box, so
      // stock RawLocalFileSystem shells `chmod` per created file/dir —
      // FileOutputCommitter mkdirs + every parquet part file pay a fork of
      // this JVM. NioLocalFileSystem sets the same bits via java.nio.
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS", "graft.util.NioLocalFileSystem"))
        .getOrCreate()
    }
    spark.sparkContext.setLogLevel(
      if (opts.logLevel <= 0) "DEBUG" else if (opts.logLevel == 1) "INFO" else "WARN")
    graft.functions.GraftFunctions.register(spark)
    val metrics = Metrics.install(spark)

    val outDir = opts.out.getOrElse(Paths.get(configDir, "out").toString)
    // compileAll validates the schema against the selected mode first — the
    // reference's pre-flight DynamicSchema.Validate(opts) (dsl/schema.go:213)
    val compiled = Compiler.compileAll(spark, registry, schema)
    println(s"graft: ${compiled.size} queries, mode=" +
      s"${if (opts.realtime) "realtime" else "historical"}, " +
      s"rate-limit=${opts.rateLimit}rps, log-parts=${opts.logParts}")

    lazy val jdbcTarget = cfg.jdbcTarget

    // One finished frame → every selected batch sink. Serves historical
    // queries AND the bounded-realtime method grids, whose compile runs
    // the stream eagerly (Streams.methodGridRealtime drains AvailableNow
    // inside the Compiler) and hands back a finished batch frame.
    def landBatch(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val sinks = Seq.newBuilder[org.apache.spark.sql.DataFrame => Unit]
      if (opts.stdout) sinks += (d => { println(s"== $name"); Sinks.stdout(d) })
      if (opts.csv) sinks += (d => Sinks.csv(d, s"$outDir/$name.csv"))
      if (opts.db) {
        val (url, props) = jdbcTarget
        sinks += (d => Sinks.jdbc(d, url, Sinks.quotedTable(url, name), props))
      }
      Sinks.multi(df, sinks.result())
    }

    val (allLive, drained) = compiled.partition(_._2.isStreaming)
    // bounded realtime method grids drain to BATCH frames — they need a
    // batch sink; SSE only carries live streams
    require(drained.isEmpty || opts.stdout || opts.csv || opts.db,
      s"queries ${drained.keys.toSeq.sorted.mkString(", ")} drain to batch frames — " +
        "--sse only serves live streams; add --stdout/--csv/--db for them")
    drained.toSeq.sortBy(_._1).foreach { case (name, df) => landBatch(name, df) }
    // AGGREGATED realtime queries emit updated group values, not appended
    // rows — they cannot ride the append-mode demux. Each lands in its own
    // upserted SQL table (one current row per group, Sinks.upsertJdbcStream);
    // file/console/SSE sinks for them fail loud with the remedy.
    val aggNames = schema.queries.filter(_.aggregates.nonEmpty).map(_.name).toSet
    val (aggLive, live) = allLive.partition { case (name, _) => aggNames.contains(name) }
    // --sse only carries live NON-aggregate streams (aggregates update group
    // values in place; drained grids are batch frames) — a run where nothing
    // can reach the SSE consumer must say so, not silently serve nothing.
    // Checked BEFORE any stream starts, so the failure leaks nothing.
    require(opts.sse.isEmpty || live.nonEmpty,
      "--sse requested but no live non-aggregate stream exists to serve over SSE — " +
        s"this schema's realtime queries ${(aggLive.keys ++ drained.keys).toSeq.sorted.mkString(", ")} " +
        "are aggregates (upserted via --db) or bounded grids (batch sinks); " +
        "SSE frames require an append-mode live stream")
    val ourStreams = scala.collection.mutable.ListBuffer.empty[org.apache.spark.sql.streaming.StreamingQuery]
    if (aggLive.nonEmpty) {
      // aggregates need --db (the upserted live table); csv/sse stay valid
      // for the OTHER live queries in the same schema — only the aggregates
      // route around them. Console CAN show updates, so --stdout gets an
      // update-mode console stream per aggregate.
      require(opts.db,
        s"realtime aggregate queries ${aggLive.keys.toSeq.sorted.mkString(", ")} update " +
          "group values in place — add --db (each lands as an upserted SQL table); " +
          "file/SSE sinks cannot represent updates")
      val (url, props) = jdbcTarget
      aggLive.toSeq.sortBy(_._1).foreach { case (name, df) =>
        val keys = schema.queries.find(_.name == name).get.groupBy
        require(keys.nonEmpty,
          s"query $name: realtime global aggregate (no group_by) has a single " +
            "ever-changing row — declare group_by keys for the live table")
        ourStreams += Sinks.upsertJdbcStream(df, keys, url, name,
          props, s"$outDir/_checkpoints/agg_$name", bounded = opts.once)
        if (opts.stdout) {
          val w = df.writeStream.format("console")
            .outputMode("update")
            .option("truncate", "false")
            .option("checkpointLocation", s"$outDir/_checkpoints/agg_console_$name")
          ourStreams += (if (opts.once)
            w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          else w.start())
        }
      }
    }
    if (live.nonEmpty) {
      val demuxed = Compiler.demux(live)
      val started = ourStreams // continue the same run-wide query list
      if (opts.csv) started += Sinks.demuxFileStream(
        demuxed, s"$outDir/csv", s"$outDir/_checkpoints/csv", format = "csv",
        bounded = opts.once)
      if (opts.db) {
        val (url, props) = jdbcTarget
        started += Sinks.demuxJdbcStream(
          demuxed, url, props, s"$outDir/_checkpoints/db", bounded = opts.once)
      }
      if (opts.stdout) {
        val w = demuxed.writeStream.format("console")
          .option("truncate", "false")
          .option("checkpointLocation", s"$outDir/_checkpoints/console")
        started += (if (opts.once)
          w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        else w.start())
      }
      opts.sse.foreach { case (host, port) =>
        started += Sinks.sseStream(
          demuxed, host, port, s"$outDir/_checkpoints/sse", bounded = opts.once)
      }
    }
    // One await for EVERY stream this run started (aggregate upserts and
    // demuxed sinks alike): --once drains each to completion; unbounded
    // mode runs until any of THIS run's streams terminates (the
    // reference's ctrl+c loop — not spark.streams.awaitAnyTermination(),
    // which a shared session would pollute with someone else's queries).
    if (opts.once) ourStreams.foreach(_.awaitTermination())
    else if (ourStreams.nonEmpty) {
      while (ourStreams.forall(_.isActive)) Thread.sleep(200)
      // a stream that DIED (vs. was stopped) must surface its error —
      // awaitTermination would rethrow it; the poll loop must too
      ourStreams.filterNot(_.isActive).foreach { q =>
        q.exception.foreach(e => throw e)
      }
    }
    // reference: service.DumpMetrics() on the way out
    println(metrics.dump())
  }

  def main(args: Array[String]): Unit =
    try run(args)
    catch {
      case e: Throwable =>
        System.err.println(s"graft run: ${e.getMessage}")
        sys.exit(1)
    }
}
