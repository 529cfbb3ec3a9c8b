package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.model.{ConfigFile, HclSchema}
import graft.tools.Run

/** The CLI surface (graft.tools.Run ≙ reference main.go/flags.go): init,
  * flag parsing, endpoint resolution, and full historical + realtime runs
  * landing the example schema in every sink. */
class CliSpec extends SparkSpec {

  private def writeConfigDir(postgresUrl: Option[String] = None): String = {
    val dir = Files.createTempDirectory("cli").toString
    Run.run(Array("init", "--config-dir", dir))
    // retarget the example config at THIS suite's store + embedded Derby
    Files.writeString(Paths.get(dir, "config.yml"),
      s"""rpc:
         |  ethereum: $sf
         |postgres:
         |${postgresUrl.fold("")(u => s"  url: $u\n  driver: org.apache.derby.jdbc.EmbeddedDriver\n")}  host: localhost
         |  name: apollo
         |  user: apollo
         |  password: apollo
         |""".stripMargin)
    dir
  }

  private def exampleBatch() = {
    graft.functions.GraftFunctions.register(spark)
    val dir = writeConfigDir()
    val hcl = Files.readString(Paths.get(dir, "schema.hcl"))
    graft.engine.Compiler.compile(spark, sf, HclSchema.parse(hcl).queries.head)
  }

  test("init writes a runnable config + schema pair") {
    val dir = Files.createTempDirectory("cli_init").toString
    Run.run(Array("init", "--config-dir", dir))
    val cfg = ConfigFile.parse(Files.readString(Paths.get(dir, "config.yml")))
    assert(cfg.rpc.keySet == Set("ethereum"))
    assert(cfg.postgres.keySet == Set("host", "name", "user", "password"))
    val schema = HclSchema.parse(Files.readString(Paths.get(dir, "schema.hcl")))
    assert(schema.queries.map(_.name) == Seq("testbed_swaps"))
    assert(schema.queries.head.contracts.size == 2)
  }

  test("flag parsing: reference flag set + loud unknowns") {
    val o = Run.parseArgs(Array("--config-dir", "/x", "--realtime", "--csv",
      "--rate-limit", "25", "--log-parts", "8", "--log-level", "2"))
    assert(o.configDir.contains("/x") && o.realtime && o.csv)
    assert(o.rateLimit == 25 && o.logParts == 8 && o.logLevel == 2)
    assert(Run.parseArgs(Array("-R")).realtime)
    val e = intercept[RuntimeException](Run.parseArgs(Array("--nope")))
    assert(e.getMessage.contains("unknown argument"))
    assert(intercept[IllegalArgumentException](
      Run.parseArgs(Array("--rate-limit", "0"))).getMessage.contains("positive"))
  }

  test("endpoint resolution: directory stores pass through, live RPC needs --data") {
    assert(Run.resolveEndpoint(None)("ethereum", sf) == sf)
    assert(Run.resolveEndpoint(Some("/d"))("ethereum", "wss://node.example/ws") == "/d")
    val e = intercept[RuntimeException](
      Run.resolveEndpoint(None)("ethereum", "wss://node.example/ws"))
    assert(e.getMessage.contains("--data"))
    // http(s) endpoints pass through with the CLI's connector knobs
    // attached as locator-fragment defaults…
    assert(Run.resolveEndpoint(None, "parts=50&rateLimit=100")(
      "ethereum", "http://node.example/") == "http://node.example/#parts=50&rateLimit=100")
    // …and a fragment already configured on the endpoint WINS (the
    // locator grammar keeps the last occurrence of a key)
    assert(Run.resolveEndpoint(None, "parts=50")(
      "ethereum", "http://node.example/#parts=4")
      == "http://node.example/#parts=50&parts=4")
  }

  test("live RPC config: an http endpoint in config.yml dials the node end-to-end") {
    // the reference's deployment shape — config.yml `rpc: chain: <url>`
    // (config.example.yml:4-9) — through THIS engine's whole stack: config
    // → registry → compiler → DSv2 connector → real HTTP → csv sink
    val srv = new JsonRpcReplayServer(tip0 = 200L)
    try {
      val dir = Files.createTempDirectory("cli_live").toString
      Files.writeString(Paths.get(dir, "config.yml"),
        s"""rpc:
           |  ethereum: ${srv.url}
           |postgres:
           |  host: localhost
           |  name: apollo
           |  user: apollo
           |  password: apollo
           |""".stripMargin)
      Files.writeString(Paths.get(dir, "schema.hcl"),
        """query live_swaps {
          |  chain = "ethereum"
          |  contract {
          |    address = 7
          |    event Swap { outputs = ["value"] }
          |  }
          |  save {
          |    block = blocknumber
          |    contract = contract_address
          |    amount = value
          |  }
          |}
          |""".stripMargin)
      val out = Files.createTempDirectory("cli_live_out").toString
      Run.run(Array("--config-dir", dir, "--csv", "--out", out), Some(spark))
      val got = spark.read.option("header", "true").csv(s"$out/live_swaps.csv")
      val expected = (0L to 200L).flatMap(graft.sources.EvmLogs.fetchBlockLogs)
        .filter(r => r._4 == 7L && r._5 == "Swap")
      assert(expected.nonEmpty)
      assert(got.count() == expected.size,
        s"csv rows ${got.count()} != chain truth ${expected.size}")
      assert(got.columns.toSeq == Seq("block", "contract", "amount"))
      assert(srv.getLogsCalls.get() > 0, "the CLI never dialed the endpoint")
      // the pushed address/topic filter reached the wire request itself
      val f = org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(srv.lastGetLogsFilter))
      assert(f.contains("\"address\"") && f.contains("Swap"), f)
    } finally srv.stop()
  }

  test("historical run lands csv + db + stdout for the example schema") {
    val url = "jdbc:derby:memory:clidb;create=true"
    val dir = writeConfigDir(postgresUrl = Some(url))
    val out = Files.createTempDirectory("cli_out").toString
    Run.run(Array("--config-dir", dir, "--stdout", "--csv", "--db", "--out", out),
      Some(spark))

    val want = exampleBatch()
    val wantCount = want.count()
    assert(wantCount > 0)

    val gotCsv = spark.read.option("header", "true").csv(s"$out/testbed_swaps.csv")
    assert(gotCsv.count() == wantCount)
    assert(gotCsv.columns.toSeq == Seq("block", "contract", "amount"))
    // values survive the csv round-trip (cast back and diff)
    val csvTyped = gotCsv.select(
      col("block").cast("long"), col("contract").cast("long"),
      col("amount").cast("double"))
    assert(csvTyped.exceptAll(want).count() == 0)

    // read back with the SAME credentials the CLI wrote with — embedded
    // Derby scopes unqualified tables to the user's schema (APOLLO)
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    props.setProperty("user", "apollo")
    props.setProperty("password", "apollo")
    val gotDb = spark.read.jdbc(url, "testbed_swaps", props)
    assert(gotDb.count() == wantCount)
  }

  test("realtime --once run demuxes a csv stream per query and matches batch") {
    val dir = writeConfigDir()
    val out = Files.createTempDirectory("cli_rt").toString
    Run.run(Array("--config-dir", dir, "--realtime", "--once", "--csv", "--out", out),
      Some(spark))
    val want = exampleBatch()
    val got = spark.read.option("header", "true")
      .csv(s"$out/csv/query_name=testbed_swaps")
      .select(col("block").cast("long"), col("contract").cast("long"),
        col("amount").cast("double"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
  }

  test("realtime --once --sse pushes every result row as an SSE frame") {
    val dir = writeConfigDir()
    val out = Files.createTempDirectory("cli_sse").toString
    val srv = new SseTestServer
    try {
      Run.run(Array("--config-dir", dir, "--realtime", "--once",
        "--sse", s"localhost:${srv.port}", "--out", out), Some(spark))
      val want = exampleBatch().count()
      srv.awaitFrames(want)
      assert(srv.received.size() == want, s"got ${srv.received.size()} frames, want $want")
      // --sse without --realtime is loud
      val e = intercept[IllegalArgumentException](
        Run.run(Array("--config-dir", dir, "--sse", "localhost:1"), Some(spark)))
      assert(e.getMessage.contains("realtime latency sink"))
      // bad host:port / out-of-range ports are loud at parse time
      assert(intercept[IllegalArgumentException](
        Run.parseArgs(Array("--sse", "nocolon"))).getMessage.contains("host:port"))
      assert(intercept[IllegalArgumentException](
        Run.parseArgs(Array("--sse", "h:70000"))).getMessage.contains("host:port"))
      assert(intercept[IllegalArgumentException](
        Run.parseArgs(Array("--sse", "h:99999999999"))).getMessage.contains("host:port"))
    } finally srv.stop()
  }

  test("unbounded realtime CLI: live trigger lands rows per query dir; graceful stop exits clean") {
    // the steady-state path --once never exercises: the stream stays LIVE,
    // rows land while the poll loop is still running, and a graceful stop
    // (the reference's ctrl+c) exits without surfacing an error
    val dir = writeConfigDir()
    val out = Files.createTempDirectory("cli_live").toString
    val before = spark.streams.active.map(_.id).toSet
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() => {
      try Run.run(Array("--config-dir", dir, "--realtime", "--csv", "--out", out), Some(spark))
      catch { case e: Throwable => err = Some(e) }
    })
    t.start()
    def landedRows(): Long = scala.util.Try {
      spark.read.option("header", "true").csv(s"$out/csv/query_name=testbed_swaps").count()
    }.getOrElse(0L)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (landedRows() == 0 && t.isAlive && err.isEmpty && System.nanoTime() < deadline)
      Thread.sleep(300)
    assert(err.isEmpty, s"live run failed: $err")
    assert(landedRows() > 0, "no rows landed while the stream was live")
    assert(t.isAlive, "run returned on its own — the stream was not live")
    spark.streams.active.filterNot(q => before(q.id)).foreach(_.stop())
    t.join(120000)
    assert(!t.isAlive, "run did not exit after its stream was stopped")
    assert(err.isEmpty, s"graceful stop surfaced an error: $err")
  }

  test("unbounded realtime CLI: a dying sink surfaces its failure (not a silent hang)") {
    // an SSE consumer that is DOWN: the sink's open() exhausts its connect
    // retries, the streaming query dies, and the unbounded poll loop must
    // RETHROW that failure (110181f) instead of idling forever
    val dir = writeConfigDir()
    val out = Files.createTempDirectory("cli_dead").toString
    val port = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() => {
      try Run.run(Array("--config-dir", dir, "--realtime",
        "--sse", s"localhost:$port", "--out", out), Some(spark))
      catch { case e: Throwable => err = Some(e) }
    })
    t.start()
    t.join(180000)
    assert(!t.isAlive, "run did not exit after its sink failed")
    assert(err.nonEmpty, "sink failure was swallowed — the poll loop must surface it")
    val messages = Iterator.iterate(err.get.asInstanceOf[Throwable])(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("unreachable"), s"unexpected failure chain: $messages")
  }

  test("realtime aggregate query through the CLI lands as an upserted SQL table") {
    val url = "jdbc:derby:memory:cliagg;create=true"
    val dir = writeConfigDir(Some(url))
    val out = Files.createTempDirectory("cli_agg").toString
    Files.writeString(Paths.get(dir, "schema.hcl"),
      """query "vol_by_contract" {
        |  chain = "ethereum"
        |  event purchase { outputs = ["value"] }
        |  save {
        |    contract = contract_address
        |    v = value
        |  }
        |  aggregate {
        |    group_by = [contract]
        |    n = count(1)
        |    biggest = max(v)
        |  }
        |}""".stripMargin)
    Run.run(Array("--config-dir", dir, "--realtime", "--once", "--db", "--out", out),
      Some(spark))
    // read back with the CLI's credentials — Derby scopes unqualified
    // tables to the user's schema (APOLLO)
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    props.setProperty("user", "apollo")
    props.setProperty("password", "apollo")
    val back = spark.read.jdbc(url, "vol_by_contract", props)
    val want = Tables.events(spark, sf).where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("contract"))
      .agg(count(lit(1)).as("n"), max("value").as("biggest"))
    assert(back.count() == want.count())
    assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty)
    // csv cannot represent updates — loud with the remedy
    val e = intercept[IllegalArgumentException](
      Run.run(Array("--config-dir", dir, "--realtime", "--once", "--csv",
        "--out", out), Some(spark)))
    assert(e.getMessage.contains("upserted SQL table"))
  }

  test("--schema overrides the conventional schema location (ROADMAP.md:62-64)") {
    val dir = writeConfigDir()
    val out = Files.createTempDirectory("cli_schema").toString
    // move the schema elsewhere; the conventional path no longer exists
    val alt = Files.createTempDirectory("alt_schema").resolve("my.hcl")
    Files.move(Paths.get(dir, "schema.hcl"), alt)
    val e = intercept[IllegalArgumentException](
      Run.run(Array("--config-dir", dir, "--stdout"), Some(spark)))
    assert(e.getMessage.contains("schema file not found"))
    Run.run(Array("--config-dir", dir, "--schema", alt.toString,
      "--csv", "--out", out), Some(spark))
    assert(new java.io.File(s"$out/testbed_swaps.csv").exists())
  }

  test("failure modes are loud: no sink, missing config, empty rpc") {
    val dir = writeConfigDir()
    assert(intercept[IllegalArgumentException](
      Run.run(Array("--config-dir", dir), Some(spark)))
      .getMessage.contains("no sink selected"))
    assert(intercept[IllegalArgumentException](
      Run.run(Array("--config-dir", "/nonexistent-cli", "--stdout"), Some(spark)))
      .getMessage.contains("config.yml"))
    Files.writeString(Paths.get(dir, "config.yml"), "rpc:\npostgres:\n  url: x\n")
    assert(intercept[RuntimeException](
      Run.run(Array("--config-dir", dir, "--stdout"), Some(spark)))
      .getMessage.contains("no chains"))
  }

  test("realtime --once handles a bounded method grid (S6 compiles to a DRAINED batch frame)") {
    val dir = writeConfigDir()
    Files.writeString(Paths.get(dir, "schema.hcl"),
      """start_time = "2024-01-01"
        |end_time = "2024-01-30"
        |query daily_state {
        |  chain = "ethereum"
        |  block_interval = 86400
        |  contract {
        |    address = 1
        |    method purchase { outputs = ["value"] }
        |  }
        |  save {
        |    sample_ts = sample_ts
        |    contract = user_id
        |    last_value = purchase_value
        |  }
        |}
        |""".stripMargin)
    val out = Files.createTempDirectory("cli_s6").toString
    // the bounded realtime method grid runs AvailableNow inside the
    // Compiler and hands back a finished batch frame — the CLI must land
    // it through the batch sinks, not crash calling writeStream on it
    Run.run(Array("--config-dir", dir, "--realtime", "--once", "--csv", "--out", out),
      Some(spark))
    val got = spark.read.option("header", "true").csv(s"$out/daily_state.csv")
    assert(got.count() == 30) // 30 daily samples x 1 contract
    assert(got.columns.toSeq == Seq("sample_ts", "contract", "last_value"))
  }

  test("a schema chain missing from config rpc fails loud instead of reading another store") {
    val dir = writeConfigDir()
    val hcl = Files.readString(Paths.get(dir, "schema.hcl"))
    Files.writeString(Paths.get(dir, "schema.hcl"),
      hcl.replace("chain = \"ethereum\"", "chain = \"gnosis\""))
    val e = intercept[IllegalArgumentException](
      Run.run(Array("--config-dir", dir, "--stdout"), Some(spark)))
    assert(e.getMessage.contains("gnosis"))
    // --data is the explicit opt-in default store for unconfigured chains
    Run.run(Array("--config-dir", dir, "--stdout", "--data", sf,
      "--out", Files.createTempDirectory("cli_data").toString), Some(spark))
  }

  test("schema validation fires through the CLI: realtime method query needs an interval") {
    val dir = writeConfigDir()
    Files.writeString(Paths.get(dir, "schema.hcl"),
      """query polls {
        |  chain = "ethereum"
        |  contract {
        |    address = 1
        |    method click { outputs = ["value"] }
        |  }
        |  save { v = click_value }
        |}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      Run.run(Array("--config-dir", dir, "--realtime", "--once", "--stdout",
        "--out", Files.createTempDirectory("cli_v").toString), Some(spark)))
    assert(e.getMessage.contains("blockInterval"))
  }

  test("abi subcommand fetches from the local registry seam and validates (ROADMAP.md:56, r10)") {
    val dir = writeConfigDir()
    val reg = Files.createTempDirectory("registry").toString
    // an Etherscan getabi response body: events + function entries (ignored)
    Files.writeString(Paths.get(reg, "0xAbC1.json"),
      """[{"type":"event","name":"purchase","inputs":[
        |   {"name":"value","type":"uint256","indexed":false},
        |   {"name":"props","type":"string","indexed":false}]},
        | {"type":"event","name":"signup","inputs":[
        |   {"name":"value","type":"uint256","indexed":true}]},
        | {"type":"function","name":"balanceOf","inputs":[
        |   {"name":"owner","type":"address"}]}]""".stripMargin)
    Run.run(Array("abi", "0xAbC1", "--config-dir", dir, "--registry", reg))
    val out = Paths.get(dir, "abis", "0xabc1.json")
    assert(Files.exists(out), s"expected fetched abi at $out")
    val evs = graft.model.AbiSchema.parse(Files.readString(out))
    assert(evs.map(_.name) == Seq("purchase", "signup"))
    assert(evs.head.inputs.map(_.name) == Seq("value", "props"))
    // --out overrides the destination
    val explicit = Paths.get(dir, "x", "my_abi.json").toString
    Run.run(Array("abi", "0xAbC1", "--config-dir", dir, "--registry", reg, "--out", explicit))
    assert(Files.exists(Paths.get(explicit)))
    // unknown address fails loud with the looked-up names
    val miss = intercept[RuntimeException](
      Run.run(Array("abi", "0xdead", "--config-dir", dir, "--registry", reg)))
    assert(miss.getMessage.contains("not in registry"))
    // registry junk (no events) fails at FETCH time, not mid-query
    Files.writeString(Paths.get(reg, "0xbad.json"),
      """[{"type":"function","name":"f","inputs":[]}]""")
    val junk = intercept[IllegalArgumentException](
      Run.run(Array("abi", "0xbad", "--config-dir", dir, "--registry", reg)))
    assert(junk.getMessage.contains("declares no events"))
    // the egress seam is loud when no registry is given
    val seam = intercept[RuntimeException](
      Run.run(Array("abi", "0xAbC1", "--config-dir", dir)))
    assert(seam.getMessage.contains("--registry"))
  }

  test("abi subcommand fetches over HTTP: Etherscan envelope, retry, rejection (r11)") {
    val dir = writeConfigDir()
    val abi =
      """[{"type":"event","name":"purchase","inputs":[
        |   {"name":"value","type":"uint256","indexed":false}]}]""".stripMargin
    // Etherscan getabi envelope: the ABI rides as a JSON STRING in `result`
    val envelope = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JObject(
        "status" -> org.json4s.JString("1"),
        "message" -> org.json4s.JString("OK"),
        "result" -> org.json4s.JString(abi))))
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var lastQuery: String = ""
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val n = requests.incrementAndGet()
      lastQuery = ex.getRequestURI.getQuery
      val (status, body) =
        if (n <= 2) (500, "transient") // first two answers fail: retry path
        else if (lastQuery.contains("address=0xdead"))
          (200, """{"status":"0","message":"NOTOK","result":"Contract source code not verified"}""")
        else (200, envelope)
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      // succeeds THROUGH the two injected 500s, unwraps the envelope,
      // validates with the decode parser, writes the abis/ file
      Run.run(Array("abi", "0xAbC1", "--config-dir", dir, "--registry", url))
      val out = Paths.get(dir, "abis", "0xabc1.json")
      assert(Files.exists(out))
      assert(graft.model.AbiSchema.parse(Files.readString(out)).map(_.name) == Seq("purchase"))
      assert(requests.get() >= 3, "the injected 500s were not retried through")
      assert(lastQuery.contains("module=contract") && lastQuery.contains("action=getabi")
        && lastQuery.contains("address=0xAbC1"), s"unexpected query: $lastQuery")
      // an explorer rejection surfaces its message, loudly
      val rej = intercept[RuntimeException](
        Run.run(Array("abi", "0xdead", "--config-dir", dir, "--registry", url)))
      assert(rej.getMessage.contains("not verified"), rej.getMessage)
    } finally server.stop(0)
  }
}
