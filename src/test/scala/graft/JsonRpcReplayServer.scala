package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Loopback JSON-RPC replay server (test fixture): serves the SAME
  * deterministic chain as [[graft.sources.EvmLogs.fetchBlockLogs]] over
  * real HTTP, so the connector's live transport path (HTTP client, retry,
  * rate gate, adaptive range splitting) EXECUTES in the zero-egress
  * sandbox and its rows can be compared 1:1 against the stub path.
  *
  * Fault injection knobs:
  *  - `failFirst`: the first N requests answer HTTP 500 (retry path);
  *  - `maxSpan`: an `eth_getLogs` whose block span exceeds it answers the
  *    Infura-style -32005 "query returned more than ... results" error
  *    (adaptive-split path — the client must halve and recurse).
  *
  * Counters record what actually hit the wire so specs can assert the
  * client's behavior (calls made, filters pushed into the request).
  */
final class JsonRpcReplayServer(
    tip0: Long = 1000L,
    maxSpan: Long = Long.MaxValue,
    failFirst: Int = 0,
    failStatus: Int = 500,
    failBody: String = """{"error":"injected transient failure"}""",
    failHeaders: Map[String, String] = Map.empty) {

  /** The simulated chain head — mutable so poller specs can advance it
    * between ticks (the chain moving under a live S6 loop). */
  @volatile var tip: Long = tip0

  /** DIVERGING-CHAIN mode (reorg fixture): once set below MaxValue, every
    * block with number > forkBase serves the FORKED variant — same
    * heights, new blockHashes/txHashes/values
    * ([[graft.sources.EvmLogs.fetchBlockLogsForked]]). Flipping this
    * mid-stream IS the reorg: a client that already fetched those heights
    * holds rows the chain no longer contains. */
  @volatile var forkBase: Long = Long.MaxValue

  private def chainLogs(b: Long) =
    if (b > forkBase) graft.sources.EvmLogs.fetchBlockLogsForked(b)
    else graft.sources.EvmLogs.fetchBlockLogs(b)
  private def chainHash(b: Long): String =
    if (b > forkBase) graft.sources.EvmLogs.forkedBlockHashOf(b)
    else graft.sources.EvmLogs.blockHashOf(b)

  val requests = new java.util.concurrent.atomic.AtomicInteger(0)
  val getLogsCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  val tooManyRejections = new java.util.concurrent.atomic.AtomicInteger(0)
  val ethCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  val headerCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  val blockNumberCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  /** eth_call wire hits per 4-byte selector — the counter the
    * immutable-key caching specs read (one decimals() per contract EVER
    * must hold on the wire, not just in client counters). */
  val ethCallsBySelector = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
  @volatile var lastGetLogsFilter: JValue = JNothing

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}/"

  private def hexToLong(j: JValue): Long = j match {
    case JString(s) if s.startsWith("0x") => java.lang.Long.parseLong(s.drop(2), 16)
    case JString(s) => s.toLong
    case other => sys.error(s"replay: bad quantity $other")
  }
  private def hex(v: Long): String = "0x" + java.lang.Long.toHexString(v)

  private def logsFor(filter: JValue): JValue = {
    val from = hexToLong(filter \ "fromBlock")
    val to = hexToLong(filter \ "toBlock") // inclusive, the wire convention
    if (to - from + 1 > maxSpan) {
      tooManyRejections.incrementAndGet()
      throw new JsonRpcReplayServer.RpcReject(
        -32005, s"query returned more than $maxSpan results")
    }
    val addrs: Option[Set[Long]] = filter \ "address" match {
      case JArray(as) => Some(as.map(hexToLong).toSet)
      case JString(s) => Some(Set(hexToLong(JString(s))))
      case _ => None
    }
    val topic0: Option[String] = filter \ "topics" match {
      case JArray(JString(t) :: _) => Some(t)
      case _ => None
    }
    JArray((from to to).flatMap { b =>
      chainLogs(b)
        .filter { case (_, _, _, addr, top, _) =>
          addrs.forall(_.contains(addr)) && topic0.forall(_ == top)
        }
        .map { case (bn, bh, th, addr, top, value) =>
          JObject(
            "blockNumber" -> JString(hex(bn)),
            "blockHash" -> JString(bh),
            "transactionHash" -> JString(th),
            "address" -> JString(hex(addr)),
            "topics" -> JArray(List(JString(top))),
            // fixture codec: value in exact cents (the stub's doubles are
            // all x.xx), lossless both directions
            "data" -> JString(hex(math.round(value * 100))))
        }.toList
    }.toList)
  }

  // ---- ABI result encoding (the node side of abi.Unpack) ----
  private def abiUint(v: BigInt): String = {
    val h = v.toString(16)
    "0x" + ("0" * (64 - h.length)) + h
  }
  private def abiString(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val hexData = bytes.map(b => f"${b & 0xff}%02x").mkString
    val padded = hexData + "0" * ((64 - hexData.length % 64) % 64)
    "0x" + abiUint(BigInt(32)).drop(2) + abiUint(BigInt(bytes.length)).drop(2) + padded
  }

  /** Deterministic contract state — answers eth_call from the SAME pure
    * functions the stub chain uses, so decoded values are assertable. */
  private def callResult(params: JValue): JValue = {
    val msg = params match { case JArray(m :: _) => m; case _ => JNothing }
    val blockTag = params match {
      case JArray(_ :: JString(t) :: _) => t
      case _ => "latest"
    }
    val addr = hexToLong(msg \ "to")
    val data = msg \ "data" match { case JString(d) => d.toLowerCase; case _ => "" }
    val block = if (blockTag == "latest") tip else hexToLong(JString(blockTag))
    val sel = "0x" + data.stripPrefix("0x").take(8)
    ethCallsBySelector.computeIfAbsent(sel,
      _ => new java.util.concurrent.atomic.AtomicInteger(0)).incrementAndGet()
    sel match {
      case graft.sources.EvmLogs.SelDecimals =>
        JString(abiUint(BigInt(graft.sources.EvmLogs.decimalsOf(addr))))
      case graft.sources.EvmLogs.SelSymbol =>
        JString(abiString(graft.sources.EvmLogs.symbolOf(addr)))
      case graft.sources.EvmLogs.SelTotalSupply =>
        JString(abiUint(graft.sources.EvmLogs.totalSupplyAt(addr, block)))
      case other =>
        throw new JsonRpcReplayServer.RpcReject(-32000, s"execution reverted: $other")
    }
  }

  server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
    val n = requests.incrementAndGet()
    val bodyIn = new String(ex.getRequestBody.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val (status, body) =
      if (n <= failFirst) (failStatus, failBody)
      else {
        val req = JsonMethods.parse(bodyIn)
        val id = req \ "id"
        val method = req \ "method" match { case JString(m) => m; case _ => "" }
        def ok(result: JValue) = JsonMethods.compact(JsonMethods.render(JObject(
          "jsonrpc" -> JString("2.0"), "id" -> id, "result" -> result)))
        def err(code: Long, msg: String) = JsonMethods.compact(JsonMethods.render(JObject(
          "jsonrpc" -> JString("2.0"), "id" -> id,
          "error" -> JObject("code" -> JLong(code), "message" -> JString(msg)))))
        try {
          method match {
            case "eth_blockNumber" =>
              blockNumberCalls.incrementAndGet()
              (200, ok(JString(hex(tip))))
            case "eth_getLogs" =>
              getLogsCalls.incrementAndGet()
              val filter = req \ "params" match {
                case JArray(f :: _) => f
                case _ => JNothing
              }
              lastGetLogsFilter = filter
              (200, ok(logsFor(filter)))
            case "eth_call" =>
              ethCalls.incrementAndGet()
              (200, ok(callResult(req \ "params")))
            case "eth_getBlockByNumber" =>
              headerCalls.incrementAndGet()
              val b = req \ "params" match {
                case JArray(JString("latest") :: _) => tip
                case JArray(t :: _) => hexToLong(t)
                case _ => tip
              }
              (200, ok(JObject(
                "number" -> JString(hex(b)),
                "hash" -> JString(chainHash(b)),
                "timestamp" -> JString(hex(graft.sources.EvmLogs.blockTime(b))))))
            case m => (200, err(-32601, s"method not found: $m"))
          }
        } catch {
          case r: JsonRpcReplayServer.RpcReject => (200, err(r.code, r.msg))
        }
      }
    val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    if (n <= failFirst) // e.g. Retry-After on an injected 429
      failHeaders.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  })
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.start()

  def stop(): Unit = server.stop(0)
}

object JsonRpcReplayServer {
  private final case class RpcReject(code: Long, msg: String) extends RuntimeException(msg)
}
