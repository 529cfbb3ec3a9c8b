package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

/** A JSON-RPC error returned by the node (as opposed to a transport
  * failure, which is retried). Carries the wire code so callers can react
  * to specific protocol errors — the adaptive log splitter keys on the
  * too-many-results code. */
final case class JsonRpcException(code: Long, message: String)
  extends RuntimeException(s"json-rpc error $code: $message")

/** Minimal JSON-RPC-over-HTTP client for the EVM log connector — the
  * transport seam the reference implements natively: request execution
  * with bounded retry (cached_client.go:72-91), client-side rate limiting
  * (`--rate-limit`, flags.go:31-36), and ADAPTIVE range splitting of
  * `eth_getLogs` when the node rejects a span as too large
  * (SmartFilterLogs, cached_client.go:125-185 — halve and recurse).
  *
  * The container is zero-egress, so the gate drives this against a
  * loopback replay server (EvmLogsSourceSpec) — but everything on this
  * side is the production path: a real `java.net.http` POST per call,
  * real retry/backoff on transport failures and 5xx, a real shared
  * token gate for the rate limit, and the real split recursion driven by
  * the server's own error responses. Production points `endpoint` at a
  * live node and nothing here changes.
  *
  * Threading: one instance is cheap (the underlying HttpClient pools);
  * the RATE GATE is process-global per endpoint, shared across partition
  * readers — the reference rate-limits per client process the same way
  * (on a multi-executor cluster the budget is per executor; size
  * `ratePerSec` accordingly, exactly as the reference sizes it per
  * worker). */
final class JsonRpcClient(
    endpoint: String,
    ratePerSec: Double = 0.0, // 0 = unlimited
    maxRetries: Int = 3,
    retryBaseMs: Long = 50L) {

  private val http = java.net.http.HttpClient.newHttpClient()
  private val ids = new java.util.concurrent.atomic.AtomicLong(0L)

  /** One JSON-RPC call: rate-gate, POST, retry transport-level failures
    * with exponential backoff, surface protocol errors as
    * [[JsonRpcException]] (NOT retried — a node error is deterministic). */
  def call(method: String, params: JValue): JValue = {
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "jsonrpc" -> JString("2.0"),
      "id" -> JLong(ids.incrementAndGet()),
      "method" -> JString(method),
      "params" -> params)))
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    var attempt = 0
    while (true) {
      JsonRpcClient.rateGate(endpoint, ratePerSec)
      val resp: Either[Throwable, java.net.http.HttpResponse[String]] =
        try Right(http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()))
        catch { case e: java.io.IOException => Left(e) }
      resp match {
        case Right(r) if r.statusCode() < 500 =>
          val parsed = JsonMethods.parse(r.body())
          parsed \ "error" match {
            case JObject(_) =>
              val code = (parsed \ "error" \ "code") match {
                case JInt(c) => c.toLong
                case JLong(c) => c
                case _ => -1L
              }
              val msg = (parsed \ "error" \ "message") match {
                case JString(m) => m
                case _ => ""
              }
              throw JsonRpcException(code, msg)
            case _ => return parsed \ "result"
          }
        case failed => // 5xx or IOException: transient — bounded backoff
          attempt += 1
          if (attempt > maxRetries) failed match {
            case Left(e) => throw e
            case Right(r) => throw new java.io.IOException(
              s"json-rpc $endpoint: HTTP ${r.statusCode()} after $maxRetries retries")
          }
          Thread.sleep(retryBaseMs << (attempt - 1))
      }
    }
    sys.error("unreachable")
  }

  /** The latest block number the node has (`eth_blockNumber`). */
  def blockNumber(): Long =
    JsonRpcClient.hexToLong(call("eth_blockNumber", JArray(Nil)))

  /** `eth_getLogs` over the inclusive-exclusive [from, until) range with
    * the PUSHED filters in the request itself (address set + topic0 —
    * the predicates events.go:39,65 narrows the fetch with). On the
    * node's too-many-results rejection, halves the range and recurses —
    * the reference's SmartFilterLogs loop. Returns rows in the stub's
    * column order. */
  def getLogs(
      from: Long, until: Long,
      addresses: Option[Set[Long]], topic: Option[String],
  ): Seq[(Long, String, String, Long, String, Double)] = {
    if (from >= until) return Seq.empty
    val filter = JObject(List(
      "fromBlock" -> JString(JsonRpcClient.hex(from)),
      "toBlock" -> JString(JsonRpcClient.hex(until - 1))) ++
      addresses.map(as => "address" ->
        JArray(as.toList.sorted.map(a => JString(JsonRpcClient.hex(a))))).toList ++
      topic.map(t => "topics" -> JArray(List(JString(t)))).toList)
    try {
      val JArray(logs) = call("eth_getLogs", JArray(List(filter))): @unchecked
      logs.map { lg =>
        val topics = lg \ "topics" match {
          case JArray(ts) => ts.collect { case JString(s) => s }
          case _ => Nil
        }
        (JsonRpcClient.hexToLong(lg \ "blockNumber"),
          JsonRpcClient.str(lg \ "blockHash"),
          JsonRpcClient.str(lg \ "transactionHash"),
          JsonRpcClient.hexToLong(lg \ "address"),
          topics.headOption.getOrElse(""),
          JsonRpcClient.hexToLong(lg \ "data") / 100.0)
      }
    } catch {
      // -32005: "query returned more than N results" — split and recurse
      case JsonRpcException(-32005, _) if until - from > 1 =>
        val mid = from + (until - from) / 2
        getLogs(from, mid, addresses, topic) ++ getLogs(mid, until, addresses, topic)
    }
  }
}

object JsonRpcClient {
  def hex(v: Long): String = "0x" + java.lang.Long.toHexString(v)
  def hexToLong(j: JValue): Long = j match {
    case JString(s) if s.startsWith("0x") => java.lang.Long.parseLong(s.drop(2), 16)
    case JString(s) => s.toLong
    case JInt(i) => i.toLong
    case JLong(l) => l
    case other => sys.error(s"json-rpc: expected hex quantity, got $other")
  }
  private def str(j: JValue): String = j match {
    case JString(s) => s
    case other => other.toString
  }

  /** Process-global min-interval token gate per endpoint: each call claims
    * the next free slot atomically and sleeps until it. Partition readers
    * in one executor share the budget. Idle time banks AT MOST one
    * interval of credit (a naive next-free counter left behind by an idle
    * period would let a later burst fire unthrottled until the banked
    * credit drained — not what a server-side limiter allows). */
  private val nextFreeAt = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  private def rateGate(endpoint: String, ratePerSec: Double): Unit = {
    if (ratePerSec <= 0) return
    val intervalNs = (1e9 / ratePerSec).toLong
    val slot = nextFreeAt.computeIfAbsent(endpoint,
      _ => new java.util.concurrent.atomic.AtomicLong(System.nanoTime()))
    var mine = 0L
    var claimed = false
    while (!claimed) {
      val cur = slot.get()
      mine = math.max(cur, System.nanoTime() - intervalNs)
      claimed = slot.compareAndSet(cur, mine + intervalNs)
    }
    val wait = mine - System.nanoTime()
    if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
  }
}
