package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

/** PUSH subscription over websocket — the reference's realtime transport
  * (`eth_subscribe`, /root/reference/chainservice/events.go:253-268 and
  * cached_client.go:113-117 SubscribeFilterLogs): the node pushes
  * `eth_subscription` notifications instead of the client polling.
  *
  * Two channels, both the reference subscribes to:
  *  - `newHeads`: each pushed header advances [[head]] — the
  *    micro-batch source consumes this as its PUSH-DRIVEN OFFSET signal
  *    (no `eth_blockNumber` polling), while row FETCH stays the
  *    replayable ranged `eth_getLogs`, preserving the exactly-once
  *    offset-replay contract the reference's forward-only websocket loop
  *    lacks (events.go:221-320 just forwards; a dropped row is gone);
  *  - `logs` (+ address/topic filter): each matching log row is pushed
  *    whole into [[pushedLogs]] — the reference's direct mode, exposed
  *    for latency-first consumers that accept at-most-once on reconnect.
  *
  * Transport: `java.net.http.WebSocket` (the JDK client), text frames of
  * JSON-RPC. The zero-egress gate drives this against a loopback
  * websocket replay fixture; a live deployment points `endpoint` at a
  * node's `ws://` port. */
final class EvmSubscription(
    endpoint: String,
    addresses: Option[Set[Long]] = None,
    topic: Option[String] = None,
    subscribeLogs: Boolean = false) extends AutoCloseable {

  @volatile var head: Long = -1L
  val pushedLogs =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String, Long, String, Double)]()
  val notifications = new java.util.concurrent.atomic.AtomicLong(0L)

  private val ids = new java.util.concurrent.atomic.AtomicLong(0L)
  // subscription id -> channel, filled as the node confirms each subscribe
  private val subs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val pendingSub = new java.util.concurrent.ConcurrentHashMap[Long, String]()

  private def handle(text: String): Unit = {
    val j = JsonMethods.parse(text)
    j \ "method" match {
      case JString("eth_subscription") =>
        notifications.incrementAndGet()
        val subId = j \ "params" \ "subscription" match {
          case JString(s) => s
          case _ => ""
        }
        val result = j \ "params" \ "result"
        subs.getOrDefault(subId, "") match {
          case "newHeads" =>
            val n = JsonRpcClient.hexToLong(result \ "number")
            if (n > head) head = n
          case "logs" =>
            val topics = result \ "topics" match {
              case JArray(ts) => ts.collect { case JString(s) => s }
              case _ => Nil
            }
            pushedLogs.add((
              JsonRpcClient.hexToLong(result \ "blockNumber"),
              JsonRpcClient.str(result \ "blockHash"),
              JsonRpcClient.str(result \ "transactionHash"),
              JsonRpcClient.hexToBigInt(result \ "address").longValue,
              topics.headOption.getOrElse(""),
              JsonRpcClient.hexToBigInt(result \ "data").longValue / 100.0))
          case _ => ()
        }
      case _ =>
        // a subscribe confirmation: {"id": n, "result": "0x..."}
        (j \ "id", j \ "result") match {
          case (JInt(id), JString(subId)) =>
            Option(pendingSub.remove(id.toLong)).foreach(ch => subs.put(subId, ch))
          case (JLong(id), JString(subId)) =>
            Option(pendingSub.remove(id)).foreach(ch => subs.put(subId, ch))
          case _ => ()
        }
    }
  }

  /** Completed reconnect count — a spec/monitoring counter; the HEAD
    * watermark is what consumers rely on, this says how it stayed alive. */
  val reconnects = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var closed = false
  @volatile private var ws: java.net.http.WebSocket = _

  /** A node dropping the socket must not freeze the head silently (the
    * availability watermark would stall the whole streaming query with no
    * failure signal): onClose/onError RECONNECT with bounded backoff and
    * re-issue every subscription — the reference's subscription loop gets
    * this from ethclient's resubscribe machinery; here it is explicit.
    * Already-pushed state (head watermark, queued logs) survives; what a
    * dead socket missed is missed (at-most-once on the push channel — the
    * offset-driven consumer re-fetches rows by range, so IT loses
    * nothing). */
  private def reconnectLater(): Unit = {
    if (closed) return
    val t = new Thread(() => {
      var attempt = 0
      var done = false
      while (!done && !closed && attempt < 8) {
        try { Thread.sleep(50L << math.min(attempt, 5)); connect(); done = true }
        catch { case _: Throwable => attempt += 1 }
      }
      if (done) reconnects.incrementAndGet(): Unit
    }, "evm-subscription-reconnect")
    t.setDaemon(true)
    t.start()
  }

  private def newListener() = new java.net.http.WebSocket.Listener {
    private val buf = new StringBuilder
    override def onText(sock: java.net.http.WebSocket,
        data: CharSequence, last: Boolean): java.util.concurrent.CompletionStage[_] = {
      buf.append(data)
      if (last) { val t = buf.toString(); buf.setLength(0); handle(t) }
      sock.request(1)
      null
    }
    override def onClose(sock: java.net.http.WebSocket,
        statusCode: Int, reason: String): java.util.concurrent.CompletionStage[_] = {
      reconnectLater(); null
    }
    override def onError(sock: java.net.http.WebSocket, error: Throwable): Unit =
      reconnectLater()
  }

  private def subscribe(channel: String, params: List[JValue]): Unit = {
    val id = ids.incrementAndGet()
    pendingSub.put(id, channel)
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "jsonrpc" -> JString("2.0"), "id" -> JLong(id),
      "method" -> JString("eth_subscribe"),
      "params" -> JArray(JString(channel) :: params))))
    ws.sendText(body, true).join()
  }

  private def connect(): Unit = {
    ws = java.net.http.HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(java.net.URI.create(endpoint), newListener())
      .join()
    subscribe("newHeads", Nil)
    if (subscribeLogs) {
      val filter = JObject(
        addresses.map(as => "address" ->
          (JArray(as.toList.sorted.map(a => JString(JsonRpcClient.hex(a)))): JValue)).toList ++
        topic.map(t => "topics" -> (JArray(List(JString(t))): JValue)).toList)
      subscribe("logs", List(filter))
    }
  }

  connect()

  /** Blocks until the node has confirmed every requested subscription (or
    * the timeout lapses) — callers that immediately assert on pushes need
    * the server to have registered them first. */
  def awaitSubscribed(timeoutMs: Long = 5000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!pendingSub.isEmpty && System.nanoTime() < deadline) Thread.sleep(5L)
    pendingSub.isEmpty
  }

  override def close(): Unit = {
    closed = true
    try ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done")
      .join(): Unit
    catch { case _: Throwable => () }
    ws.abort()
  }
}
