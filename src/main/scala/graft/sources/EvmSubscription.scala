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
  *    for latency-first consumers. This channel is explicitly
  *    AT-MOST-ONCE and BOUNDED:
  *      - the buffer holds at most `pushCapacity` rows; a burst against a
  *        slow consumer drops the OLDEST rows and counts them in
  *        [[overflowDropped]] (the reference's Go channel gives it
  *        backpressure for free, events.go:221-320 — a JDK listener has
  *        no one to block, so the bound + counter make the loss explicit
  *        instead of growing the driver heap without bound);
  *      - a reconnect can re-deliver the boundary block's rows (the node
  *        replays the tip after a resubscribe); a (blockNumber, txHash)
  *        high-water filter drops the duplicates, counted in
  *        [[duplicatesDropped]] — so the channel never double-delivers,
  *        it only ever misses (at-most-once, stated not implied).
  *
  * Transport: `java.net.http.WebSocket` (the JDK client), text frames of
  * JSON-RPC. The zero-egress gate drives this against a loopback
  * websocket replay fixture; a live deployment points `endpoint` at a
  * node's `ws://` port. */
final class EvmSubscription(
    endpoint: String,
    addresses: Option[Set[Long]] = None,
    topic: Option[String] = None,
    subscribeLogs: Boolean = false,
    pushCapacity: Int = 1 << 16) extends AutoCloseable {

  // max-accumulated, never read-modify-write on a volatile: during a
  // reconnect handover a stale in-flight frame on the OLD socket could
  // interleave its `if (n > head) head = n` with the new listener's and
  // transiently REGRESS the watermark (a one-trigger availability stall,
  // not a correctness fault — offsets never consume a regressed read —
  // but monotonic is the contract the name promises)
  private val headWatermark = new java.util.concurrent.atomic.AtomicLong(-1L)
  def head: Long = headWatermark.get()
  val pushedLogs =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String, Long, String, Double)]()
  val notifications = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Rows dropped oldest-first because the bounded buffer was full. */
  val overflowDropped = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Rows dropped as reconnect re-deliveries (high-water filter). */
  val duplicatesDropped = new java.util.concurrent.atomic.AtomicLong(0L)

  private val ids = new java.util.concurrent.atomic.AtomicLong(0L)
  // subscription id -> channel, filled as the node confirms each subscribe
  private val subs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val pendingSub = new java.util.concurrent.ConcurrentHashMap[Long, String]()

  // push-channel state, all mutated under `pushLock` (one listener thread
  // per socket, but a reconnect swaps sockets — the monitor keeps the
  // size/high-water bookkeeping exact through the handover)
  private val pushLock = new Object
  private var pushedSize = 0
  private var hwBlock = Long.MinValue
  private val hwTxs = scala.collection.mutable.Set.empty[String]

  private def pushLog(row: (Long, String, String, Long, String, Double)): Unit =
    pushLock.synchronized {
      val (bn, _, tx, _, _, _) = row
      // (blockNumber, txHash) high-water: anything at or below the mark is
      // a re-delivery (a reconnect replaying the boundary block) — drop it
      if (bn < hwBlock || (bn == hwBlock && hwTxs.contains(tx))) {
        duplicatesDropped.incrementAndGet(): Unit
      } else {
        if (bn > hwBlock) { hwBlock = bn; hwTxs.clear() }
        hwTxs += tx
        pushedLogs.add(row)
        pushedSize += 1
        if (pushedSize > pushCapacity) {
          pushedLogs.poll()
          pushedSize -= 1
          overflowDropped.incrementAndGet(): Unit
        }
      }
    }

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
            headWatermark.getAndAccumulate(n, (a, b) => math.max(a, b)): Unit
          case "logs" =>
            val topics = result \ "topics" match {
              case JArray(ts) => ts.collect { case JString(s) => s }
              case _ => Nil
            }
            pushLog((
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
  @volatile private var terminallyFailed = false
  @volatile private var ws: java.net.http.WebSocket = _

  /** True once the reconnect budget is exhausted — the FAILURE SIGNAL a
    * consumer must see instead of a silently frozen [[head]]: the
    * micro-batch source switches its availability watermark to polling
    * the http endpoint when this flips (round-12 advice). */
  def isFailed: Boolean = terminallyFailed

  // one reconnect loop at a time: onClose and onError can BOTH fire for a
  // single socket failure — without the gate they'd race two concurrent
  // reconnect threads into duplicate sockets and duplicate subscriptions
  // (round-12 advice)
  private val reconnecting = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** A node dropping the socket must not freeze the head silently (the
    * availability watermark would stall the whole streaming query with no
    * failure signal): onClose/onError RECONNECT with bounded backoff and
    * re-issue every subscription — the reference's subscription loop gets
    * this from ethclient's resubscribe machinery; here it is explicit.
    * Already-pushed state (head watermark, queued logs) survives; what a
    * dead socket missed is missed (at-most-once on the push channel — the
    * offset-driven consumer re-fetches rows by range, so IT loses
    * nothing). Retry exhaustion sets [[isFailed]] instead of giving up
    * silently. */
  private def reconnectLater(): Unit = {
    if (closed || terminallyFailed) return
    if (!reconnecting.compareAndSet(false, true)) return
    val t = new Thread(() => {
      try {
        var attempt = 0
        var done = false
        while (!done && !closed && attempt < 8) {
          try { Thread.sleep(50L << math.min(attempt, 5)); connect(); done = true }
          catch { case _: Throwable => attempt += 1 }
        }
        if (done) reconnects.incrementAndGet(): Unit
        else if (!closed) terminallyFailed = true
      } finally reconnecting.set(false)
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

  // ONE HttpClient for the subscription's lifetime: each instance owns a
  // selector thread that lives until the client is collected, so building
  // a fresh one per (re)connect let a flapping node accumulate threads
  // for as long as dead sockets stayed reachable
  private val httpClient = java.net.http.HttpClient.newHttpClient()

  private def connect(): Unit = {
    ws = httpClient.newWebSocketBuilder()
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
    * the server to have registered them first. Returns false early if the
    * subscription terminally failed while waiting. */
  def awaitSubscribed(timeoutMs: Long = 5000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!pendingSub.isEmpty && !terminallyFailed && System.nanoTime() < deadline)
      Thread.sleep(5L)
    pendingSub.isEmpty && !terminallyFailed
  }

  override def close(): Unit = {
    closed = true
    try ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done")
      .join(): Unit
    catch { case _: Throwable => () }
    ws.abort()
  }
}
