package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Loopback WEBSOCKET replay server (test fixture): the `eth_subscribe`
  * side of [[JsonRpcReplayServer]] — a minimal RFC 6455 endpoint speaking
  * JSON-RPC text frames, so the connector's PUSH transport
  * ([[graft.sources.EvmSubscription]]) executes over a real websocket in
  * the zero-egress sandbox. Serves the same deterministic chain as the
  * HTTP fixture: `advanceTip(to)` pushes one `newHeads` notification per
  * new block to every newHeads subscriber, and each block's
  * [[graft.sources.EvmLogs.fetchBlockLogs]] rows (filtered by the
  * subscription's address/topic filter) to every logs subscriber — the
  * node side of the reference's subscription mode (events.go:253-320). */
final class WsReplayServer(tip0: Long = -1L) {

  val subscribeRequests = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var tip = tip0

  private val server =
    new java.net.ServerSocket(0, 16, java.net.InetAddress.getByName("127.0.0.1"))
  def url: String = s"ws://127.0.0.1:${server.getLocalPort}/"

  private def hex(v: Long): String = "0x" + java.lang.Long.toHexString(v)

  private final class Conn(sock: java.net.Socket) {
    private val in = new java.io.BufferedInputStream(sock.getInputStream)
    private val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    // channel -> (subscription id, address filter, topic filter)
    @volatile var newHeadsSub: Option[String] = None
    @volatile var logsSub: Option[(String, Option[Set[Long]], Option[String])] = None
    private val subIds = new java.util.concurrent.atomic.AtomicInteger(0xa0)

    def handshake(): Boolean = {
      val req = new StringBuilder
      var prev = 0
      while (!req.endsWith("\r\n\r\n")) {
        val c = in.read()
        if (c < 0) return false
        req.append(c.toChar); prev = c
      }
      val key = req.toString.linesIterator
        .find(_.toLowerCase.startsWith("sec-websocket-key:"))
        .map(_.split(":", 2)(1).trim)
        .getOrElse(return false)
      val accept = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
        s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.flush()
      true
    }

    /** Reads one client frame: (opcode, payload). Client frames are masked
      * per RFC 6455 §5.1. Returns opcode -1 on EOF. */
    private def readFrame(): (Int, Array[Byte]) = {
      val b0 = in.read(); if (b0 < 0) return (-1, Array.empty)
      val opcode = b0 & 0x0f
      val b1 = in.read(); if (b1 < 0) return (-1, Array.empty)
      var len: Long = b1 & 0x7f
      if (len == 126) len = (in.read() << 8 | in.read()).toLong
      else if (len == 127) {
        len = 0L
        for (_ <- 0 until 8) len = (len << 8) | in.read()
      }
      val masked = (b1 & 0x80) != 0
      val mask = if (masked) Array.fill(4)(in.read().toByte) else Array.empty[Byte]
      val payload = new Array[Byte](len.toInt)
      var off = 0
      while (off < len) {
        val n = in.read(payload, off, len.toInt - off)
        if (n < 0) return (-1, Array.empty)
        off += n
      }
      if (masked) payload.indices.foreach(i => payload(i) = (payload(i) ^ mask(i & 3)).toByte)
      (opcode, payload)
    }

    /** Writes one unmasked server frame. */
    def writeFrame(opcode: Int, payload: Array[Byte]): Unit = synchronized {
      out.write(0x80 | opcode)
      if (payload.length < 126) out.write(payload.length)
      else { out.write(126); out.write(payload.length >> 8); out.write(payload.length & 0xff) }
      out.write(payload)
      out.flush()
    }

    def sendText(s: String): Unit =
      writeFrame(0x1, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    def sendNotification(subId: String, result: JValue): Unit =
      sendText(JsonMethods.compact(JsonMethods.render(JObject(
        "jsonrpc" -> JString("2.0"),
        "method" -> JString("eth_subscription"),
        "params" -> JObject("subscription" -> JString(subId), "result" -> result)))))

    /** Abrupt server-side drop (fault injection for the reconnect spec). */
    def kill(): Unit = {
      try sock.close() catch { case _: Throwable => () }
    }

    def loop(): Unit = try {
      var open = true
      while (open) {
        val (opcode, payload) = readFrame()
        opcode match {
          case -1 | 0x8 => // EOF / close: echo close, drop
            if (opcode == 0x8) writeFrame(0x8, payload)
            open = false
          case 0x9 => writeFrame(0xa, payload) // ping -> pong
          case 0x1 =>
            val req = JsonMethods.parse(
              new String(payload, java.nio.charset.StandardCharsets.UTF_8))
            val id = req \ "id"
            req \ "method" match {
              case JString("eth_subscribe") =>
                val subId = hex(subIds.incrementAndGet().toLong)
                req \ "params" match {
                  case JArray(JString("newHeads") :: _) => newHeadsSub = Some(subId)
                  case JArray(JString("logs") :: rest) =>
                    val filter = rest.headOption.getOrElse(JNothing)
                    val addrs = filter \ "address" match {
                      case JArray(as) => Some(as.collect {
                        case JString(s) => java.lang.Long.parseUnsignedLong(s.stripPrefix("0x"), 16)
                      }.toSet)
                      case _ => None
                    }
                    val topic = filter \ "topics" match {
                      case JArray(JString(t) :: _) => Some(t)
                      case _ => None
                    }
                    logsSub = Some((subId, addrs, topic))
                  case _ => ()
                }
                // counter AFTER the registration writes: a spec that waits
                // on it may advance the tip the moment it flips
                subscribeRequests.incrementAndGet()
                sendText(JsonMethods.compact(JsonMethods.render(JObject(
                  "jsonrpc" -> JString("2.0"), "id" -> id, "result" -> JString(subId)))))
              case _ =>
                sendText(JsonMethods.compact(JsonMethods.render(JObject(
                  "jsonrpc" -> JString("2.0"), "id" -> id,
                  "error" -> JObject("code" -> JLong(-32601L),
                    "message" -> JString("method not found"))))))
            }
          case _ => () // ignore binary/continuation — not in this protocol
        }
      }
    } catch {
      case _: Throwable => () // abrupt drop (kill()/client abort): fall through
    } finally {
      conns.remove(this)
      try sock.close() catch { case _: Throwable => () }
    }
  }

  private val conns = java.util.concurrent.ConcurrentHashMap.newKeySet[Conn]()

  private val acceptor = new Thread(() => {
    try while (true) {
      val sock = server.accept()
      val conn = new Conn(sock)
      conns.add(conn)
      val t = new Thread(() => if (conn.handshake()) conn.loop(), "ws-replay-conn")
      t.setDaemon(true)
      t.start()
    } catch { case _: Throwable => () } // socket closed on stop()
  }, "ws-replay-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def pushBlockLogs(c: Conn, b: Long): Unit =
    c.logsSub.foreach { case (subId, addrs, topic) =>
      graft.sources.EvmLogs.fetchBlockLogs(b)
        .filter { case (_, _, _, addr, top, _) =>
          addrs.forall(_.contains(addr)) && topic.forall(_ == top)
        }
        .foreach { case (bn, bh, th, addr, top, value) =>
          c.sendNotification(subId, JObject(
            "blockNumber" -> JString(hex(bn)),
            "blockHash" -> JString(bh),
            "transactionHash" -> JString(th),
            "address" -> JString(hex(addr)),
            "topics" -> JArray(List(JString(top))),
            "data" -> JString(hex(math.round(value * 100)))))
        }
    }

  /** Advances the chain head, PUSHING per-block notifications to every
    * subscriber: one newHeads header per block, and each block's matching
    * log rows to logs subscribers. */
  def advanceTip(to: Long): Unit = {
    while (tip < to) {
      tip += 1
      val b = tip
      conns.forEach { c =>
        pushBlockLogs(c, b)
        c.newHeadsSub.foreach(subId =>
          c.sendNotification(subId, JObject("number" -> JString(hex(b)))))
      }
    }
  }

  /** RE-pushes one block's matching log rows to every logs subscriber —
    * the boundary double-delivery a node produces after a reconnect (it
    * replays the tip block to the fresh subscription). The client's
    * high-water filter must drop these. */
  def repushBlock(b: Long): Unit = conns.forEach(pushBlockLogs(_, b))

  /** Drops every live connection abruptly (no close frame) — the node
    * restart / LB idle-kill case the client must reconnect through. */
  def dropConnections(): Unit = conns.forEach(_.kill())

  def stop(): Unit = {
    try server.close() catch { case _: Throwable => () }
  }
}
