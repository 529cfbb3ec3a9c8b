package graft

/** Shared SSE consumer for sink tests: a local TCP server accepting every
  * executor connection and collecting `data: ` frame payloads. One place to
  * change if the SSE framing ever grows (event:/id: lines). */
final class SseTestServer {
  val server = new java.net.ServerSocket(0)
  val received: java.util.List[String] =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  /** `id:` line accompanying each data frame (same order as [[received]];
    * "" when a frame carried no id) — the consumer-side dedup key. */
  val ids: java.util.List[String] =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  @volatile private var accepting = true

  private val acceptor = new Thread(() => {
    while (accepting) {
      try {
        val s = server.accept()
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(
          s.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        var line = r.readLine()
        var lastId = ""
        while (line != null) {
          if (line.startsWith("id: ")) lastId = line.drop(4)
          else if (line.startsWith("data: ")) { received.add(line.drop(6)); ids.add(lastId); lastId = "" }
          line = r.readLine()
        }
        s.close()
      } catch { case _: java.net.SocketException => /* server closed */ }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def port: Int = server.getLocalPort

  /** Wait until `n` frames arrived (frames drain asynchronously after the
    * streaming query terminates) or the deadline passes. */
  def awaitFrames(n: Long, timeoutMs: Long = 15000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (received.size() < n && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
  }

  def stop(): Unit = { accepting = false; server.close() }
}
