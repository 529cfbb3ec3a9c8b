package graft.engine

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import graft.sources.JsonRpcClient

/** The WIRE method-caller seam (SURVEY §2.1 S5/S7 live path): executes the
  * reference's per-(block, contract) `eth_call` loop
  * (/root/reference/chainservice/methods.go:21-146 RunMethodCaller →
  * callMethod, via the caching CallContract cached_client.go:72-91) as a
  * distributed map over a grid frame.
  *
  * The testbed's oracle queries keep answering method grids from the state
  * parquet (the as-of join, [[graft.engine.Enrich]]); this seam is what a
  * live deployment swaps in — every value comes off a real JSON-RPC
  * transport ([[JsonRpcClient]]), driven end-to-end in specs against the
  * loopback replay server.
  *
  * Scale shape: one `mapPartitions` over the grid — each executor drives
  * its partitions' calls through ONE process-shared client, so the
  * reference's LRU policy holds per worker process (immutable
  * decimals()/symbol() answers hit the wire once per contract per
  * executor, per-block state calls key on (to, data, block)); the
  * rate gate is process-global per endpoint, exactly the reference's
  * per-worker budget. No collect, no driver loop — the reference's
  * synchronous goroutine fan-out (methods.go:34-70) becomes Spark tasks.
  */
object MethodCaller {

  /** Declared wire method: output column name, ABI-packed calldata
    * (selector + args — BuildCallMsg, reference generate/generate.go),
    * and the output shape to unpack ("uint" → DECIMAL(38,0), "string"). */
  final case class WireMethod(name: String, calldata: String, ret: String = "uint") {
    require(ret == "uint" || ret == "string", s"method $name: unsupported return shape $ret")
  }

  // one cached client per (endpoint, rate) per executor PROCESS — the
  // reference's CachedClient lifetime (one per worker, shared across its
  // goroutines); partition readers on the same executor share the LRU.
  // The cache itself lives in JsonRpcClient.sharedClient so the log
  // connector's readers resolve through the SAME map (round-12 advice).
  private[graft] def clientFor(endpoint: String, ratePerSec: Double): JsonRpcClient =
    JsonRpcClient.sharedClient(endpoint, ratePerSec)

  /** Calls every declared method for each (blocknumber, address) grid row
    * at block `blocknumber + blockOffset` (the reference applies
    * method.BlockOffset the same way, events.go:93-105), appending the
    * header `timestamp` (methods.go:123-131 attaches it per row) and one
    * typed column per method. All grid columns pass through. */
  def callGrid(
      grid: DataFrame,
      endpoint: String,
      methods: Seq[WireMethod],
      ratePerSec: Double = 0.0,
      blockOffset: Long = 0L): DataFrame = {
    val inSchema = grid.schema
    val bIdx = inSchema.fieldIndex("blocknumber")
    val aIdx = inSchema.fieldIndex("address")
    val outSchema = StructType(inSchema.fields ++
      (StructField("timestamp", LongType, nullable = false) +:
        methods.map(m => StructField(m.name,
          if (m.ret == "uint") DecimalType(38, 0) else StringType, nullable = false))))
    val ms = methods.toIndexedSeq // stable, serializable closure capture
    grid.mapPartitions { rows =>
      val client = clientFor(endpoint, ratePerSec)
      rows.map { r =>
        val block = r.getLong(bIdx) + blockOffset
        val addr = r.getLong(aIdx)
        val ts = client.blockTimestamp(block)
        val vals: Seq[Any] = ms.map { m =>
          if (m.ret == "uint")
            new java.math.BigDecimal(client.ethCallUint(addr, m.calldata, Some(block)).bigInteger)
          else client.ethCallString(addr, m.calldata, Some(block))
        }
        Row.fromSeq(r.toSeq ++ (ts +: vals))
      }
    }(Encoders.row(outSchema))
  }

  /** One S6 poll tick over the wire: pins the node's CURRENT head
    * (`eth_blockNumber`), fans out to the declared contracts, and calls
    * every method at that pinned block — one tick, one consistent
    * snapshot (the reference's ticker loop chainservice.go:173-179 +
    * RunMethodCaller at `blockNumber = nil`, methods.go:29-31; pinning
    * beats literal per-row "latest", which could straddle a head
    * advance mid-tick). The realtime poller is this in `foreachBatch`,
    * one call per rate-source tick. */
  def pollOnce(
      spark: org.apache.spark.sql.SparkSession,
      endpoint: String,
      addresses: Seq[Long],
      methods: Seq[WireMethod],
      ratePerSec: Double = 0.0): DataFrame = {
    val head = clientFor(endpoint, ratePerSec).blockNumber()
    val grid = spark.createDataFrame(addresses.map(a => (head, a)))
      .toDF("blocknumber", "address")
    callGrid(grid, endpoint, methods, ratePerSec)
  }
}
