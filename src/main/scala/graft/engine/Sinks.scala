package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Sinks (SURVEY §2.4 K1-K3 + parquet).
  *
  * The reference appends row-at-a-time from the driver loop
  * (/root/reference/output/output.go:82-173); here every sink is a
  * distributed `DataFrameWriter` job. Multiple sinks at once (reference
  * builder pattern, main.go:145-155) = calling several of these on the same
  * cached frame.
  */
object Sinks {

  /** K1 — stdout. */
  def stdout(df: DataFrame, numRows: Int = 20): Unit =
    df.show(numRows, truncate = false)

  /** K2 — CSV with header, one directory per query (reference writes one
    * file per query, output/output.go:104-121). */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** K3 — JDBC. The reference drops + recreates the table then inserts
    * row-at-a-time with string-quoted values (generate/sql.go:18-52,
    * db/db.go:97-111 — SQL-injectable; not copied). `SaveMode.Overwrite`
    * reproduces the drop-and-recreate contract with batched, parameterized
    * inserts.
    */
  def jdbc(
      df: DataFrame, url: String, table: String, props: java.util.Properties,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Multi-sink (reference builder chains sinks, main.go:145-155): the frame
    * is computed ONCE (cached) and each sink writes from the cached blocks —
    * not one recomputation per sink. */
  def multi(df: DataFrame, sinks: Seq[DataFrame => Unit]): Unit = {
    val cached = df.cache()
    try sinks.foreach(_(cached))
    finally cached.unpersist()
  }

  /** K4 — JSON lines (unimplemented roadmap item in the reference,
    * ROADMAP.md:71-73). */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Parquet — the testbed's primary sink. */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** R8 — demuxed multi-query sink: one sub-directory per query_name, the
    * Spark analogue of the reference's per-query output channels
    * (chainservice.go:85-152). Partition pruning makes per-query reads free.
    */
  def demuxParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy("query_name").parquet(path)

  /** R8 STREAMING — demuxed realtime sink: a compiled multi-query realtime
    * schema ([[Compiler.demux]] over the streaming frames) lands one
    * directory per query_name from ONE running query, checkpointed for
    * exactly-once file output — the reference's per-query channels
    * (chainservice.go:85-152) with restart semantics its realtime mode
    * lacks. `bounded = true` drains the currently-available data and stops
    * (Trigger.AvailableNow, the testbed harness); the default trigger runs
    * live. Returns the started query — callers own its lifecycle. */
  def demuxParquetStream(
      df: DataFrame,
      path: String,
      checkpoint: String,
      bounded: Boolean = false,
  ): StreamingQuery = demuxFileStream(df, path, checkpoint, bounded = bounded)

  /** [[demuxParquetStream]] for any Spark file-sink format — the realtime
    * `--csv` CLI flag routes here (the reference appends one csv per query
    * in realtime too, output/output.go:104-121). */
  def demuxFileStream(
      df: DataFrame,
      path: String,
      checkpoint: String,
      format: String = "parquet",
      bounded: Boolean = false,
  ): StreamingQuery = {
    require(df.isStreaming, "demuxFileStream needs a streaming frame; use demuxParquet")
    val w = df.writeStream
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("query_name")
      .outputMode("append")
    val w2 = if (format == "csv") w.option("header", "true") else w
    (if (bounded) w2.trigger(Trigger.AvailableNow()) else w2).start()
  }

  /** Streaming AGGREGATE → SQL table with per-group upsert semantics: the
    * realtime form of the DSL's aggregate block landing in a database. An
    * aggregated stream in update mode emits each group's CURRENT value when
    * it changes; an append-only DB sink (the reference's contract,
    * output/output.go:82-104) would accumulate stale versions of every
    * group. Here each micro-batch transactionally replaces exactly the
    * groups it contains (DELETE keyed rows + INSERT, one transaction per
    * batch) so the table always holds one current row per group — a live
    * dashboard reads it directly. Source progress is checkpointed; the
    * replace is idempotent per (group, value), so a replayed batch
    * converges to the same table. */
  def upsertJdbcStream(
      df: DataFrame,
      keyCols: Seq[String],
      url: String,
      table: String,
      props: java.util.Properties,
      checkpoint: String,
      bounded: Boolean = false,
  ): StreamingQuery = {
    require(df.isStreaming, "upsertJdbcStream needs a streaming frame; use Sinks.jdbc")
    require(keyCols.nonEmpty, "upsertJdbcStream needs at least one key column")
    // the per-batch collect() below is safe ONLY because update mode on an
    // aggregated stream emits |changed groups| rows per micro-batch — a
    // non-aggregated stream would collect whole batches into the driver, so
    // reject it loudly here instead of OOMing later. The aggregate must sit
    // on the STREAMING subtree (isStreaming) — an Aggregate on a joined
    // static side bounds nothing; streaming Deduplicate is equally bounded
    // (one row per new key) and allowed.
    require(df.queryExecution.analyzed.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate if a.isStreaming => a
      case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate if d.isStreaming => d
    }.isDefined,
      "upsertJdbcStream upserts CHANGED GROUPS of an aggregated stream; this frame has no " +
        "streaming aggregation, so micro-batches are unbounded row sets — use " +
        "demuxJdbcStream/jdbc instead")
    val missing = keyCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"upsertJdbcStream: key columns not in frame: $missing")
    val spark = df.sparkSession
    val qt = quotedTable(url, table) // loop-stamped names ("0-signups") quote
    // create the table ONCE, before the stream starts — not a per-batch
    // existence round-trip + empty write job on the hot path
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
      .write.mode(SaveMode.Append).jdbc(url, qt, props)
    val w = df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // update mode emits only CHANGED groups — a micro-batch is
        // |changed groups| rows, driver-side by construction
        val rows = batch.collect()
        if (rows.nonEmpty) {
          val conn = java.sql.DriverManager.getConnection(url, props)
          // Spark's JDBC writer created the columns QUOTED (exact case) —
          // our statements must address them the same way or the DB's
          // case-folding resolves a different identifier
          val quote = org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier _
          try upsertTxn(conn, batch.schema.fieldNames.toSeq, rows, keyCols, qt, quote)
          finally conn.close()
        }
      }
    (if (bounded) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** One batch = one transaction, with an EXPLICIT rollback on failure:
    * `close()` with an open transaction is driver-DEFINED behavior (some
    * engines roll back, some COMMIT), so relying on close alone could land
    * a failed batch PARTIALLY — half its groups replaced, half stale: the
    * exact torn state the single-transaction contract exists to prevent,
    * and invisible on engines (like Derby) that happen to roll back. The
    * rollback's own failure is suppressed into the original diagnostic. */
  private[graft] def upsertTxn(
      conn: java.sql.Connection,
      cols: Seq[String],
      rows: Array[org.apache.spark.sql.Row],
      keyCols: Seq[String],
      quotedTable: String,
      quote: String => String): Unit = {
    conn.setAutoCommit(false)
    try {
      upsertInto(conn, cols, rows, keyCols, quotedTable, quote)
      conn.commit()
    } catch {
      case t: Throwable =>
        try conn.rollback() catch { case c: Throwable => t.addSuppressed(c) }
        throw t
    }
  }

  /** Transactional replace of exactly the given groups: DELETE each row's
    * key then INSERT its current value, one commit for the whole batch.
    * NULL group keys (Spark's groupBy keeps NULL as a real group) need
    * `IS NULL` predicates — `k = NULL` never matches, which would leave one
    * stale row per batch — so deletes are prepared per null-mask. */
  private[graft] def upsertInto(
      conn: java.sql.Connection,
      cols: Seq[String],
      rows: Array[org.apache.spark.sql.Row],
      keyCols: Seq[String],
      quotedTable: String,
      quote: String => String): Unit = {
    val dels = scala.collection.mutable.Map.empty[Seq[Boolean], java.sql.PreparedStatement]
    def delFor(mask: Seq[Boolean]): java.sql.PreparedStatement =
      dels.getOrElseUpdate(mask, conn.prepareStatement(
        s"DELETE FROM $quotedTable WHERE " +
          keyCols.zip(mask).map { case (k, isNull) =>
            if (isNull) s"${quote(k)} IS NULL" else s"${quote(k)} = ?"
          }.mkString(" AND ")))
    val ins = conn.prepareStatement(
      s"INSERT INTO $quotedTable (${cols.map(quote).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})")
    try {
      rows.foreach { r =>
        val vals = keyCols.map(k => r.getAs[Any](k))
        val del = delFor(vals.map(_ == null))
        var p = 0
        vals.foreach { v => if (v != null) { p += 1; del.setObject(p, v) } }
        del.addBatch()
        cols.zipWithIndex.foreach { case (c, i) => ins.setObject(i + 1, r.getAs[Any](c)) }
        ins.addBatch()
      }
      dels.values.foreach(_.executeBatch())
      ins.executeBatch()
    } finally {
      dels.values.foreach(_.close())
      ins.close()
    }
  }

  /** Latency-sensitive stream output (ROADMAP.md:72-74: "Different stream
    * output option for latency-sensitive operations (like mempool
    * monitoring): i.e. Websocket, SSE"): every result row is pushed as a
    * Server-Sent-Events frame over a TCP connection as its micro-batch
    * completes — no file/table materialization on the hot path. One
    * connection per partition per epoch (the executors write directly; rows
    * never route through the driver).
    *
    * Delivery contract: AT-LEAST-ONCE. Source progress is checkpointed, so
    * a restarted query resumes from the last committed epoch; an epoch
    * whose sink write ran but whose commit didn't land is re-emitted on
    * restart, and a mid-epoch task retry re-emits that partition's frames.
    * Every frame therefore carries an `id: <epoch>-<partition>-<seq>` line
    * (the SSE last-event-id mechanism) — stable across re-emissions when
    * the per-partition row order is deterministic (true of the narrow
    * demux pipeline this serves; a shuffled upstream would need an explicit
    * sort), so consumers dedup/resume by id, the standard SSE story.
    * A consumer that is DOWN fails open() after 3 connect
    * attempts and kills the query (fail-loud: this sink exists to deliver
    * frames; silently dropping a partition via `open() = false` would be
    * data loss with no signal). Pair with the no-save-block raw passthrough
    * for the reference's "stream everything as-is" mode. */
  def sseStream(
      df: DataFrame,
      host: String,
      port: Int,
      checkpoint: String,
      bounded: Boolean = false,
  ): StreamingQuery = {
    require(df.isStreaming, "sseStream needs a streaming frame")
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val payload = df.select(to_json(struct(df.columns.map(col): _*)).as("payload"))
    val retries = 3 // connect attempts before the fail-loud IOException
    val writer = new org.apache.spark.sql.ForeachWriter[org.apache.spark.sql.Row] {
      @transient private var sock: java.net.Socket = _
      @transient private var out: java.io.Writer = _
      @transient private var idPrefix: String = _
      @transient private var seq: Long = _
      def open(partitionId: Long, epochId: Long): Boolean = {
        // ride out transient consumer restarts; a consumer still down after
        // the retries fails the query (see delivery contract above)
        var attempt = 0
        var last: Throwable = null
        while (sock == null && attempt < retries) {
          try sock = new java.net.Socket(host, port)
          catch {
            case e: java.io.IOException =>
              last = e; attempt += 1
              // back off only when another attempt remains — the final
              // failure should throw NOW, not after one more sleep
              if (attempt < retries) Thread.sleep(200L * attempt)
          }
        }
        if (sock == null) throw new java.io.IOException(
          s"sseStream: consumer $host:$port unreachable after $retries attempts", last)
        out = new java.io.OutputStreamWriter(sock.getOutputStream,
          java.nio.charset.StandardCharsets.UTF_8)
        idPrefix = s"$epochId-$partitionId-"
        seq = 0L
        true
      }
      def process(r: org.apache.spark.sql.Row): Unit = {
        out.write("id: " + idPrefix + seq + "\ndata: " + r.getString(0) + "\n\n")
        seq += 1
        out.flush() // latency sink: the frame leaves NOW, not at buffer fill
      }
      def close(errorOrNull: Throwable): Unit =
        if (sock != null)
          try { if (out != null) out.flush() } finally sock.close()
    }
    val w = payload.writeStream.option("checkpointLocation", checkpoint).foreach(writer)
    (if (bounded) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** R8 STREAMING → per-query SQL TABLES: the reference's DB output creates
    * one table per query and appends each result row as it arrives — in
    * realtime mode too (output/output.go:82-104: `HandleResult(name, …)` +
    * `CreateTable` on first write, keyed by query name). Streaming form:
    * a checkpointed `foreachBatch` splits each micro-batch by query_name
    * and appends to that query's table. Source progress is exactly-once
    * via the checkpoint; the JDBC appends themselves are at-least-once on
    * a mid-batch crash (add a batch-id column and dedup downstream for
    * exactly-once into SQL) — the reference has no restart story at all.
    * The per-batch name list is tiny (≤ #queries), so the driver-side
    * routing loop is not a data path. */
  /** Query names as JDBC table names: loop-expanded names ("0-signups")
    * are not bare SQL identifiers — quote those per the target's dialect
    * or CREATE TABLE parses the dash. Bare identifiers stay unquoted
    * (quoting flips them to case-sensitive resolution, breaking plain
    * reads). Shared by the streaming demux and the CLI's batch --db path
    * so the rule cannot drift. */
  def quotedTable(url: String, name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*")) name
    else org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(name)

  def demuxJdbcStream(
      df: DataFrame,
      url: String,
      props: java.util.Properties,
      checkpoint: String,
      bounded: Boolean = false,
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    require(df.isStreaming, "demuxJdbcStream needs a streaming frame; use Sinks.jdbc")
    import org.apache.spark.sql.functions.col
    val w = df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.cache()
        try {
          val names = cached.select("query_name").distinct()
            .collect().map(_.getString(0)).sorted
          names.foreach { n =>
            cached.where(col("query_name") === n).drop("query_name")
              .write.mode(SaveMode.Append).jdbc(url, quotedTable(url, n), props)
          }
        } finally cached.unpersist()
      }
    (if (bounded) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
