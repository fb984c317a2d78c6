package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** CloudEvent delivery stage — the reference's K1/K2 HTTP sink re-expressed
  * Spark-natively (pkg/adapter/adapter.go:140-156 batch SendEvents,
  * adapter.go:212-218 stream SendEventsStream).
  *
  * Shape: events serialize to their JSON envelope in the plan (codegen'd
  * to_json Project), then `foreachPartition` drives a pluggable transport —
  * one transport instance per partition (≙ one HTTP connection per task,
  * where the Go code POSTs per event on one goroutine: batching by
  * partition is the scale fix for the reference's main perf flaw, SURVEY
  * §4). Per-event failures are isolated and COUNTED, never thrown — the
  * multierror accumulation + IsACK sent-count of adapter.go:146-151 (F4)
  * becomes a pair of Spark accumulators (C4), readable on the driver after
  * the job. Delivery is at-least-once; the receiving side is idempotent
  * (MERGE semantics, §2.5), matching the reference's contract.
  */
object CloudEventSink {

  /** One delivery channel. `open` is called once per partition per batch
    * (connection setup) with the (batchId, partitionId) identity of the
    * delivery attempt — an idempotent transport keys its effect on that
    * pair, so an at-least-once redelivery REPLACES the previous attempt
    * instead of duplicating it; `send` returns the ACK (F4); `close`
    * flushes. */
  trait EventTransport extends Serializable {
    /** Driver-side hook, called once per delivery attempt BEFORE any
      * partition task runs: an idempotent transport clears leftovers of a
      * previous attempt of the SAME delivery here (a redelivery that plans
      * fewer partitions must not leave the old attempt's extra part files
      * behind). */
    def beginDelivery(deliveryId: Long): Unit = ()
    def open(partitionId: Int, batchId: Long): Unit = ()
    def send(eventJson: String): Boolean
    def close(): Unit = ()
  }

  /** Offline stand-in for the HTTP POST: NDJSON in one file per
    * (delivery, partition) (K_SINK ≙ a directory). The final file name is
    * DETERMINISTIC per (deliveryId, partitionId), so a redelivery of the
    * same delivery replaces its previous attempt — delivery-side
    * idempotency to match the receiver's MERGE idempotency (the reference
    * leans on Neo4j MERGE alone; an at-least-once retry there duplicates
    * in-flight sends and relies on the receiver to collapse them).
    *
    * Two robustness rules (a file-commit protocol in miniature, the same
    * shape Spark's own FileCommitProtocol uses):
    *  - each ATTEMPT writes a unique temp file and atomically renames it
    *    to the final name on close — two concurrent attempts of one
    *    partition (speculation, zombie task during retry) can never
    *    interleave bytes; last rename wins whole;
    *  - `beginDelivery` (driver-side, before tasks launch) deletes the
    *    delivery's previous part files, so a redelivered batch that plans
    *    FEWER partitions leaves no stale parts from the wider attempt. */
  class NdjsonDirTransport(dir: String) extends EventTransport {
    @transient private var out: java.io.BufferedWriter = _
    @transient private var tmp: java.nio.file.Path = _
    @transient private var dst: java.nio.file.Path = _
    override def beginDelivery(deliveryId: Long): Unit = {
      val d = Paths.get(dir)
      if (Files.isDirectory(d)) {
        val prefix = f"part-b$deliveryId%05d-"
        val it = Files.list(d)
        try it.iterator().forEachRemaining { p =>
          val n = p.getFileName.toString
          // also sweep temp files a crashed attempt left behind (".<part>.…tmp")
          if (n.startsWith(prefix) || n.startsWith(s".$prefix")) Files.deleteIfExists(p)
        } finally it.close()
      }
    }
    override def open(partitionId: Int, batchId: Long): Unit = {
      Files.createDirectories(Paths.get(dir))
      dst = Paths.get(dir, f"part-b$batchId%05d-p$partitionId%05d.ndjson")
      tmp = Files.createTempFile(Paths.get(dir), s".${dst.getFileName}.", ".tmp")
      out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    override def send(eventJson: String): Boolean = { out.write(eventJson); out.write("\n"); true }
    override def close(): Unit = if (out != null) {
      out.close()
      try Files.move(tmp, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING) }
    }
  }

  /** Delivery outcome — `sent` is the ACK count the reference returns from
    * SendEvents; `failed` is the multierror cardinality. */
  case class Delivery(sent: Long, failed: Long)

  /** Serialize every column into the CE JSON envelope once, in the plan. */
  private def toEnvelope(ce: DataFrame): DataFrame =
    ce.select(to_json(struct(ce.columns.map(col).toIndexedSeq: _*)).as("event_json"))

  /** K1 — batch delivery with per-event error isolation. A transport
    * failure marks the event failed and moves on; the job never dies for
    * one bad event (C4). `deliveryId` identifies the LOGICAL batch for
    * transport idempotency — a rerun with the SAME id replaces its
    * previous attempt; distinct deliveries (successive poll cycles,
    * main.go:118-150) MUST carry distinct ids or they overwrite each
    * other, which is why there is no default: the caller owns the cycle
    * counter. */
  def deliver(ce: DataFrame, transport: EventTransport,
              deliveryId: Long): Delivery = {
    val sc = ce.sparkSession.sparkContext
    val sent = sc.longAccumulator("ce_sent")
    val failed = sc.longAccumulator("ce_failed")
    transport.beginDelivery(deliveryId)
    toEnvelope(ce).foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      transport.open(pid, deliveryId)
      try rows.foreach { r =>
        try { if (transport.send(r.getString(0))) sent.add(1) else failed.add(1) }
        catch { case scala.util.control.NonFatal(_) => failed.add(1) }
      } finally transport.close()
    }
    Delivery(sent.value, failed.value)
  }

  /** Handle on a running streaming delivery: the query plus live access to
    * the F4/C4 accounting (accumulators keep counting across batches; read
    * `delivery` after `query.awaitTermination()` for the final tally). */
  case class StreamingDelivery(query: StreamingQuery,
                               private val sentAcc: org.apache.spark.util.LongAccumulator,
                               private val failedAcc: org.apache.spark.util.LongAccumulator) {
    def delivery: Delivery = Delivery(sentAcc.value, failedAcc.value)
  }

  /** K2 — streaming delivery: same per-partition transport + accounting
    * inside foreachBatch (at-least-once; idempotent receiver). Returns the
    * started query WITH its accounting handle. */
  def deliverStream(ce: DataFrame, transport: EventTransport,
                    checkpoint: String): StreamingDelivery = {
    val sc = ce.sparkSession.sparkContext
    val sent = sc.longAccumulator("ce_sent_stream")
    val failed = sc.longAccumulator("ce_failed_stream")
    val w: DataStreamWriter[Row] = toEnvelope(ce).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        transport.beginDelivery(batchId) // foreachBatch body runs driver-side
        batch.foreachPartition { (rows: Iterator[Row]) =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          transport.open(pid, batchId)
          try rows.foreach { r =>
            try { if (transport.send(r.getString(0))) sent.add(1) else failed.add(1) }
            catch { case scala.util.control.NonFatal(_) => failed.add(1) }
          } finally transport.close()
        }
      }
    StreamingDelivery(w.start(), sent, failed)
  }

  /** K4 — console/debug sink (the event_display of the reference deploy). */
  def debug(ce: DataFrame, rows: Int = 10): Unit =
    ce.show(rows, truncate = false)
}
