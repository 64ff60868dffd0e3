package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming observability (the reference's console monitoring cell,
  * /root/reference/src/04_monitor_streams.py style `lastProgress`
  * polling, as a first-class listener): collects per-query progress —
  * batchId, input rows, processing rate, event-time watermark — and
  * can render a console summary on demand.
  *
  * The listener is push-based (no polling thread) and keeps a bounded
  * ring of recent progress per query, so it is safe to leave attached
  * to long-running production queries: memory is O(queries × keep).
  */
class QueryMonitor(keep: Int = 16) extends StreamingQueryListener {

  final case class Snapshot(name: String, batchId: Long, numInputRows: Long,
                            rowsPerSec: Double, watermark: String,
                            timestamp: String)

  private val progress =
    new java.util.concurrent.ConcurrentHashMap[java.util.UUID,
      java.util.ArrayDeque[Snapshot]]()
  @volatile private var terminated = List.empty[(java.util.UUID, Option[String])]

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    progress.putIfAbsent(event.id, new java.util.ArrayDeque[Snapshot]())

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val snap = Snapshot(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      p.processedRowsPerSecond,
      Option(p.eventTime.get("watermark")).getOrElse(""),
      p.timestamp)
    val ring = progress.computeIfAbsent(p.id,
      _ => new java.util.ArrayDeque[Snapshot]())
    ring.synchronized {
      ring.addLast(snap)
      while (ring.size > keep) ring.removeFirst()
    }
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    terminated ::= (event.id, event.exception)

  /** Latest snapshot per tracked query. */
  def latest: Map[java.util.UUID, Snapshot] = {
    import scala.jdk.CollectionConverters._
    progress.asScala.flatMap { case (id, ring) =>
      val last = ring.synchronized {
        if (ring.isEmpty) None else Some(ring.peekLast())
      }
      last.map(id -> _)
    }.toMap
  }

  /** Full retained history for one query id. */
  def history(id: java.util.UUID): Seq[Snapshot] = {
    import scala.jdk.CollectionConverters._
    Option(progress.get(id))
      .map(r => r.synchronized(r.asScala.toVector))
      .getOrElse(Vector.empty)
  }

  def terminations: List[(java.util.UUID, Option[String])] = terminated

  /** Console one-liner per query — the reference notebook's monitor
    * cell output, minus the notebook.
    */
  def render(): String =
    latest.values.toSeq.sortBy(_.name).map { s =>
      f"${s.name}%-24s batch=${s.batchId}%-5d rows=${s.numInputRows}%-7d " +
        f"rate=${s.rowsPerSec}%10.1f/s wm=${s.watermark}"
    }.mkString("\n")
}

object QueryMonitor {
  /** Attach a monitor to a session's streams. */
  def attach(spark: SparkSession, keep: Int = 16): QueryMonitor = {
    val m = new QueryMonitor(keep)
    spark.streams.addListener(m)
    m
  }
}
