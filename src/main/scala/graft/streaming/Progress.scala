package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** T4: progress telemetry. The reference streams ProgressEvents
  * (pipeline_started / file_completed / pipeline_halted …) through
  * Redis to websockets (executor.py:199-340); the Spark-native carrier
  * is a StreamingQueryListener — per-batch rows/sec and state,
  * collected into an inspectable event log.
  */
object Progress {

  sealed trait Event { def queryId: String }
  final case class Started(queryId: String, name: String) extends Event
  final case class BatchCompleted(queryId: String, batchId: Long,
      numInputRows: Long, inputRowsPerSecond: Double) extends Event
  final case class Terminated(queryId: String,
      exception: Option[String]) extends Event

  /** Attachable listener with a bounded in-memory event log. */
  final class Recorder(maxEvents: Int = 10000) extends StreamingQueryListener {
    private val log = new ConcurrentLinkedQueue[Event]()

    private def add(e: Event): Unit = {
      log.add(e)
      while (log.size > maxEvents) log.poll()
    }

    override def onQueryStarted(event: QueryStartedEvent): Unit =
      add(Started(event.id.toString, Option(event.name).getOrElse("")))

    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      add(BatchCompleted(p.id.toString, p.batchId, p.numInputRows,
        Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0)))
    }

    override def onQueryIdle(event: QueryIdleEvent): Unit = ()

    override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
      add(Terminated(event.id.toString, event.exception))

    def events: Seq[Event] = {
      val it = log.iterator()
      val b = Seq.newBuilder[Event]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  def attach(spark: SparkSession, maxEvents: Int = 10000): Recorder = {
    val r = new Recorder(maxEvents)
    spark.streams.addListener(r)
    r
  }
}
