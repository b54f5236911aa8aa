package graft.core

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Ticketed async-job surface: the reference's download-slot protocol
  * (parqueryd/rpc.py:210-254 `downloads()` / `delete_download`; ticket
  * slots in controller.py:555-597) re-expressed over Spark job groups.
  *
  * The reference tracks a ticket per bulk download, lists progress per
  * node, and cancels by marking slot files for the downloader to notice.
  * Here a ticket owns a Spark job group: `submit` returns immediately with
  * the ticket id, the body runs on a daemon thread inside that group,
  * `list`/`get` expose the lifecycle, and `cancel` interrupts every job of
  * the group mid-stage (`interruptOnCancel`) — Spark's scheduler is the
  * per-node slot machinery. States: PENDING → RUNNING → DONE | FAILED |
  * CANCELLED.
  */
object Tickets {

  sealed abstract class State(val name: String) { override def toString: String = name }
  case object Pending extends State("PENDING")
  case object Running extends State("RUNNING")
  case object Done extends State("DONE")
  case object Failed extends State("FAILED")
  case object Cancelled extends State("CANCELLED")

  final case class Ticket(
      id: String,
      what: String,
      state: State,
      submittedMs: Long,
      endedMs: Option[Long] = None,
      error: Option[String] = None) {
    def terminal: Boolean = state == Done || state == Failed || state == Cancelled
  }

  /** Per-file progress slot — the reference's node×file download slots with
    * byte counts (parqueryd/controller.py:580-590, worker.py:492-519). A
    * 10k-file ingest is no longer one opaque RUNNING: each file transitions
    * PENDING → RUNNING → DONE(bytes) | FAILED independently. */
  final case class FileSlot(path: String, bytes: Long, state: State)

  private val registry = new ConcurrentHashMap[String, Ticket]()

  /** One latch per ticket, released when the ticket reaches a terminal
    * state — lets callers block on COMPLETION rather than poll a wall-clock
    * deadline (the round-3 flake class: a fixed deadline that a loaded box
    * can always exceed). */
  private val done = new ConcurrentHashMap[String, java.util.concurrent.CountDownLatch]()

  private def transition(id: String)(f: Ticket => Ticket): Unit = {
    registry.computeIfPresent(id, (_, t) => f(t))
    if (get(id).exists(_.terminal))
      Option(done.get(id)).foreach(_.countDown())
  }

  /** Block until the ticket is terminal (or `timeoutMs` elapses); returns
    * the latest ticket state either way. Latch-based: wakes the moment the
    * worker thread or a cancel flips the state, immune to poll-interval ×
    * load-factor flakiness. */
  def await(id: String, timeoutMs: Long): Option[Ticket] = {
    Option(done.get(id)).foreach(
      _.await(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    get(id)
  }

  private val slots =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, FileSlot]]()

  /** Per-file slots of a ticket, path-sorted (deterministic listing). */
  def fileSlots(id: String): Seq[FileSlot] =
    Option(slots.get(id)).map(_.values.asScala.toSeq.sortBy(_.path))
      .getOrElse(Nil)

  /** Move one file's slot; bytes are cumulative for the file. */
  def fileUpdate(id: String, path: String, bytes: Long, state: State): Unit =
    Option(slots.get(id)).foreach(_.put(path, FileSlot(path, bytes, state)))

  /** [[submit]] with per-file progress slots: `files` are registered
    * PENDING before the worker thread starts (a `downloads` listing can
    * never observe the ticket without its slots), and the body receives the
    * ticket id so it can move slots as it goes. */
  def submitWithFiles(spark: SparkSession, what: String, files: Seq[String])(
      body: (SparkSession, String) => Unit): String = {
    val id = submitImpl(spark, what, before = { id =>
      val m = new ConcurrentHashMap[String, FileSlot]()
      files.foreach(f => m.put(f, FileSlot(f, 0L, Pending)))
      slots.put(id, m)
    })(body)
    id
  }

  /** Submit `body` as a ticketed background job; returns the ticket id
    * immediately (the reference's `download` returns its ticket the same
    * way). The body's Spark jobs all run under the ticket's job group, so
    * a later [[cancel]] reaches work already in flight. */
  def submit(spark: SparkSession, what: String)(body: SparkSession => Unit): String =
    submitImpl(spark, what, before = _ => ())((s, _) => body(s))

  private def submitImpl(spark: SparkSession, what: String, before: String => Unit)(
      body: (SparkSession, String) => Unit): String = {
    val id = UUID.randomUUID().toString.take(12)
    done.put(id, new java.util.concurrent.CountDownLatch(1))
    // slots (before) register BEFORE the ticket becomes listable: a
    // concurrent `downloads` call must never observe a multi-file ticket
    // with zero file slots
    before(id)
    registry.put(id, Ticket(id, what, Pending, System.currentTimeMillis()))
    val runner = new Thread(() => {
      transition(id)(t => if (t.state == Pending) t.copy(state = Running) else t)
      spark.sparkContext.setJobGroup(id, s"graft ticket $id: $what",
        interruptOnCancel = true)
      try {
        // a cancel() that landed before the thread started wins: the body
        // must not run (its side effects would publish after "cancelled")
        if (!get(id).exists(_.state == Running)) throw new InterruptedException("cancelled before start")
        body(spark, id)
        transition(id)(t =>
          if (t.state == Running)
            t.copy(state = Done, endedMs = Some(System.currentTimeMillis()))
          else t)
      } catch {
        case e: Throwable =>
          // a cancel() races the failure it provokes: keep CANCELLED sticky
          transition(id)(t =>
            if (t.state == Cancelled) t
            else t.copy(state = Failed, endedMs = Some(System.currentTimeMillis()),
              error = Some(e.toString)))
      } finally spark.sparkContext.clearJobGroup()
    }, s"graft-ticket-$id")
    runner.setDaemon(true)
    runner.start()
    id
  }

  /** All known tickets, newest first (the `downloads()` listing verb). */
  def list(): Seq[Ticket] =
    registry.values().asScala.toSeq.sortBy(-_.submittedMs)

  def get(id: String): Option[Ticket] = Option(registry.get(id))

  /** Cancel a ticket (the `delete_download` verb): marks it CANCELLED and
    * interrupts every Spark job in its group. No-op on terminal tickets. */
  def cancel(spark: SparkSession, id: String): Boolean =
    get(id) match {
      case Some(t) if !t.terminal =>
        transition(id)(t => if (t.terminal) t
          else t.copy(state = Cancelled, endedMs = Some(System.currentTimeMillis())))
        spark.sparkContext.cancelJobGroup(id)
        true
      case _ => false
    }

  /** Drop terminal tickets from the listing (ops hygiene; the reference
    * overwrites slots as they complete). */
  def prune(): Int = {
    val gone = registry.values().asScala.filter(_.terminal).map(_.id).toSeq
    gone.foreach { id => registry.remove(id); done.remove(id); slots.remove(id) }
    gone.size
  }
}
