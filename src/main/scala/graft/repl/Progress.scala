package graft.repl

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler._

/** Per-cell task progress — behavioral analog of the reference's
  * ProgressSparkListener.scala:19-185: count tasks started/completed across
  * the stages a cell triggers, expose a rate-limited (500 ms) progress
  * snapshot for display. Attach before executing a cell, remove after
  * (reference ArcInterpreter.scala:386-396, :640-648).
  */
final class ProgressListener(onUpdate: ProgressListener.Snapshot => Unit = _ => ())
    extends SparkListener {

  private val total = new AtomicInteger(0)
  private val done = new AtomicInteger(0)
  @volatile private var lastPush = 0L

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    total.addAndGet(e.stageInfo.numTasks)
    push(force = false)
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    done.incrementAndGet()
    push(force = false)
  }

  override def onJobEnd(e: SparkListenerJobEnd): Unit = push(force = true)

  def snapshot: ProgressListener.Snapshot =
    ProgressListener.Snapshot(done.get, total.get)

  private def push(force: Boolean): Unit = {
    val now = System.currentTimeMillis()
    if (force || now - lastPush >= 500) { // reference rate limit: 500 ms
      lastPush = now
      onUpdate(snapshot)
    }
  }
}

object ProgressListener {
  final case class Snapshot(done: Int, total: Int) {
    def percent: Int = if (total == 0) 0 else math.min(100, done * 100 / total)
    /** Text progress bar like the reference's HTML bar. */
    def bar(width: Int = 40): String = {
      val filled = if (total == 0) 0 else math.min(width, done * width / total)
      "[" + "#" * filled + "-" * (width - filled) + s"] $done/$total"
    }
  }

  /** Run `body` with a listener attached; always detaches. Listener events
    * are delivered asynchronously, so after `body` returns we poll briefly
    * until the task counts stop moving (bounded at 1 s) before snapshotting.
    */
  def withProgress[T](spark: org.apache.spark.sql.SparkSession)(body: => T): (T, Snapshot) = {
    val l = new ProgressListener()
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      val deadline = System.currentTimeMillis() + 1000
      var prev = l.snapshot
      var stable = false
      while (!stable && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        val cur = l.snapshot
        stable = cur == prev && cur.done >= cur.total
        prev = cur
      }
      (r, prev)
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
