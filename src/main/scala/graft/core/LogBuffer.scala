package graft.core

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Per-cell in-memory log capture — behavioral analog of the reference's
  * `InMemoryLoggerAppender` (InMemoryLoggerAppender.scala:1-24, surfaced at
  * ArcInterpreter.scala:298-306): log lines produced while a cell executes
  * are buffered and returned with the cell result, so `%log` / LogExecute
  * output is visible in the notebook instead of disappearing into the JVM
  * log. Thread-safe: stages may log from FAIR-scheduled concurrent jobs.
  */
object LogBuffer {
  private val buf = new ConcurrentLinkedQueue[String]()
  private val size = new java.util.concurrent.atomic.AtomicInteger(0)

  // The REPL drains per cell, but library code (e.g. takedown completion
  // logging) appends in batch jobs too, where nothing ever drains — cap
  // the buffer by dropping the OLDEST lines so a long-running pipeline
  // cannot accumulate log strings without bound.
  private val MaxLines = 10000

  def append(msg: String): Unit = {
    buf.add(msg)
    if (size.incrementAndGet() > MaxLines && buf.poll() != null)
      size.decrementAndGet()
  }

  def clear(): Unit = { buf.clear(); size.set(0) }

  /** Drain all buffered lines (oldest first) and clear the buffer. */
  def drain(): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var m = buf.poll()
    while (m != null) { out += m; size.decrementAndGet(); m = buf.poll() }
    out.toSeq
  }
}
