package graft.core

import scala.jdk.CollectionConverters._

/** Per-cell in-memory log capture — behavioral analog of the reference's
  * `InMemoryLoggerAppender` (InMemoryLoggerAppender.scala:1-24, surfaced at
  * ArcInterpreter.scala:298-306): log lines produced while a cell executes
  * are buffered and returned with the cell result, so `%log` / LogExecute
  * output is visible in the notebook instead of disappearing into the JVM
  * log. Thread-safe: stages may log from FAIR-scheduled concurrent jobs.
  * Plain monitor synchronization keeps the cap EXACT under concurrent
  * append/drain/clear — log lines arrive at stage cadence, not row
  * cadence, so a lock costs nothing here and a lock-free counter drifts.
  */
object LogBuffer {
  private val buf = new java.util.ArrayDeque[String]()

  // The REPL drains per cell, but library code (e.g. takedown completion
  // logging) appends in batch jobs too, where nothing ever drains — cap
  // the buffer by dropping the OLDEST lines so a long-running pipeline
  // cannot accumulate log strings without bound.
  private val MaxLines = 10000

  def append(msg: String): Unit = synchronized {
    buf.addLast(msg)
    if (buf.size > MaxLines) buf.pollFirst()
  }

  def clear(): Unit = synchronized { buf.clear() }

  /** Drain all buffered lines (oldest first) and clear the buffer. */
  def drain(): Seq[String] = synchronized {
    val out = buf.asScala.toList
    buf.clear()
    out
  }
}
