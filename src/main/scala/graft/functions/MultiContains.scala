package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring search over the UTF-8 buffer: which
  * of `patterns` occur in the document, in ONE pass, independent of how many
  * patterns there are.
  *
  * The need: canary detection — benchmark strings, PII canaries, licensed
  * passages, blocklisted phrases — where the pattern list runs to thousands
  * and `k × contains()` plans k full scans per document (and a regex
  * alternation of 10k literals is quadratic to compile and slow to run).
  * The automaton walks each document's bytes once; matching is O(bytes +
  * hits) regardless of pattern count.
  *
  * The automaton is built once per expression instance from the literal
  * pattern list (patterns shape the computation, like winnowing's k/w —
  * they are not data), marked @transient so executors rebuild it lazily on
  * first use instead of shipping the tables; codegen embeds the instance
  * via `addReferenceObj`, so eval and generated code share one automaton
  * and cannot drift. Matching is byte-level (UTF-8 is self-synchronizing:
  * a byte-level match of a valid UTF-8 pattern is always a character-level
  * match).
  *
  * Returns the DISTINCT indices of matched patterns, ascending —
  * `array<int>`, empty when nothing matches.
  */
case class MultiContainsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "multi_contains requires at least one pattern")
  require(patterns.forall(_.nonEmpty), "multi_contains patterns must be non-empty")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_contains requires a string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val automaton = AhoCorasick.build(patterns)

  override def nullSafeEval(s: Any): Any =
    automaton.findDistinct(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ahoCorasick", automaton, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.findDistinct($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "multi_contains"
}

/** The automaton: a byte-trie with BFS failure links and per-node output
  * lists (pattern indices ending at the node, propagated through failure
  * links at build time so matching never walks them).
  */
final class AhoCorasick private (
    // flat transition tables: next(node)(byte) — dense only at the root is
    // wasteful for huge pattern sets, but canary lists (≤ ~100k nodes) fit
    // comfortably and dense lookup keeps the scan branch-free
    private val next: Array[Array[Int]],
    private val outputs: Array[Array[Int]]
) extends Serializable {

  /** Distinct matched pattern indices, ascending. */
  def findDistinct(s: UTF8String): ArrayData = {
    val numBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var state = 0
    var found: java.util.TreeSet[Integer] = null
    var i = 0
    while (i < numBytes) {
      state = next(state)(Platform.getByte(base, off + i) & 0xff)
      val out = outputs(state)
      if (out.length > 0) {
        if (found == null) found = new java.util.TreeSet[Integer]()
        var j = 0
        while (j < out.length) { found.add(out(j)); j += 1 }
      }
      i += 1
    }
    if (found == null) AhoCorasick.EMPTY
    else {
      val arr = new Array[Int](found.size())
      val it = found.iterator()
      var k = 0
      while (it.hasNext) { arr(k) = it.next(); k += 1 }
      new GenericArrayData(arr)
    }
  }
}

object AhoCorasick {

  private val EMPTY = new GenericArrayData(Array.emptyIntArray)

  /** Build the goto/failure/output tables (classic BFS construction). */
  def build(patterns: Seq[String]): AhoCorasick = {
    // trie over pattern UTF-8 bytes
    val trieNext = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var node = 0
      p.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
        val c = b & 0xff
        if (trieNext(node)(c) == -1) {
          trieNext(node)(c) = trieNext.length
          trieNext += Array.fill(256)(-1)
          ends += Nil
        }
        node = trieNext(node)(c)
      }
      ends(node) = idx :: ends(node)
    }
    val n = trieNext.length
    val fail = new Array[Int](n)
    val out = Array.fill(n)(List.empty[Int])
    (0 until n).foreach(i => out(i) = ends(i))
    // BFS: convert to a complete goto function, compute failure links, and
    // merge each node's outputs with its failure node's (already complete,
    // since failure nodes are strictly shallower)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      val t = trieNext(0)(c)
      if (t == -1) trieNext(0)(c) = 0
      else { fail(t) = 0; queue += t }
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) = out(u) ::: out(fail(u))
      (0 until 256).foreach { c =>
        val t = trieNext(u)(c)
        if (t == -1) trieNext(u)(c) = trieNext(fail(u))(c)
        else { fail(t) = trieNext(fail(u))(c); queue += t }
      }
    }
    new AhoCorasick(trieNext.toArray, out.map(_.toArray.sorted))
  }
}

object MultiContainsExpr {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_contains",
      exprs => fromExprs(exprs),
      "built-in")

  private[functions] def fromExprs(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(t, pats) if pats.foldable =>
      val arr = pats.eval() match {
        case a: ArrayData => (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
        case other =>
          throw new IllegalArgumentException(
            s"multi_contains: patterns must be an array literal, got $other")
      }
      MultiContainsExpr(t, arr)
    case _ =>
      throw new IllegalArgumentException(
        "multi_contains(text, array('p1', 'p2', ...)) — patterns must be a foldable array")
  }

  /** Column-level constructor (classic-session bridge). */
  def multi_contains(text: Column, patterns: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      MultiContainsExpr(GraftColumnBridge.expression(text), patterns))
  }
}
