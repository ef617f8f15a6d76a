package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded per-key top-k.
  *
  * The standard window formulation — `row_number() over (partition by key
  * order by score) <= k` — shuffles and sorts EVERY row of every key. At
  * 100 TB with a handful of hot keys that is the whole corpus through one
  * sort. This operator prunes first: a narrow `mapPartitions` pass keeps at
  * most k rows per key per partition with bounded heaps (any row in the true
  * global top-k is necessarily in its partition's local top-k), so the
  * shuffle moves ≤ k × partitions rows per key, and the final window ranks
  * only those. Same result, bounded intermediate.
  */
object TopK {

  /** Top `k` rows per `keys` group, ranked by `sortCol` (numeric).
    * Output: input columns + `rank` (1-based). Ties break by the remaining
    * column values' hash for determinism of the SET (rank order among exact
    * ties is made deterministic by the final window's full ordering).
    */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      sortCol: String,
      k: Int,
      descending: Boolean = true
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val cols = df.columns.toSeq
    val keyIdx = keys.map(cols.indexOf)
    require(keyIdx.forall(_ >= 0), s"missing key column in ${keys}")
    val sIdx = cols.indexOf(sortCol)
    require(sIdx >= 0, s"missing sort column $sortCol")
    val enc = Encoders.row(df.schema)
    val desc = descending
    val kk = k
    // local bounded prune: per (partition, key) keep the k best rows
    val pruned = df.mapPartitions { rows =>
      def score(r: Row): Double = r.getAs[Any](sIdx) match {
        case null                 => Double.NegativeInfinity
        case n: java.lang.Number  => n.doubleValue()
        case other => throw new IllegalArgumentException(s"sort column must be numeric, got $other")
      }
      // min-heap of the current top-k (max-heap when ascending)
      val ord: Ordering[(Double, Row)] =
        if (desc) Ordering.by[(Double, Row), Double](_._1).reverse
        else Ordering.by[(Double, Row), Double](_._1)
      val heaps = mutable.HashMap.empty[Seq[Any], mutable.PriorityQueue[(Double, Row)]]
      rows.foreach { r =>
        val key = keyIdx.map(r.get)
        val h = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty(ord))
        val s = score(r)
        if (h.size < kk) h.enqueue((s, r))
        else {
          val worst = h.head._1
          val better = if (desc) s > worst else s < worst
          if (better) { h.dequeue(); h.enqueue((s, r)) }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._2))
    }(enc)
    // final exact ranking over the pruned survivors only
    val sort = if (descending) col(sortCol).desc else col(sortCol).asc
    val tiebreakers = cols.filterNot(c => c == sortCol).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(sort +: tiebreakers: _*)
    pruned
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kk)
  }
}
