package graft.core

import org.apache.spark.sql.DataFrame

/** Bucketed catalog tables for co-located joins (SURVEY "Optimize for scale":
  * pre-partitioning / bucketing).
  *
  * Two tables bucketed by the same key into the same bucket count sort-merge
  * join with ZERO exchange: each task reads bucket i of both sides. At 100 TB
  * the shuffle cost of every recurring fact-to-fact join is paid ONCE at
  * write time instead of per query — the canonical layout for a fact table
  * that is repeatedly joined on its key.
  *
  * Bucketing requires the session catalog (`saveAsTable`): a plain path write
  * drops the bucket metadata.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketBy: Seq[String],
      numBuckets: Int,
      sortBy: Seq[String] = Nil,
      format: String = "parquet"
  ): Unit = {
    require(bucketBy.nonEmpty, "bucketBy columns required")
    val w = df.write
      .mode("overwrite")
      .format(format)
      .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
    val sorted =
      if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*)
      else w.sortBy(bucketBy.head, bucketBy.tail: _*)
    sorted.saveAsTable(table)
  }
}
