package graft.load

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}
import graft.core.{PipelineContext, Stage}

/** Load stages: inputView → sink (SURVEY.md §2.2 Load). Shared options:
  * `numPartitions`, `partitionBy`, `saveMode` (Append | Overwrite |
  * ErrorIfExists | Ignore).
  *
  * Scale notes:
  *  - `partitionBy` columns become directory partitions — pick low-cardinality
  *    keys or the job creates millions of tiny files.
  *  - `numPartitions` caps output file count; when partitionBy is also set we
  *    repartition BY those columns so each task writes few files (avoids the
  *    classic numPartitions × numPartitionValues file explosion).
  */
trait FileLoad extends Stage {
  def inputView: String
  def numPartitions: Option[Int]
  def partitionBy: Seq[String]
  def saveMode: String
  /** Range-cluster the data on these keys before writing (columnar formats:
    * narrow per-file min/max → row-group skipping at read). See core.Layout.
    */
  def clusterBy: Seq[String] = Nil
  /** Z-order-cluster on these keys (multi-dimensional locality). Wins over
    * clusterBy when both are set.
    */
  def zOrderBy: Seq[String] = Nil
  /** Fraction of the input the z-order quantile pass reads (seeded,
    * deterministic). 1.0 = exact boundaries but a full extra scan — at
    * 100 TB set this to ~0.01; equi-depth binning only needs approximate
    * boundaries.
    */
  def zOrderSampleFraction: Double = 1.0
  /** With saveMode=Overwrite and partitionBy set, replace ONLY the
    * partitions present in the input instead of truncating the whole
    * dataset — the idempotent daily-ingest pattern (re-running a day's load
    * rewrites that day's partitions and leaves the other 10 years alone).
    * Maps to the per-writer `partitionOverwriteMode=dynamic` option, so the
    * session-wide conf is untouched.
    */
  def dynamicPartitionOverwrite: Boolean = false

  protected def writer(ctx: PipelineContext): DataFrameWriter[Row] = {
    import org.apache.spark.sql.functions.col
    val src = ctx.view(inputView)
    val shaped =
      if (zOrderBy.nonEmpty)
        graft.core.Layout.zorder(src, zOrderBy, numPartitions = numPartitions,
          sampleFraction = zOrderSampleFraction)
      else if (clusterBy.nonEmpty) graft.core.Layout.cluster(src, clusterBy, numPartitions)
      else (numPartitions, partitionBy) match {
        case (Some(n), Nil) => src.repartition(n)
        case (Some(n), by)  => src.repartition(n, by.map(col): _*)
        case (None, Nil)    => src
        case (None, by)     => src.repartition(by.map(col): _*)
      }
    val w0 = shaped.write.mode(saveMode)
    val w = if (dynamicPartitionOverwrite) w0.option("partitionOverwriteMode", "dynamic") else w0
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
  }
}

final case class ParquetLoad(
    name: String,
    inputView: String,
    outputURI: String,
    saveMode: String = "Overwrite",
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil,
    override val clusterBy: Seq[String] = Nil,
    override val zOrderBy: Seq[String] = Nil,
    override val zOrderSampleFraction: Double = 1.0,
    override val dynamicPartitionOverwrite: Boolean = false
) extends FileLoad {
  val stageType = "ParquetLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    writer(ctx).parquet(outputURI); None
  }
}

final case class ORCLoad(
    name: String,
    inputView: String,
    outputURI: String,
    saveMode: String = "Overwrite",
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil,
    override val clusterBy: Seq[String] = Nil,
    override val zOrderBy: Seq[String] = Nil,
    override val zOrderSampleFraction: Double = 1.0,
    override val dynamicPartitionOverwrite: Boolean = false
) extends FileLoad {
  val stageType = "ORCLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    writer(ctx).orc(outputURI); None
  }
}

/** Requires the spark-avro connector jar (absent here — fails fast). */
final case class AvroLoad(
    name: String,
    inputView: String,
    outputURI: String,
    saveMode: String = "Overwrite",
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil
) extends FileLoad {
  val stageType = "AvroLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    writer(ctx).format("avro").save(outputURI); None
  }
}

final case class DelimitedLoad(
    name: String,
    inputView: String,
    outputURI: String,
    delimiter: String = ",",
    header: Boolean = true,
    saveMode: String = "Overwrite",
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil
) extends FileLoad {
  val stageType = "DelimitedLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    writer(ctx).option("sep", delimiter).option("header", header.toString).csv(outputURI)
    None
  }
}

final case class JSONLoad(
    name: String,
    inputView: String,
    outputURI: String,
    saveMode: String = "Overwrite",
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil
) extends FileLoad {
  val stageType = "JSONLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    writer(ctx).json(outputURI); None
  }
}

final case class TextLoad(
    name: String,
    inputView: String,
    outputURI: String,
    saveMode: String = "Overwrite",
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil
) extends FileLoad {
  val stageType = "TextLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    writer(ctx).text(outputURI); None
  }
}

/** BucketedTableLoad — write a view as a BUCKETED catalog table
  * ([[graft.core.Bucketing]]): two tables bucketed by the same key into the
  * same bucket count sort-merge join with zero exchange, so the shuffle of
  * every recurring join on the key is paid once at write time. Requires the
  * session catalog (bucket metadata does not survive a plain path write).
  */
final case class BucketedTableLoad(
    name: String,
    inputView: String,
    table: String,
    bucketByFields: Seq[String],
    numBuckets: Int = 32,
    sortByFields: Seq[String] = Nil,
    format: String = "parquet"
) extends Stage {
  val stageType = "BucketedTableLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    graft.core.Bucketing.writeBucketed(
      ctx.view(inputView), table, bucketByFields, numBuckets, sortByFields, format)
    None
  }
}

/** JDBCLoad — `df.write.jdbc` (no reachable database here; compiles, untested). */
final case class JDBCLoad(
    name: String,
    inputView: String,
    jdbcURL: String,
    tableName: String,
    saveMode: String = "Append",
    batchsize: Int = 1000,
    isolationLevel: String = "READ_UNCOMMITTED",
    truncate: Boolean = false,
    numPartitions: Option[Int] = None,
    connectionProperties: Map[String, String] = Map.empty
) extends Stage {
  val stageType = "JDBCLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val src = ctx.view(inputView)
    val shaped = numPartitions.fold(src)(src.repartition(_))
    val props = new java.util.Properties()
    connectionProperties.foreach { case (k, v) => props.setProperty(k, v) }
    shaped.write
      .mode(saveMode)
      .option("batchsize", batchsize)
      .option("isolationLevel", isolationLevel)
      .option("truncate", truncate)
      .jdbc(jdbcURL, tableName, props)
    None
  }
}

/** ConsoleLoad — streaming sink for debugging (SURVEY.md §2.2). */
final case class ConsoleLoad(
    name: String,
    inputView: String,
    outputMode: String = "append"
) extends Stage {
  val stageType = "ConsoleLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val q = ctx
      .view(inputView)
      .writeStream
      .format("console")
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    None
  }
}

/** HTTPLoad — per-partition POST of rows to an endpoint. Offline stub: the
  * transport is pluggable and defaults to a no-op counter; the Spark shape
  * (foreachPartition, one client per partition, batching) is the real design.
  */
final case class HTTPLoad(
    name: String,
    inputView: String,
    uri: String,
    batchSize: Int = 100,
    // default: REAL HTTP POST of the newline-joined JSON batch
    // (graft.core.Http — shared JDK client per executor)
    transport: (String, Seq[String]) => Unit = (u, batch) => {
      val (code, body) = graft.core.Http.postString(u, batch.mkString("\n"))
      if (code < 200 || code >= 300)
        throw new RuntimeException(s"HTTPLoad POST $u returned $code: $body")
    }
) extends Stage {
  val stageType = "HTTPLoad"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val endpoint = uri
    val bs = batchSize
    val t = transport
    ctx.view(inputView).toJSON.foreachPartition { (rows: Iterator[String]) =>
      rows.grouped(bs).foreach(batch => t(endpoint, batch))
    }
    None
  }
}
