package graft.core

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** A session key→value pair; secrets are masked on echo and must never be
  * rendered back to the user.
  * Mirrors reference Common.scala:38-41 (`ConfigValue`).
  */
final case class ConfigValue(value: String, secret: Boolean = false)

/** Mutable per-session state threaded through every stage execution.
  *
  * The data model is deliberately thin: a "table" IS a Spark temp view in the
  * session catalog (reference ArcInterpreter.scala:487, :584) — stages read
  * `inputView` with `spark.table` and publish `outputView` with
  * `createOrReplaceTempView`, so Catalyst sees one composed logical plan per
  * query and can push filters/prune columns across stage boundaries.
  */
final class PipelineContext(
    val spark: SparkSession,
    val params: mutable.Map[String, ConfigValue] = mutable.Map.empty,
    var streaming: Boolean = false,
    var storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER,
    val hooks: mutable.Buffer[LifecycleHook] = mutable.Buffer.empty
) {

  /** Views registered by stages this session (name → producing stage name).
    * The Spark catalog remains the source of truth; this map only remembers
    * provenance for completions / `%help`-style introspection
    * (reference OutputTable.scala:88-98).
    */
  val viewProvenance: mutable.Map[String, String] = mutable.Map.empty

  def register(view: String, df: DataFrame, producer: String = ""): DataFrame = {
    df.createOrReplaceTempView(view)
    viewProvenance(view) = producer
    df
  }

  def view(name: String): DataFrame = spark.table(name)

  /** Resolve plain (non-secret) params for SQL `${k}` substitution. */
  def sqlParams: Map[String, String] =
    params.collect { case (k, v) => k -> v.value }.toMap
}

/** One pipeline stage: DataFrame-in (via views), DataFrame-out.
  *
  * Mirrors the reference's Arc stage contract (HOCON objects with
  * `type/name/environments/inputView/outputView`, SURVEY.md §2.2) but as a
  * plain Scala ADT — configuration is case-class construction, not HOCON.
  * `execute` returns the stage's result DataFrame when it has one (extracts,
  * transforms) or None (loads, executes).
  */
trait Stage {
  def name: String
  def stageType: String
  def execute(ctx: PipelineContext): Option[DataFrame]

  /** Shared post-processing used by extract/transform stages: optional
    * repartition and persist, then temp-view registration.
    * numPartitions/partitionBy mirror the Arc shared stage options
    * (SURVEY.md §2.2 Extract shared options); `repartition(cols)` without a
    * target count lets AQE pick the final partition number at scale.
    */
  protected def publish(
      ctx: PipelineContext,
      df: DataFrame,
      outputView: String,
      numPartitions: Option[Int] = None,
      partitionBy: Seq[String] = Nil,
      persist: Boolean = false
  ): DataFrame = {
    import org.apache.spark.sql.functions.col
    val repartitioned = (numPartitions, partitionBy) match {
      case (Some(n), Nil)  => df.repartition(n)
      case (Some(n), cols) => df.repartition(n, cols.map(col): _*)
      case (None, Nil)     => df
      case (None, cols)    => df.repartition(cols.map(col): _*)
    }
    val persisted =
      if (persist && !repartitioned.isStreaming)
        repartitioned.persist(ctx.storageLevel)
      else repartitioned
    ctx.register(outputView, persisted, name)
    persisted
  }
}

/** Post-stage callback — the reference renders every intermediate stage's
  * output through an identical hook (OutputTable.scala:65-150).
  */
trait LifecycleHook {
  def after(stage: Stage, index: Int, total: Int, result: Option[DataFrame]): Unit
}

/** Dynamic parameter provider — the analog of the reference's config
  * plugins (`%configplugin`, ArcInterpreter.scala:259-261): a classpath
  * class whose values are merged into the session parameters at
  * registration, so later cells resolve them via `${key}` substitution
  * (the reference uses these for e.g. secret/endpoint resolution; under
  * zero egress ours resolve from code or the local environment only).
  */
trait ConfigPlugin {
  def values(environment: String): Map[String, String]
}

/** Built-in [[ConfigPlugin]]: imports environment variables whose name
  * starts with `prefix` (default `ETL_CONF_`, the reference's convention for
  * pipeline configuration) as session parameters, prefix stripped — e.g.
  * `ETL_CONF_BASE_URI` becomes `${BASE_URI}`.
  */
final class EnvConfigPlugin(params: Map[String, String]) extends ConfigPlugin {
  def this() = this(Map.empty)
  def values(environment: String): Map[String, String] = {
    val prefix = params.getOrElse("prefix", "ETL_CONF_")
    sys.env.collect {
      case (k, v) if k.startsWith(prefix) && k.length > prefix.length =>
        k.stripPrefix(prefix) -> v
    }
  }
}

/** Raised by validate stages; aborts the pipeline (SURVEY.md §2.2 SQLValidate). */
final class ValidationException(message: String) extends RuntimeException(message)

/** Sequential stage runner — the `ARC.run(pipeline)` analog
  * (reference ArcInterpreter.scala:441). Returns the last stage's DataFrame.
  */
object Runner {
  def run(stages: Seq[Stage], ctx: PipelineContext): Option[DataFrame] = {
    val total = stages.size
    var last: Option[DataFrame] = None
    stages.zipWithIndex.foreach { case (stage, i) =>
      val t0 = System.nanoTime()
      val result = stage.execute(ctx)
      LogBuffer.append(
        f"stage ${i + 1}/$total ${stage.stageType}:${stage.name} completed in ${(System.nanoTime() - t0) / 1e3}%.0fµs")
      if (result.isDefined) last = result
      ctx.hooks.foreach(_.after(stage, i, total, result))
    }
    last
  }
}
