package graft

import scala.collection.mutable
import graft.core.{LifecycleHook, PipelineConfig, Stage}
import graft.repl.Interpreter
import org.apache.spark.sql.DataFrame

/** A classpath lifecycle plugin for the registration tests: records every
  * post-stage callback with the params it was constructed with.
  */
class RecordingHook(params: Map[String, String]) extends LifecycleHook {
  def after(stage: Stage, index: Int, total: Int, result: Option[DataFrame]): Unit =
    RecordingHook.calls += ((params.getOrElse("tag", "?"), stage.stageType, index, total))
}
object RecordingHook {
  val calls: mutable.Buffer[(String, String, Int, Int)] = mutable.Buffer.empty
}

/** A no-arg-constructor variant. */
class NoArgHook extends LifecycleHook {
  def after(stage: Stage, index: Int, total: Int, result: Option[DataFrame]): Unit =
    NoArgHook.count += 1
}
object NoArgHook { var count = 0 }

/** Lifecycle-plugin registration from config cells — the analog of the
  * reference's activeLifecyclePlugins accumulation for zero-stage config
  * cells (reference ArcInterpreter.scala:427-434) and the %lifecycleplugin
  * magic (reference ArcInterpreter.scala:259-264).
  */
class LifecyclePluginSpec extends SparkSpec {

  test("zero-stage config cell registers plugins for later cells") {
    RecordingHook.calls.clear()
    val interp = new Interpreter(spark)
    val r = interp.execute(
      """{plugins: {lifecycle: [
        |  {type = "graft.RecordingHook", tag = "zero-stage"}
        |]}}""".stripMargin)
    assert(r.success, r.text)
    assert(r.text.contains("1 lifecycle plugin(s) registered"))
    assert(RecordingHook.calls.isEmpty, "registration alone must not fire the hook")
    val r2 = interp.execute("%sql\nSELECT 1 AS x")
    assert(r2.success)
    assert(RecordingHook.calls.exists { case (tag, st, _, _) =>
      tag == "zero-stage" && st == "SQLTransform"
    })
  }

  test("%lifecycleplugin magic accepts a bare plugin object") {
    NoArgHook.count = 0
    val interp = new Interpreter(spark)
    val r = interp.execute("%lifecycleplugin\n{type = \"graft.NoArgHook\"}")
    assert(r.success, r.text)
    interp.execute("%sql\nSELECT 2 AS y")
    assert(NoArgHook.count == 1)
  }

  test("plugins also apply to stages in the registering cell") {
    RecordingHook.calls.clear()
    val interp = new Interpreter(spark)
    val r = interp.execute(
      """{plugins: {lifecycle: [{type = "graft.RecordingHook", tag = "same-cell"}]},
        | stages: [{type = "SQLTransform", name = "q", sql = "SELECT 3 AS z", outputView = "lp_v"}]}""".stripMargin)
    assert(r.success, r.text)
    assert(RecordingHook.calls.exists(_._1 == "same-cell"))
  }

  test("environments filters plugin registration like stages") {
    val hooks = PipelineConfig.parseLifecycleCell(
      """[{type = "graft.NoArgHook", environments = [dev]}]""",
      environment = "production")
    assert(hooks.isEmpty)
    val active = PipelineConfig.parseLifecycleCell(
      """[{type = "graft.NoArgHook", environments = [production]}]""",
      environment = "production")
    assert(active.size == 1)
  }

  test("unknown class and non-hook class fail with clear errors") {
    val e1 = intercept[IllegalArgumentException] {
      PipelineConfig.parseLifecycleCell("""[{type = "graft.DoesNotExist"}]""")
    }
    assert(e1.getMessage.contains("not found"))
    val e2 = intercept[IllegalArgumentException] {
      PipelineConfig.parseLifecycleCell("""[{type = "java.lang.String"}]""")
    }
    assert(e2.getMessage.contains("does not implement"))
  }

  test("%configplugin provides parameters to later cells via ${k}") {
    val interp = new Interpreter(spark)
    val r = interp.execute(
      """%configplugin
        |{plugins: {config: [{type = "graft.FixedParamsPlugin", base = "41"}]}}""".stripMargin)
    assert(r.success, r.text)
    assert(r.text.contains("1 config plugin(s) registered"), r.text)
    assert(r.text.contains("answer"), r.text)
    val r2 = interp.execute("%sql\nSELECT ${answer} AS a, '${env_name}' AS e")
    assert(r2.success, r2.text)
    assert(r2.text.contains("42") && r2.text.contains("production"), r2.text)
  }

  test("built-in EnvConfigPlugin imports prefixed environment variables") {
    val hits = sys.env.keys.filter(_.startsWith("HO")).toSeq // e.g. HOME
    assume(hits.nonEmpty)
    val got = new graft.core.EnvConfigPlugin(Map("prefix" -> "HO")).values("production")
    assert(got.keySet == hits.map(_.stripPrefix("HO")).toSet)
    assert(got.forall { case (k, v) => sys.env("HO" + k) == v })
    // default prefix: only ETL_CONF_ vars (none in the test env → empty)
    val dflt = new graft.core.EnvConfigPlugin().values("production")
    assert(dflt.keySet == sys.env.keySet.filter(_.startsWith("ETL_CONF_"))
      .map(_.stripPrefix("ETL_CONF_")))
  }

  test("configplugin cells honor environments and reject non-plugins") {
    assert(PipelineConfig.parseConfigCell(
      """[{type = "graft.FixedParamsPlugin", environments = [dev]}]""").isEmpty)
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.parseConfigCell("""[{type = "graft.NoArgHook"}]""")
    }
    assert(e.getMessage.contains("does not implement"))
  }
}

/** A classpath config plugin: computes a param from its construction args
  * and reports the active environment (the zero-egress analog of the
  * reference's dynamic config resolution).
  */
class FixedParamsPlugin(params: Map[String, String]) extends graft.core.ConfigPlugin {
  def values(environment: String): Map[String, String] = Map(
    "answer" -> (params.getOrElse("base", "0").toInt + 1).toString,
    "env_name" -> environment)
}
