package graft

import graft.core._
import graft.extract.ParquetExtract
import graft.transform.SQLTransform

class ParamsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("injectParameters substitutes keys and defaults") {
    assert(Params.injectParameters("SELECT ${a}", Map("a" -> "1")) == "SELECT 1")
    assert(Params.injectParameters("SELECT ${a=5}", Map.empty) == "SELECT 5")
    assert(Params.injectParameters("SELECT ${a=5}", Map("a" -> "7")) == "SELECT 7")
    assert(Params.injectParameters("SELECT ${missing}", Map.empty) == "SELECT ${missing}")
    assert(
      Params.injectParameters("${x} + ${x}", Map("x" -> "y")) == "y + y"
    )
  }

  test("parseArgs splits k=v with quotes") {
    val args = Params.parseArgs("""name=test numRows=10 sql="SELECT 1 AS x" note='a b'""")
    assert(args == Map("name" -> "test", "numRows" -> "10", "sql" -> "SELECT 1 AS x", "note" -> "a b"))
  }

  test("secret guard catches inline secrets") {
    assert(Params.containsInlineSecret("""{"accessKey": "AKIA123"}"""))
    assert(!Params.containsInlineSecret("SELECT 1"))
  }

  test("maskSecrets hides secret values") {
    val p = Map("k" -> ConfigValue("supersecret", secret = true))
    assert(!Params.maskSecrets("x supersecret y", p).contains("supersecret"))
  }
}

class RunnerSpec extends SparkSpec {
  test("pipeline: extract -> sql -> view registry") {
    val ctx = new PipelineContext(spark)
    val out = Runner.run(
      Seq(
        ParquetExtract("e", s"${sf()}/nation.parquet", "nation_t"),
        SQLTransform("q", "SELECT n_name FROM nation_t WHERE n_regionkey = 0 ORDER BY n_name", "result_t")
      ),
      ctx
    )
    assert(out.isDefined)
    assert(out.get.columns.toSeq == Seq("n_name"))
    assert(spark.table("result_t").count() == out.get.count())
    assert(ctx.viewProvenance.contains("nation_t"))
  }

  test("lifecycle hooks fire per stage") {
    val ctx = new PipelineContext(spark)
    var seen = List.empty[String]
    ctx.hooks += new LifecycleHook {
      def after(stage: Stage, index: Int, total: Int, result: Option[org.apache.spark.sql.DataFrame]): Unit =
        seen ::= s"${stage.name}@$index/$total"
    }
    Runner.run(
      Seq(
        ParquetExtract("e1", s"${sf()}/region.parquet", "region_t"),
        SQLTransform("q1", "SELECT * FROM region_t", "r2")
      ),
      ctx
    )
    assert(seen.reverse == List("e1@0/2", "q1@1/2"))
  }

  test("SQLValidate aborts on false") {
    val ctx = new PipelineContext(spark)
    intercept[ValidationException] {
      graft.validate
        .SQLValidate("v", "SELECT false AS valid, 'boom' AS message")
        .execute(ctx)
    }
    // and passes on true
    graft.validate.SQLValidate("v2", "SELECT true AS valid, 'ok' AS message").execute(ctx)
  }

  test("EqualityValidate detects row differences") {
    val ctx = new PipelineContext(spark)
    Runner.run(Seq(ParquetExtract("e", s"${sf()}/region.parquet", "reg_a")), ctx)
    spark.table("reg_a").limit(3).createOrReplaceTempView("reg_b")
    intercept[ValidationException] {
      graft.validate.EqualityValidate("eq", "reg_a", "reg_b").execute(ctx)
    }
    graft.validate.EqualityValidate("eq2", "reg_a", "reg_a").execute(ctx)
  }

  test("ConfigExecute merges JSON into session params") {
    val ctx = new PipelineContext(spark)
    graft.execute
      .ConfigExecute("c", """SELECT TO_JSON(NAMED_STRUCT('env', 'prod', 'n', 3)) AS conf""")
      .execute(ctx)
    assert(ctx.params("env").value == "prod")
    assert(ctx.params("n").value == "3")
  }
}
