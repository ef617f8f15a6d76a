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

  test("LogExecute writes to the cell log buffer") {
    val ctx = new PipelineContext(spark)
    LogBuffer.clear()
    graft.execute.LogExecute("l", "SELECT 'rows loaded: 42' AS message").execute(ctx)
    assert(LogBuffer.drain().exists(_.contains("rows loaded: 42")))
  }

  test("HTTPExecute validates status codes and logs the call") {
    val ctx = new PipelineContext(spark)
    ctx.params("env") = ConfigValue("prod")
    var posted: (String, String) = ("", "")
    LogBuffer.clear()
    graft.execute.HTTPExecute(
      "h", "http://example.invalid/hook", payload = """{"env": "${env}"}""",
      transport = (uri, _, body) => { posted = (uri, body); (200, "ok") }
    ).execute(ctx)
    assert(posted._1 == "http://example.invalid/hook")
    assert(posted._2 == """{"env": "prod"}""") // params injected into payload
    assert(LogBuffer.drain().exists(_.contains("-> 200")))
    intercept[ValidationException] {
      graft.execute.HTTPExecute("h2", "http://example.invalid/hook",
        transport = (_, _, _) => (500, "boom")).execute(ctx)
    }
  }

  test("TensorFlowServingTransform appends aligned predictions per batch") {
    val ctx = new PipelineContext(spark)
    import spark.implicits._
    Seq("a", "b", "c", "d", "e").toDF("value").createOrReplaceTempView("tfs_in")
    val out = graft.transform.TensorFlowServingTransform(
      "tfs", "http://example.invalid/v1/models/m:predict", "tfs_in", "tfs_out",
      batchSize = 2,
      transport = (_, body) => // echo: instance line count -> prediction 0.5 each
        body.linesIterator.map(_ => "0.5").mkString("{\"predictions\": [", ",", "]}")
    ).execute(ctx).get
    assert(out.columns.toSeq == Seq("value", "prediction"))
    assert(out.count() == 5)
    assert(out.select("prediction").as[Double].collect().forall(_ == 0.5))
    // default stub is deterministic: same input -> same prediction
    val d1 = graft.transform.TensorFlowServingTransform(
      "t1", "u", "tfs_in", "tfs_d1").execute(ctx).get.orderBy("value").collect()
    val d2 = graft.transform.TensorFlowServingTransform(
      "t2", "u", "tfs_in", "tfs_d2").execute(ctx).get.orderBy("value").collect()
    assert(d1.sameElements(d2))
  }

  test("get_uri and get_uri_array read local files") {
    graft.udf.Udfs.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("uris")
    java.nio.file.Files.write(dir.resolve("a.txt"), "alpha".getBytes)
    java.nio.file.Files.write(dir.resolve("b.txt"), "beta".getBytes)
    val r = spark.sql(
      s"SELECT get_uri('file://$dir/a.txt') AS one, get_uri_array('file://$dir/*.txt') AS many")
      .head()
    assert(new String(r.getAs[Array[Byte]]("one")) == "alpha")
    val many = r.getSeq[Array[Byte]](1).map(new String(_))
    assert(many == Seq("alpha", "beta")) // path-sorted
  }

  test("compile-only stages fail fast with a clear error when the dependency is absent") {
    val ctx = new PipelineContext(spark)
    // Each of these lacks its external dependency here (DB, fitted model);
    // the stage must surface the underlying error, not hang or no-op.
    intercept[Exception] {
      graft.execute.JDBCExecute("j", "jdbc:postgresql://127.0.0.1:1/none", "SELECT 1").execute(ctx)
    }
    intercept[Exception] {
      graft.extract.JDBCExtract("je", "jdbc:postgresql://127.0.0.1:1/none", "t", "jdbc_v").execute(ctx)
    }
    intercept[Exception] {
      graft.load.JDBCLoad("jl", "reg_a", "jdbc:postgresql://127.0.0.1:1/none", "t").execute(ctx)
    }
    intercept[Exception] {
      graft.transform.MLTransform("ml", "/nonexistent/model", "reg_a", "ml_v").execute(ctx)
    }
    intercept[Exception] {
      graft.extract.AvroExtract("av", "/nonexistent/file.avro", "avro_v").execute(ctx)
    }
    intercept[Exception] {
      graft.extract.ImageExtract("im", "/nonexistent/images", "img_v").execute(ctx)
    }
  }

  test("LogBuffer caps at 10k lines by dropping the oldest") {
    graft.core.LogBuffer.clear()
    (0 until 10500).foreach(i => graft.core.LogBuffer.append(s"line-$i"))
    val drained = graft.core.LogBuffer.drain()
    assert(drained.size == 10000 && drained.head == "line-500" &&
      drained.last == "line-10499", s"${drained.size} ${drained.headOption}")
    // drain reset the counter: the next append is retained normally
    graft.core.LogBuffer.append("fresh")
    assert(graft.core.LogBuffer.drain() == Seq("fresh"))
  }

  test("AuditLog round-trips records with quotes, backslashes and control chars") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("audit").toString + "/log"
    val nasty = "a\"b\\c\nd\te"
    graft.core.AuditLog.append(spark, dir,
      Seq("table" -> nasty, "rows" -> 7L))
    graft.core.AuditLog.append(spark, dir,
      Seq("table" -> "plain", "rows" -> 0L))
    val schema = StructType(Seq(
      StructField("table", StringType), StructField("rows", LongType),
      StructField("runId", StringType), StructField("completedAtMs", LongType)))
    val rows = graft.core.AuditLog.read(spark, dir, schema)
      .orderBy("completedAtMs")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSet == Set((nasty, 7L), ("plain", 0L)), rows.mkString(","))
    // a never-written log reads as an empty frame under the same schema
    assert(graft.core.AuditLog.read(spark, dir + "_none", schema).count() == 0)
  }
}
