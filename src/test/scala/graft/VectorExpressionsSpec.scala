package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.llm.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the composable zip_with form bit-for-bit") {
    val em = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(100)
    val pairs = em.select($"vec_id".as("ia"), $"embedding".as("a"))
      .crossJoin(em.select($"vec_id".as("ib"), $"embedding".as("b")))
      .limit(500)
    val diff = pairs.select(
      (VectorExpressions.vec_dot($"a", $"b") - Similarity.dotComposable($"a", $"b")).as("d")
    ).agg(max(abs($"d"))).head().getDouble(0)
    assert(diff == 0.0) // same element order, same doubles
  }

  test("vec_dot handles known values, null elements, and length mismatch") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(VectorExpressions.vec_dot($"a", $"b")).head().getDouble(0) == 32.0)
    val withNull = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(1.0, 1.0, 1.0))).toDF("a", "b")
    assert(withNull.select(VectorExpressions.vec_dot($"a", $"b")).head().getDouble(0) == 4.0)
    val mismatch = Seq((Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(mismatch.select(VectorExpressions.vec_dot($"a", $"b")).head().getDouble(0) == 11.0)
  }

  test("vec_dot null array yields null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(VectorExpressions.vec_dot($"a", $"b")).head().isNullAt(0))
  }

  test("vec_dot is registered for SQL and participates in codegen") {
    graft.udf.Udfs.register(spark)
    spark.read.parquet(s"${sf()}/embeddings.parquet").createOrReplaceTempView("emb_vx")
    val r = spark.sql(
      """SELECT vec_id, VEC_DOT(embedding, embedding) AS norm2
        FROM emb_vx ORDER BY vec_id LIMIT 3""").collect()
    assert(r.length == 3 && r.forall(_.getDouble(1) > 0))
    // plan stays inside whole-stage codegen (no UDF barrier)
    val plan = spark.sql("SELECT VEC_DOT(embedding, embedding) FROM emb_vx")
      .queryExecution.executedPlan.toString
    // '*(n)' prefix = operator inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("vec_cosine matches the composable cosine bit-for-bit") {
    val em = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(100)
    val pairs = em.select($"vec_id".as("ia"), $"embedding".as("a"))
      .crossJoin(em.select($"vec_id".as("ib"), $"embedding".as("b")))
      .limit(500)
    val diff = pairs.select(
      (VectorExpressions.vec_cosine($"a", $"b") - Similarity.cosineComposable($"a", $"b")).as("d")
    ).agg(max(abs($"d"))).head().getDouble(0)
    assert(diff == 0.0)
  }

  test("vec_cosine known values, zero vector, SQL registration, codegen") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.0, 0.0)))
      .toDF("a", "b", "c", "z")
    val r = df.select(
      VectorExpressions.vec_cosine($"a", $"b"),
      VectorExpressions.vec_cosine($"a", $"c"),
      VectorExpressions.vec_cosine($"a", $"z")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(r.getDouble(1)) < 1e-15)
    assert(r.getDouble(2) == 0.0) // zero-norm guard
    graft.udf.Udfs.register(spark)
    spark.read.parquet(s"${sf()}/embeddings.parquet").createOrReplaceTempView("emb_vc")
    val plan = spark.sql("SELECT VEC_COSINE(embedding, embedding) FROM emb_vc")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val self = spark.sql(
      "SELECT VEC_COSINE(embedding, embedding) AS c FROM emb_vc LIMIT 5").collect()
    assert(self.forall(r2 => math.abs(r2.getDouble(0) - 1.0) < 1e-12))
  }

  test("type mismatch is rejected at analysis") {
    val df = Seq((1, Seq(1.0))).toDF("n", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.vec_dot($"n", $"v")).collect()
    }
  }
}
