package graft

class XmlSpec extends SparkSpec {
  test("XMLExtract parses rowTag elements into all-string columns") {
    val dir = java.nio.file.Files.createTempDirectory("xmlx")
    java.nio.file.Files.writeString(dir.resolve("a.xml"),
      """<orders>
        |  <order><id>1</id><price>10.5</price><tag>x</tag><tag>y</tag></order>
        |  <order><id>2</id><price>20.0</price></order>
        |</orders>""".stripMargin)
    java.nio.file.Files.writeString(dir.resolve("b.xml"),
      """<orders><order><id>3</id><note>hello</note></order></orders>""")
    val ctx = new graft.core.PipelineContext(spark)
    val df = graft.extract.XMLExtract("x", dir.toString, "xml_v", rowTag = "order")
      .execute(ctx).get
    assert(df.columns.toSeq == Seq("id", "note", "price", "tag"))
    assert(df.schema.fields.forall(_.dataType == org.apache.spark.sql.types.StringType))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("tag") == "x,y") // repeated tags concatenate
    assert(rows(2).getAs[String]("note") == "hello")
    assert(rows(2).getAs[String]("price") == null || rows(2).isNullAt(df.columns.indexOf("price")))
    // constructible from HOCON config too
    val stages = graft.core.PipelineConfig.parse(
      s"""{stages: [{type = "XMLExtract", name = "x2", inputURI = "$dir",
         outputView = "xml_v2", rowTag = "order"}]}""")
    graft.core.Runner.run(stages, ctx)
    assert(spark.table("xml_v2").count() == 3)
  }
}

import org.apache.spark.sql.functions._
import graft.core.{PipelineContext, Runner}
import graft.extract.{DelimitedExtract, JSONExtract, ORCExtract, ParquetExtract, ParquetMeta, TextExtract, BytesExtract, HTTPExtract}
import graft.load._
import graft.schema.FieldSpec
import graft.transform.TypingTransform

/** Round-trip coverage: each Load writes a view, the matching Extract reads
  * it back, contents must survive.
  */
class LoadsSpec extends SparkSpec {

  private lazy val tmp = {
    val d = java.nio.file.Files.createTempDirectory("graft_loads").toString
    d
  }

  private def ctxWithNation(): PipelineContext = {
    val ctx = new PipelineContext(spark)
    Runner.run(Seq(ParquetExtract("e", s"${sf()}/nation.parquet", "nation_src")), ctx)
    ctx
  }

  test("ParquetLoad -> ParquetExtract round-trip with partitionBy") {
    val ctx = ctxWithNation()
    ParquetLoad("l", "nation_src", s"$tmp/nation_pq", partitionBy = Seq("n_regionkey")).execute(ctx)
    ParquetExtract("e2", s"$tmp/nation_pq", "nation_back").execute(ctx)
    val back = spark.table("nation_back")
    assert(back.count() == 25)
    // partition column moves to the end but survives with correct values
    assert(back.select(countDistinct(col("n_regionkey"))).head().getLong(0) == 5)
    // physical layout: one directory per region key
    val dirs = new java.io.File(s"$tmp/nation_pq").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("n_regionkey=")) == 5)
  }

  test("ParquetLoad dynamic partition overwrite replaces only the incoming partitions") {
    val ctx = ctxWithNation()
    val out = s"$tmp/nation_dpo"
    ParquetLoad("l", "nation_src", out, partitionBy = Seq("n_regionkey")).execute(ctx)
    // incremental batch: region 2 only, with rewritten names
    spark.table("nation_src").filter(col("n_regionkey") === 2)
      .withColumn("n_name", lit("REWRITTEN"))
      .createOrReplaceTempView("nation_r2")
    ParquetLoad("l2", "nation_r2", out, partitionBy = Seq("n_regionkey"),
      dynamicPartitionOverwrite = true).execute(ctx)
    val back = spark.read.parquet(out)
    // all five regions still present — static overwrite would have truncated
    assert(back.select(countDistinct(col("n_regionkey"))).head().getLong(0) == 5)
    assert(back.count() == 25)
    // region 2 was replaced, others untouched
    assert(back.filter(col("n_regionkey") === 2 && col("n_name") =!= "REWRITTEN").count() == 0)
    assert(back.filter(col("n_regionkey") =!= 2 && col("n_name") === "REWRITTEN").count() == 0)
    // and WITHOUT the flag, overwrite truncates the whole dataset
    ParquetLoad("l3", "nation_r2", out, partitionBy = Seq("n_regionkey")).execute(ctx)
    assert(spark.read.parquet(out).select(countDistinct(col("n_regionkey"))).head().getLong(0) == 1)
  }

  test("ORCLoad -> ORCExtract round-trip") {
    val ctx = ctxWithNation()
    ORCLoad("l", "nation_src", s"$tmp/nation_orc").execute(ctx)
    ORCExtract("e2", s"$tmp/nation_orc", "nation_orc_back").execute(ctx)
    assert(spark.table("nation_orc_back").count() == 25)
  }

  test("DelimitedLoad -> DelimitedExtract -> TypingTransform recovers typed values") {
    val ctx = ctxWithNation()
    DelimitedLoad("l", "nation_src", s"$tmp/nation_csv", delimiter = ";").execute(ctx)
    DelimitedExtract("e2", s"$tmp/nation_csv", "nation_csv_back", delimiter = ";").execute(ctx)
    val raw = spark.table("nation_csv_back")
    assert(raw.schema.fields.forall(_.dataType.typeName == "string")) // all-string contract
    TypingTransform(
      "t",
      Seq(FieldSpec("n_nationkey", "integer"), FieldSpec("n_name", "string"),
          FieldSpec("n_regionkey", "integer")),
      "nation_csv_back", "nation_typed"
    ).execute(ctx)
    val typed = spark.table("nation_typed")
    assert(typed.filter(size(col("_errors")) > 0).count() == 0)
    assert(typed.select(sum(col("n_nationkey"))).head().getLong(0) == (0 until 25).sum)
  }

  test("JSONLoad -> JSONExtract round-trip") {
    val ctx = ctxWithNation()
    JSONLoad("l", "nation_src", s"$tmp/nation_json").execute(ctx)
    JSONExtract("e2", s"$tmp/nation_json/*.json", "nation_json_back", multiLine = false).execute(ctx)
    assert(spark.table("nation_json_back").count() == 25)
  }

  test("TextLoad -> TextExtract round-trip") {
    val ctx = ctxWithNation()
    spark.table("nation_src").select(col("n_name")).createOrReplaceTempView("names_only")
    TextLoad("l", "names_only", s"$tmp/nation_txt").execute(ctx)
    TextExtract("e2", s"$tmp/nation_txt", "nation_txt_back").execute(ctx)
    assert(spark.table("nation_txt_back").count() == 25)
  }

  test("BytesExtract reads whole files as binary rows") {
    val ctx = new PipelineContext(spark)
    BytesExtract("b", s"${sf()}/nation.parquet", "nation_bytes").execute(ctx)
    val row = spark.table("nation_bytes").select("length", "path").head()
    assert(row.getLong(0) > 1000)
  }

  test("HTTPExtract stub reads file: URIs") {
    val ctx = new PipelineContext(spark)
    val f = java.nio.file.Files.createTempFile("graft_http", ".txt")
    java.nio.file.Files.writeString(f, "hello body")
    HTTPExtract("h", f.toUri.toString, "http_out").execute(ctx)
    val row = spark.table("http_out").head()
    assert(row.getAs[String]("body") == "hello body")
  }

  test("ParquetMeta.rowCount is footer-exact and ignores hidden path segments") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqmeta").toString + "/t"
    (1 to 137).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    assert(ParquetMeta.rowCount(spark, dir) == 137L)
    // decoy: an in-flight write's _temporary part file must not count
    val tmp = new java.io.File(s"$dir/_temporary/0")
    tmp.mkdirs()
    val src = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(src.toPath, new java.io.File(tmp, src.getName).toPath)
    assert(ParquetMeta.rowCount(spark, dir) == 137L)
    // matches the official table count at real scale
    assert(ParquetMeta.rowCount(spark, s"${sf()}/documents.parquet") ==
      spark.read.parquet(s"${sf()}/documents.parquet").count())
  }
}
