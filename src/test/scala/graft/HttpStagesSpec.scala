package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import com.sun.net.httpserver.HttpServer
import graft.core.PipelineContext

/** The HTTP stages against a REAL server (JDK com.sun.net.httpserver on
  * loopback): default transports are genuine HTTP round-trips, not stubs.
  */
class HttpStagesSpec extends SparkSpec {
  import spark.implicits._

  private var server: HttpServer = _
  private var base: String = _
  private val hits = new AtomicInteger(0)
  private val lastBody = new AtomicReference[String]("")

  private def ensureServer(): Unit = if (server == null) {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data", ex => {
      val b = "payload from server".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.createContext("/upper", ex => {
      val in = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val b = in.toUpperCase.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.createContext("/sink", ex => {
      hits.incrementAndGet()
      lastBody.set(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(201, -1); ex.close()
    })
    server.createContext("/tfs", ex => {
      val n = new String(ex.getRequestBody.readAllBytes(), "UTF-8").linesIterator.size
      val b = (1 to n).map(_ => "0.25").mkString("{\"predictions\": [", ",", "]}").getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  test("HTTPExtract GETs a real endpoint") {
    ensureServer()
    val ctx = new PipelineContext(spark)
    val df = graft.extract.HTTPExtract("he", s"$base/data", "http_v").execute(ctx).get
    assert(df.select("body").head().getString(0) == "payload from server")
  }

  test("HTTPTransform POSTs each row and appends the real response") {
    ensureServer()
    val ctx = new PipelineContext(spark)
    Seq("alpha", "beta").toDF("value").createOrReplaceTempView("ht_in")
    val out = graft.transform.HTTPTransform("ht", s"$base/upper", "ht_in", "ht_out")
      .execute(ctx).get
    val got = out.select("value", "response").as[(String, String)].collect().toMap
    assert(got == Map("alpha" -> "ALPHA", "beta" -> "BETA"))
  }

  test("HTTPLoad POSTs JSON batches; non-2xx fails the stage") {
    ensureServer()
    val ctx = new PipelineContext(spark)
    hits.set(0)
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
      .coalesce(1).createOrReplaceTempView("hl_in")
    graft.load.HTTPLoad("hl", "hl_in", s"$base/sink", batchSize = 2).execute(ctx)
    assert(hits.get() == 2) // 3 rows, batchSize 2 -> two POSTs
    assert(lastBody.get().contains("\"id\""))
    val err = intercept[Exception] {
      graft.load.HTTPLoad("hl2", "hl_in", s"$base/nope").execute(ctx)
    }
    assert(err.getMessage != null)
  }

  test("HTTPExecute posts for real and enforces validStatusCodes") {
    ensureServer()
    val ctx = new PipelineContext(spark)
    graft.execute.HTTPExecute("hx", s"$base/sink", payload = "ping",
      validStatusCodes = Seq(201)).execute(ctx)
    intercept[graft.core.ValidationException] {
      graft.execute.HTTPExecute("hx2", s"$base/nope", payload = "ping").execute(ctx)
    }
  }

  test("TensorFlowServingTransform over a live REST endpoint") {
    ensureServer()
    val ctx = new PipelineContext(spark)
    Seq("a", "b", "c").toDF("value").createOrReplaceTempView("tfs_live_in")
    val out = graft.transform.TensorFlowServingTransform(
      "tfs", s"$base/tfs", "tfs_live_in", "tfs_live_out",
      transport = graft.transform.TensorFlowServingTransform.http
    ).execute(ctx).get
    assert(out.select("prediction").as[Double].collect().toSeq == Seq(0.25, 0.25, 0.25))
  }

  override def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    try super.withFixture(test)
    finally if (test.name.contains("live REST") && server != null) { server.stop(0); server = null }
  }
}
