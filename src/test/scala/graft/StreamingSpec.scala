package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  /** The raw events table stores ns timestamps (unreadable by Spark's parquet
    * reader); materialize a µs-timestamp copy once for the streaming tests.
    */
  private lazy val eventsPath: String = {
    val out = "/tmp/graft_test_events_us.parquet"
    if (!new java.io.File(out).exists()) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"${sf()}/events.parquet")
        .withColumn("ts", expr("TIMESTAMP_MICROS(ts DIV 1000)"))
        .write.mode("overwrite").parquet(out)
    }
    out
  }

  test("file stream -> watermarked tumbling window agg -> memory sink") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream
      .schema(schema)
      .parquet(eventsPath)
    assert(stream.isStreaming)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_agg_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append mode only emits windows below the final watermark; the final
    // window(s) stay open, so compare against the batch count minus the tail.
    val streamed = spark.table("stream_agg_test").count()
    val batch = spark.read.parquet(eventsPath)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
      .count()
    assert(streamed > 0 && streamed <= batch)
  }

  test("rate source produces rows through RateExtract") {
    val ctx = new graft.core.PipelineContext(spark)
    val df = graft.extract.RateExtract("rate", "rate_view", rowsPerSecond = 100).execute(ctx).get
    assert(df.isStreaming)
    val q = df.writeStream.format("memory").outputMode("append").queryName("rate_test").start()
    try {
      var n = 0L
      val deadline = System.currentTimeMillis() + 15000
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        n = spark.table("rate_test").count()
      }
      assert(n > 0)
    } finally q.stop()
  }

  test("streaming dedup with dropDuplicates on stream") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id")
      .writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_dedup_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val users = spark.table("stream_dedup_test").select("user_id").distinct().count()
    val total = spark.table("stream_dedup_test").count()
    assert(total == users) // each user exactly once
  }
}
