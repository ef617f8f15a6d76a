package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage-by-stage timing of the minhash pipeline at a given SF. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("scan only")(docs.count())
    val hashedShingles =
      array_distinct(transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)))
    val sh = docs.select(col("doc_id").as("_id"), hashedShingles.as("_sh"))
      .filter(size(col("_sh")) > 0)
    time("shingle hash")(sh.write.format("noop").mode("overwrite").save())
    val withSig = sh.withColumn("_sig", Dedup.minhashSignature(col("_sh"), 32))
      .repartition(col("_id"))
    time("sig (1st)")(withSig.write.format("noop").mode("overwrite").save())
    time("sig (2nd)")(withSig.write.format("noop").mode("overwrite").save())
    val banded = withSig.select(
      col("_id"),
      posexplode(
        array((0 until 8).map { b =>
          xxhash64(slice(col("_sig"), b * 4 + 1, 4), lit(b))
        }: _*)
      ).as(Seq("_band", "_bucket"))
    )
    time("banded")(banded.write.format("noop").mode("overwrite").save())
    val cands = Dedup.bucketCandidates(banded, Seq("_band", "_bucket"), "_id", 256)
    time("candidates")(println("  npairs=" + cands.count()))
    time("full minhashPairs")(
      println("  pairs=" + Dedup.minhashPairs(docs, "doc_id", "text").count()))
    time("full minhashPairs again")(
      println("  pairs=" + Dedup.minhashPairs(docs, "doc_id", "text").count()))
    spark.stop()
  }
}
