package graft.tools

import org.apache.spark.sql.functions._

object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val spark = ScalingBench.session(8)
    val dir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val df = d.unionByName(d.where(col("doc_id") < 50).withColumn("doc_id", col("doc_id") + 100000))
    def time(n: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.1f s -> $r")
    }
    import graft.pipeline.{Dedup, TextAnalysis}
    time("shingles") { df.select(size(TextAnalysis.shingles(col("text"))).as("n")).agg(sum(col("n"))).collect()(0) }
    time("signature") { df.select(Dedup.minhashSignature(col("text")).as("s")).agg(sum(size(col("s")))).collect()(0) }
    time("buckets") { Dedup.lshBuckets(df, col("text"), col("doc_id")).count() }
    val cands = Dedup.minhashCandidates(df, col("text"), col("doc_id"))
    time("bucket sizes") {
      Dedup.lshBuckets(df, col("text"), col("doc_id")).groupBy("band","bucket").count()
        .agg(max("count"), expr("percentile(count, 0.99)"), count(lit(1))).collect()(0)
    }
    time("candidates") { cands.count() }
    time("verify") { Dedup.jaccardVerify(df, col("text"), col("doc_id"), cands, threshold=0.9).count() }
    spark.stop()
  }
}
