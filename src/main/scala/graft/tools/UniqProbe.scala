package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: per-stage cost of the uniqueness path at 1e7 rows, plus an A/B
  * of the salted two-stage vs a single-exchange partial-agg formulation. */
object UniqProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = ScalingBench.session(32)
    val dir = graft.Bench.ensureParquet(spark, rows)
    val df = spark.read.parquet(dir)
    val stats = StageStats.attach(spark)

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[uniq] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} s")
    }

    // current salted two-stage
    stats.reset()
    time("two-stage salted") {
      graft.dataset.CrossRow.duplicateKeys(df, "doc_id").count()
    }
    println(stats.report(32))

    // A/B: single-exchange hash count (map-side partial agg handles skew for count)
    stats.reset()
    time("single-exchange") {
      val hashed = df.select(col("doc_id"), xxhash64(col("doc_id")).as("_kh"))
      val dupHashes = hashed.select(col("_kh")).groupBy(col("_kh"))
        .agg(count(lit(1)).as("_hc")).where(col("_hc") > 1).select(col("_kh"))
      hashed.join(dupHashes, Seq("_kh"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1).count()
    }
    println(stats.report(32))
    spark.stop()
  }
}
