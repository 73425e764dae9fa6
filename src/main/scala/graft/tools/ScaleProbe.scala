package graft.tools
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = ScalingBench.session(32)
    graft.Bench.ensureParquet(spark, 30000000L)
    graft.Bench.runSuite(spark, 50000L) // warm
    val ts = (1 to 2).map(_ => graft.Bench.runSuite(spark, 30000000L)._1)
    println(f"[scale] suite 3e7 rows: min ${ts.min}%.2f s (${30000000 / ts.min}%.0f seq/s; all ${ts.map(t => f"$t%.1f").mkString(", ")})")
    spark.stop()
  }
}
