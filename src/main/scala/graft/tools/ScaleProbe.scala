package graft.tools
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(30000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = ScalingBench.session(32)
    graft.Bench.ensureParquet(spark, rows)
    graft.Bench.runSuite(spark, 50000L) // warm
    val ts = (1 to reps).map(_ => graft.Bench.runSuite(spark, rows)._1)
    println(f"[scale] suite $rows rows: min ${ts.min}%.2f s (${rows / ts.min}%.0f seq/s; all ${ts.map(t => f"$t%.1f").mkString(", ")})")
    spark.stop()
  }
}
