package graft.tools

/** Time individual driver queries: `runMain graft.tools.QueryProbe <sfDir> q1 q2 …`
  * (reps via SPARK_GRAFT_REPS, default 2 — min is the reported number). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = ScalingBench.session(32)
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val fn = qs(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n: min ${ts.min}%.2f s  (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
