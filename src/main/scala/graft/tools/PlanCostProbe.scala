package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose a scaling-pair leg into driver-side plan compilation vs
  * execution: the plan (analysis → optimization → physical planning) is
  * single-threaded and row-count-independent, so it costs the SAME seconds
  * on both legs of the 1↔4-core pair — a fixed tax that deflates measured
  * scaling efficiency exactly like the 3e6-row hazard in BASELINE.md.
  * Usage: `runMain graft.tools.PlanCostProbe [rows] [reps]`. */
object PlanCostProbe {

  private def leg(cpus: Int, rows: Long, stages: Boolean = false): (Double, Double) = {
    val spark = ScalingBench.session(cpus)
    try {
      val listener = if (stages) Some(StageStats.attach(spark)) else None
      val dir = graft.Bench.ensureParquet(spark, rows)
      val df = spark.read.parquet(dir)
      val dim = graft.data.SequenceGen.dimSources(spark)
      val agg = graft.run.Suite.validateSequences(df, dim)
        .verdicts.agg(sum(col("violations")))
      val tp = System.nanoTime()
      agg.queryExecution.executedPlan
      val planSec = (System.nanoTime() - tp) / 1e9
      listener.foreach(_.reset())
      val te = System.nanoTime()
      agg.collect()
      val execSec = (System.nanoTime() - te) / 1e9
      listener.foreach(l => println(l.report(cpus)))
      (planSec, execSec)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    // warm JVM/Janino with one small full run
    leg(32, 50000L)
    (1 to reps).foreach { r =>
      Seq(1, 4).foreach { c =>
        val (p, e) = leg(c, rows, stages = c == 4)
        println(f"[plancost] rep$r local[$c] × $rows: plan $p%.2f s, exec $e%.2f s")
      }
    }
  }
}
