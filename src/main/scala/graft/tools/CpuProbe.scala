package graft.tools

import org.apache.spark.sql.functions._

/** Pure-CPU scaling probe: embarrassingly parallel hash-sum at two core
  * counts — establishes the machine's achievable scaling ceiling, separating
  * hardware limits from engine plan quality. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(400000000L)
    val cpuList = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 32)
    cpuList.foreach { cpus =>
      val spark = ScalingBench.session(cpus)
      // warmup
      spark.range(1000000).select(sum(pmod(xxhash64(col("id")), lit(1000)))).collect()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(n)
          .select(sum(pmod(xxhash64(col("id"), col("id") + 1, col("id") + 2), lit(1000))))
          .collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"cpus=$cpus min=${times.min}%.2f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
