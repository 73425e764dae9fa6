package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the nested-column vectorized parquet reader on the tokens scan. */
object ReadProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    Seq(true, false).foreach { nested =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("read-probe")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.parquet.enableNestedColumnVectorizedReader", nested.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      println("nested reader conf = " +
        spark.conf.get("spark.sql.parquet.enableNestedColumnVectorizedReader"))
      val dir = graft.Bench.ensureParquet(spark, rows)
      val df = spark.read.parquet(dir)
      df.agg(sum(size(col("tokens")))).collect() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(sum(size(col("tokens"))), sum(pmod(element_at(col("tokens"), 1), lit(97)))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"nested=$nested cpus=$cpus times=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
