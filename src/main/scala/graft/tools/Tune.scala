package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for suite config experiments at fixed rows/cores. */
object Tune {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val aqe = args.lift(2).forall(_.toBoolean)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-tune")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "false")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.runSuite(spark, 50000L)
    val times = (1 to 3).map(_ => graft.Bench.runSuite(spark, rows)._1)
    println(f"rows=$rows cpus=$cpus aqe=$aqe times=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f")
    spark.stop()
  }
}
