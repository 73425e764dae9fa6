package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the flagship entry end-to-end on sf0.001 and prints plans —
  * `sbt "runMain graft.tools.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val verdicts = graft.SparkEntry.entry(spark)
    println("=== verdicts (sf0.001 documents) ===")
    verdicts.show(50, truncate = false)

    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    println("=== sample violations ===")
    graft.Queries.documentViolations(spark, sfDir).show(10, truncate = false)

    println("=== physical plan (verdicts) ===")
    verdicts.explain("formatted")

    spark.stop()
  }
}
