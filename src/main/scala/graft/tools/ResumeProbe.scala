package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the x_resume driver query (full stack traces). */
object ResumeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SuiteQueries.resumedVerdicts(spark, "/root/testdata/sf0.01")
    df.show(50, truncate = false)
    spark.stop()
  }
}
