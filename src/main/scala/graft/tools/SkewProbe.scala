package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: why doesn't the x_skew_uniqueness join-back skew-split? */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sess.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    sess.conf.set("spark.sql.shuffle.partitions", "8")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    sess.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    sess.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    val id = col("event_id")
    val key = when(pmod(id, lit(10)) < 3, lit("hot"))
      .otherwise(concat(lit("k"), id.cast("string")))
    val df = sess.read.parquet("/root/testdata/sf0.1/events.parquet").select(
      key.as("doc_id"), md5(id.cast("string")).as("part"))
    val v = graft.dataset.CrossRow.uniqueness(df, "doc_id", "part", checkpointDups = true)
    println("rows=" + v.violations.collect().length)
    val plan = v.violations.queryExecution.executedPlan
    SuitePlanProbe.walk(plan).foreach(p => println("NODE " + p.getClass.getSimpleName +
      " :: " + p.toString.linesIterator.next().take(200)))
    spark.stop()
  }
}
