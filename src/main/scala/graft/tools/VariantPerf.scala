package graft.tools

import org.apache.spark.sql.functions._

object VariantPerf {
  def main(args: Array[String]): Unit = {
    val spark = ScalingBench.session(32)
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    def time(n: String)(f: => Any): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$n rep$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    time("parse only") {
      ev.select(parse_json(col("props")).as("v")).select(count(lit(1))).collect()
    }
    time("parse + schema_of_variant") {
      ev.select(schema_of_variant(parse_json(col("props"))).as("t"))
        .groupBy("t").count().collect()
    }
    time("parse + 1 variant_get") {
      ev.select(try_variant_get(parse_json(col("props")), "$.k", "double").as("k"))
        .agg(sum("k")).collect()
    }
    val spec = graft.spec.SpecParser.parse(
      """{"type":"object","required":["k"],
         "properties":{"k":{"type":"integer","minimum":0,"maximum":50}}}""")
    time("full validateJson verdicts") {
      graft.run.Validator.validateJson(ev, spec, "props", "event_id", None)
        .verdicts.agg(sum("violations")).collect()
    }
    time("full validateJson violations") {
      graft.run.Validator.validateJson(ev, spec, "props", "event_id", None)
        .violations.count()
    }
    time("violations ordered (driver query shape)") {
      graft.run.Validator.validateJson(ev, spec, "props", "event_id", None)
        .violations.drop("rank").drop("part")
        .orderBy("doc_id", "constraint_id")
        .write.format("noop").mode("overwrite").save()
    }
    // codegen participation: if the extraction projection prints INSIDE a
    // WholeStageCodegen span, Spark 4.1's VariantGet doGenCode is active and
    // a custom native extraction Expression buys nothing structural
    val probe = ev.select(parse_json(col("props")).as("v"))
      .select(try_variant_get(col("v"), "$", "map<string,variant>").as("m"),
        try_variant_get(col("v"), "$.k", "double").as("k"))
      .agg(sum(col("k")))
    probe.collect() // AQE prints codegen spans only in the FINAL plan
    println(probe.queryExecution.executedPlan.toString.linesIterator.take(20).mkString("\n"))
    spark.stop()
  }
}
