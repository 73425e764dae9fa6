package graft.tools
import org.apache.spark.sql.functions._
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = ScalingBench.session(8)
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val spec = graft.spec.SpecParser.parse(
      """{"type":"object","required":["k"],
         "properties":{"k":{"type":"integer","minimum":0,"maximum":50}}}""")
    val v = graft.run.Validator.validateJson(ev, spec, "props", "event_id", None)
    val plan = v.violations.queryExecution.executedPlan.toString
    println("=== occurrences in violations physical plan ===")
    for (tok <- Seq("schema_of_variant", "variant_get", "parse_json", "to_json"))
      println(s"$tok: ${tok.r.findAllIn(plan).length}")
    println(plan.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
