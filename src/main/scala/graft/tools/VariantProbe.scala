package graft.tools

import org.apache.spark.sql.functions._

object VariantProbe {
  def main(args: Array[String]): Unit = {
    val spark = ScalingBench.session(4)
    import spark.implicits._
    val df = Seq(
      """{"a": 1, "b": "x", "c": [1,2,3]}""",
      """[1, 2, 3]""",
      """"hello"""",
      """42""",
      """4.5""",
      """true""",
      """null"""
    ).toDF("js").select(parse_json(col("js")).as("v"))
    df.select(
      schema_of_variant(col("v")).as("schema"),
      try_variant_get(col("v"), "$", "string").as("as_str"),
      try_variant_get(col("v"), "$", "double").as("as_dbl"),
      try_variant_get(col("v"), "$", "array<variant>").as("as_arr"),
      try_variant_get(col("v"), "$.a", "long").as("a_long"),
      is_variant_null(col("v")).as("is_null")
    ).show(10, truncate = false)
    // element-level checks over variant arrays
    df.where(schema_of_variant(col("v")).startsWith("ARRAY")).select(
      forall(try_variant_get(col("v"), "$", "array<variant>"),
        e => try_variant_get(e, "$", "long") >= 2).as("forall_ge2"),
      size(try_variant_get(col("v"), "$", "array<variant>")).as("n")
    ).show(5, truncate = false)
    // object keys
    df.select(try_variant_get(col("v"), "$", "map<string,variant>").as("m"))
      .select(map_keys(col("m"))).show(5, truncate = false)
    spark.stop()
  }
}
