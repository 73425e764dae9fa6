package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import Harness.spark

/** Native graft_dot expression: registration via SparkSessionExtensions,
  * bit-parity with the HOF fold, null semantics, SQL surface, and
  * whole-stage-codegen participation. */
class ExtSpec extends AnyFunSuite {
  import spark.implicits._

  test("graft_dot is registered and bit-identical to the aggregate/zip_with fold") {
    assert(spark.catalog.functionExists("graft_dot"))
    val rnd = new scala.util.Random(1)
    val rows = Seq.fill(100)((Array.fill(64)(rnd.nextDouble()), Array.fill(64)(rnd.nextDouble())))
    val both = rows.toDF("a", "b").select(
        call_function("graft_dot", col("a"), col("b")).as("n"),
        aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
          lit(0.0d), (acc, v) => acc + v).as("h"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1), "not bit-identical"))
  }

  test("graft_dot null semantics match zip_with padding/propagation") {
    // length mismatch → null (zip_with pads with null)
    val mism = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b"))).collect()(0)
    assert(mism.isNullAt(0))
    // null element → null
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, cast(null as double)), array(1.0d, 2.0d))").collect()(0)
    assert(r.isNullAt(0))
    // SQL surface + empty arrays → 0.0
    assert(spark.sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d))")
      .collect()(0).getDouble(0) == 11.0)
    assert(spark.sql("SELECT graft_dot(cast(array() as array<double>), cast(array() as array<double>))")
      .collect()(0).getDouble(0) == 0.0)
  }

  test("graft_variant_kind agrees with schema_of_variant gates on every JSON shape") {
    assert(spark.catalog.functionExists("graft_variant_kind"))
    val shapes = Seq(
      """{"a":1}""" -> 0, """[1,2]""" -> 1, """"s"""" -> 2,
      """5""" -> 3, """5.5""" -> 3, """1e60""" -> 3, """0.1""" -> 3,
      """true""" -> 4, """null""" -> 5)
    shapes.foreach { case (json, expected) =>
      val r = spark.sql(
        s"SELECT graft_variant_kind(parse_json('${json.replace("'", "''")}'))")
        .collect()(0).getInt(0)
      assert(r == expected, s"$json → $r, expected $expected")
    }
    // SQL-null variant → null kind
    assert(spark.sql("SELECT graft_variant_kind(cast(null as variant))")
      .collect()(0).isNullAt(0))
  }

  test("graft_dot runs inside whole-stage codegen (the HOF form cannot)") {
    // non-literal input so ConvertToLocalRelation can't fold the projection
    val df = spark.range(10)
      .select(array(col("id").cast("double"), lit(2.0d)).as("a"),
              array(lit(3.0d), col("id").cast("double")).as("b"))
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("graft_dot")),
      "graft_dot not inside a WholeStageCodegen span:\n" + p)
  }
}
