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

  test("graft_all_in_range matches the forall+pred composition on every edge") {
    assert(spark.catalog.functionExists("graft_all_in_range"))
    val vocab = 32000L
    // random arrays + targeted edges: null array, empty, null element,
    // boundary values 0 / vocab-1 / vocab / -1, min/max longs
    val rnd = new scala.util.Random(7)
    val data: Seq[Option[Seq[Option[Long]]]] =
      Seq.fill(200)(Some(Seq.fill(rnd.nextInt(6))(Some(rnd.between(-2L, vocab + 2L))))) ++
        Seq(None, Some(Seq.empty), Some(Seq(Some(0L))), Some(Seq(Some(vocab - 1))),
          Some(Seq(Some(vocab))), Some(Seq(Some(-1L))), Some(Seq(None)),
          Some(Seq(Some(0L), None, Some(5L))), Some(Seq(Some(Long.MinValue))),
          Some(Seq(Some(Long.MaxValue))))
    val df = data.toDF("a")
    def hof(lo: Long, hi: Long) =
      forall(col("a"), e => e.isNotNull && e >= lo && e < hi)
    def native(lo: Long, hi: Long) =
      call_function("graft_all_in_range", col("a"), lit(lo), lit(hi), lit(false), lit(true))
    val rows = df.select(native(0L, vocab).as("n"), hof(0L, vocab).as("h")).collect()
    rows.zip(data).foreach { case (r, in) =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getBoolean(0) == r.getBoolean(1)),
        s"mismatch on $in: native=${r.get(0)} hof=${r.get(1)}")
    }
    // inclusive upper + open lower (MinValue sentinel) over int arrays
    val ints = Seq(Seq(1, 2, 3), Seq(0, 10), Seq(-5)).toDF("a")
    val r2 = ints.select(
      call_function("graft_all_in_range", col("a"),
        lit(Long.MinValue), lit(10L), lit(false), lit(false)).as("n"),
      forall(col("a"), e => e.isNotNull && e <= 10).as("h")).collect()
    r2.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("typed items range-check compiles to graft_all_in_range and stays in codegen") {
    import graft.spec.SpecParser
    import graft.run.Validator
    val df = spark.range(50)
      .select(col("id").cast("string").as("doc_id"),
        array(col("id").cast("int"), lit(3)).as("tokens"))
    val spec = SpecParser.parse(
      """{"type":"object","required":["tokens"],
         "properties":{"tokens":{"type":"array",
           "items":{"type":"integer","minimum":0,"exclusiveMaximum":10}}}}""")
    val v = Validator.validate(df, spec, docId = "doc_id", part = None)
    val p = v.verdicts.queryExecution.executedPlan.toString
    assert(p.contains("graft_all_in_range"),
      "items range check did not use the native expression:\n" + p)
    assert(!p.contains("forall("), "interpreted forall still present:\n" + p)
    // and the verdict counts are what the composable form would produce:
    // ids 0-9 pass (0..9 in range, 3 in range), 10-49 fail on the first elem
    val counts = v.verdicts.collect()
      .map(r => r.getAs[String]("constraint_id") -> r.getAs[Long]("violations")).toMap
    assert(counts(".tokens/items") == 40L, counts.toString)
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
