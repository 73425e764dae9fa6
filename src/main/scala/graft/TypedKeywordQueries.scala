package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.Messages
import graft.run.Validator
import graft.spec.SpecParser

/** Per-keyword driver-oracle battery for the TYPED-COLUMN compiler (the
  * flagship path — `KeywordQueries` covers the same keyword semantics in
  * variant mode, but the typed compiler takes different code paths:
  * driver-static propertyNames, schema-regex patternProperties column
  * selection, static additionalProperties diff, typed-array prefixItems /
  * items with per-element-type messages, presence ≡ non-null).
  *
  * Same protocol: typed columns derived from `event_id mod 8` (literal
  * per-residue fixtures), full `Validator.validate` run, oracle enumerates
  * expected violation rows per residue class independently. */
object TypedKeywordQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  private def m: Column = pmod(col("event_id"), lit(8))

  private def run(df: DataFrame, spec: String): DataFrame =
    Validator.validate(df, SpecParser.parse(spec), docId = "event_id", part = None)
      .violations.drop("rank").drop("part")
      .repartition(1).sortWithinPartitions("doc_id", "constraint_id")

  private def arm(mv: Int, cid: String, path: String, observed: String,
                  message: String): String = {
    def q(s: String) = if (s == null) "CAST(NULL AS VARCHAR)"
                       else "'" + s.replace("'", "''") + "'"
    s"""SELECT event_id, ${q(cid)} AS constraint_id, ${q(path)} AS path,
               ${q(observed)} AS observed, ${q(message)} AS message
        FROM events WHERE event_id % 8 = $mv"""
  }

  private def oracle(arms: Seq[(Int, String, String, String, String)],
                     everyRow: Seq[(String, String, String, String)] = Seq.empty): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val armSql = arms.map { case (mv, cid, p, o, msg) => arm(mv, cid, p, o, msg) }
    val everySql = everyRow.map { case (cid, p, o, msg) =>
      s"""SELECT event_id, ${q(cid)} AS constraint_id, ${q(p)} AS path,
                 ${q(o)} AS observed, ${q(msg)} AS message FROM events"""
    }
    s"""SELECT event_id AS doc_id, constraint_id, path, observed, message FROM (
        ${(armSql ++ everySql).mkString("\n UNION ALL\n")}
        ) ORDER BY doc_id, constraint_id"""
  }

  // -- typed object keywords -------------------------------------------------

  private val objectSpec =
    """{"type":"object",
       "required":["event_id","a"],
       "dependentRequired":{"b":["c"]},
       "dependentSchemas":{"p_x":{"type":"object","required":["a"]}},
       "propertyNames":{"maxLength":12},
       "minProperties":2,"maxProperties":5,
       "properties":{"a":{"type":"integer","minimum":0}},
       "patternProperties":{"^p_":{"type":"number","maximum":100}}}"""

  private def objectDf(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id"),
      when(m === 1, lit(null).cast("bigint"))
        .when(m === 2, lit(-5L)).otherwise(col("event_id")).as("a"),
      when(m === 3 || m === 4, lit(7L)).otherwise(lit(null).cast("bigint")).as("b"),
      when(m === 4 || m === 5, lit(9L)).otherwise(lit(null).cast("bigint")).as("c"),
      when(m === 6, lit(150.0d)).otherwise(lit(50.0d)).as("p_x"),
      lit("x").as("waytoolongcolumn"))

  private val objectOracle = oracle(
    arms = Seq(
      (1, "./required:a", ".", null, Messages.required("a")),
      (1, ".~dep(p_x)/required:a", ".", null, Messages.required("a")),
      (2, ".a/minimum", ".a", "-5", Messages.minimum(0)),
      (3, "./dependentRequired(b,c)", ".", null, Messages.dependentRequired("c", "b")),
      (4, "./maxProperties", ".", "6", Messages.maxProperties(5)),
      (6, ".p_x~pp0/maximum", ".p_x", "150.0", Messages.maximum(100))),
    everyRow = Seq(
      // driver-STATIC propertyNames: the 16-char column name fails at
      // compile time, so every row carries the violation
      ("./propertyNames(waytoolongcolumn)/maxLength", ".waytoolongcolumn",
        "waytoolongcolumn", Messages.maxLength(12))))

  // -- typed array keywords + additionalProperties:false + format ------------

  private val arraySpec =
    """{"type":"object",
       "required":["event_id"],
       "properties":{
         "event_id":{"type":"integer"},
         "xs":{"type":"array","items":{"type":"integer","minimum":0},
               "uniqueItems":true,"maxItems":6},
         "tup":{"type":"array",
                "prefixItems":[{"type":"string","minLength":2},
                               {"type":"string","pattern":"^[0-9]+$"}],
                "items":false},
         "s":{"type":"string","format":"uuid"}},
       "additionalProperties":false}"""

  private val Uuid = "123e4567-e89b-12d3-a456-426614174000"

  private def arrayDf(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id"),
      when(m === 0, array(lit(1L), lit(2L), lit(3L)))
        .when(m === 1, array(lit(1L), lit(-2L)))
        .when(m === 2, array(lit(1L), lit(1L)))
        .when(m === 3, sequence(lit(1L), lit(7L)))
        .otherwise(lit(null).cast("array<bigint>")).as("xs"),
      when(m === 0, array(lit("ab"), lit("12")))
        .when(m === 4, array(lit("x"), lit("12")))
        .when(m === 5, array(lit("ab"), lit("xy")))
        .when(m === 6, array(lit("ab"), lit("12"), lit("zz")))
        .otherwise(lit(null).cast("array<string>")).as("tup"),
      when(m === 0, lit(Uuid))
        .when(m === 7, lit("not-a-uuid"))
        .otherwise(lit(null).cast("string")).as("s"),
      when(m === 5, lit("x")).otherwise(lit(null).cast("string")).as("extra"))

  private val arrayOracle = oracle(Seq(
    (1, ".xs/items", ".xs", "[-2]", Messages.minimum(0)),
    (2, ".xs/uniqueItems", ".xs", "[1,1]", Messages.uniqueItems),
    (3, ".xs/maxItems", ".xs", "7", Messages.maxItems(6)),
    (4, ".tup/prefixItems[0]", ".tup[0]", "x", Messages.minLength(2)),
    (5, ".tup/prefixItems[1]", ".tup[1]", "xy", Messages.pattern("^[0-9]+$")),
    (6, ".tup/items:false", ".tup", "3", Messages.tupleLength(2)),
    (5, "./additionalProperties", ".", """{"extra":"x"}""", Messages.additionalProperties),
    (7, ".s/format", ".s", "not-a-uuid", Messages.format("uuid"))))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_kw_object" -> ((s, dir) => run(objectDf(s, dir), objectSpec)),
    "t_kw_array" -> ((s, dir) => run(arrayDf(s, dir), arraySpec)))

  val oracles: Map[String, String] = Map(
    "t_kw_object" -> objectOracle,
    "t_kw_array" -> arrayOracle)
}
