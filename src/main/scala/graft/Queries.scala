package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.run.Validator
import graft.spec.SpecParser

/** The driver-facing query battery: every entry has a DuckDB oracle twin in
  * `oracles` (column names aligned — the driver sorts columns by name before
  * hashing). Grows one entry per operator from SURVEY.md §2. */
object Queries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Per-constraint verdict rows for the flagship documents spec. */
  def documentVerdicts(s: SparkSession, dir: String): DataFrame =
    Validator.validate(docs(s, dir), SpecParser.parse(SparkEntry.DocSpecJson),
        docId = "doc_id", part = None)
      .verdicts.drop("rank").orderBy("constraint_id")

  /** Ordered violation rows for the flagship documents spec. */
  def documentViolations(s: SparkSession, dir: String): DataFrame =
    Validator.validate(docs(s, dir), SpecParser.parse(SparkEntry.DocSpecJson),
        docId = "doc_id", part = None)
      .violations.drop("rank").drop("part")
      .repartition(1).sortWithinPartitions("constraint_id", "doc_id")

  /** The SAME flagship spec built through the fluent DSL instead of parsed
    * JSON — driver-gated proof the two spec front-ends compile to identical
    * checks (messages, paths, ordering): the oracle is
    * `v_documents_violations`' SQL verbatim, so any DSL↔JSON divergence is a
    * hash mismatch. */
  def documentViolationsFluent(s: SparkSession, dir: String): DataFrame = {
    import graft.spec.Fluent._
    val spec = obj
      .required("doc_id", "text", "source")
      .prop("doc_id", int.min(0))
      .prop("text", str.minLength(1))
      .prop("lang", str.enum("en", "de", "fr", "es"))
      .prop("source", str.pattern("^src[0-9]+$"))
      .prop("n_chars", int.min(0).max(500))
    Validator.validate(docs(s, dir), spec, docId = "doc_id", part = None)
      .violations.drop("rank").drop("part")
      .repartition(1).sortWithinPartitions("constraint_id", "doc_id")
  }

  /** The flagship spec compiled under a SWAPPED i18n table — driver-gated
    * proof of the `set_lang` analog (reference i18n.cr:87-117): one fixed
    * string and one interpolated entry overridden, every other id falling
    * back to EN_US. Messages bake into literal Columns at compile time, so
    * the swap brackets only the compile; the oracle is the EN SQL with the
    * two literals substituted — wrong fallback or interpolation is a hash
    * mismatch. */
  def documentViolationsI18n(s: SparkSession, dir: String): DataFrame = {
    import graft.compile.I18n
    I18n.setLang(Map[Int, I18n.Entry](
      10 -> Left(I18nEnumMsg),
      43 -> Right(a => s"La cadena no coincide con /${a(0)}/")))
    try
      Validator.validate(docs(s, dir), SpecParser.parse(SparkEntry.DocSpecJson),
          docId = "doc_id", part = None)
        .violations.drop("rank").drop("part")
        .repartition(1).sortWithinPartitions("constraint_id", "doc_id")
    finally I18n.reset()
  }

  private val I18nEnumMsg = "Valor fuera del enum"

  /** Classic aggregation sanity query (map-side partial agg + tiny shuffle). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_documents_verdicts" -> (documentVerdicts _),
    "v_documents_violations" -> (documentViolations _),
    "v_documents_fluent" -> (documentViolationsFluent _),
    "v_documents_i18n" -> (documentViolationsI18n _),
    "q1_agg" -> (q1Agg _)
  ) ++ PipelineQueries.all ++ KeywordQueries.all ++ SuiteQueries.all ++ ExtQueries.all ++ TypedKeywordQueries.all

  /** DuckDB twins. The verdict oracle enumerates each compiled constraint in
    * id order with its violation predicate — an independent re-derivation of
    * the spec semantics, not a port of the Spark plan. */
  val oracles: Map[String, String] = PipelineQueries.oracles ++ KeywordQueries.oracles ++ SuiteQueries.oracles ++ ExtQueries.oracles ++ TypedKeywordQueries.oracles ++ Map(
    "v_documents_verdicts" ->
      """WITH d AS (SELECT * FROM documents),
         c(constraint_id, violations) AS (
           SELECT './required:doc_id', (SELECT count(*) FROM d WHERE doc_id IS NULL) UNION ALL
           SELECT './required:text',   (SELECT count(*) FROM d WHERE text IS NULL) UNION ALL
           SELECT './required:source', (SELECT count(*) FROM d WHERE source IS NULL) UNION ALL
           SELECT '.doc_id/minimum',   (SELECT count(*) FROM d WHERE doc_id IS NOT NULL AND doc_id < 0) UNION ALL
           SELECT '.text/minLength',   (SELECT count(*) FROM d WHERE text IS NOT NULL AND length(text) < 1) UNION ALL
           SELECT '.lang/enum',        (SELECT count(*) FROM d WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr','es')) UNION ALL
           SELECT '.source/pattern',   (SELECT count(*) FROM d WHERE source IS NOT NULL AND NOT regexp_matches(source, 'src[0-9]+$')) UNION ALL
           SELECT '.n_chars/minimum',  (SELECT count(*) FROM d WHERE n_chars IS NOT NULL AND n_chars < 0) UNION ALL
           SELECT '.n_chars/maximum',  (SELECT count(*) FROM d WHERE n_chars IS NOT NULL AND n_chars > 500))
         SELECT 'all' AS part, constraint_id, (SELECT count(*) FROM d) AS total,
                violations, violations = 0 AS pass
         FROM c ORDER BY constraint_id""",
    "v_documents_violations" -> DocViolationsSql,
    // the fluent-DSL twin must be indistinguishable from the parsed-JSON one
    "v_documents_fluent" -> DocViolationsSql,
    // EN oracle with exactly the two swapped literals substituted
    "v_documents_i18n" -> DocViolationsSql
      .replace("Expected value to be equal to the enum", I18nEnumMsg)
      .replace("Expected string to match pattern /^src[0-9]+$/",
               "La cadena no coincide con /^src[0-9]+$/"),
    "q1_agg" -> Q1AggSql,
  )

  // both lazy: referenced from `oracles` ABOVE their declaration — a plain
  // val would still be null when the object initializer builds the map
  private lazy val DocViolationsSql: String =
      """SELECT doc_id, constraint_id, path, observed, message FROM (
           SELECT doc_id, './required:doc_id' AS constraint_id, '.' AS path, CAST(NULL AS VARCHAR) AS observed,
                  'Expected required property "doc_id" to be set' AS message
           FROM documents WHERE doc_id IS NULL
           UNION ALL
           SELECT doc_id, './required:text', '.', CAST(NULL AS VARCHAR),
                  'Expected required property "text" to be set'
           FROM documents WHERE text IS NULL
           UNION ALL
           SELECT doc_id, './required:source', '.', CAST(NULL AS VARCHAR),
                  'Expected required property "source" to be set'
           FROM documents WHERE source IS NULL
           UNION ALL
           SELECT doc_id, '.doc_id/minimum', '.doc_id', CAST(doc_id AS VARCHAR),
                  'Expected numeric value be greater than or equal to 0'
           FROM documents WHERE doc_id IS NOT NULL AND doc_id < 0
           UNION ALL
           SELECT doc_id, '.text/minLength', '.text', text,
                  'Expected string to have a minimum length of 1'
           FROM documents WHERE text IS NOT NULL AND length(text) < 1
           UNION ALL
           SELECT doc_id, '.lang/enum', '.lang', lang,
                  'Expected value to be equal to the enum'
           FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr','es')
           UNION ALL
           SELECT doc_id, '.source/pattern', '.source', source,
                  'Expected string to match pattern /^src[0-9]+$/'
           FROM documents WHERE source IS NOT NULL AND NOT regexp_matches(source, 'src[0-9]+$')
           UNION ALL
           SELECT doc_id, '.n_chars/minimum', '.n_chars', CAST(n_chars AS VARCHAR),
                  'Expected numeric value be greater than or equal to 0'
           FROM documents WHERE n_chars IS NOT NULL AND n_chars < 0
           UNION ALL
           SELECT doc_id, '.n_chars/maximum', '.n_chars', CAST(n_chars AS VARCHAR),
                  'Expected numeric value be less than or equal to 500'
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 500
         ) ORDER BY constraint_id, doc_id"""

  private lazy val Q1AggSql: String =
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS sum_qty,
                sum(l_extendedprice * (1 - l_discount)) AS revenue,
                count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""
}
