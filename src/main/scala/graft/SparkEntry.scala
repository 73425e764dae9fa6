package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.run.Validator
import graft.spec.SpecParser

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship constraint spec over the `documents` table: type/range checks,
    * enum, pattern, length — compiled once to Catalyst Columns and evaluated
    * in a single codegen'd pass (SURVEY.md §3.4). Some constraints
    * intentionally fail on real rows (zh lang, long docs) so the verdict
    * frame exercises both outcomes. */
  val DocSpecJson: String =
    """{"type":"object",
       "required":["doc_id","text","source"],
       "properties":{
         "doc_id":{"type":"integer","minimum":0},
         "text":{"type":"string","minLength":1},
         "lang":{"type":"string","enum":["en","de","fr","es"]},
         "source":{"type":"string","pattern":"^src[0-9]+$"},
         "n_chars":{"type":"integer","minimum":0,"maximum":500}}}"""

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Validator.validate(docs, SpecParser.parse(DocSpecJson), docId = "doc_id", part = None)
      .orderedVerdicts
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles

  /** Oracles whose SQL embeds DATA-DEPENDENT literals (e.g. the trained
    * IVF centroid matrix, which differs per sf dir) — Verify evaluates
    * these against the live session + sf dir and merges the results into
    * oracle_sql.json alongside the static map. */
  def dynamicOracleSql: Map[String, (SparkSession, String) => String] =
    PipelineQueries.dynamicOracles
}
