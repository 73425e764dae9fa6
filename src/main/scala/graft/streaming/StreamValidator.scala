package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.compile.{CompiledCheck, Compiler}
import graft.spec.Spec

/** Structured Streaming front-end for the same compiled checks.
  *
  * The reference is strictly request/response (no streams), so this is an
  * engine-side extension (SURVEY.md §2.8): validate an unbounded source with
  * the identical `CompiledCheck` Columns — the spec compiles once, the
  * micro-batch planner re-uses the expressions.
  *
  * - `violationStream`: per-row violation records, append-mode (stateless —
  *   a narrow projection, safe at any rate).
  * - `verdictStream`: per-(event-time window × partition × constraint)
  *   verdict counts with a watermark — state is bounded by
  *   windows × partitions × checks, independent of row rate.
  */
object StreamValidator {

  def violationStream(stream: DataFrame, spec: Spec, docId: String,
                      part: Option[String]): DataFrame = {
    val checks = Compiler.compile(spec, stream.schema)
    graft.run.Validator.violationFrame(stream, checks, col(docId),
      part.map(col).getOrElse(lit("all")))
  }

  def verdictStream(stream: DataFrame, spec: Spec, timeCol: String,
                    windowDuration: String, watermarkDelay: String,
                    part: Option[String]): DataFrame = {
    val checks = Compiler.compile(spec, stream.schema)
    verdictStreamForChecks(stream, checks, timeCol, windowDuration, watermarkDelay, part)
  }

  def verdictStreamForChecks(stream: DataFrame, checks: Vector[CompiledCheck],
                             timeCol: String, windowDuration: String,
                             watermarkDelay: String, part: Option[String]): DataFrame = {
    val partCol = part.map(col).getOrElse(lit("all"))
    val aggs = checks.map(c => sum((!c.pass).cast("long")).as(s"c${c.rank}"))
    val agg = stream
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowDuration), partCol.as("part"))
      .agg(count(lit(1)).as("total"), aggs: _*)
    val kv = explode(array(checks.map(c =>
      struct(lit(c.rank).as("rank"), lit(c.id).as("constraint_id"),
             col(s"c${c.rank}").as("violations"))): _*))
    agg.select(col("window"), col("part"), col("total"), kv.as("kv"))
      .select(col("window"), col("part"),
        col("kv.rank").as("rank"), col("kv.constraint_id").as("constraint_id"),
        col("total"), col("kv.violations").as("violations"),
        (col("kv.violations") === 0).as("pass"))
  }
}
