package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.run.Validation

/** Distribution-drift checks: KL divergence and PSI of a bucketed column's
  * per-partition histogram against the global (all-partition) histogram.
  *
  * Pure DataFrame algebra (SURVEY.md §2.8): one `groupBy(part, bucket)`
  * shuffle over the data, then all joins/sums happen on histogram-sized
  * frames (|parts| × |buckets| rows), independent of table size. No UDAF.
  *
  * KL(p‖q) = Σ p·ln(p/q), PSI = Σ (p−q)·ln(p/q), with Laplace smoothing so
  * empty buckets never divide by zero.
  */
object Drift {

  /** Per-(part, bucket) counts for an arbitrary bucketing expression. */
  def histogram(df: DataFrame, bucket: Column, part: String = "part"): DataFrame =
    df.groupBy(col(part).as("part"), bucket.cast(StringType).as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Fixed-width numeric bucketing. */
  def widthBucket(c: Column, width: Double): Column =
    floor(c.cast(DoubleType) / width).cast(LongType)

  /** (part, kl, psi, total) — drift of each partition vs the global mix. */
  def divergence(df: DataFrame, bucket: Column, part: String = "part",
                 smoothing: Double = 0.5): DataFrame =
    divergenceFromHistogram(histogram(df, bucket, part), smoothing)

  /** Divergence math over a prebuilt (part, bucket, c) histogram — all
    * frames histogram-sized. */
  def divergenceFromHistogram(h: DataFrame, smoothing: Double = 0.5): DataFrame = {
    val totals = h.groupBy(col("part")).agg(sum(col("c")).as("t"))
    val base = h.groupBy(col("bucket")).agg(sum(col("c")).as("bc"))
    val baseTotal = base.agg(sum(col("bc")).as("bt"), count(lit(1)).as("k"))

    // grid = every (part × bucket) pair, so buckets absent from a partition
    // still contribute (smoothed) mass — all frames here are histogram-sized
    val grid = totals.crossJoin(base).crossJoin(baseTotal)
      .join(h, Seq("part", "bucket"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val eps = lit(smoothing)
    val p = (col("c") + eps) / (col("t") + eps * col("k"))
    val q = (col("bc") + eps) / (col("bt") + eps * col("k"))
    val ratio = log(p / q)
    grid.groupBy(col("part"))
      .agg(
        sum(p * ratio).as("kl"),
        sum((p - q) * ratio).as("psi"),
        first(col("t")).as("total"))
  }

  /** SINGLE-SCAN multi-dimension drift: one `groupBy(part, b1, …, bn)` cube
    * (cardinality = Π bucket-counts × parts, still histogram-sized), then
    * each dimension's histogram is a re-aggregation of the cube — n drift
    * checks for the scan+shuffle price of one. */
  def multiValidation(df: DataFrame, dims: Seq[(String, Column, Double)],
                      part: String = "part", smoothing: Double = 0.5,
                      baseRank: Int = 1100): Seq[Validation] = {
    val keys = col(part).as("part") +:
      dims.zipWithIndex.map { case ((_, b, _), i) => b.cast(StringType).as(s"_b$i") }
    val cube = df.groupBy(keys: _*).agg(count(lit(1)).as("c"))
    dims.zipWithIndex.map { case ((name, _, threshold), i) =>
      val h = cube.groupBy(col("part"), col(s"_b$i").as("bucket")).agg(sum(col("c")).as("c"))
      validationFromDivergence(divergenceFromHistogram(h, smoothing), name,
        threshold, baseRank + i)
    }
  }

  /** Verdict-shaped drift check: pass iff KL ≤ threshold. The partition's
    * divergence value rides in `observed` of a per-partition violation row. */
  def validation(df: DataFrame, bucket: Column, name: String,
                 klThreshold: Double, part: String = "part",
                 smoothing: Double = 0.5, rank: Int = 1100): Validation =
    validationFromDivergence(divergence(df, bucket, part, smoothing), name,
      klThreshold, rank)

  private def validationFromDivergence(div: DataFrame, name: String,
                                       klThreshold: Double, rank: Int): Validation = {
    val id = s"dataset/drift:$name"
    val message = s"""Expected "$name" distribution to stay within KL $klThreshold of the global mix"""

    val verdicts = div.select(
      col("part"), lit(rank).as("rank"), lit(id).as("constraint_id"),
      col("total"),
      when(col("kl") <= klThreshold, 0L).otherwise(1L).as("violations"),
      (col("kl") <= klThreshold).as("pass"))

    val violations = div.where(col("kl") > klThreshold).select(
      col("part"), col("part").as("doc_id"), lit(rank).as("rank"),
      lit(id).as("constraint_id"), lit(".").as("path"),
      format_string("kl=%.6f psi=%.6f", col("kl"), col("psi")).as("observed"),
      lit(message).as("message"))

    Validation(verdicts, violations)
  }
}
