package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition statistics sketches + checkpoint/resume (SURVEY.md §7.1
  * step 5, north-star "validation state").
  *
  * Stats are one `groupBy(part)` with mergeable sketches — HyperLogLog++
  * (`approx_count_distinct`) and Greenwald-Khanna quantiles
  * (`percentile_approx`); partial aggregation makes the shuffle
  * O(parts), not O(rows).
  *
  * Checkpointing: metrics rows are keyed by (part, spec_hash, run_epoch) and
  * appended via Spark's file-commit protocol (write-to-temp then atomic
  * task-commit move). Resume = collect the completed partition list (small:
  * one row per partition) and anti-filter with `isin`, which prunes whole
  * files when `part` is a physical partition column — a killed run restarts
  * by reading only unvalidated partitions.
  */
object Metrics {

  /** Sketch columns for the sequences shape; generalizes by argument. */
  def partitionStats(df: DataFrame, part: String = "part", key: String = "doc_id",
                     numeric: String = "n_tok", cat: String = "source"): DataFrame =
    df.groupBy(col(part).as("part")).agg(
      count(lit(1)).as("total"),
      min(col(numeric)).as(s"${numeric}_min"),
      max(col(numeric)).as(s"${numeric}_max"),
      avg(col(numeric)).as(s"${numeric}_avg"),
      percentile_approx(col(numeric), array(lit(0.5), lit(0.95), lit(0.99)), lit(10000))
        .as(s"${numeric}_quantiles"),
      approx_count_distinct(col(key)).as(s"${key}_approx_distinct"),
      sum(col(key).isNull.cast("long")).as(s"${key}_nulls"),
      sum(col(cat).isNull.cast("long")).as(s"${cat}_nulls"),
      approx_count_distinct(col(cat)).as(s"${cat}_approx_distinct"))
}

/** Hive-partitioned-parquet metrics store. The Iceberg metrics table is a
  * drop-in behind the same interface (no Iceberg jars in this sandbox —
  * SURVEY.md §7.3). */
final case class MetricsStore(dir: String) {

  /** Append a finished run's per-partition stats under its spec lineage. */
  def append(metrics: DataFrame, specHash: String, runEpoch: Long): Unit =
    metrics
      .withColumn("spec_hash", lit(specHash))
      .withColumn("run_epoch", lit(runEpoch))
      .write.mode("append").partitionBy("spec_hash").parquet(dir)

  def read(spark: SparkSession): DataFrame = spark.read.parquet(dir)

  /** Partitions already validated under this spec lineage (any epoch —
    * retries are idempotent because verdicts are deterministic re-runs). */
  def completedParts(spark: SparkSession, specHash: String): Seq[String] =
    if (!new java.io.File(dir).exists()) Seq.empty
    else read(spark)
      .where(col("spec_hash") === specHash)
      .select(col("part")).distinct()
      .collect().map(_.getString(0)).toSeq

  /** Resume filter: only not-yet-validated partitions. The `isin` over the
    * (small) completed list is a static predicate → partition pruning at the
    * file listing, so completed partitions are never read. */
  def remaining(df: DataFrame, specHash: String, part: String = "part"): DataFrame = {
    val done = completedParts(df.sparkSession, specHash)
    if (done.isEmpty) df else df.where(!col(part).isin(done: _*))
  }
}
