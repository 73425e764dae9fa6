package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data mixing.
  *
  * The reference has no analog (single-value validator); this is part of
  * the LLM-pipeline operator family the brief adds. No randomness anywhere:
  * sample membership is a pure function of the row key, so runs are
  * reproducible across partitionings, retries and engines (the driver
  * oracle recomputes the same sample in DuckDB).
  */
object Sampling {

  /** Per-key QUOTA sample (data mixing): the `quota` rows with the
    * smallest seeded hash of `docId` within each `key` group — i.e. a
    * deterministic uniform sample without replacement, stable under
    * repartitioning and row order, ties broken by `docId`.
    *
    * Scale shape: the rank filter compiles to WindowGroupLimit
    * (PlanSpec-gated), so each map task keeps only its LOCAL top-`quota`
    * rows per key before the single key-partitioned exchange — shuffle
    * volume is O(quota × tasks-per-key), never the table. A hot key
    * (one source dominating the corpus) is therefore bounded the same way
    * the salted uniqueness stage is: pre-aggregation at the input
    * partition boundary.
    *
    * `hash` defaults to the production xxhash64 family; driver-oracle
    * queries pass [[Hashing.Md5]] so DuckDB reproduces membership
    * bit-for-bit. The id is hashed through its STRING form — the decimal
    * rendering is the one representation both engines agree on (md5 of a
    * BIGINT would hash engine-specific bytes). */
  def quotaSample(df: DataFrame, key: String, docId: String, quota: Int,
                  hash: Hashing.HashFamily = Hashing.Xx): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    // Null ids rank LAST, explicitly: md5 of null is null but xxhash64 of a
    // null input returns the SEED (42) — without forcing the hash to null
    // for null ids, the two families would rank null rows differently and
    // xxhash64 would slot them mid-order. asc_nulls_last then matches
    // standard SQL (and the DuckDB oracle's) NULLS LAST, so null-id rows
    // never displace real ids from the quota in either engine.
    val w = Window.partitionBy(col(key))
      .orderBy(col("_mh").asc_nulls_last, col(docId).asc_nulls_last)
    df.withColumn("_mh",
        when(col(docId).isNull, lit(null))
          .otherwise(hash.plain(col(docId).cast(org.apache.spark.sql.types.StringType))))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= quota)
      .drop("_mh", "_rn")
  }

  /** Data-MIXTURE report per key: `(key, docs, tokens, doc_ppm,
    * token_ppm)` — the per-source share table a mixing step samples
    * against. One partial-aggregated groupBy over the corpus; the global
    * totals join is |keys|-sized (aggregate-over-aggregate, no second
    * scan: Catalyst collapses the totals derivation onto the same
    * aggregate output). Token counts use the whitespace tokenizer
    * ([[TextAnalysis.wsTokenCount]]) so the oracle twin is exact.
    *
    * Shares are HASH-STABLE integers: parts-per-million as
    * `floor(docs * 1e6 / total)` BIGINT, the same IEEE double expression
    * (cast → multiply → divide → floor) evaluated in the DuckDB oracle
    * twin. The previous `round(double, 6)` fractions could diverge by one
    * ulp between engines (Spark rounds the decimal expansion HALF_UP via
    * BigDecimal; DuckDB std::rounds the scaled binary double) — exactly
    * the class of divergence a bit-exact hash gate rejects. floor of a
    * shared-bit-pattern double is exact by construction. */
  def mixtureReport(df: DataFrame, key: String, text: String): DataFrame = {
    val perKey = df.groupBy(col(key))
      .agg(count(lit(1)).as("docs"),
           sum(TextAnalysis.wsTokenCount(col(text)).cast("long")).as("tokens"))
    val totals = perKey.agg(sum(col("docs")).as("_td"), sum(col("tokens")).as("_tt"))
    perKey.crossJoin(totals)
      .select(col(key), col("docs"), col("tokens"),
        floor(col("docs").cast("double") * lit(1000000.0) / col("_td").cast("double"))
          .as("doc_ppm"),
        floor(col("tokens").cast("double") * lit(1000000.0) / col("_tt").cast("double"))
          .as("token_ppm"))
  }

  /** Token-BUDGET sampling (Chinchilla-style data mixing): keep a
    * deterministic subset of each key's documents whose total token count
    * lands near the key's budget. Two passes, both scale-correct:
    * (1) per-key token totals — one partial-aggregated groupBy producing a
    * |keys|-sized frame; (2) keep fraction `ppm_k = ⌊min(1e6, budget_k ×
    * 1e6 / total_k)⌋` broadcast back, membership = `hash(docId) mod 1e6 <
    * ppm_k` — a MAP-SIDE Bernoulli-by-hash filter, no ordered scan, no
    * per-key window. An exact per-key running-sum cutoff would need a
    * full-key ordered window (corpus-sized shuffle, hot keys unbounded);
    * hash thresholding hits the budget within sampling noise and keeps
    * membership a pure row-local function — reproducible across
    * partitionings, retries, engines.
    *
    * `budgets` is a (key, budget) frame, expected tiny (broadcast). Keys
    * absent from it are dropped (budget 0 ≡ absent). The fraction math is
    * double IEEE (identical in DuckDB) with the ∞ hazard capped by
    * `least` BEFORE `floor` — a zero-token key keeps everything when its
    * budget is positive. Null doc ids are never kept (hash forced null —
    * xxhash64(null) would return the seed and diverge from md5). */
  def tokenBudgetSample(df: DataFrame, key: String, docId: String,
                        tokens: org.apache.spark.sql.Column, budgets: DataFrame,
                        hash: Hashing.HashFamily = Hashing.Xx): DataFrame = {
    val totals = df.groupBy(col(key)).agg(sum(tokens.cast("long")).as("_tk"))
    // budget 0 ≡ absent (also dodges the 0×1e6/0 NaN, which both engines
    // would otherwise sort ABOVE the least() cap and keep everything)
    val frac = totals.join(budgets.where(col("budget") > 0), key)
      .select(col(key),
        floor(least(lit(1000000.0),
          col("budget").cast("double") * lit(1000000.0) / col("_tk").cast("double")))
          .as("_keep_ppm"))
    df.join(broadcast(frac), Seq(key))
      .where(Hashing.ppmBucket(col(docId), hash) < col("_keep_ppm"))
      .drop("_keep_ppm")
  }

  /** Deterministic train/val/test split assignment — the leakage-safe way
    * to carve held-out sets out of a training corpus: membership is a pure
    * function of the row key (`bucket = hash(docId string) mod 10⁶`,
    * ppm thresholds carve `val` then `test` off the low buckets), so the
    * same document lands in the same split across runs, engines,
    * partitionings and corpus growth — appending new documents never
    * reshuffles existing assignments, unlike any `randomSplit`. Adds
    * `bucket` (BIGINT ppm) and `split` columns.
    *
    * Scale shape: a narrow map-side projection — no shuffle, no state;
    * filters on `split` push down to the scan like any other predicate.
    * `hash` defaults to the production xxhash64 family; driver-oracle
    * queries pass [[Hashing.Md5]] so DuckDB reproduces every assignment
    * bit-for-bit (the md5 value is non-negative by construction, so `pmod`
    * here and `%` in the twin agree). Null ids bucket to null and fall to
    * `train` in both engines and BOTH hash families —
    * [[Hashing.ppmBucket]] forces the null (xxhash64(NULL) returns the
    * seed, which would otherwise send null ids to bucket 42 = `val`). */
  def splitAssign(df: DataFrame, docId: String,
                  valPpm: Long = 10000L, testPpm: Long = 10000L,
                  hash: Hashing.HashFamily = Hashing.Xx): DataFrame = {
    require(valPpm >= 0 && testPpm >= 0 && valPpm + testPpm <= 1000000L,
      s"split fractions must be non-negative ppm summing to ≤ 1e6, got $valPpm + $testPpm")
    df.withColumn("bucket", Hashing.ppmBucket(col(docId), hash))
      .withColumn("split",
        when(col("bucket") < valPpm, "val")
          .when(col("bucket") < valPpm + testPpm, "test")
          .otherwise("train"))
  }
}
