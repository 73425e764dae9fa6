package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with a BROADCAST query set — one scan
  * of the corpus, no corpus shuffle, per-partition partial top-k via window
  * rank on (query, corpus-partition)… Catalyst turns the rank filter into a
  * per-partition TopK (WindowGroupLimit) before the shuffle.
  *
  * Scale path: IVF — corpus assigned once to the nearest of C seeded
  * centroids (one narrow pass, written/bucketed by centroid); queries probe
  * only their `nprobe` closest centroid buckets.
  */
object Similarity {

  /** Brute-force exact top-k: queries must be small (broadcast). */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int = 10): DataFrame = {
    val c = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val scored = c.join(broadcast(q))
      .select(col("query_id"), col("corpus_id"),
        Dedup.cosine(col("cv"), col("qv")).as("cos"))
      .where(col("corpus_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic data-free centroids: unit-ish pseudo-random vectors. */
  def seededCentroids(numCentroids: Int, dim: Int, seed: Long = 7L): Column =
    transform(sequence(lit(0), lit(numCentroids - 1)), cIdx =>
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(lit(seed), cIdx, j), lit(100000L)).cast("double") / 100000.0d) - 0.5d))

  /** IVF assignment: nearest centroid id (1-based) per row — one narrow
    * pass; at scale the output is written bucketed by `centroid` so probes
    * prune buckets. */
  def ivfAssign(df: DataFrame, vec: Column, numCentroids: Int, dim: Int,
                seed: Long = 7L): DataFrame = {
    val cents = seededCentroids(numCentroids, dim, seed)
    val scored = transform(cents, c => Dedup.cosine(vec, c))
    df.withColumn("centroid", array_position(scored, array_max(scored)).cast("int"))
  }

  /** IVF top-k: each query probes its `nprobe` closest centroid buckets and
    * scores only those corpus rows — recall trades off against the fraction
    * of the corpus scanned (nprobe / numCentroids). */
  def ivfTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int = 10, numCentroids: Int = 16, dim: Int = 64,
              nprobe: Int = 4, seed: Long = 7L): DataFrame = {
    val assigned = ivfAssign(
      corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv")),
      col("cv"), numCentroids, dim, seed)

    val cents = seededCentroids(numCentroids, dim, seed)
    // top-nprobe centroids per query: sort (−score, idx) structs, slice
    val scoredIdx = transform(cents, (c, i) =>
      struct((-Dedup.cosine(col("qv"), c)).as("negscore"), (i + 1).as("idx")))
    val probes = transform(slice(array_sort(scoredIdx), 1, nprobe), s => s.getField("idx"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
      .select(col("query_id"), col("qv"), explode(probes).as("centroid"))

    val scored = assigned.join(broadcast(q), Seq("centroid"))
      .select(col("query_id"), col("corpus_id"),
        Dedup.cosine(col("cv"), col("qv")).as("cos"))
      .where(col("corpus_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), round(col("cos"), 4).as("cos"))
  }
}
