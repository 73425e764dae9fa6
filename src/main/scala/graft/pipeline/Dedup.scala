package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard
  * verification, embedding-cosine near-dup.
  *
  * Scale design: every method is shuffle-bounded by either a key groupBy
  * (partial agg) or an LSH band-bucket join — NEVER an all-pairs product.
  * Candidate pairs are generated only within LSH buckets, then verified with
  * an exact measure; bucket skew is bounded by banding parameters.
  */
object Dedup {

  // -- exact ---------------------------------------------------------------

  /** Exact duplicate groups by normalized content hash: (content_key, cnt,
    * keep_doc_id) — keep = min doc_id, the canonical representative. */
  def exactGroups(df: DataFrame, text: Column, docId: Column): DataFrame =
    df.select(TextAnalysis.contentKey(text).as("content_key"), docId.as("doc_id"))
      .groupBy(col("content_key"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_doc_id"))
      .where(col("cnt") > 1)

  /** Rows to DROP under exact dedup (everything but the representative). */
  def exactDropList(df: DataFrame, text: Column, docId: Column): DataFrame = {
    val keyed = df.select(TextAnalysis.contentKey(text).as("content_key"), docId.as("doc_id"))
    keyed.join(exactGroups(df, text, docId), Seq("content_key"))
      .where(col("doc_id") =!= col("keep_doc_id"))
      .select(col("doc_id"), col("content_key"), col("keep_doc_id"))
  }

  // -- MinHash + LSH -------------------------------------------------------

  /** MinHash signature from a MATERIALIZED shingle column (see
    * TextAnalysis.shinglesFromWords performance contract — an inline shingle
    * expression would be re-evaluated per hash index, ×numHashes). One
    * xxhash64 per (shingle × hash-index), all inside codegen. */
  def minhashSignatureFromShingles(sh: Column, numHashes: Int = 32): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(sh, s => xxhash64(s, h))))

  /** Small-input convenience (inlines shingles; at scale use the staged
    * form via lshBuckets which materializes them first). */
  def minhashSignature(text: Column, numHashes: Int = 32, k: Int = 3): Column =
    minhashSignatureFromShingles(TextAnalysis.shingles(text, k), numHashes)

  /** LSH band buckets: signature split into `bands` bands of `rowsPerBand`;
    * each band hashes to one bucket id. Docs sharing ANY band bucket are
    * candidates. Returns (doc_id, band, bucket). */
  def lshBuckets(df: DataFrame, text: Column, docId: Column,
                 bands: Int = 8, rowsPerBand: Int = 4, k: Int = 3): DataFrame = {
    // stage: words → shingles → signature → band buckets, one projection
    // each, so nothing is re-evaluated inside downstream lambdas
    val staged = TextAnalysis.withShingles(df.select(docId.as("doc_id"), text.as("_t")),
        col("_t"), k)
      .withColumn("_sig", minhashSignatureFromShingles(col("_sh"), bands * rowsPerBand))
    val bandBuckets = transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(array_join(slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ","), b))
    staged.select(col("doc_id"), posexplode(bandBuckets).as(Seq("band", "bucket")))
  }

  /** Candidate near-dup pairs from LSH: self-join WITHIN (band, bucket) only
    * (doc_a < doc_b), de-duplicated across bands. `maxBucket` caps
    * pathological buckets (boilerplate text) so no reducer sees a quadratic
    * blowup — capped buckets are dropped and counted by the caller if needed. */
  def minhashCandidates(df: DataFrame, text: Column, docId: Column,
                        bands: Int = 8, rowsPerBand: Int = 4, k: Int = 3,
                        maxBucket: Int = 64): DataFrame = {
    val b = lshBuckets(df, text, docId, bands, rowsPerBand, k)
    val grouped = b.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .where(size(col("docs")) > 1 && size(col("docs")) <= maxBucket)
    // pairs generated inside the (small, capped) bucket array — no join
    val pairs = grouped.select(explode(flatten(
      transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))),
          bDoc => struct(least(a, bDoc).as("doc_a"), greatest(a, bDoc).as("doc_b"))))))
      .as("p"))
    pairs.select(col("p.doc_a"), col("p.doc_b")).distinct()
  }

  /** Exact n-gram Jaccard verification of candidate pairs: joins the two
    * shingle sets back (hash-partitioned by doc id) and computes
    * |∩| / |∪| via array_intersect/array_union. */
  def jaccardVerify(df: DataFrame, text: Column, docId: Column,
                    candidates: DataFrame, k: Int = 3,
                    threshold: Double = 0.7): DataFrame = {
    val sh = TextAnalysis.withShingles(df.select(docId.as("doc_id"), text.as("_t")),
        col("_t"), k)
      .select(col("doc_id"), array_distinct(col("_sh")).as("sh"))
    val j = candidates
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
    j.where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Full MinHash near-dup pipeline: LSH candidates → exact Jaccard filter. */
  def nearDuplicates(df: DataFrame, text: Column, docId: Column,
                     bands: Int = 8, rowsPerBand: Int = 4, k: Int = 3,
                     threshold: Double = 0.7): DataFrame =
    jaccardVerify(df, text, docId,
      minhashCandidates(df, text, docId, bands, rowsPerBand, k), k, threshold)

  // -- SimHash -------------------------------------------------------------

  /** 64-bit SimHash over words: bit i is the sign of Σ_w (±1 by bit i of
    * hash(w)). Near-dups differ in few bits. */
  def simhashFromHashes(hashes: Column, bits: Int = 64): Column = {
    val bitCols = transform(sequence(lit(0), lit(bits - 1)), i =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(zip_with(bitCols, sequence(lit(0), lit(bits - 1)),
      (bit, i) => call_function("shiftleft", bit, i.cast("int"))), lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Small-input convenience — inlines word hashes (re-evaluated per bit,
    * ×64); at scale use `withSimhash`. */
  def simhash(text: Column, bits: Int = 64): Column =
    simhashFromHashes(transform(TextAnalysis.words(text), w => xxhash64(w)), bits)

  /** Staged simhash: word-hash array materialized once, then 64 bit-sums.
    * Higher-order aggregates are interpreted per element — for large corpora
    * prefer `simhashByKey` (codegen'd). */
  def withSimhash(df: DataFrame, text: Column, out: String = "simhash",
                  bits: Int = 64): DataFrame =
    df.withColumn("_graft_wh", transform(TextAnalysis.words(text), w => xxhash64(w)))
      .withColumn(out, simhashFromHashes(col("_graft_wh"), bits))
      .drop("_graft_wh")

  /** Scale-path simhash: explode words → ONE codegen'd HashAggregate with 64
    * conditional sums (map-side combined), then reassemble the bit vector —
    * identical output to `withSimhash`, but whole-stage-codegen'd instead of
    * 64 interpreted lambda passes over the hash array. Returns
    * (doc_id, simhash). */
  def simhashByKey(df: DataFrame, text: Column, docId: Column,
                   bits: Int = 64): DataFrame = {
    val words = df.select(docId.as("doc_id"), explode_outer(TextAnalysis.words(text)).as("_w"))
    val h = xxhash64(col("_w"))
    val sums = (0 until bits).map { i =>
      sum(when(col("_w").isNull, lit(0L)).otherwise(
        when(call_function("shiftright", h, lit(i)).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
        .as(s"_b$i")
    }
    words.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(i => when(col(s"_b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64 bits into `bands` chunks; docs
    * sharing any chunk value are candidates (≤ hammingMax differing bits
    * guarantees a shared band when bands > hammingMax). */
  def simhashCandidates(df: DataFrame, text: Column, docId: Column,
                        bands: Int = 4, maxBucket: Int = 64): DataFrame = {
    val width = 64 / bands
    val staged = simhashByKey(df, text, docId)
    val sh = col("simhash")
    val bandBuckets = transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        call_function("shiftright", sh, b * lit(width)).bitwiseAND(lit((1L << width) - 1)).as("bucket")))
    val exploded = staged.select(col("doc_id"), explode(bandBuckets).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val grouped = exploded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .where(size(col("docs")) > 1 && size(col("docs")) <= maxBucket)
    grouped.select(explode(flatten(
      transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))),
          bDoc => struct(least(a, bDoc).as("doc_a"), greatest(a, bDoc).as("doc_b"))))))
      .as("p"))
      .select(col("p.doc_a"), col("p.doc_b")).distinct()
  }

  // -- embedding near-dup --------------------------------------------------

  /** Cosine similarity of two float-array columns (zip_with dot / norms). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Random-hyperplane LSH bucket for an embedding: sign bits of dots with
    * `planes` seeded pseudo-random hyperplanes (deterministic, data-free). */
  def hyperplaneBucket(vec: Column, dim: Int, planes: Int = 12, seed: Long = 42L): Column = {
    val bits = (0 until planes).map { p =>
      // hyperplane component j = centered hash in [-0.5, 0.5)
      val comps = transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(lit(seed), lit(p), j), lit(100000L)).cast("double") / 100000.0d) - 0.5d)
      val d = aggregate(zip_with(vec, comps, (x, c) => x * c), lit(0.0d), (acc, v) => acc + v)
      when(d > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Embedding near-dup pairs: bucket by hyperplane signs, pair within
    * buckets, verify with exact cosine ≥ threshold. */
  def embeddingNearDups(df: DataFrame, vec: Column, id: Column, dim: Int,
                        planes: Int = 12, threshold: Double = 0.95,
                        maxBucket: Int = 256): DataFrame = {
    val b = df.select(id.as("vid"), vec.as("v"),
      hyperplaneBucket(vec, dim, planes).as("bucket"))
    val grouped = b.groupBy(col("bucket"))
      .agg(collect_list(struct(col("vid"), col("v"))).as("docs"))
      .where(size(col("docs")) > 1 && size(col("docs")) <= maxBucket)
    val pairs = grouped.select(explode(flatten(
      transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + 2, size(col("docs"))),
          c => struct(a.as("a"), c.as("b"))))))
      .as("p"))
    pairs.select(
        least(col("p.a.vid"), col("p.b.vid")).as("id_a"),
        greatest(col("p.a.vid"), col("p.b.vid")).as("id_b"),
        cosine(col("p.a.v"), col("p.b.v")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .distinct()
  }
}
