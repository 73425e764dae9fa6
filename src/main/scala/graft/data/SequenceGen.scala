package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesized tokenized-sequence table (FIXTURES.md §1).
  *
  * Schema matches BASELINE.json `input_hint`:
  *   (doc_id:string, tokens:array<int>, n_tok:int, source:string, part:string)
  *
  * Every field is a pure Column expression over `spark.range(n)` — seeded
  * `xxhash64`, no UDFs, no data movement: generation is embarrassingly
  * parallel and whole-stage-codegen'd, so the same (seed, n) always yields
  * identical bytes at any parallelism (the property the scaling benchmark
  * relies on). Violations are injected at known deterministic rates so every
  * constraint (dedup incl. hot-key skew, domain, range, enum, nulls,
  * referential, consistency, drift) has known-positive rows.
  */
object SequenceGen {

  val Vocab = 50000
  val MaxLen = 128
  val Sources: Seq[String] = Seq("web", "books", "code", "wiki")

  /** Injection rates (1 row in N). Chosen co-prime so injections don't overlap. */
  val DupEvery = 1000        // row i reuses row i-1's doc_id
  val HotEvery = 101         // ~1% of rows collapse onto 3 hot doc_ids (skew)
  val NTokZeroEvery = 4999   // n_tok = 0 (violates minimum:1)
  val NTokOverEvery = 5003   // n_tok = MaxLen*100 (violates maximum)
  val BadTokenEvery = 2003   // one token out of [0, Vocab)
  val MismatchEvery = 3001   // n_tok != size(tokens)
  val NullSourceEvery = 1499 // source null (violates required)
  val SpamSourceEvery = 1501 // source = "spam" (violates enum + FK)

  def sequences(spark: SparkSession, n: Long, numParts: Int = 16,
                seed: Long = 42L, driftPart: Boolean = true): DataFrame = {
    val id = col("id")
    def h(cols: org.apache.spark.sql.Column*) = xxhash64((lit(seed) +: cols): _*)

    // doc index: duplicates + hot keys
    val docIndex =
      when(id % HotEvery === 17, pmod(id, lit(3)))          // 3 hot ids: 0,1,2
        .when(id % DupEvery === 0 && id > 0, id - 1)
        .otherwise(id)
    val docId = concat(lit("doc-"), lpad(docIndex.cast("string"), 12, "0"))

    val part = concat(lit("p"), lpad(pmod(id, lit(numParts)).cast("string"), 3, "0"))

    // base length 1..MaxLen; partition p000 gets a shifted distribution
    // (halved lengths) to trip the KL/PSI drift check
    val baseLen = (pmod(h(id), lit(MaxLen)) + 1).cast("int")
    val shifted =
      if (driftPart) when(pmod(id, lit(numParts)) === 0, greatest(baseLen / 2, lit(1)).cast("int"))
        .otherwise(baseLen)
      else baseLen
    val lenForTokens = shifted

    // one xxhash64 per ROW + an affine step per element (a full hash per
    // element would dominate generation cost at bench scale)
    val rowHash = h(id, lit(13))
    val tokens0 = transform(sequence(lit(1), lenForTokens),
      j => pmod(rowHash + j * lit(2654435761L), lit(Vocab)).cast("int"))
    // inject one out-of-domain element
    val tokens = when(id % BadTokenEvery === 3,
        concat(slice(tokens0, lit(1), greatest(lenForTokens - 1, lit(1))), array(lit(-5))))
      .otherwise(tokens0)

    val nTok = when(id % NTokZeroEvery === 1, lit(0))
      .when(id % NTokOverEvery === 2, lit(MaxLen * 100))
      .when(id % MismatchEvery === 4, size(tokens) + 1)
      .otherwise(size(tokens))
      .cast("int")

    // skew-weighted source: web ≫ rest, plus null / unknown injections
    val srcBucket = pmod(h(id, lit(7)), lit(10))
    val source = when(id % NullSourceEvery === 5, lit(null).cast("string"))
      .when(id % SpamSourceEvery === 6, lit("spam"))
      .when(srcBucket <= 6, lit("web"))
      .when(srcBucket === 7, lit("books"))
      .when(srcBucket === 8, lit("code"))
      .otherwise(lit("wiki"))

    spark.range(n).select(
      docId.as("doc_id"),
      tokens.as("tokens"),
      nTok.as("n_tok"),
      source.as("source"),
      part.as("part"))
  }

  /** Dimension table for referential integrity (FIXTURES.md §1). */
  def dimSources(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Sources.zipWithIndex.map { case (s, i) => (s, 1.0 / (i + 1)) }
      .toDF("source", "weight")
  }

  /** The flagship constraint spec over the sequences table (SURVEY.md §7.1
    * step 3): range+integrality on n_tok, enum on source, element-domain on
    * tokens, length bounds. */
  val SeqSpecJson: String =
    s"""{"type":"object",
        "required":["doc_id","tokens","n_tok","source"],
        "properties":{
          "doc_id":{"type":"string","minLength":1,"pattern":"^doc-[0-9]{12}$$"},
          "tokens":{"type":"array","items":{"type":"integer","minimum":0,"exclusiveMaximum":$Vocab},
                    "minItems":1,"maxItems":$MaxLen},
          "n_tok":{"type":"integer","minimum":1,"maximum":$MaxLen},
          "source":{"type":"string","enum":["web","books","code","wiki"]}}}"""
}
