package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * language ID, quality scoring, document fingerprinting. All pure Catalyst
  * expressions (codegen'd, no UDFs) — they run inside the same narrow
  * projection pass as constraint checks, zero shuffle. */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: GPT-2-style pretokenizer word/number/punct pieces.
    * A real BPE vocab merge is a lookup, not a per-row computation — the
    * pretoken count is the standard cheap proxy. */
  val BpeTokenPattern = "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Stopword/character-class profiles per language (n-gram heuristic). */
  val LangProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|for|with|was|are)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|von|mit|für|ein|eine)\\b",
    "fr" -> "\\b(le|la|les|et|est|que|pour|dans|une|des|du)\\b",
    "es" -> "\\b(el|la|los|las|que|de|en|es|por|una|con)\\b"
  )

  /** Language ID: CJK script detection, else argmax of per-language stopword
    * hit-rate; "und" (undetermined) when nothing matches. */
  def languageId(text: Column): Column = {
    val lowered = lower(text)
    val scores = LangProfiles.map { case (lang, re) =>
      lang -> size(regexp_extract_all(lowered, lit(re), lit(0)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh")).otherwise(pick)
  }

  /** Quality heuristics à la Gopher/C4 rules: each component in [0,1]. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val words = wsTokenCount(text).cast("double")
    val meanWordLen = when(words > 0, nChars / words).otherwise(lit(0.0))
    val punct = size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast("double")
    val alpha = size(regexp_extract_all(text, lit("[\\p{L}]"), lit(0))).cast("double")
    val lengthOk = when(words >= 10 && words <= 10000, 1.0).otherwise(0.0)
    val wordLenOk = when(meanWordLen >= 2 && meanWordLen <= 12, 1.0).otherwise(0.0)
    val alphaRatio = when(nChars > 0, alpha / nChars).otherwise(lit(0.0))
    val punctOk = when(nChars > 0 && punct / nChars <= 0.2, 1.0).otherwise(0.0)
    round((lengthOk + wordLenOk + punctOk + least(alphaRatio * lit(1.25), lit(1.0))) / 4.0, 4)
  }

  /** Whitespace-normalized word array (shared by fingerprint + dedup). */
  def words(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), w => length(w) > 0)

  /** Word k-shingles from an ALREADY-MATERIALIZED word-array column.
    *
    * PERFORMANCE CONTRACT: `ws` must be a bound column (a prior projection),
    * not an inline expression — a lambda body re-evaluates its free
    * expressions per element, so inlining `words(text)` here costs
    * O(words² · regex) per row (measured 123 s vs <2 s on 5k docs).
    * Catalyst's CollapseProject keeps expensive multi-referenced projections
    * un-inlined, so `df.withColumn("_w", words(text))` staging is enough. */
  def shinglesFromWords(ws: Column, k: Int = 3): Column =
    when(size(ws) <= k, array(array_join(ws, " ")))
      .otherwise(transform(sequence(lit(1), size(ws) - (k - 1)),
        i => array_join(slice(ws, i, lit(k)), " ")))

  /** Word k-shingles as strings ("a b c" for k=3); rows shorter than k get
    * their single joined text as one shingle. Convenience for SMALL inputs —
    * inlines `words(text)` (see shinglesFromWords contract); at scale use
    * `withShingles`. */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesFromWords(words(text), k)

  /** Staged shingle computation: adds `out` (array<string>) in two
    * projections so each intermediate is computed once per row. */
  def withShingles(df: org.apache.spark.sql.DataFrame, text: Column, k: Int = 3,
                   out: String = "_sh"): org.apache.spark.sql.DataFrame =
    df.withColumn("_graft_words", words(text))
      .withColumn(out, shinglesFromWords(col("_graft_words"), k))
      .drop("_graft_words")

  /** Global top-`k` word n-grams by total occurrence count — the corpus
    * statistic tokenizer training (BPE pair counts) and n-gram LM
    * filtering start from. Exact n-grams only: rows with fewer than `n`
    * words contribute nothing (unlike the shingle family's short-row
    * sentinel, which would pollute the counts with unigrams).
    *
    * Scale shape: staged words → per-row n-gram array → explode_outer
    * (outer dodges InferFiltersFromGenerate re-inlining the staged lambda
    * — the known hazard) → partial-aggregated groupBy (map-side combine
    * ships (ngram, count) pairs, never positions) → `orderBy.limit(k)`
    * compiles to TakeOrderedAndProject: each task keeps its local top-k,
    * the driver merges — no global sort. Ties break on the n-gram string
    * so top-k is deterministic cross-engine. */
  def topNgrams(df: org.apache.spark.sql.DataFrame, text: Column,
                n: Int = 2, k: Int = 100): org.apache.spark.sql.DataFrame = {
    require(n >= 1 && k >= 1, s"need n ≥ 1 and k ≥ 1, got n=$n k=$k")
    val staged = df.select(words(text).as("_w"))
      .select(when(size(col("_w")) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(col("_w")) - (n - 1)),
          i => array_join(slice(col("_w"), i, lit(n)), " "))).as("_ng"))
    staged.select(explode_outer(col("_ng")).as("ngram"))
      .where(col("ngram").isNotNull)
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }

  /** Broadcast-dictionary familiarity scoring — the unigram-LM quality
    * signal computed against a reference vocabulary `(word, cnt)` (e.g.
    * [[topNgrams]] n=1 output, or a trusted-corpus word table): per doc,
    * total words, words found in the vocabulary, and the summed reference
    * counts of every occurrence. Integer outputs by design — a log-prob
    * variant would hash-diverge across libm implementations; callers can
    * take `ln` driver-side.
    *
    * Scale shape: staged words → explode (map) → BROADCAST hash join
    * against the dictionary (map — the corpus side never shuffles for the
    * lookup) → per-doc partial aggregate BEFORE the one doc_id exchange,
    * so the shuffle carries one row per doc per task, never per word. */
  def vocabScore(df: org.apache.spark.sql.DataFrame, text: Column, docId: Column,
                 vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val staged = df.select(docId.as("doc_id"), words(text).as("_w"))
    staged
      .select(col("doc_id"), size(col("_w")).as("_n"),
        explode_outer(col("_w")).as("word"))
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(
        max(col("_n")).as("words"), // constant per doc; max dodges a group key
        sum(when(col("cnt").isNotNull, 1L).otherwise(0L)).as("known_words"),
        sum(coalesce(col("cnt"), lit(0L))).as("known_count_sum"))
  }

  /** 64-bit document fingerprint: min of shingle hashes (winnowing-style —
    * stable under small edits far from the minimal shingle). Small-input
    * convenience; at scale stage via `withShingles` + `fingerprintFromShingles`. */
  def fingerprint(text: Column, k: Int = 3): Column =
    fingerprintFromShingles(shingles(text, k))

  /** `hash` defaults to xxhash64; pass `Hashing.Md5.plain` for the
    * SQL-reproducible oracle variant. */
  def fingerprintFromShingles(sh: Column,
                              hash: Column => Column = c => xxhash64(c)): Column =
    array_min(transform(sh, s => hash(s)))

  /** Exact-dup content key: hash of the whitespace-normalized text. md5 so a
    * SQL oracle can reproduce it byte-for-byte. */
  def contentKey(text: Column): Column =
    md5(array_join(words(text), " "))

  /** PII patterns in the Java-regex ∩ RE2 common subset (no lookaround, no
    * backrefs), so the DuckDB oracle evaluates the IDENTICAL pattern text:
    * email, IPv4, international-format phone, US-SSN shape. Deliberately
    * conservative (precision over recall): a training-pipeline PII pass
    * flags/redacts the unambiguous shapes and leaves fuzzy matching to a
    * dedicated NER stage. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4s", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phones", "\\+[0-9]{1,2} [0-9]{3} [0-9]{3,4}( [0-9]{3,4})?", "<PHONE>"),
    ("ssns", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"))

  /** PII scan + redaction, entirely map-side (codegen'd regex, zero
    * shuffle): per-doc match counts for each pattern family plus the
    * redacted text with matches replaced by typed placeholders. Redaction
    * applies in PiiPatterns order (email first — an IPv4-shaped domain or
    * SSN-shaped local part is consumed by the email placeholder before the
    * narrower patterns run), matching the oracle's nested regexp_replace.
    * At 100 TB this is the same narrow projection pass as quality/lang-id:
    * no exchange, whole-stage codegen, scan-bound. */
  def piiScan(df: org.apache.spark.sql.DataFrame, text: Column,
              docId: Column): org.apache.spark.sql.DataFrame = {
    val counts = PiiPatterns.map { case (name, re, _) =>
      size(regexp_extract_all(text, lit(re), lit(0))).as(name)
    }
    val redacted = PiiPatterns.foldLeft(text) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, lit(re), lit(tag))
    }
    df.select(docId.as("doc_id") +: counts :+ redacted.as("redacted"): _*)
  }

  /** Gopher-style REPETITION signals per document, computed entirely
    * map-side (zero shuffle): `(doc_id, words, dup_word_frac, bigrams,
    * top_bigram_count, top_bigram_frac)` — the "fraction of the doc covered
    * by its most frequent n-gram" filter family (Rae et al., Gopher,
    * arXiv:2112.11446 §A1.1).
    *
    * The top-bigram count is a run-length maximum over the SORTED bigram
    * array — O(n log n) per row with a constant-size aggregate state. NOT
    * an explode+groupBy (that would shuffle every bigram of a 100-TB
    * corpus for a per-row statistic) and NOT a count-per-distinct nested
    * HOF (O(n²) per row on long documents). Lambda bodies reference only
    * the accumulator and element (free expressions in Catalyst lambdas
    * re-evaluate per element — the staged `_w`/`_bg` columns stay outside). */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, text: Column,
                      docId: Column): org.apache.spark.sql.DataFrame = {
    val staged = df.select(docId.as("doc_id"), words(text).as("_w"))
      .withColumn("_bg",
        zip_with(
          slice(col("_w"), lit(1), greatest(size(col("_w")) - 1, lit(0))),
          slice(col("_w"), lit(2), greatest(size(col("_w")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)))
      .withColumn("_top",
        aggregate(
          array_sort(col("_bg")),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, x) => {
            val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
              .otherwise(lit(1L))
            struct(x.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best")))
    staged.select(
      col("doc_id"),
      size(col("_w")).as("words"),
      when(size(col("_w")) > 0,
        round(lit(1.0) - size(array_distinct(col("_w"))).cast("double") / size(col("_w")), 4))
        .otherwise(lit(0.0)).as("dup_word_frac"),
      size(col("_bg")).as("bigrams"),
      col("_top").as("top_bigram_count"),
      when(size(col("_bg")) > 0,
        round(col("_top").cast("double") / size(col("_bg")), 4))
        .otherwise(lit(0.0)).as("top_bigram_frac"))
  }
}
