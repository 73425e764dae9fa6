package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing for training-data assembly: the concat-and-chop
  * layout (concatenate documents in a deterministic order, cut every `ctx`
  * tokens) that turns a variable-length document corpus into fixed-length
  * training sequences. The operator does not materialize token buffers —
  * it computes each document's PLACEMENT (start offset → bin span) and the
  * per-stream packing efficiency report a pipeline owner actually reads:
  * how many context windows a corpus fills, how many documents straddle a
  * window boundary (and would need attention-mask surgery or re-chunking),
  * and how many tokens the final partial window wastes.
  *
  * The reference has no analog (single-value validator); this is part of
  * the LLM-pipeline operator family the brief adds.
  *
  * Scale shape: ONE exchange, keyed by the stream column — placement is a
  * running sum over a window `partitionBy(stream).orderBy(docId)`, and the
  * stats roll up with a groupBy on the SAME key, so Catalyst reuses the
  * window's shuffle for the aggregate (no second exchange; the same
  * pattern the cap-below-collect LSH stages gate in PlanSpec). The running
  * sum is order-dependent by definition, so a hot stream serializes into
  * one sorted partition — at 10^12 scale, feed a finer stream key (e.g.
  * source × date-shard) exactly as a production packer shards its writer
  * tasks; every derived quantity here remains exact per shard.
  *
  * Bin arithmetic is BIGINT `div` end to end (DuckDB `//`) — no doubles,
  * so the oracle twin is hash-exact by construction. */
object Packing {

  /** Per-document placement under concat-and-chop packing at `ctx` tokens:
    * `(stream, docId, n_tok, start_tok, first_bin, last_bin, straddles)`.
    * Documents are laid out per `stream` in ascending `docId` order;
    * `start_tok` is the token offset where the document begins, bins are
    * the `ctx`-sized windows its span [start_tok, start_tok + n_tok)
    * intersects. Zero-token documents occupy no span: they land in the bin
    * of their start offset and never straddle. Null token counts (null
    * text) pack as zero tokens. */
  def packAssignments(df: DataFrame, tokens: Column, docId: Column,
                      stream: Column, ctx: Int): DataFrame = {
    require(ctx > 0, s"ctx must be positive, got $ctx")
    // full tiebreak (doc_id, n_tok), nulls last to match SQL defaults: a
    // doc_id-only ROWS frame makes placement partition-layout-dependent
    // when (stream, doc_id) repeats with different token counts —
    // remaining ties are between identical rows, whose placements are
    // interchangeable, so the layout is well-defined
    val w = Window.partitionBy(col("stream"))
      .orderBy(col("doc_id").asc_nulls_last, col("n_tok").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(stream.as("stream"), docId.as("doc_id"),
        coalesce(tokens.cast("long"), lit(0L)).as("n_tok"))
      .withColumn("_end", sum(col("n_tok")).over(w))
      .withColumn("start_tok", col("_end") - col("n_tok"))
      // last occupied offset: max(end, start+1) - 1 keeps zero-token docs
      // pinned to their start bin instead of the previous one
      .withColumn("first_bin", expr(s"start_tok div $ctx"))
      .withColumn("last_bin",
        expr(s"(greatest(_end, start_tok + 1) - 1) div $ctx"))
      .withColumn("straddles", col("first_bin") =!= col("last_bin"))
      .drop("_end")
  }

  /** Per-stream packing report at `ctx` tokens: `(stream, docs,
    * total_tokens, n_bins, straddling_docs, tail_waste)` where `n_bins` =
    * ⌈total/ctx⌉ full-or-partial context windows and `tail_waste` = unused
    * tokens in the last window (0 when the stream ends exactly on a
    * boundary, and for empty streams). */
  def packStats(df: DataFrame, tokens: Column, docId: Column,
                stream: Column, ctx: Int): DataFrame =
    packAssignments(df, tokens, docId, stream, ctx)
      .groupBy(col("stream"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_tok")).as("total_tokens"),
        expr(s"(sum(n_tok) + ${ctx - 1}) div $ctx").as("n_bins"),
        sum(col("straddles").cast("long")).as("straddling_docs"),
        (expr(s"(sum(n_tok) + ${ctx - 1}) div $ctx") * ctx - sum(col("n_tok")))
          .as("tail_waste"))
}
