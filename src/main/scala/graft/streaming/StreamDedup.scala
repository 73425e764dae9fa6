package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming duplicate ledger — the streaming analog of
  * `CrossRow.uniqueness` violations, maintained in keyed state via
  * `flatMapGroupsWithState` (the custom-state primitive the brief names).
  *
  * Spark already covers the keep-first DECISION natively
  * (`dropDuplicates` / `dropDuplicatesWithinWatermark` — prefer those to
  * drop rows); this operator adds the OBSERVABILITY side a validation
  * suite needs: which keys duplicated and how often, emitted as updates
  * whenever a key's occurrence count grows past 1.
  *
  * Scale: state is one Long per distinct key, partitioned by key hash —
  * the same shuffle shape as a streaming aggregation. The exact ledger
  * assumes a bounded key universe (true for a validation window's doc_id
  * set); for unbounded keys, bound the state with the watermark instead:
  * `dropDuplicatesWithinWatermark` for the keep-first decision, or an
  * event-time-timeout variant of this ledger (a processing-time TTL makes
  * the engine busy-trigger empty micro-batches to poll timeouts —
  * measured, not theoretical — so it is deliberately NOT offered). */
object StreamDedup {

  final case class KeyCount(k: Long, occurrences: Long)

  /** Per-key duplicate counts, unbounded state (exact, use for bounded key
    * universes): emits (k, occurrences) in Update mode each time a key's
    * total grows while > 1. */
  def duplicateCounts(df: DataFrame, key: Column): Dataset[KeyCount] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("long").as("k")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, KeyCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: Long, values: Iterator[Long], state: GroupState[Long]) =>
          val now = state.getOption.getOrElse(0L) + values.size
          state.update(now)
          if (now > 1) Iterator(KeyCount(k, now)) else Iterator.empty
      }
  }

}
