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
  * `dropDuplicatesWithinWatermark` for the keep-first decision, or
  * `duplicateCountsWithinWatermark` below for this ledger (event-time
  * timeout — a processing-time TTL would make the engine busy-trigger
  * empty micro-batches to poll timeouts — measured, not theoretical — so
  * that variant is deliberately NOT offered). */
object StreamDedup {

  final case class KeyCount(k: Long, occurrences: Long)
  final case class KeyedEvent(k: Long, ts: java.sql.Timestamp)
  final case class CountState(count: Long, maxTsMs: Long)

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

  /** Bounded-state duplicate ledger for UNBOUNDED key universes: per-key
    * occurrence counts whose state is freed by EVENT-TIME timeout once the
    * watermark passes (key's last event time + `ttlMs`). State size is then
    * O(keys active within one TTL window), not O(all keys ever seen). The
    * recall contract is `dropDuplicatesWithinWatermark`'s: duplicates
    * farther apart in event time than the TTL restart the count at 1 and
    * are NOT reported — bounded state is bought with bounded memory.
    *
    * `watermarkDelay` is the usual lateness bound on `timeCol` (events
    * later than it may be dropped by the engine before reaching state). */
  def duplicateCountsWithinWatermark(df: DataFrame, key: Column, timeCol: Column,
                                     ttlMs: Long,
                                     watermarkDelay: String = "0 seconds"): Dataset[KeyCount] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("long").as("k"), timeCol.cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[KeyedEvent]
      .groupByKey(_.k)
      .flatMapGroupsWithState[CountState, KeyCount](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, values: Iterator[KeyedEvent], state: GroupState[CountState]) =>
          if (state.hasTimedOut) { // watermark passed last-seen + ttl
            state.remove()
            Iterator.empty
          } else {
            val evs = values.toVector
            val prev = state.getOption.getOrElse(CountState(0L, Long.MinValue))
            val maxTs = math.max(prev.maxTsMs, evs.map(_.ts.getTime).max)
            val now = CountState(prev.count + evs.size, maxTs)
            state.update(now)
            state.setTimeoutTimestamp(maxTs + ttlMs)
            if (now.count > 1) Iterator(KeyCount(k, now.count)) else Iterator.empty
          }
      }
  }

}
