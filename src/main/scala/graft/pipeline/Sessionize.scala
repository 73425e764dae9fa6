package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based event sessionization — the event-stream analog of the
  * training-pipeline operators: group each user's events into sessions
  * that break wherever the inter-event gap exceeds `gapSeconds` (the
  * classic web-analytics 30-minute rule).
  *
  * The reference has no analog (single-value validator); this is part of
  * the brief's operator family over the `events` table.
  */
object Sessionize {

  /** Per-session rollup `(user_id, session_idx, events, duration_us,
    * first_event)`. `session_idx` is 1-based per user in time order;
    * `first_event` is the id of the session's OPENING event — the row
    * whose gap flag started the session, i.e. first in (ts, eventId)
    * order, not the minimum id. Events with a null timestamp cannot be
    * placed on a timeline and are EXCLUDED (Spark sorts nulls first,
    * DuckDB last — keeping them would also diverge the engines).
    *
    * Scale shape — ONE exchange end to end: the lag + running-sum windows
    * share a single (user) partition / (ts, event_id) sort, and the
    * per-session rollup's ClusteredDistribution(user, session_idx) is
    * already satisfied by the window's HashPartitioning(user) — grouping
    * keys that extend the existing partitioning never re-shuffle
    * (PlanSpec-gated). Hot users are bounded by the window's spillable
    * buffer; timestamps travel as unix micros (BIGINT) so the DuckDB twin
    * (`epoch_us`) is integer-exact — no float time arithmetic anywhere.
    * Ties order on `eventId`, so sessions are deterministic under
    * duplicate timestamps. */
  def sessions(df: DataFrame, userId: Column, ts: Column, eventId: Column,
               gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gap must be positive seconds, got $gapSeconds")
    val w = Window.partitionBy(col("_u")).orderBy(col("_tus").asc, col("_eid").asc)
    df.where(ts.isNotNull)
      .select(userId.as("_u"),
        unix_micros(ts.cast("timestamp")).as("_tus"), eventId.as("_eid"))
      .withColumn("_prev", lag(col("_tus"), 1).over(w))
      .withColumn("_open",
        when(col("_prev").isNull
            || col("_tus") - col("_prev") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("_open")).over(w))
      .groupBy(col("_u").as("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("events"),
        (max(col("_tus")) - min(col("_tus"))).as("duration_us"),
        // exactly one opener per session by construction
        min(when(col("_open") === 1L, col("_eid"))).as("first_event"))
  }
}
