package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spec.SpecParser
import graft.streaming.StreamValidator

import Harness.spark

/** Structured Streaming front-end: same compiled checks over a MemoryStream. */
class StreamingSpec extends AnyFunSuite {
  import spark.implicits._

  case class Ev(doc_id: String, n_tok: Int, source: String, ts: java.sql.Timestamp)
  case class KEv(k: Long, ts: java.sql.Timestamp)

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  val spec = SpecParser.parse(
    """{"type":"object","required":["source"],
       "properties":{"n_tok":{"type":"integer","minimum":1,"maximum":100},
                     "source":{"type":"string","enum":["web","books"]}}}""")

  test("violationStream emits per-row violations in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamValidator.violationStream(mem.toDF(), spec, "doc_id", None)
    val q = out.writeStream.format("memory").queryName("viols").outputMode("append").start()
    mem.addData(
      Ev("a", 5, "web", ts("2026-01-01 00:00:00")),
      Ev("b", 0, "web", ts("2026-01-01 00:00:10")),   // n_tok minimum
      Ev("c", 5, "spam", ts("2026-01-01 00:00:20")),  // enum
      Ev("d", 5, null, ts("2026-01-01 00:00:30")))    // required
    q.processAllAvailable()
    val rows = spark.table("viols")
      .select("doc_id", "constraint_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(rows == Set(
      ("b", ".n_tok/minimum"),
      ("c", ".source/enum"),
      ("d", "./required:source")))
  }

  test("verdictStream aggregates per event-time window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamValidator.verdictStream(mem.toDF(), spec, "ts",
      "1 minute", "10 seconds", part = None)
    val q = out.writeStream.format("memory").queryName("verdicts")
      .outputMode("complete").start()
    mem.addData(
      Ev("a", 5, "web", ts("2026-01-01 00:00:05")),
      Ev("b", 0, "web", ts("2026-01-01 00:00:15")),
      Ev("c", 5, "web", ts("2026-01-01 00:01:05")))
    q.processAllAvailable()
    val rows = spark.table("verdicts")
      .select(col("window.start").cast("string"), col("constraint_id"),
        col("total"), col("violations"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    q.stop()
    val w0 = rows.filter(r => r._1.startsWith("2026-01-01 00:00") && r._2 == ".n_tok/minimum")
    assert(w0.length == 1 && w0.head._3 == 2 && w0.head._4 == 1)
    val w1 = rows.filter(r => r._1.startsWith("2026-01-01 00:01") && r._2 == ".n_tok/minimum")
    assert(w1.length == 1 && w1.head._3 == 1 && w1.head._4 == 0)
  }

  test("session_window: exact-gap boundary MERGES; only a strictly larger gap splits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KEv]
    val out = mem.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(col("k"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("events"))
      .select(col("k"), col("session_window.start").cast("string").as("s"),
        col("events"))
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    mem.addData(
      KEv(1L, ts("2026-01-01 00:00:00")),
      KEv(1L, ts("2026-01-01 00:29:59")), // < gap → same session
      KEv(1L, ts("2026-01-01 00:59:59")), // exactly 30:00 later → MERGES
      KEv(1L, ts("2026-01-01 01:30:00")), // 30:01 later → new session
      KEv(2L, ts("2026-01-01 00:00:00")))
    q.processAllAvailable()
    val rows = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    // pins the INCLUSIVE boundary merge — the same `>` split rule as the
    // batch Sessionize operator, so the two front-ends agree everywhere
    assert(rows == Set(
      (1L, "2026-01-01 00:00:00", 3L),
      (1L, "2026-01-01 01:30:00", 1L),
      (2L, "2026-01-01 00:00:00", 1L)),
      s"session_window boundary semantics changed: $rows")
  }

  test("stateful streaming dedup ledger accumulates counts ACROSS batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val out = graft.streaming.StreamDedup.duplicateCounts(mem.toDF(), col("value"))
    val q = out.toDF().writeStream.format("memory").queryName("dupled")
      .outputMode("update").start()
    mem.addData(1L, 2L, 3L, 1L) // batch 1: key 1 duplicated
    q.processAllAvailable()
    mem.addData(2L, 1L)         // batch 2: key 2 now dup, key 1 grows to 3
    q.processAllAvailable()
    val rows = spark.table("dupled").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    // update-mode emissions: (1,2) from batch 1; (2,2) and (1,3) from
    // batch 2 — key state PERSISTED between batches
    assert(rows == Set((1L, 2L), (2L, 2L), (1L, 3L)), rows.toString)
  }

  test("watermark-bounded dedup ledger frees expired key state (event-time timeout)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KEv]
    val out = graft.streaming.StreamDedup.duplicateCountsWithinWatermark(
      mem.toDF(), col("k"), col("ts"), ttlMs = 30000L)
    val q = out.toDF().writeStream.format("memory").queryName("dupwm")
      .outputMode("update").start()
    // B1: key 1 duplicated → (1,2); timeouts armed at last-seen + 30 s
    mem.addData(KEv(1, ts("2026-01-01 00:00:00")), KEv(1, ts("2026-01-01 00:00:05")),
                KEv(2, ts("2026-01-01 00:00:10")))
    q.processAllAvailable()
    // B2 advances the watermark PAST the timeouts (wm updates at batch end);
    // B3 is where the engine actually fires them and frees keys 1 and 2
    mem.addData(KEv(8, ts("2026-01-01 00:01:00")))
    q.processAllAvailable()
    mem.addData(KEv(9, ts("2026-01-01 00:01:30")))
    q.processAllAvailable()
    // B4: key 1 re-appears AFTER expiry — fresh state, so the pair counts
    // from 1 again and emits (1,2); surviving state would have emitted (1,3)
    mem.addData(KEv(1, ts("2026-01-01 00:02:00")), KEv(1, ts("2026-01-01 00:02:05")))
    q.processAllAvailable()
    val rows = spark.table("dupwm").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    q.stop()
    assert(rows == Seq((1L, 2L), (1L, 2L)), rows.toString)
  }

}
