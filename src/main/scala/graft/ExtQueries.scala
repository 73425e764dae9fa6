package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.Multimodal
import graft.spec.SpecParser

/** Driver-oracle coverage for the two engine extensions that had only sbt
  * evidence in round 1: Structured Streaming validation and the multimodal
  * binary-column plumbing.
  *
  * - `s_stream_verdicts` runs REAL Structured Streaming (file source →
  *   watermarked windowed verdict aggregation → memory sink, AvailableNow
  *   trigger) over the events table; the oracle recomputes every
  *   (hour-window × constraint) verdict with plain SQL aggregation.
  * - `p_multimodal_meta` drives the full binary pipeline (deterministic
  *   GRF0 container encode → opaque binary column → batched mapPartitions
  *   decode); the oracle predicts the decoded metadata from the generator
  *   contract (Objects.hash(42L, id) = 2263 + id for id < 2³¹) without
  *   ever touching bytes — a disagreement anywhere in the encode/decode
  *   plumbing breaks the hash compare.
  */
object ExtQueries {

  /** Streaming spec: enum excludes 'error', maximum 400 < max(value) so
    * both violation kinds occur in most windows. */
  private val StreamSpecJson =
    """{"type":"object","required":["event_id"],
       "properties":{
         "event_type":{"type":"string","enum":["click","view","purchase","signup"]},
         "value":{"type":"number","minimum":0,"maximum":400}}}"""

  /** The file streaming source lists a DIRECTORY; the testdata table is a
    * single parquet file, so stage it into one (bytes unchanged). One file
    * also means ONE micro-batch under AvailableNow — which makes
    * update-mode state outputs deterministic for the oracle. */
  private def stagedEventsDir(dir: String): String = {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val stageDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_src_${math.abs(dir.hashCode)}")
    java.nio.file.Files.createDirectories(stageDir)
    val staged = stageDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(staged) ||
        java.nio.file.Files.size(staged) != java.nio.file.Files.size(src)) {
      java.nio.file.Files.copy(src, staged,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    staged.getParent.toString
  }

  /** Shared sink scaffold for the streaming queries: run a streaming frame
    * to a named memory sink under AvailableNow and return the sink table
    * (dropTempView first so one session can re-run the query). */
  private def runToMemorySink(s: SparkSession, out: DataFrame, sink: String,
                              mode: String): DataFrame = {
    s.catalog.dropTempView(sink)
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(sink)
  }

  private def streamVerdicts(s: SparkSession, dir: String): DataFrame = {
    val path = stagedEventsDir(dir)
    val schema = s.read.parquet(path).schema
    // parquet timestamps are NTZ; watermarks need TIMESTAMP — the cast
    // reinterprets the wall clock in the (UTC) session zone, which is also
    // what the oracle's date_trunc sees
    val stream = s.readStream.schema(schema).parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = graft.streaming.StreamValidator.verdictStream(stream,
        SpecParser.parse(StreamSpecJson), "ts", "1 hour", "10 minutes", part = None)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("constraint_id"), col("total"), col("violations"), col("pass"))
    runToMemorySink(s, out, s"graft_stream_sink_${math.abs(path.hashCode)}",
      "complete").orderBy("w_start", "constraint_id")
  }

  /** Stateful streaming dedup ledger (`flatMapGroupsWithState`): per-key
    * occurrence counts over a keyed event stream; single staged file →
    * single AvailableNow batch → exactly one update row per duplicated
    * key, which the SQL oracle reproduces with a plain GROUP BY/HAVING. */
  private def streamDedupCounts(s: SparkSession, dir: String): DataFrame = {
    val path = stagedEventsDir(dir)
    val schema = s.read.parquet(path).schema
    val stream = s.readStream.schema(schema).parquet(path)
    val out = graft.streaming.StreamDedup.duplicateCounts(
      stream, pmod(col("event_id"), lit(4000)))
    runToMemorySink(s, out.toDF(),
      s"graft_stream_dedup_${math.abs(path.hashCode)}", "update").orderBy("k")
  }

  /** Native `session_window` gap sessions over a REAL stream — the
    * streaming twin of the batch `Sessionize.sessions` operator. The
    * built-in merges sessions INCLUSIVELY at the boundary (measured,
    * StreamingSpec pins it): a gap of exactly the threshold stays in the
    * SAME session, so the oracle's new-session flag is `>` — identical to
    * the batch operator's rule. */
  private def streamSessions(s: SparkSession, dir: String): DataFrame = {
    val path = stagedEventsDir(dir)
    val schema = s.read.parquet(path).schema
    val stream = s.readStream.schema(schema).parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
    val out = stream
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("events"), min(col("event_id")).as("min_event"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        col("events"), col("min_event"))
    runToMemorySink(s, out,
      s"graft_stream_sessions_${math.abs(path.hashCode)}", "complete")
      .orderBy("user_id", "s_start")
  }

  /** Sessions re-derived with window SQL: the session START is the first
    * event's timestamp (second-truncated like date_format), events and
    * min_event per (user, session). */
  private val streamSessionsOracle =
    """WITH o AS (SELECT user_id, event_id, ts, epoch_us(ts) AS tus,
                         lag(epoch_us(ts)) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                  FROM events WHERE ts IS NOT NULL),
       s AS (SELECT user_id, event_id, ts,
                    sum(CASE WHEN prev IS NULL OR tus - prev > 1800000000
                             THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY tus, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
             FROM o)
       SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
              count(*) AS events, min(event_id) AS min_event
       FROM s GROUP BY user_id, sid
       ORDER BY user_id, s_start"""

  private val streamDedupOracle =
    """SELECT event_id % 4000 AS k, count(*) AS occurrences
       FROM events GROUP BY 1 HAVING count(*) > 1 ORDER BY k"""

  private val streamOracle =
    """WITH w AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
                         event_id, event_type, value
                  FROM events),
       tot AS (SELECT w_start, count(*) AS total FROM w GROUP BY 1),
       vio AS (
         SELECT w_start, './required:event_id' AS cid,
                count(*) FILTER (WHERE event_id IS NULL) AS v FROM w GROUP BY 1
         UNION ALL
         SELECT w_start, '.event_type/enum',
                count(*) FILTER (WHERE event_type IS NOT NULL AND event_type
                                 NOT IN ('click','view','purchase','signup'))
         FROM w GROUP BY 1
         UNION ALL
         SELECT w_start, '.value/minimum',
                count(*) FILTER (WHERE value IS NOT NULL AND value < 0) FROM w GROUP BY 1
         UNION ALL
         SELECT w_start, '.value/maximum',
                count(*) FILTER (WHERE value IS NOT NULL AND value > 400) FROM w GROUP BY 1)
       SELECT t.w_start, v.cid AS constraint_id, t.total,
              v.v AS violations, v.v = 0 AS pass
       FROM tot t JOIN vio v USING (w_start)
       ORDER BY w_start, constraint_id"""

  private val MediaRows = 5000L
  private val ImageRows = 2000L

  /** The REAL-codec arm (VERDICT r2 #6): genuine PNG (even ids) / JPEG
    * (odd ids) bytes round-trip through javax.imageio on the Spark side —
    * both magic-dispatch branches run; the oracle predicts the decoded
    * dimensions purely from the generator contract (w = 8 + id mod 32,
    * h = 8 + ⌊id/7⌋ mod 32; JPEG is lossy in pixels, never in dimensions).
    * n_bytes is excluded — encoded size is codec-internal, not
    * contract-predictable. */
  private val imageMetaOracle =
    s"""SELECT id AS doc_id, 'image' AS media_type,
              (8 + id % 32)::INT AS width,
              (8 + (id // 7) % 32)::INT AS height,
              (1)::INT AS n_frames
       FROM range($ImageRows) t(id) ORDER BY doc_id"""

  private val multimodalOracle =
    s"""SELECT id AS doc_id,
              CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
              (64 + (2263 + id) % 1024)::INT AS width,
              (64 + ((2263 + id) // 7) % 1024)::INT AS height,
              (CASE WHEN id % 3 = 2 THEN 1 + ((2263 + id) // 11) % 32 ELSE 1 END)::INT AS n_frames,
              (80 + (2263 + id) % 192)::BIGINT AS n_bytes
       FROM range($MediaRows) t(id) ORDER BY doc_id"""

  private val AudioRows = 2000L

  /** The REAL audio-codec arm (VERDICT r3 #5): genuine RIFF/WAVE bytes
    * written by the JDK's own WAV encoder round-trip through
    * `javax.sound.sampled` on the Spark side; the oracle predicts the
    * DECODED header fields purely from the generator contract (sr ∈
    * {8000,16000,44100} by id mod 3, ch = 1 + id mod 2, 16-bit, frames =
    * 100 + id mod 400 — Multimodal.syntheticAudio). Unlike images,
    * n_bytes IS contract-predictable: the JDK writes a canonical 44-byte
    * PCM WAV header, so n_bytes = 44 + frames × channels × 2. */
  private val audioMetaOracle =
    s"""SELECT id AS doc_id,
              (CASE id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)::INT AS sample_rate,
              (1 + id % 2)::INT AS channels,
              (16)::INT AS bits,
              (100 + id % 400)::BIGINT AS n_samples,
              (44 + (100 + id % 400) * (1 + id % 2) * 2)::BIGINT AS n_bytes
       FROM range($AudioRows) t(id) ORDER BY doc_id"""

  private val VideoRows = 2000L

  /** The REAL video-container arm: genuine minimal ISO-BMFF files written
    * box by box (ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl/stsz/
    * stsc/stco/mdat — Multimodal.syntheticVideos) round-trip through the
    * from-scratch box-tree parser on the Spark side; the oracle predicts
    * every DECODED field from the generator contract, INCLUDING total
    * container size (every non-mdat box is fixed-layout: 421 header bytes
    * + frames × 16 + 4 inter-chunk junk bytes = 425 + frames × 16, since
    * the r5 two-chunk stsc/stco layout).
    * A parser that skipped the walk and guessed any field breaks the hash. */
  private val videoMetaOracle =
    s"""SELECT id AS doc_id,
              (160 + (id % 32) * 4)::INT AS width,
              (96 + ((id // 7) % 32) * 4)::INT AS height,
              (1 + id % 120)::INT AS n_frames,
              (600)::INT AS timescale,
              ((1 + id % 120) * 25)::BIGINT AS duration_ticks,
              (425 + (1 + id % 120) * 16)::BIGINT AS n_bytes
       FROM range($VideoRows) t(id) ORDER BY doc_id"""

  /** Frame sampling through the driver gate (VERDICT r4 #6): every-4th
    * frame of every synthetic video, sliced by the REAL stsc/stco/stsz
    * demuxer addressing. The generator contract makes the oracle exact in
    * CONTENT, not just shape: the corpus is genuinely multi-chunk with
    * junk bytes between the chunks, sample bytes follow
    * (id·31 + i·17 + j·7) mod 256, and the oracle recomputes each sampled
    * frame's full hex — a slicer that ignores stco (contiguous-from-mdat
    * would read the junk), mis-addresses any boundary, or emits frames
    * for corrupt payloads changes frame_hex or the row set and breaks the
    * hash. */
  private val frameSampleOracle =
    s"""WITH fr AS (SELECT id,
                unnest(generate_series(0, (id % 120)::INT, 4))::BIGINT AS frame_idx
              FROM range($VideoRows) t(id))
       SELECT fr.id AS doc_id, fr.frame_idx, (16)::BIGINT AS n_bytes,
              (SELECT string_agg(
                        printf('%02X', ((fr.id * 31 + fr.frame_idx * 17 + j * 7) % 256)::INT),
                        '' ORDER BY j)
               FROM range(16) r(j)) AS frame_hex
       FROM fr ORDER BY doc_id, frame_idx"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_stream_verdicts" -> (streamVerdicts _),
    "s_stream_dedup" -> (streamDedupCounts _),
    "s_stream_sessions" -> (streamSessions _),
    "p_multimodal_meta" -> ((s, _) =>
      Multimodal.decodeMeta(Multimodal.syntheticMedia(s, MediaRows)).toDF()
        .orderBy("doc_id")),
    "p_image_meta" -> ((s, _) =>
      Multimodal.decodeMeta(Multimodal.syntheticImages(s, ImageRows)).toDF()
        .select("doc_id", "media_type", "width", "height", "n_frames")
        .orderBy("doc_id")),
    "p_audio_meta" -> ((s, _) =>
      Multimodal.decodeAudioMeta(Multimodal.syntheticAudio(s, AudioRows)).toDF()
        .orderBy("doc_id")),
    "p_video_meta" -> ((s, _) =>
      Multimodal.decodeVideoMeta(Multimodal.syntheticVideos(s, VideoRows)).toDF()
        .orderBy("doc_id")),
    "p_frame_sample" -> ((s, _) =>
      Multimodal.frameSample(Multimodal.syntheticVideos(s, VideoRows), everyN = 4).toDF()
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame")).cast("long").as("n_bytes"),
          hex(col("frame")).as("frame_hex"))
        .orderBy("doc_id", "frame_idx")))

  val oracles: Map[String, String] = Map(
    "s_stream_verdicts" -> streamOracle,
    "s_stream_dedup" -> streamDedupOracle,
    "s_stream_sessions" -> streamSessionsOracle,
    "p_multimodal_meta" -> multimodalOracle,
    "p_image_meta" -> imageMetaOracle,
    "p_audio_meta" -> audioMetaOracle,
    "p_video_meta" -> videoMetaOracle,
    "p_frame_sample" -> frameSampleOracle)
}
