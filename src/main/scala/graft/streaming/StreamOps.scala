package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.12 — Structured Streaming extension surface. The reference is pure
  * batch, but its AVL/APC and GPS inputs are timestamped event streams;
  * SURVEY.md §2.12 plans the batch sessionization ops to be
  * watermark-compatible. This module exposes them over readStream:
  *
  *  - `sessionAggregate`: the Clipper W4 sessionization as a
  *    `session_window` aggregation (event-time, watermark-bounded state);
  *  - `windowedCounts`: tumbling-window event rollups.
  *
  * Both run identically over a batch DataFrame (Spark evaluates
  * session_window in batch too) — the parity test in StreamingSpec drives
  * the same frames through readStream + memory sink.
  */
object StreamOps {

  /** Session aggregation: one row per (key, session window) with event
    * count and value sum. `gap` e.g. "90 minutes". For a streaming input
    * add `.withWatermark(tsCol, horizon)` upstream.
    */
  def sessionAggregate(
      events: DataFrame, tsCol: String, keyCol: String, gap: String,
      valueCol: String = "value"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("session"))
      .agg(count(lit(1)).as("n_events"), sum(valueCol).as("sum_value"))

  /** Tumbling-window counts by category. */
  def windowedCounts(
      events: DataFrame, tsCol: String, width: String,
      typeCol: String = "event_type"): DataFrame =
    events
      .groupBy(window(col(tsCol), width).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup: keep the first document per content
    * fingerprint seen within the watermark horizon; state for a
    * fingerprint is evicted once the watermark passes it. This is the
    * honest unbounded-stream contract — a global streaming dedup would
    * grow state with corpus size forever; the batch job (Dedup.exact)
    * owns the global pass, the stream bounds its memory by time.
    */
  def streamingDedup(
      docs: DataFrame, tsCol: String, textCol: String,
      horizon: String): DataFrame =
    docs
      .withColumn("fingerprint", graft.functions.Text.fingerprint(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming incremental dedup against a STATIC reference corpus — the
    * streaming twin of Dedup.incrementalNearDup's exact tier: as new
    * documents stream in, flag the ones whose content fingerprint already
    * exists in the corpus. Stream-static left joins are STATELESS (the
    * static side is just re-planned per micro-batch, broadcast when small
    * enough), so this adds no state beyond the in-stream dedup's
    * watermark-bounded fingerprint set. The corpus fingerprint table is
    * the batch job's product (Dedup) — refreshed on the batch cadence,
    * exactly how an incremental ingest sits next to a nightly dedup.
    *
    * `corpusFps` must have a `fingerprint` column (md5 of normalized
    * text, Text.fingerprint) and be distinct. Output = stream docs, first
    * occurrence per fingerprint within the horizon, with `is_known_dup`.
    */
  def streamingIncrementalDedup(
      docs: DataFrame, corpusFps: DataFrame, tsCol: String, textCol: String,
      horizon: String): DataFrame = {
    val marked = corpusFps.select(col("fingerprint"),
      lit(true).as("__in_corpus"))
    streamingDedup(docs, tsCol, textCol, horizon)
      .join(marked, Seq("fingerprint"), "left")
      .withColumn("is_known_dup", coalesce(col("__in_corpus"), lit(false)))
      .drop("__in_corpus")
  }

  /** Stream-STREAM event-time join — the click-attribution shape: each
    * click joins the impression with the same key whose event time
    * precedes it by at most `within`. Both sides carry watermarks and
    * the join condition bounds BOTH event times, so Spark can size the
    * buffered state exactly (impressions evict once no future click can
    * reach them; clicks evict past their own watermark) — the honest
    * unbounded-stream contract for a two-stream join. Inner join: a
    * click with no in-window impression drops (left-outer emits nulls
    * only after the watermark closes the window — same code, different
    * joinType, more latency).
    *
    * `impressions` needs (keyCol, impTsCol, ...), `clicks`
    * (keyCol, clickTsCol, ...); both must already have
    * `.withWatermark` applied upstream. Returns every matched pair with
    * the attribution latency in seconds (exact integer micros → one
    * divide).
    */
  def streamStreamAttribution(
      impressions: DataFrame, clicks: DataFrame, keyCol: String,
      impTsCol: String, clickTsCol: String, within: String): DataFrame =
    impressions.join(clicks,
      impressions(keyCol) === clicks(keyCol) &&
        clicks(clickTsCol) >= impressions(impTsCol) &&
        clicks(clickTsCol) <=
          impressions(impTsCol) + expr(s"INTERVAL $within"))
      .drop(clicks(keyCol))
      .withColumn("latency_seconds",
        (unix_micros(col(clickTsCol)) - unix_micros(col(impTsCol)))
          .cast("double") / 1e6)
}
