package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the bottom-k (KMV) quantile sketch
  * (operators.Sketches.bottomKSample): each shard maintains its k
  * smallest (hash, value) rows as keyed state, and because the bottom-k
  * of a union IS the bottom-k of per-shard bottom-k's, the global
  * sample at any point is one map-side merge over #shards * k rows —
  * the stream never stores more than that, regardless of how much data
  * has flowed through. This is the sketch-family streaming contract:
  * per-batch partials fold into mergeable state, rollup happens at
  * read time without rescans.
  */
object StreamingSketch {

  /** One incoming row: pre-hashed (the hash is the batch operator's
    * md5Hash64 — computed map-side before the stateful stage so state
    * only ever holds 16 bytes per kept row). */
  final case class BkRow(shard: Int, h: Long, v: Double)

  /** Per-shard state and emission: the shard's current bottom-k,
    * (h, v)-sorted — the exact order the batch sample uses. */
  final case class BkShard(shard: Int, hs: Seq[Long], vs: Seq[Double])

  private[streaming] def update(k: Int)(
      shard: Int, rows: Iterator[BkRow],
      state: GroupState[BkShard]): BkShard = {
    val prev = state.getOption
      .map(s => s.hs.zip(s.vs).toVector).getOrElse(Vector.empty)
    val merged = (prev ++ rows.map(r => (r.h, r.v)))
      .sorted.take(k)
    val out = BkShard(shard, merged.map(_._1), merged.map(_._2))
    state.update(out)
    out
  }

  /** Stateful per-shard bottom-k. Run with OutputMode.Update; the
    * latest row per shard is that shard's current sample. */
  def bottomKShards(ds: Dataset[BkRow], k: Int): Dataset[BkShard] = {
    implicit val enc = Encoders.product[BkShard]
    ds.groupByKey(_.shard)(Encoders.scalaInt)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update(k))
  }

  /** The read-time rollup: merge shard samples to the global bottom-k
    * (KMV property — equals the batch sample over everything the
    * stream has seen). A KMV merge is a SET union: overlapping samples
    * (re-emissions of the same shard, shards sharing rows) must not
    * crowd the k slots with duplicates. Plain batch code over
    * #samples * k rows. */
  def mergeShards(shards: Seq[BkShard], k: Int): Seq[(Long, Double)] =
    shards.flatMap(s => s.hs.zip(s.vs)).distinct.sorted.take(k)

  /** One incoming WEIGHTED row (the priority-sampling twin —
    * operators.Sketches.weightedBottomK): p = w/u is computed map-side
    * like the hash, so state holds 4 numbers per kept row. */
  final case class WBkRow(shard: Int, p: Double, h: Long, v: Double,
                          w: Double)

  /** Per-shard weighted state: the k+1 LARGEST priorities under the
    * batch operator's total order (p desc, h, v) — k sample rows plus
    * the threshold row, so τ (and with it every Horvitz–Thompson
    * adjusted weight) survives the read-time merge exactly like the
    * batch rollup. */
  final case class WBkShard(shard: Int, ps: Seq[Double], hs: Seq[Long],
                            vs: Seq[Double], ws: Seq[Double])

  private def wOrd: Ordering[(Double, Long, Double, Double)] =
    Ordering.by { case (p, h, v, _) => (-p, h, v) }

  private[streaming] def wUpdate(k: Int)(
      shard: Int, rows: Iterator[WBkRow],
      state: GroupState[WBkShard]): WBkShard = {
    val prev = state.getOption.map(s =>
      s.ps.indices.toVector.map(i => (s.ps(i), s.hs(i), s.vs(i), s.ws(i))))
      .getOrElse(Vector.empty)
    val merged = (prev ++ rows.map(r => (r.p, r.h, r.v, r.w)))
      .sorted(wOrd).take(k + 1)
    val out = WBkShard(shard, merged.map(_._1), merged.map(_._2),
      merged.map(_._3), merged.map(_._4))
    state.update(out)
    out
  }

  /** Stateful per-shard weighted bottom-k (top-(k+1) priorities). Run
    * with OutputMode.Update. */
  def weightedBottomKShards(ds: Dataset[WBkRow], k: Int)
      : Dataset[WBkShard] = {
    implicit val enc = Encoders.product[WBkShard]
    ds.groupByKey(_.shard)(Encoders.scalaInt)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(wUpdate(k))
  }

  /** Read-time rollup to the global k+1 rows — equals the batch
    * weightedBottomK over everything the stream has seen (top-(k+1) of
    * a union is the top-(k+1) of per-shard top-(k+1)s under the same
    * total order; distinct first because re-emissions of a shard
    * overlap). Returns (p, h, v, w) rows. */
  def mergeWeightedShards(shards: Seq[WBkShard], k: Int)
      : Seq[(Double, Long, Double, Double)] =
    shards.flatMap(s => s.ps.indices.map(i =>
      (s.ps(i), s.hs(i), s.vs(i), s.ws(i))))
      .distinct.sorted(wOrd).take(k + 1)

  /** Output mode the stateful stage requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
