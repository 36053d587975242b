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

  /** Output mode the stateful stage requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
