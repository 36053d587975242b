package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the Misra–Gries heavy-hitters pass
  * (operators.Sketches.heavyHitters): each shard maintains a k-counter
  * MG summary as keyed state — O(k) memory per shard FOREVER, however
  * much data flows through — and the read-time merge adds counters
  * across shard summaries. The merged summary keeps the MG guarantee
  * (Misra & Gries 1982; mergeability per Agarwal et al., PODS'12):
  * absence from shard s undercounts a key by at most n_s/(k+1), so a
  * key with true global frequency > Σ n_s/(k+1) = n/(k+1) survives in
  * at least one shard — the candidate set is a SUPERSET of the
  * phi-heavy keys for any phi > 1/(k+1), exactly the batch
  * operator's pass-1 contract. The batch exact-recount (pass 2) stays
  * a batch job over ≤ shards·k candidate keys. */
object StreamingHeavyHitters {

  /** One incoming row, pre-sharded map-side (hash of the key mod
    * shards — any assignment works; sharding exists to parallelize
    * state, not for correctness). */
  final case class KeyRow(shard: Int, key: String)

  /** Per-shard MG summary: parallel (keys, counts) arrays plus the
    * shard's exact row count n — needed at merge time for the error
    * bound. Keys kept sorted so emissions are deterministic. */
  final case class MgShard(shard: Int, keys: Seq[String],
                           counts: Seq[Long], n: Long)

  private[streaming] def update(k: Int)(
      shard: Int, rows: Iterator[KeyRow],
      state: GroupState[MgShard]): MgShard = {
    val m = scala.collection.mutable.Map.empty[String, Long]
    state.getOption.foreach(s => s.keys.zip(s.counts).foreach {
      case (key, c) => m(key) = c
    })
    var n = state.getOption.map(_.n).getOrElse(0L)
    rows.foreach { r =>
      n += 1
      if (m.contains(r.key)) m(r.key) += 1
      else if (m.size < k) m(r.key) = 1L
      else {
        // classic MG: a full table + an unseen key decrements ALL
        // counters by one; zeros vacate their slots
        m.mapValuesInPlace((_, v) => v - 1)
        m.filterInPlace((_, v) => v > 0): Unit
      }
    }
    val keys = m.keys.toSeq.sorted
    val out = MgShard(shard, keys, keys.map(m), n)
    state.update(out)
    out
  }

  /** Stateful per-shard MG. Run with OutputMode.Update; the latest row
    * per shard is that shard's current summary. */
  def mgShards(ds: Dataset[KeyRow], k: Int): Dataset[MgShard] = {
    require(k >= 1, "mgShards needs k >= 1")
    implicit val enc = Encoders.product[MgShard]
    ds.groupByKey(_.shard)(Encoders.scalaInt)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update(k))
  }

  /** Read-time rollup over the LATEST emission per shard: counter
    * addition (the mergeable-summaries merge) + total n. Returns
    * (total n, merged candidate -> estimated count). Estimates
    * undercount by at most n/(k+1); the exact tier recounts them in
    * batch like Sketches.heavyHitters pass 2. */
  def mergeShards(shards: Seq[MgShard]): (Long, Map[String, Long]) = {
    val latest = shards.groupBy(_.shard).map { case (_, emissions) =>
      emissions.maxBy(_.n)
    }.toSeq
    (latest.map(_.n).sum,
      latest.flatMap(s => s.keys.zip(s.counts))
        .groupMapReduce(_._1)(_._2)(_ + _))
  }

  /** Output mode the stateful stage requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
