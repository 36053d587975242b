package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of TimeSeries.ewma: the smoothing recursion
  * y₁ = x₁; yₜ = α·xₜ + (1−α)·yₜ₋₁ carried as ONE double of keyed state
  * per series — the canonical flatMapGroupsWithState shape (the batch
  * operator folds a collected array; the stream folds arrival order).
  *
  * Contract: within a micro-batch the iterator is sorted here by the
  * order key, so batch boundaries never reorder a series as long as the
  * source delivers order keys monotonically ACROSS batches per key (a
  * kafka-per-key-partition or file-sequence source does). Under that
  * contract the emitted smoothed values are bit-identical to the batch
  * fold over the union of all batches — α and (1−α) are the same two
  * literals, applied in the same order (StreamingCurationSpec pins the
  * parity, split across batches).
  */
object StreamingEwma {

  final case class EwmaIn(key: String, t: Long, x: Double)
  final case class EwmaOut(key: String, t: Long, x: Double, ewma: Double)
  /** (last smoothed value) — the entire per-series state. */
  final case class EwmaState(y: Double)

  private[streaming] def update(alpha: Double)(
      key: String, rows: Iterator[EwmaIn],
      state: GroupState[EwmaState]): Iterator[EwmaOut] = {
    val beta = 1.0 - alpha
    var y = state.getOption.map(_.y)
    val out = rows.toVector.sortBy(_.t).map { r =>
      val next = y match {
        case None => r.x
        case Some(prev) => alpha * r.x + beta * prev
      }
      y = Some(next)
      EwmaOut(r.key, r.t, r.x, next)
    }
    y.foreach(v => state.update(EwmaState(v)))
    out.iterator
  }

  /** Stateful per-key exponential smoothing. Run with
    * OutputMode.Append; every input row is emitted once with its
    * smoothed value. */
  def ewma(ds: Dataset[EwmaIn], alpha: Double): Dataset[EwmaOut] = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    implicit val encOut = Encoders.product[EwmaOut]
    implicit val encState = Encoders.product[EwmaState]
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update(alpha))
  }

  /** Output mode the stateful stage requires. */
  val outputMode: OutputMode = OutputMode.Append()
}
