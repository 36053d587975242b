package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** §2.12 — the streaming twin of the W5 taxi trip segmentation
  * (pipelines/Taxi.segmentPoints, TaxiDataHelper.py:195-320), the second
  * "naturally streamable" reference input after sessionization: GPS pings
  * arrive per vehicle in event-time order and trip breaks must be decided
  * online.
  *
  * Why custom state instead of windows: the backward stationary time at
  * point p sums the stationary stretch AFTER p — a suffix quantity. A
  * point can therefore only be finalized once its trailing stretch
  * resolves (a fast/zero-gap point arrives, or the stream flushes), which
  * is exactly a buffer-and-replay `flatMapGroupsWithState`:
  *
  *  - state per vehicle = the last finalized point (forward context: its
  *    coordinates/status for the next delta, its forward stationary
  *    accumulator, the trip counter) + the raw buffer of not-yet-final
  *    points (the open stationary tail — bounded by the longest stop, the
  *    same window the reference's backward iterrows pass needs);
  *  - each micro-batch replays the SEQUENTIAL reference recurrence over
  *    buffer + new points (sorted by (ts, tie)) and emits every point
  *    whose backward value is exactly resolved;
  *  - an event-time timeout (`flushHorizonMs` past the last ping) flushes
  *    the buffer with end-of-stream semantics and keeps the forward
  *    context, so a vehicle resuming later still gets exact deltas; a
  *    second idle horizon garbage-collects the context.
  *
  * The recurrences mirror Taxi.segmentPoints' window algebra exactly
  * (fwd: reset-to-zero-else-accumulate; bwd: bwd(i) = 0 if next point is
  * fast/missing else seconds(i+1) + bwd(i+1)); StreamingTaxiSpec proves
  * row-level batch/stream parity on a fixture exercising all 5 break
  * predicates. Late data behind the last finalized point is dropped
  * (the batch path is the replay story there).
  */
object StreamingTaxi {

  final case class Pt(cab: String, ts: Timestamp, tie: Long,
      x: Double, y: Double, status: Long)

  final case class SegOut(cab: String, ts: Timestamp, tie: Long,
      seconds: Option[Double], feet: Option[Double], speed: Option[Double],
      fwd_stationary: Double, bwd_stationary: Double,
      is_break: Int, trip_id: Long)

  /** Raw buffered point (tsMs, tie, x, y, status). */
  final case class Raw(tsMs: Long, tie: Long, x: Double, y: Double, status: Long)

  final case class TaxiState(
      prev: Option[Raw], fwdSt: Double, tripCount: Long, buffer: Vector[Raw])

  /** Forward-resolved point. */
  private final case class F(raw: Raw, seconds: Option[Double],
      feet: Option[Double], speed: Option[Double], statusChg: Boolean,
      fwdSt: Double)

  import graft.pipelines.Taxi.{SpeedThresholdMph, StationarySeconds,
    MaxSecondsBetween, MaxFeetBetween}

  /** One replay pass: returns (emitted, next state). */
  def process(st: TaxiState, incoming: Vector[Raw], endOfStream: Boolean)
      : (Vector[SegOut], TaxiState) = {
    val cutoff = st.prev.map(p => (p.tsMs, p.tie))
    // NO .distinct here: exact duplicate pings (at-least-once producers)
    // are real rows the batch path keeps (second one emits seconds = 0),
    // and buffer/incoming never overlap by construction (the cutoff
    // filter owns the emitted boundary) — a dedup here broke row-level
    // batch/stream parity on duplicated input
    val pts = (st.buffer ++ incoming
        .filterNot(p => cutoff.exists { case (t, k) =>
          p.tsMs < t || (p.tsMs == t && p.tie <= k) }))
      .sortBy(p => (p.tsMs, p.tie))
    if (pts.isEmpty) return (Vector.empty, st)

    // forward pass — the reference's first iterrows sweep
    val fs = new Array[F](pts.length)
    var prev = st.prev
    var fwdAcc = st.fwdSt
    var i = 0
    while (i < pts.length) {
      val p = pts(i)
      val seconds = prev.map(q => (p.tsMs - q.tsMs) / 1000.0)
      val feet = prev.map(q =>
        math.sqrt(math.pow(p.x - q.x, 2) + math.pow(p.y - q.y, 2)))
      val statusChg = prev.exists(_.status != p.status)
      val speed = (seconds, feet) match {
        case (Some(s), Some(f)) if s > 0 => Some(f / s * 0.681818)
        case _ => None
      }
      val fwdReset = seconds.isEmpty || seconds.contains(0.0) ||
        speed.exists(_ >= SpeedThresholdMph)
      fwdAcc = if (fwdReset) 0.0 else fwdAcc + seconds.get
      fs(i) = F(p, seconds, feet, speed, statusChg, fwdAcc)
      prev = Some(p)
      i += 1
    }

    // backward pass: bwd(i) = 0 if the NEXT point is fast/zero-gap/missing,
    // else seconds(i+1) + bwd(i+1); exactly known only once that recursion
    // hits a reset (or end-of-stream)
    val bwd = new Array[Double](pts.length)
    val known = new Array[Boolean](pts.length)
    i = pts.length - 1
    while (i >= 0) {
      if (i == pts.length - 1) {
        // no next point yet: resolved (to 0) only at end of stream
        bwd(i) = 0.0; known(i) = endOfStream
      } else {
        val s2 = fs(i + 1).seconds; val sp2 = fs(i + 1).speed
        val br = s2.isEmpty || s2.contains(0.0) ||
          sp2.exists(_ >= SpeedThresholdMph)
        if (br) { bwd(i) = 0.0; known(i) = true }
        else { bwd(i) = s2.get + bwd(i + 1); known(i) = known(i + 1) }
      }
      i -= 1
    }

    val nFinal = {
      var k = 0
      while (k < pts.length && known(k)) k += 1
      k
    }
    var trips = st.tripCount
    val out = Vector.newBuilder[SegOut]
    i = 0
    while (i < nFinal) {
      val f = fs(i)
      val isBreak = f.seconds.isEmpty || f.statusChg ||
        f.seconds.exists(_ > MaxSecondsBetween) ||
        f.feet.exists(_ > MaxFeetBetween) ||
        f.fwdSt > StationarySeconds ||
        (bwd(i) > StationarySeconds && f.fwdSt > 0)
      if (isBreak) trips += 1
      out += SegOut("", new Timestamp(f.raw.tsMs), f.raw.tie,
        f.seconds, f.feet, f.speed, f.fwdSt, bwd(i),
        if (isBreak) 1 else 0, trips)
      i += 1
    }
    val newPrev = if (nFinal > 0) Some(fs(nFinal - 1).raw) else st.prev
    val newFwd = if (nFinal > 0) fs(nFinal - 1).fwdSt else st.fwdSt
    (out.result(),
      TaxiState(newPrev, newFwd, trips, pts.drop(nFinal)))
  }

  def update(flushHorizonMs: Long)(
      key: String, events: Iterator[Pt], state: GroupState[TaxiState])
      : Iterator[SegOut] = {
    val st = state.getOption.getOrElse(TaxiState(None, 0.0, 0L, Vector.empty))
    // a timeout candidate may already sit behind the advancing watermark
    // (that is exactly what fired the flush) — clamp forward or Spark
    // rejects it
    def armTimeout(candidateMs: Long): Unit =
      state.setTimeoutTimestamp(
        math.max(candidateMs, state.getCurrentWatermarkMs() + 1))
    if (state.hasTimedOut) {
      if (st.buffer.isEmpty) { state.remove(); Iterator.empty }
      else {
        val (outs, next) = process(st, Vector.empty, endOfStream = true)
        state.update(next)
        // context kept for exact deltas if the vehicle resumes; a second
        // idle horizon GCs it (buffer now empty -> remove branch above).
        // The horizon must be measured from NOW (the watermark): the
        // last point's own timestamp is already >= one horizon behind
        // the watermark — that's what fired this flush — so arming from
        // it would clamp to watermark+1 and GC the kept context on the
        // very next tick instead of after a second idle horizon.
        next.prev.foreach(_ =>
          armTimeout(state.getCurrentWatermarkMs() + flushHorizonMs))
        outs.iterator.map(_.copy(cab = key))
      }
    } else {
      val pts = events.map(p => Raw(p.ts.getTime, p.tie, p.x, p.y, p.status)).toVector
      val (outs, next) = process(st, pts, endOfStream = false)
      state.update(next)
      next.buffer.lastOption match {
        case Some(last) => armTimeout(last.tsMs + flushHorizonMs)
        case None if outs.nonEmpty =>
          // everything buffered got finalized and emitted this batch:
          // prev IS the last emitted point — a fresh timestamp, so the
          // horizon measured from it is the normal idle contract
          armTimeout(next.prev.get.tsMs + flushHorizonMs)
        case None if next.prev.isEmpty =>
          // nothing buffered, nothing emitted, nothing ever kept (every
          // input was late): no reason for this state to exist
          state.remove()
        case None =>
          // post-flush kept context and a no-op batch (late/duplicate
          // pings only): LEAVE the GC timer from the flush in place.
          // Re-arming from prev.tsMs would clamp to watermark+1 — prev
          // is already a horizon behind the watermark — and destroy the
          // kept context on the next tick.
          ()
      }
      outs.iterator.map(_.copy(cab = key))
    }
  }

  /** Wire over a (watermarked, streaming) Dataset[Pt]. */
  def segment(ds: Dataset[Pt], flushHorizonMinutes: Double): Dataset[SegOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.cab)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update((flushHorizonMinutes * 60000).toLong))
  }
}
