package graft.graph

/** G4 — Viterbi decoding kernel (Trajectory.py:37-97,188-235 runs an HMM
  * map-matcher per taxi trip). Plain Scala: the reference's per-trip state
  * spaces are tiny (≤ dozens of points × ≤5 candidate states), so the DP
  * runs inside a `mapGroups` per entity — fully distributed across groups,
  * no driver involvement.
  */
object Viterbi {

  /** Minimum-cost state path.
    *
    * @param nObs    observation count
    * @param nStates state count per observation (rectangular state space)
    * @param emit    emit(t, s): cost of state s at observation t
    * @param trans   trans(s1, s2): transition cost s1 -> s2
    * @return argmin path, length nObs (empty if nObs == 0)
    */
  def decode(
      nObs: Int, nStates: Int,
      emit: (Int, Int) => Double,
      trans: (Int, Int) => Double): Array[Int] =
    decodeVar(nObs, _ => nStates, emit, (_, a, b) => trans(a, b))

  /** The general kernel: per-observation state counts and time-dependent
    * transition costs — the shape map-matching needs (candidate links per
    * GPS point vary; the path cost between two candidates depends on the
    * observed time gap at that step). Unreachable states carry
    * Double.PositiveInfinity cost and are never chosen while any finite
    * path exists.
    *
    * @param nStatesAt states at observation t (>= 1 for every t)
    * @param trans     trans(t, s1, s2): cost s1@(t-1) -> s2@t
    */
  def decodeVar(
      nObs: Int, nStatesAt: Int => Int,
      emit: (Int, Int) => Double,
      trans: (Int, Int, Int) => Double): Array[Int] = {
    if (nObs == 0) return Array.empty
    val cost = Array.tabulate(nObs)(t => new Array[Double](nStatesAt(t)))
    val back = Array.tabulate(nObs)(t => new Array[Int](nStatesAt(t)))
    var s = 0
    while (s < nStatesAt(0)) { cost(0)(s) = emit(0, s); s = 1 + s }
    var t = 1
    while (t < nObs) {
      var cur = 0
      while (cur < nStatesAt(t)) {
        var bestPrev = 0
        var bestCost = Double.PositiveInfinity
        var prev = 0
        while (prev < nStatesAt(t - 1)) {
          val c = cost(t - 1)(prev) + trans(t, prev, cur)
          if (c < bestCost) { bestCost = c; bestPrev = prev }
          prev += 1
        }
        cost(t)(cur) = bestCost + emit(t, cur)
        back(t)(cur) = bestPrev
        cur += 1
      }
      t += 1
    }
    // backtrack from the cheapest terminal state (ties -> lowest index)
    var best = 0
    var bc = cost(nObs - 1)(0)
    s = 1
    while (s < nStatesAt(nObs - 1)) {
      if (cost(nObs - 1)(s) < bc) { bc = cost(nObs - 1)(s); best = s }
      s += 1
    }
    val path = new Array[Int](nObs)
    path(nObs - 1) = best
    t = nObs - 1
    while (t > 0) { path(t - 1) = back(t)(path(t)); t -= 1 }
    path
  }
}
