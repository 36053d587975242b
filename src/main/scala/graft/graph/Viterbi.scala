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

  private def logSumExp(xs: Array[Double]): Double = {
    var m = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) { if (xs(i) > m) m = xs(i); i += 1 }
    if (m == Double.NegativeInfinity) return Double.NegativeInfinity
    var s = 0.0
    i = 0
    while (i < xs.length) { s += math.exp(xs(i) - m); i += 1 }
    m + math.log(s)
  }

  /** Posterior state probabilities by forward-backward over the SAME cost
    * structure decodeVar minimizes — the reference's optional smoother
    * pass (Trajectory.py:220-235 runs TrajectorySmoother1 beside the
    * Viterbi over identical features/transitions). Costs are treated as
    * negative log potentials: P(path) ∝ exp(-Σ costs), and
    * gamma(t)(s) = P(state_t = s | all observations). Runs in the log
    * domain with per-step log-sum-exp, so large/infinite costs cannot
    * underflow; an observation whose states are ALL unreachable yields
    * an all-zero row rather than NaN. */
  def smooth(
      nObs: Int, nStatesAt: Int => Int,
      emit: (Int, Int) => Double,
      trans: (Int, Int, Int) => Double): Array[Array[Double]] = {
    if (nObs == 0) return Array.empty
    val la = Array.tabulate(nObs)(t => new Array[Double](nStatesAt(t)))
    val lb = Array.tabulate(nObs)(t => new Array[Double](nStatesAt(t)))
    var s = 0
    while (s < nStatesAt(0)) { la(0)(s) = -emit(0, s); s += 1 }
    var t = 1
    while (t < nObs) {
      var cur = 0
      while (cur < nStatesAt(t)) {
        val terms = new Array[Double](nStatesAt(t - 1))
        var prev = 0
        while (prev < nStatesAt(t - 1)) {
          terms(prev) = la(t - 1)(prev) - trans(t, prev, cur)
          prev += 1
        }
        la(t)(cur) = logSumExp(terms) - emit(t, cur)
        cur += 1
      }
      t += 1
    }
    // beta: lb(nObs-1) = 0 (log 1)
    t = nObs - 2
    while (t >= 0) {
      var cur = 0
      while (cur < nStatesAt(t)) {
        val terms = new Array[Double](nStatesAt(t + 1))
        var next = 0
        while (next < nStatesAt(t + 1)) {
          terms(next) = lb(t + 1)(next) - trans(t + 1, cur, next) -
            emit(t + 1, next)
          next += 1
        }
        lb(t)(cur) = logSumExp(terms)
        cur += 1
      }
      t -= 1
    }
    Array.tabulate(nObs) { t =>
      val joint = Array.tabulate(nStatesAt(t))(s => la(t)(s) + lb(t)(s))
      val z = logSumExp(joint)
      if (z == Double.NegativeInfinity) new Array[Double](nStatesAt(t))
      else joint.map(j => math.exp(j - z))
    }
  }
}
