package graft

import graft.graph.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and k-core: parity against brute-force/sequential
  * references on graphs small enough to enumerate, plus the input-shape
  * contracts (direction, duplicates, self-loops) the operators promise
  * to absorb. */
class GraphTopologySpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (String, String)*): DataFrame =
    pairs.toDF("src", "dst")

  /** Brute-force triangle census: all 3-subsets of nodes, each checked
    * against the undirected edge set. */
  private def bruteTriangles(pairs: Seq[(String, String)])
      : Map[String, Long] = {
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.map(_._1).toSeq.distinct.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      if und((nodes(i), nodes(j))) && und((nodes(j), nodes(k))) &&
        und((nodes(i), nodes(k)))
    } yield Seq(nodes(i), nodes(j), nodes(k))
    tris.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def seqKCore(pairs: Seq[(String, String)], k: Int)
      : Set[String] = {
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (a, b) => a != b }.distinct
    var alive = und.map(_._1).toSet
    var changed = true
    while (changed) {
      val deg = und.filter { case (a, b) => alive(a) && alive(b) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val next = alive.filter(n => deg.getOrElse(n, 0) >= k)
      changed = next != alive
      alive = next
    }
    alive
  }

  // K4 (complete on a-d) + a pendant + a disjoint triangle with a tail
  private val fixture = Seq(
    "a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d",
    "d" -> "e",
    "x" -> "y", "y" -> "z", "x" -> "z", "z" -> "w")

  test("triangleCount matches the brute-force census per node") {
    val got = Graph.triangleCount(edges(fixture: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === bruteTriangles(fixture))
    // K4 has C(3,2)=3 triangles per vertex; the x-y-z triangle 1 each
    assert(got("a") === 3L && got("x") === 1L)
    assert(!got.contains("e") && !got.contains("w"))
  }

  test("triangleCount absorbs direction, duplicates, and self-loops") {
    val messy = fixture ++ Seq("b" -> "a", "c" -> "a", "a" -> "b",
      "e" -> "e")
    val clean = Graph.triangleCount(edges(fixture: _*)).collect().toSet
    val got = Graph.triangleCount(edges(messy: _*)).collect().toSet
    assert(got === clean)
  }

  test("kCore matches sequential peeling, with in-core degrees") {
    for (k <- 1 to 4) {
      val got = Graph.kCore(edges(fixture: _*), k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got.keySet === seqKCore(fixture, k), s"k=$k")
      // every member's reported degree is its degree among members, >= k
      got.foreach { case (n, d) =>
        val inCore = fixture.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .count { case (a, b) => a == n && got.contains(b) }
        assert(d === inCore.toLong && d >= k, s"k=$k node=$n")
      }
    }
    // k above the max degree empties the graph
    assert(Graph.kCore(edges(fixture: _*), 10).count() === 0L)
  }

  test("kCore iters is peel depth + 1 (the probe transport round)") {
    // chain a-b-c-d-e, k=2: synchronous peel removes both endpoints per
    // round -> rounds 1 (a,e) and 2 (b,d) kill, round 3 empties (c has
    // no live neighbors), depth 3 -> iters 4
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val st = Graph.kCore(edges(chain: _*), 2)
    assert(st.count() === 0L)
    // K4: k=3 stable immediately (depth 0 -> iters 1)
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d")
    val it = Graph.kCore(edges(k4: _*), 3).select("iters").head().getInt(0)
    assert(it === 1)
  }

  // ---- weighted shortest paths ----

  private def wedges(rows: (String, String, Long)*): DataFrame =
    rows.toDF("src", "dst", "w")

  // directed weighted fixture: cheapest s->c is s-a-b-c (1+2+1=4), NOT
  // the 2-hop s-a-c (1+5=6); d only via c; e->f is a disjoint component
  private val wfix = Seq(
    ("s", "a", 1L), ("s", "b", 4L), ("a", "b", 2L), ("b", "c", 1L),
    ("a", "c", 5L), ("c", "d", 1L), ("e", "f", 2L))

  test("sssp matches hand-solved Dijkstra; unreached nodes are absent") {
    val got = Graph.sssp(wedges(wfix: _*), n => n === "s")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("s" -> 0L, "a" -> 1L, "b" -> 3L, "c" -> 4L,
      "d" -> 5L))
    // e and f are unreachable from s: frontier-compact state never
    // materializes them
    assert(!got.contains("e") && !got.contains("f"))
  }

  test("sssp multi-source takes the min over seeds per node") {
    val got = Graph.sssp(wedges(wfix: _*), n => n === "s" || n === "e")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("s" -> 0L, "a" -> 1L, "b" -> 3L, "c" -> 4L,
      "d" -> 5L, "e" -> 0L, "f" -> 2L))
  }

  test("sssp iters is fixpoint depth + 1 and duplicates are absorbed") {
    // transitions: 1 reaches a,b,f; 2 improves b, reaches c; 3 improves
    // c, reaches d; 4 improves d; 5 changes nothing -> iters 5
    val st = Graph.sssp(wedges(wfix: _*), n => n === "s" || n === "e")
    assert(st.select("iters").head().getInt(0) === 5)
    // parallel edges (one worse, one equal) change nothing: the
    // min-fold absorbs them without a dedup pass
    val dup = wfix ++ Seq(("s", "a", 7L), ("s", "a", 1L))
    val got = Graph.sssp(wedges(dup: _*), n => n === "s" || n === "e")
      .select("node", "dist").collect().toSet
    assert(got === st.select("node", "dist").collect().toSet)
  }

  test("sssp respects edge direction") {
    // only b is a seed: upstream s/a are unreachable along directed edges
    val got = Graph.sssp(wedges(wfix: _*), n => n === "b")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("b" -> 0L, "c" -> 1L, "d" -> 2L))
  }

  test("sssp with no matching seed converges empty on round one") {
    val st = Graph.sssp(wedges(wfix: _*), _ => lit(false))
    assert(st.count() === 0L)
  }

  test("ssspPerSeed keeps each seed's own distance field") {
    val got = Graph.ssspPerSeed(wedges(wfix: _*),
        n => n === "s" || n === "b")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // seed s: full single-source answer; seed b: its directed cone —
    // each (seed, node) cell independent, NOT the min over seeds
    assert(got === Map(
      ("s", "s") -> 0L, ("s", "a") -> 1L, ("s", "b") -> 3L,
      ("s", "c") -> 4L, ("s", "d") -> 5L,
      ("b", "b") -> 0L, ("b", "c") -> 1L, ("b", "d") -> 2L))
    // per-seed slices equal the corresponding single-seed sssp runs
    val single = Graph.sssp(wedges(wfix: _*), n => n === "s")
      .collect().map(r => ("s", r.getString(0)) -> r.getLong(1)).toMap
    assert(got.filter(_._1._1 == "s") === single)
  }

  test("ssspPerSeed rounds advance all frontiers at once") {
    // the deepest seed (s, fixpoint depth 5) sets the round count; seed
    // b's cone is shallower and just stops improving
    val it = Graph.ssspPerSeed(wedges(wfix: _*),
        n => n === "s" || n === "b")
      .select("iters").head().getInt(0)
    assert(it === 5)
  }

  private def betw(pairs: Seq[(String, String)], maxHops: Int = 6)
      : Map[String, Double] = {
    // undirected: feed both directions, all nodes as seeds
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    Graph.betweennessSampled(edges(und: _*), _ => lit(true), maxHops)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("betweenness: path graph loads the middle node only") {
    // 1-2-3: from each endpoint, node 2 carries the one shortest path to
    // the far side (delta 1); endpoints never intermediate -> absent
    assert(betw(Seq("1" -> "2", "2" -> "3")) === Map("2" -> 2.0))
  }

  test("betweenness: diamond splits dependency over equal paths") {
    // 1-2-4, 1-3-4: two shortest 1→4 paths, sigma(4)=2, so each middle
    // node gets delta 0.5 from each endpoint seed -> 1.0 total; 1 and 4
    // never sit INSIDE a shortest path (2-4-3 is longer via 4? no:
    // 2-1-3 and 2-4-3 are both length 2, sigma=2, each of 1 and 4 gets
    // 0.5 from seed 2 and 0.5 from seed 3 -> 1.0 as well
    assert(betw(Seq("1" -> "2", "1" -> "3", "2" -> "4", "3" -> "4")) ===
      Map("1" -> 1.0, "2" -> 1.0, "3" -> 1.0, "4" -> 1.0))
  }

  test("neighborhood function: sub-k sketches are exact; estimates track closure") {
    // path 1-2-3 undirected, k big enough that every sketch stays exact:
    // N(1) = |{1,2}| + |{1,2,3}| + |{2,3}| = 7; N(2) = 9 (all reach all)
    val path = edges("1" -> "2", "2" -> "1", "2" -> "3", "3" -> "2")
    val exact = Graph.neighborhoodFunction(path, k = 16, maxHops = 2)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(exact === Map(1 -> (3L, 7.0), 2 -> (3L, 9.0)))
    // saturated regime: a denser random-ish graph with k = 8 — the KMV
    // estimate must land within 35% of the brute-force closure size
    val pairs = (1 to 120).flatMap { i =>
      Seq(s"v${i % 30}" -> s"v${(i * 7 + 3) % 30}",
        s"v${(i * 11) % 30}" -> s"v${i % 30}")
    }.filter(p => p._1 != p._2)
    val und = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }.distinct
    val est = Graph.neighborhoodFunction(edges(und: _*), k = 8, maxHops = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    // brute closure: adjacency power by driver BFS
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def reach(h: Int): Long = adj.keys.toSeq.map { v =>
      var cur = Set(v)
      (1 to h).foreach { _ => cur = cur ++ cur.flatMap(adj.getOrElse(_, Set())) }
      cur.size.toLong
    }.sum
    (1 to 3).foreach { h =>
      val ex = reach(h).toDouble
      assert(math.abs(est(h) - ex) / ex < 0.35,
        s"hop $h: est ${est(h)} vs exact $ex drifts past 35%")
    }
  }

  test("betweenness: star centre carries every pair; hop cap truncates") {
    // star c-{a,b,d}: every leaf pair's only path crosses c ->
    // delta(c) = 2 per leaf seed (two other leaves), 6 total
    val star = Seq("c" -> "a", "c" -> "b", "c" -> "d")
    assert(betw(star) === Map("c" -> 6.0))
    // maxHops = 2 keeps leaf-leaf paths (2 hops); on the 4-path
    // a-b-c-d it cuts the 3-hop a↔d pairs — b keeps only a→c (from a)
    // and c→a (from c), likewise c: 4.0 drops to 2.0 each
    val path4 = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    assert(betw(path4) === Map("b" -> 4.0, "c" -> 4.0))
    assert(betw(path4, maxHops = 2) === Map("b" -> 2.0, "c" -> 2.0))
  }

  test("modularity: two triangles with a bridge, hand-computed") {
    // triangles {1,2,3} and {4,5,6} joined by 3-4: m = 7,
    // d_A = d_B = 7, intra = 3 each -> Q = 2*(3/7 - (7/14)^2) = 5/14
    val e = Seq("1" -> "2", "2" -> "3", "3" -> "1",
      "4" -> "5", "5" -> "6", "6" -> "4", "3" -> "4").toDF("src", "dst")
    val lab = Seq("1" -> "A", "2" -> "A", "3" -> "A",
      "4" -> "B", "5" -> "B", "6" -> "B").toDF("node", "label")
    val rows = Graph.modularity(e, lab).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("A", "B"))
    rows.values.foreach { r =>
      assert(r.getLong(1) == 3L && r.getLong(2) == 7L && r.getLong(3) == 3L)
      assert(math.abs(r.getDouble(4) - (3.0 / 7 - 0.25)) < 1e-9)
      assert(math.abs(r.getDouble(5) - 5.0 / 14) < 1e-9)
    }
  }

  test("modularity: zero-intra partition scores negative") {
    // path 1-2 split across communities: no intra edges anywhere,
    // each side contributes -(1/2)^2 -> Q = -0.5
    val e = Seq("1" -> "2").toDF("src", "dst")
    val lab = Seq("1" -> "A", "2" -> "B").toDF("node", "label")
    val rows = Graph.modularity(e, lab).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(3) == 0L)
      assert(math.abs(r.getDouble(4) - -0.25) < 1e-12)
      assert(math.abs(r.getDouble(5) - -0.5) < 1e-12)
    }
  }

  test("randomWalks: deterministic, edge-respecting, right shape") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a",
      "a" -> "c").toDF("src", "dst")
    val und = Set("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a",
        "a" -> "c").flatMap { case (x, y) => Seq(x -> y, y -> x) }
    val run = () => Graph.randomWalks(e, _.isin("a", "b"),
      walkLen = 6, walksPerSeed = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val w1 = run()
    assert(w1.map(_._1).toSeq ==
      Seq("a#1", "a#2", "b#1", "b#2"), "2 walkers per seed")
    w1.foreach { case (wid, steps, walk) =>
      assert(steps == 7L, s"$wid: walkLen+1 positions")
      val toks = walk.split(" ").toSeq
      assert(toks.size == 7 && toks.head == wid.takeWhile(_ != '#'))
      toks.sliding(2).foreach { case Seq(x, y) =>
        assert(und.contains(x -> y), s"$wid hops a non-edge $x->$y")
      }
    }
    assert(w1.toSeq == run().toSeq, "identical on re-run")
  }

  test("adamicAdar: hand-computed weights, degree cap, no-edge filter") {
    // z1-{x,y}, z2-{x,y,w}: (x,y) scores 1/ln2 + 1/ln3 (both centers),
    // (x,w)/(y,w) score 1/ln3, and the reverse pairs (z1,z2) score
    // 2/ln2 via centers x and y (deg 2 each); w (deg 1) never centers
    val e = Seq("z1" -> "x", "z1" -> "y",
      "z2" -> "x", "z2" -> "y", "z2" -> "w").toDF("src", "dst")
    val got = Graph.adamicAdar(e, maxCenterDeg = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val iln2 = 1.0 / math.log(2); val iln3 = 1.0 / math.log(3)
    assert(got.keySet == Set("x" -> "y", "w" -> "x", "w" -> "y",
      "z1" -> "z2"))
    assert(got("x" -> "y")._1 == 2L &&
      math.abs(got("x" -> "y")._2 - (iln2 + iln3)) < 1e-9)
    assert(math.abs(got("w" -> "x")._2 - iln3) < 1e-9)
    assert(got("z1" -> "z2")._1 == 2L &&
      math.abs(got("z1" -> "z2")._2 - 2 * iln2) < 1e-9)
    // degree cap drops z2 as a center: only z1 and the deg-2 leaves
    val capped = Graph.adamicAdar(e, maxCenterDeg = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(capped.keySet == Set("x" -> "y", "z1" -> "z2"))
    assert(math.abs(capped("x" -> "y") - iln2) < 1e-9)
    // adjacent pairs never score: no (z1, x)-style rows existed above
    assert(!got.keySet.exists { case (a, b) => a.startsWith("z") ^ b.startsWith("z") })
  }

  test("randomWalks: a single-edge graph forces alternation") {
    val e = Seq("x" -> "y").toDF("src", "dst")
    val out = Graph.randomWalks(e, _ === "x", walkLen = 4).collect()
    assert(out.length == 1 && out.head.getString(2) == "x y x y x")
  }

  test("skipGrams: windowed pairs of a known walk, hand-counted") {
    val walks = Seq(("w1", "a b a c")).toDF("walk_id", "walk")
    val got = Graph.skipGrams(walks, window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // positions: a0 b1 a2 c3; window 2 pairs (ordered):
    // (a0,b1)(a0,a2)(b1,a0)(b1,a2)(b1,c3)(a2,a0)(a2,b1)(a2,c3)(c3,b1)(c3,a2)
    assert(got == Map(
      ("a", "b") -> 2L, ("a", "a") -> 2L, ("a", "c") -> 1L,
      ("b", "a") -> 2L, ("b", "c") -> 1L,
      ("c", "b") -> 1L, ("c", "a") -> 1L))
  }
}
