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
}
