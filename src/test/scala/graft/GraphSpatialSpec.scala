package graft

import graft.graph.{Graph, Viterbi}
import graft.multimodal.Binary
import graft.operators.Spatial
import org.apache.spark.sql.functions._

class GraphSpatialSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi matches brute-force enumeration on a small instance") {
    val obs = Array(10.0, 20.0, 80.0, 70.0, 15.0)
    val mus = Array(25.0, 75.0)
    def emit(t: Int, s: Int) = math.abs(obs(t) - mus(s))
    def trans(a: Int, b: Int) = if (a == b) 0.0 else 10.0
    val got = Viterbi.decode(obs.length, 2, emit, trans).toSeq
    // brute force over all 2^5 paths
    val best = (0 until 32).map { mask =>
      val path = (0 until 5).map(i => (mask >> i) & 1)
      val cost = path.zipWithIndex.map { case (s, t) => emit(t, s) }.sum +
        path.sliding(2).collect { case Seq(a, b) => trans(a, b) }.sum
      (cost, path)
    }.minBy(_._1)
    assert(got == best._2, s"got $got expected ${best._2}")
  }

  test("viterbi: switching penalty suppresses single-point blips") {
    val obs = Array(20.0, 20.0, 60.0, 20.0, 20.0) // 60 is closer to high...
    def emit(t: Int, s: Int) = math.abs(obs(t) - Array(25.0, 75.0)(s))
    // ...but a 40-cost switch penalty keeps the path in the low state
    val path = Viterbi.decode(obs.length, 2, emit, (a, b) => if (a == b) 0 else 40.0)
    assert(path.toSeq == Seq(0, 0, 0, 0, 0))
  }

  test("floydWarshall computes shortest costs") {
    val (dist, _) = Graph.floydWarshall(4,
      Seq((0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 1.0)))
    assert(dist(0)(2) == 2.0 && dist(0)(3) == 3.0 && dist(3)(0) > 1e18)
  }

  test("bfsHops finds transitive hop counts") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val out = Graph.bfsHops(edges, 10)
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((1, 2)) == 1 && out((1, 3)) == 2 && out((1, 4)) == 3 && out.size == 6)
  }

  test("spatial nearest is exact: matches brute force incl. far probes") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 200).map(i =>
      (i.toLong, rnd.nextDouble() * 1000, rnd.nextDouble() * 1000)).toDF("id", "x", "y")
    // probes include one far outside the point cloud (forces the brute path)
    val probes = ((1 to 30).map(i =>
      (i.toLong, rnd.nextDouble() * 1000, rnd.nextDouble() * 1000)) :+
      (99L, 9000.0, 9000.0)).toDF("pid", "x", "y")
    val got = Spatial.nearest(probes, "pid", points, "id", "x", "y", cellSize = 100.0)
      .select("probe_id", "point_id").as[(Long, Long)].collect().toMap
    val pts = points.as[(Long, Double, Double)].collect()
    val prb = probes.as[(Long, Double, Double)].collect()
    prb.foreach { case (pid, px, py) =>
      val expected = pts.map { case (id, qx, qy) =>
        (math.sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy)), id)
      }.min._2
      assert(got(pid) == expected, s"probe $pid")
    }
  }

  test("binary feature extraction: deterministic stub checksum") {
    val blobs = Seq((1L, "AB")).toDF("doc_id", "text")
    val out = Binary.extractFeatures(Binary.documentBlobs(blobs, "doc_id", "text"))
      .collect()(0)
    assert(out.n_bytes == 2 && out.first_byte == 65 && out.checksum == (65 + 66) % 997)
    assert(out.feature(0) == 65 / 255.0f && out.feature(1) == 66 / 255.0f)
  }

  test("pageRank: one iteration matches the hand-solved recurrence") {
    // a->b, b->a, a->c; c is a sink. N=3, r0 = 1/3 each.
    // contribs: a gets r(b)/1 = 0.333333333333; b,c each get r(a)/2
    // = 0.166666666667 (12-dp addends). dangling mass = r(c), /3 =
    // 0.111111111111. new = 0.05 + 0.85*(in + 0.111111111111).
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c")).toDF("src", "dst")
    val got = Graph.pageRank(edges, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 0.427777777778) < 1e-11, s"a=${got("a")}")
    assert(math.abs(got("b") - 0.286111111111) < 1e-11, s"b=${got("b")}")
    assert(math.abs(got("c") - 0.286111111111) < 1e-11, s"c=${got("c")}")
  }

  test("pageRank: converged ranks sum to 1 and order by in-link weight") {
    // hub gets links from every other node; spoke0 additionally linked
    // by hub, so: hub > spoke0 > the rest (which tie exactly). The
    // hub<->spoke0 2-cycle oscillates with amplitude damping^2 per
    // round-pair, so damping 0.5 converges well inside 12 rounds
    // (0.85 would still be ~0.04 out of steady state).
    val edges = (1 to 5).map(i => (s"spoke$i", "hub")) ++
      Seq(("hub", "spoke0"), ("spoke0", "hub"))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iterations = 12,
        damping = 0.5, teleport = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"sum=${got.values.sum}")
    assert(got("hub") > got("spoke0"), "hub outranks spoke0")
    assert(got("spoke0") > got("spoke1"), "linked spoke outranks leaves")
    assert((1 to 5).map(i => got(s"spoke$i")).distinct.size == 1,
      "symmetric leaves tie exactly (deterministic rounding)")
  }

  test("hits: one iteration matches the hand-solved half-steps") {
    // bipartite: a->x, a->y, b->y. N=5 (a,b,x,y + isolated? no — 4).
    // init hub=auth=0.25. auth half: x gets hub(a)=0.25, y gets
    // hub(a)+hub(b)=0.5; total 0.75 -> auth(x)=1/3, auth(y)=2/3.
    // hub half: a gets auth(x)+auth(y)=1.0, b gets auth(y)=2/3;
    // total 5/3 -> hub(a)=0.6, hub(b)=0.4.
    val edges = Seq(("a", "x"), ("a", "y"), ("b", "y")).toDF("src", "dst")
    val got = Graph.hits(edges, iterations = 1)
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(math.abs(got("x")._2 - 1.0 / 3) < 1e-11, s"auth(x)=${got("x")._2}")
    assert(math.abs(got("y")._2 - 2.0 / 3) < 1e-11, s"auth(y)=${got("y")._2}")
    assert(math.abs(got("a")._1 - 0.6) < 1e-11, s"hub(a)=${got("a")._1}")
    assert(math.abs(got("b")._1 - 0.4) < 1e-11, s"hub(b)=${got("b")._1}")
    // bipartite zero paths: sources have auth 0, sinks hub 0
    assert(got("a")._2 == 0.0 && got("x")._1 == 0.0)
  }

  test("hits: partitioning-invariant and L1-normalized each side") {
    val edges = (1L to 40L).map(i => (s"n${i % 7}", s"m${(i * 3) % 11}"))
      .toDF("src", "dst")
    val once = Graph.hits(edges.repartition(1), iterations = 3).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val wide = Graph.hits(edges.repartition(13), iterations = 3).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(once == wide, "scores must be bit-identical across partitionings")
    assert(math.abs(once.values.map(_._1).sum - 1.0) < 1e-9, "hub L1")
    assert(math.abs(once.values.map(_._2).sum - 1.0) < 1e-9, "auth L1")
  }

  test("pageRank: partitioning-invariant (exact decimal sums)") {
    val edges = (1L to 40L).map(i => (s"n${i % 7}", s"n${(i * 3) % 11}"))
      .toDF("src", "dst")
    val once = Graph.pageRank(edges.repartition(1), iterations = 4).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wide = Graph.pageRank(edges.repartition(13), iterations = 4).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(once == wide, "ranks must be bit-identical across partitionings")
  }

  test("resize: nearest-neighbor index math over the byte grid") {
    // 9 bytes -> side 3 grid "ABC/DEF/GHI"; 2x2 nearest-neighbor picks
    // sx,sy in {0*3/2, 1*3/2} = {0, 1}: bytes A(0,0) B(1,0) D(0,1) E(1,1)
    val blobs = Seq((1L, "ABCDEFGHI"), (2L, "")).toDF("doc_id", "text")
    val out = Binary.resize(
        Binary.documentBlobs(blobs, "doc_id", "text"), w = 2, h = 2)
      .collect()
    assert(out.length == 1, "zero-pixel blob must be dropped")
    val r = out(0)
    assert(r.src_side == 3 && r.out_w == 2 && r.out_h == 2)
    assert(r.checksum == ('A' + 'B' + 'D' + 'E').toLong % 997)
  }

  test("aHash: hand-computed signature on an identity 8x8 grid") {
    // 64 bytes -> side 8: sampling is the identity (b-th cell reads
    // byte b). Craft bytes so the JVM reference below is trivially
    // auditable, then check the expression pipeline bit-for-bit.
    // ASCII-only so UTF-8 encoding is the identity on byte values
    val bytes = (0 until 64).map(i => ((i * 37) % 97 + 1).toChar).mkString
    val ref = {
      val p = bytes.map(_.toInt)
      val s = p.sum
      (0 until 64).map(b => if (64 * p(b) > s) 1L << b else 0L).sum
    }
    val df = Seq((1L, bytes), (2L, "short")).toDF("doc_id", "text")
      .withColumn("bytes", encode(col("text"), "UTF-8"))
    val out = Binary.withAHash(df, "doc_id", "bytes").collect()
    assert(out.length == 1, "side < 8 blobs must be dropped")
    assert(out.head.getLong(1) == ref)
  }

  test("aHashPairs: identical blobs at hamming 0, banding finds them") {
    val base = (0 until 100).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val df = Seq((1L, base), (2L, base), (3L, base.reverse))
      .toDF("doc_id", "text")
      .withColumn("bytes", encode(col("text"), "UTF-8"))
    val got = Binary.aHashPairs(df, "doc_id", "bytes", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }

  test("personalizedPageRank: hand-solved chain, mass conserved, seeds anchor") {
    import spark.implicits._
    // a -> b -> c, seed {a}: 3 rounds by hand (dangling mass returns to a)
    //   r1 = (0.15, 0.85, 0); r2 = (0.15, 0.1275, 0.7225)
    //   r3 = (0.15 + 0.85·0.7225, 0.1275, 0.85·0.1275)
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = graph.Graph.personalizedPageRank(e,
        n => n === "a", iterations = 3)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 0.764125) < 1e-9)
    assert(math.abs(got("b") - 0.1275) < 1e-9)
    assert(math.abs(got("c") - 0.108375) < 1e-9)
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass conserved")
    // unreachable-from-seed nodes hold zero rank
    val e2 = Seq(("a", "b"), ("x", "y")).toDF("src", "dst")
    val got2 = graph.Graph.personalizedPageRank(e2,
        n => n === "a", iterations = 2)
      .as[(String, Double)].collect().toMap
    assert(got2("x") == 0.0 && got2("y") == 0.0)
    assert(got2("a") > 0 && got2("b") > 0)
  }
}
