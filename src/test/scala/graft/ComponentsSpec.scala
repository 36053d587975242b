package graft

import graft.operators.Dedup

/** Star-contraction connected components (Kiveris et al., SoCC'14):
  * must agree with a sequential union-find on arbitrary graphs, and must
  * converge in logarithmic rounds on deep chains where min-label
  * propagation's round budget (O(diameter)) runs out.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("star contraction == union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 60
      val pairs = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val want = unionFind(pairs)
      val got = Dedup.connectedComponentsStar(pairs.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial")
      // min-label propagation agrees too (random graphs are shallow)
      val prop = Dedup.connectedComponents(pairs.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(prop == want, s"trial $trial propagation")
    }
  }

  test("deep chain: star contraction converges where propagation's budget fails") {
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = Dedup.connectedComponentsStar(chain.toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 121 && got.values.forall(_ == 0L))
    // the same chain exceeds min-label propagation's default round budget
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain.toDF("id1", "id2"), maxIter = 5)
    }
    assert(ex.getMessage.contains("connectedComponentsStar"))
  }

  test("empty and single-edge inputs") {
    assert(Dedup.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("id1", "id2")).count() == 0L)
    val one = Dedup.connectedComponentsStar(Seq((7L, 3L)).toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(one == Map(7L -> 3L, 3L -> 3L))
  }

  // ---- incremental maintenance ----

  private def incrementalVsFull(oldPairs: Seq[(Long, Long)],
                                newPairs: Seq[(Long, Long)]): Unit = {
    val labels = Dedup.connectedComponents(oldPairs.toDF("id1", "id2"))
    val got = Dedup
      .incrementalComponents(labels, newPairs.toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(oldPairs ++ newPairs))
  }

  test("incremental fold == full union-find on random old/new splits") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 60
      val pairs = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (oldP, newP) = pairs.splitAt(50)
      incrementalVsFull(oldP, newP)
    }
  }

  test("incremental: component merges, new-node chains, no-op edges") {
    // old graph: {1,2,3} rooted at 1 and {10,11} rooted at 10
    val oldP = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    // new edges: merge the two components, hang a chain of brand-new
    // nodes off one, add an edge INSIDE a component (must be a no-op),
    // and an isolated new pair
    val newP = Seq((3L, 10L), (11L, 20L), (20L, 21L), (1L, 3L),
      (30L, 31L))
    incrementalVsFull(oldP, newP)
  }

  test("incremental: a brand-new node can become the root") {
    // new node 0 joins the {5,6} component: min-id root moves to 0,
    // and every OLD member must relabel through the broadcast mapping
    incrementalVsFull(Seq((5L, 6L), (8L, 9L)), Seq((0L, 6L)))
  }

  test("incremental with an empty changeset is the identity") {
    val oldP = Seq((1L, 2L), (4L, 5L))
    val labels = Dedup.connectedComponents(oldP.toDF("id1", "id2"))
    val got = Dedup.incrementalComponents(labels,
      Seq.empty[(Long, Long)].toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap
    assert(got == unionFind(oldP))
  }
}
