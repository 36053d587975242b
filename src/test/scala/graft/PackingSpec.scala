package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Sequence packing + deterministic sampling unit coverage (the q79/q80
  * oracles check the data path; these pin the edge semantics). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: offsets, boundary straddle, zero-token doc") {
    // shard A: 100 + 200 + 0 + 300 tokens, seqLen 256:
    //   d1 off 0   -> seq 0..0, start_offset 0
    //   d2 off 100 -> 100+200-1 = 299 -> seq 0..1 (straddles the cut)
    //   d3 off 300, 0 tokens -> seq 1..1 (degenerate, no span)
    //   d4 off 300 -> 300+300-1 = 599 -> seq 1..2
    val df = Seq(("A", 1L, 100), ("A", 2L, 200), ("A", 3L, 0), ("A", 4L, 300))
      .toDF("shard", "id", "tok")
    val out = Packing.packSequences(df, Seq("shard"), "id", "tok", 256)
      .orderBy("id")
      .select("offset", "start_seq", "end_seq", "start_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 0L, 0L), (100L, 0L, 1L, 100L),
      (300L, 1L, 1L, 44L), (300L, 1L, 2L, 44L)))
  }

  test("sequenceStats counts docs per sequence and boundary carryovers") {
    val df = Seq(("A", 1L, 100), ("A", 2L, 200), ("A", 3L, 0), ("A", 4L, 300))
      .toDF("shard", "id", "tok")
    val packed = Packing.packSequences(df, Seq("shard"), "id", "tok", 256)
    val stats = Packing.sequenceStats(packed, Seq("shard"), 256)
      .orderBy("seq").select("seq", "n_docs", "n_carryover")
      .as[(Long, Long, Long)].collect().toSeq
    // seq0: d1, d2 start here. seq1: d2 carries over, d3+d4 start. seq2: d4 carries.
    assert(stats == Seq((0L, 2L, 0L), (1L, 3L, 1L), (2L, 1L, 1L)))
  }

  test("stratifiedSample is deterministic and respects 0/1 fractions") {
    val docs = (0 until 200).map(i => (i.toLong, if (i % 2 == 0) "keep" else "drop"))
      .toDF("id", "stratum")
    val fracs = Seq(("keep", 1.0), ("drop", 0.0)).toDF("stratum", "frac")
    val out = Packing.stratifiedSample(docs, "id", "stratum", fracs, 0.5)
    assert(out.where(col("stratum") === "drop").count() == 0)
    assert(out.where(col("stratum") === "keep").count() == 100)
    // same call twice -> identical membership (no RNG state)
    val a = out.select("id").as[Long].collect().toSet
    val b = Packing.stratifiedSample(docs, "id", "stratum", fracs, 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("temperatureMix: alpha=1 keeps natural shares, alpha->0 flattens") {
    val docs = ((0 until 90).map(i => (i.toLong, "big")) ++
      (0 until 10).map(i => (100L + i, "small"))).toDF("id", "source")
    val natural = Packing.temperatureMix(docs, "source", alpha = 1.0, budget = 100L)
      .select("source", "weight").as[(String, Double)].collect().toMap
    assert(math.abs(natural("big") - 0.9) < 1e-9)
    val flat = Packing.temperatureMix(docs, "source", alpha = 0.0001, budget = 100L)
      .select("source", "weight").as[(String, Double)].collect().toMap
    assert(math.abs(flat("big") - 0.5) < 0.01)
    // weights always normalize; epochs = weight * budget / n
    val m = Packing.temperatureMix(docs, "source", alpha = 0.3, budget = 1000L)
      .select("source", "n_docs", "weight", "epochs")
      .as[(String, Long, Double, Double)].collect()
    assert(math.abs(m.map(_._3).sum - 1.0) < 1e-5)
    m.foreach { case (_, n, w, e) =>
      assert(math.abs(e - BigDecimal(w * 1000 / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-4)
    }
  }

  test("shuffleShard: deterministic total order, balanced shards, dense pos") {
    val docs = (0 until 256).map(_.toLong).toDF("id")
    val out = Packing.shuffleShard(docs, "id", shards = 8)
      .select("id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(out.length == 256)
    // every shard's positions are dense 0..n-1
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length))
    }
    // reproducible across invocations
    val again = Packing.shuffleShard(docs, "id", shards = 8)
      .select("id", "shard", "pos").as[(Long, Long, Int)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // hash spreading: no shard hogs the corpus (256 rows over 8 shards)
    val sizes = out.groupBy(_._2).map(_._2.length)
    assert(sizes.max < 64 && sizes.min > 8)
  }

  test("zipperPack: longest-with-shortest pairing eliminates crafted waste") {
    // lengths 10/20/30/40 at capacity 50: zipper pairs (40,10) and
    // (30,20) -> zero padding, zero overflow; adjacent id-order pairs
    // (10,20) and (30,40) -> 20 padding + 20 overflow
    val docs = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40))
      .toDF("doc_id", "n_tokens")
    def totals(zip: Boolean): (Long, Long, Long) = {
      val r = Packing.zipperPack(docs, "doc_id", "n_tokens",
          shards = 1, capacity = 50, zipper = zip)
        .agg(sum("n_docs"), sum("padding"), sum("overflow"))
        .as[(Long, Long, Long)].collect().head
      r
    }
    assert(totals(zip = true) == ((4L, 0L, 0L)))
    assert(totals(zip = false) == ((4L, 20L, 20L)))
  }

  test("zipperPack: odd shard leaves the median as a singleton") {
    val docs = Seq((1L, 5), (2L, 10), (3L, 20), (4L, 30), (5L, 40))
      .toDF("doc_id", "n_tokens")
    val out = Packing.zipperPack(docs, "doc_id", "n_tokens",
        shards = 1, capacity = 50, zipper = true)
      .orderBy("pair")
      .select("pair", "n_docs", "pair_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    // rank desc: 40 30 20 10 5 -> pairs (40,5), (30,10), 20 alone
    assert(out == Seq((1L, 2L, 45L), (2L, 2L, 40L), (3L, 1L, 20L)))
    assert(out.map(_._2).sum == 5L)
  }

  /** Sequential replay of weightedSample's exact key recurrence: md5 hex
    * -> first 15 hex chars as long -> uniform -> pow(u, 1/w). Same JVM
    * Math.pow as the executors, so selection must match EXACTLY. */
  private def esKey(id: Long, w: Long, salt: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val u = (java.lang.Long.parseLong(hex, 16) % 4294967296L + 1).toDouble /
      4294967297.0
    math.pow(u, 1.0 / w)
  }

  test("weightedSample: matches the sequential A-ES reference exactly") {
    val rows = (1L to 120L).map(i => (i, s"g${i % 3}", 10L + (i % 7) * 40L))
    val got = Packing.weightedSample(
        rows.toDF("id", "grp", "w"), "id", Seq("grp"), "w", k = 8, salt = 3)
      .select("grp", "id", "es_rank").as[(String, Long, Int)]
      .collect().toSet
    val expected = rows.groupBy(_._2).flatMap { case (g, members) =>
      members.map { case (id, _, w) => (id, esKey(id, w, 3)) }
        .sortBy { case (id, key) => (-key, id) }
        .take(8).zipWithIndex
        .map { case ((id, _), i) => (g, id, i + 1) }
    }.toSet
    assert(got == expected)
  }

  test("weightedSample: k per stratum, zero-weight rows carry no mass") {
    val df = (1L to 50L).map(i => (i, "s", if (i <= 40) 5L else 0L))
      .toDF("id", "grp", "w")
    val out = Packing.weightedSample(df, "id", Seq("grp"), "w", k = 10)
      .select("id").as[Long].collect()
    assert(out.length == 10)
    assert(out.forall(_ <= 40L), "zero-weight rows must never be sampled")
  }

  test("weightedSample: heavy weights dominate the sample") {
    // 100 light (w=1) vs 100 heavy (w=200): P(light outranks heavy) per
    // pair is ~1/201, so a 20-doc sample is overwhelmingly heavy.
    val df = (1L to 200L).map(i => (i, "s", if (i <= 100) 1L else 200L))
      .toDF("id", "grp", "w")
    val picked = Packing.weightedSample(df, "id", Seq("grp"), "w", k = 20)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ > 100L)
    assert(heavy > 15, s"expected heavy docs to dominate, got $heavy/20")
  }

  test("rendezvousShard: monotone growth — keys move ONLY to the new shard") {
    val keys = spark.range(2000).toDF("id")
    val shards = keys.select(
        Packing.rendezvousShard(col("id"), 8).as("s8"),
        Packing.rendezvousShard(col("id"), 9).as("s9"))
      .as[(Int, Int)].collect()
    // HRW invariant: s9 == s8 unless the NEW shard (8) won the key
    assert(shards.forall { case (a, b) => b == a || b == 8 })
    val moved = shards.count { case (a, b) => a != b }
    // expected n/9 ≈ 222; allow generous binomial slack
    assert(moved > 120 && moved < 340, s"moved $moved of 2000")
    // balance: every shard owns something, none owns a majority
    val sizes = shards.groupBy(_._1).view.mapValues(_.size)
    assert(sizes.size == 8 && sizes.values.forall(s => s > 100 && s < 500))
  }

  test("waterFill: caps undersupplied groups, levels the rest, hits the budget") {
    // uniform targets 1/3, skewed supplies, budget 600: groups c (10) and
    // b (100) cap at full supply; a fills to the level —
    // L = (600-110)/0.333333 = 1470.0015, alloc_a = floor(490.0005+.5) = 490
    val df = Seq(("a", 1000L), ("b", 100L), ("c", 10L))
      .toDF("source", "supply")
      .withColumn("target", lit(0.333333))
      .withColumn("budget", lit(600L))
    val byKey = Packing.waterFill(df, "source")
      .select(col("source"), col("alloc"), col("supply_capped"))
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(byKey === Map("a" -> (490L, false), "b" -> (100L, true),
      "c" -> (10L, true)))
    assert(byKey.values.map(_._1).sum === 600L)
    // budget >= total supply: no level, everyone keeps full supply
    val all = Packing.waterFill(
        df.withColumn("budget", lit(5000L)), "source")
      .select(col("alloc"), col("supply_capped"))
      .as[(Long, Boolean)].collect()
    assert(all.forall(_._2) && all.map(_._1).sum === 1110L)
  }
}
