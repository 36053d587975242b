package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** q53's scale-path sketches: accuracy bounds vs the exact aggregates on
  * the real sf0.001 tables. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% and approx_percentile within 2% of exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val both = li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("exact_d"),
        approx_count_distinct(col("l_partkey")).as("approx_d"),
        expr("percentile(l_extendedprice, 0.95)").as("exact_p"),
        expr("approx_percentile(l_extendedprice, 0.95)").as("approx_p"))
      .as[(String, Long, Long, Double, Double)].collect()
    both.foreach { case (_, ed, ad, ep, ap) =>
      assert(math.abs(ad - ed).toDouble / ed < 0.05, s"distinct $ad vs $ed")
      assert(math.abs(ap - ep) / ep < 0.02, s"p95 $ap vs $ep")
    }
  }

  test("HLL sketch partials persist to parquet and merge without rescan") {
    import graft.operators.Sketches
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    // two disjoint "daily batches" write their per-flag sketch partials
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val b1 = li.where(col("l_orderkey") % 2 === 0)
    val b2 = li.where(col("l_orderkey") % 2 === 1)
    Sketches.hllPartials(b1, Seq("l_returnflag"), "l_partkey")
      .withColumn("batch", lit(1))
      .unionByName(Sketches.hllPartials(b2, Seq("l_returnflag"), "l_partkey")
        .withColumn("batch", lit(2)))
      .write.mode("overwrite").parquet(dir)
    // later rollup: read back ONLY the sketches, merge per flag and global
    val partials = spark.read.parquet(dir)
    val perFlag = Sketches.hllMergeEstimate(partials, Seq("l_returnflag"))
      .as[(String, Double)].collect().toMap
    val global = Sketches.hllMergeEstimate(partials, Nil)
      .as[Double].collect().head
    val exactFlag = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"))
      .as[(String, Long)].collect().toMap
    val exactGlobal = li.select(countDistinct("l_partkey")).as[Long].head()
    exactFlag.foreach { case (k, e) =>
      assert(math.abs(perFlag(k) - e) / e < 0.05,
        s"merged sketch for $k: ${perFlag(k)} vs exact $e")
    }
    assert(math.abs(global - exactGlobal) / exactGlobal < 0.05)
    // the merged two-batch estimate equals the single-pass estimate:
    // HLL union is lossless at the same lgK
    val single = Sketches.hllMergeEstimate(
        Sketches.hllPartials(li, Seq("l_returnflag"), "l_partkey"),
        Seq("l_returnflag"))
      .as[(String, Double)].collect().toMap
    perFlag.foreach { case (k, v) => assert(v == single(k),
      s"union of disjoint batches must equal the single-pass sketch: $k") }
  }

  test("bloom: no false negatives, and shard bitmaps OR-merge to the union") {
    import org.apache.spark.sql.functions._
    val m = 1 << 10
    val seeds = Seq(1, 2, 3)
    val keys = (0 until 200).map(i => s"key_$i")
    val df = keys.toDF("k")
    val bm = Sketches.bloomBitmap(df, col("k"), m, seeds)
    // every inserted key must test positive — the Bloom guarantee
    val hits = df.where(Sketches.bloomMightContain(col("k"), bm, m, seeds)).count()
    assert(hits == 200L, s"false negative: only $hits/200 inserted keys hit")
    // a disjoint probe set must NOT be all-positive (m=1024, n=200, k=3
    // -> FP rate ~13%; 200 misses all hitting has probability ~0)
    val probes = (1000 until 1200).map(i => s"other_$i").toDF("k")
    val fp = probes.where(Sketches.bloomMightContain(col("k"), bm, m, seeds)).count()
    assert(fp < 200L, "a disjoint probe set tested all-positive")
    // mergeable: OR of two disjoint shards' bitmaps == bitmap of the union
    val bmA = Sketches.bloomBitmap(keys.take(100).toDF("k"), col("k"), m, seeds)
    val bmB = Sketches.bloomBitmap(keys.drop(100).toDF("k"), col("k"), m, seeds)
    val merged = bmA.zip(bmB).map { case (a, b) => a | b }
    assert(merged == bm, "shard OR-merge must equal the single-pass bitmap")
  }

  test("cms: estimates never undercount, and shard tables sum to the union") {
    import org.apache.spark.sql.functions._
    val width = 32 // small so collisions (overestimates) actually occur
    val seeds = Seq(11, 12, 13, 14)
    // skewed multiset: key_i appears i+1 times
    val rows = (0 until 40).flatMap(i => Seq.fill(i + 1)(s"key_$i"))
    val df = rows.toDF("k")
    val cms = Sketches.cmsTable(df, col("k"), width, seeds)
    val got = df.groupBy("k").agg(count(lit(1)).as("n"))
      .withColumn("est", Sketches.cmsEstimate(col("k"), cms, width, seeds))
      .as[(String, Long, Long)].collect()
    got.foreach { case (k, n, est) =>
      assert(est >= n, s"CMS undercounted $k: est=$est < exact=$n") }
    // with 820 rows over 32 columns, at least one collision overestimate
    assert(got.exists { case (_, n, est) => est > n },
      "no collisions at width 32 — the one-sided bound is untested")
    // mergeable: cell-wise sum of two disjoint shards == single-pass table
    val a = Sketches.cmsTable(rows.take(400).toDF("k"), col("k"), width, seeds)
    val b = Sketches.cmsTable(rows.drop(400).toDF("k"), col("k"), width, seeds)
    val summed = a.zip(b).map { case (ra, rb) =>
      ra.zip(rb).map { case (x, y) => x + y } }
    assert(summed == cms, "shard cell-wise sum must equal the single-pass table")
  }

  test("bloom/cms: null keys are not members and probe false/zero") {
    import org.apache.spark.sql.functions._
    val m = 256
    val seeds = Seq(1, 2)
    val df = Seq(Some("a"), None, Some("b"), None).toDF("k")
    // build must not crash on null keys, and must equal the null-free build
    val bm = Sketches.bloomBitmap(df, col("k"), m, seeds)
    val bmClean = Sketches.bloomBitmap(
      Seq("a", "b").toDF("k"), col("k"), m, seeds)
    assert(bm == bmClean)
    val cms = Sketches.cmsTable(df, col("k"), m, seeds)
    assert(cms.map(_.sum).sum == 4L) // 2 non-null keys x 2 depth rows
    // null probes: false / 0, not SQL null
    val probed = df
      .select(Sketches.bloomMightContain(col("k"), bm, m, seeds).as("hit"),
        Sketches.cmsEstimate(col("k"), cms, m, seeds).as("est"))
      .as[(Boolean, Long)].collect().toSeq
    assert(probed.count(p => p._1 && p._2 == 1L) == 2) // "a", "b"
    assert(probed.count(p => !p._1 && p._2 == 0L) == 2) // the nulls
  }

  test("bottom-k: shard samples merge to the union's sample (KMV property)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val k = 64
    val whole = Sketches.bottomKSample(ev, col("event_id"), col("value"), k, 7)
      .as[(Double, Long)].collect().toSet
    // two disjoint shards, sampled independently, then re-bottom-k'd:
    // must equal the sample of the union — the no-rescan rollup
    val s1 = Sketches.bottomKSample(
      ev.where(col("event_id") % 2 === 0), col("event_id"), col("value"), k, 7)
    val s2 = Sketches.bottomKSample(
      ev.where(col("event_id") % 2 === 1), col("event_id"), col("value"), k, 7)
    val merged = s1.unionByName(s2).orderBy(col("h"), col("v")).limit(k)
      .as[(Double, Long)].collect().toSet
    assert(merged == whole, "bottom-k of shard bottom-k's != bottom-k of union")
  }

  test("bottom-k quantiles: rank error within the DKW envelope vs exact") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .where(col("value").isNotNull && !isnan(col("value")))
    val sample = Sketches.bottomKSample(ev, col("event_id"), col("value"), 256, 7)
    val qs = Seq(0.1, 0.5, 0.9)
    val est = Sketches.sampleQuantiles(sample, qs)
      .as[(Double, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    val n = ev.count().toDouble
    qs.foreach { q =>
      // realized rank of the estimate in the full data
      val rank = ev.where(col("value") <= est(q)).count() / n
      // eps at 99.9% confidence for k=256 under DKW: sqrt(ln(2/δ)/(2k))
      val eps = math.sqrt(math.log(2 / 0.001) / (2 * 256))
      assert(math.abs(rank - q) < eps,
        s"q=$q estimate rank $rank off by more than DKW eps $eps")
    }
  }

  test("weighted bottom-k: shard samples merge to the union's sample") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("id", concat(col("l_orderkey"), lit("_"), col("l_linenumber")))
    val k = 64
    def tuples(df: org.apache.spark.sql.DataFrame) =
      df.as[(Double, Double, Long, Double)].collect().toSet
    val whole = tuples(Sketches.weightedBottomK(li, col("id"),
      col("l_extendedprice"), col("l_quantity"), k, 7))
    // disjoint shards sampled independently, re-merged under the same
    // total order — must equal the union's sample INCLUDING the
    // threshold row, so τ (and thus every adjusted weight) survives
    // the no-rescan rollup
    val s1 = Sketches.weightedBottomK(li.where(col("l_orderkey") % 2 === 0),
      col("id"), col("l_extendedprice"), col("l_quantity"), k, 7)
    val s2 = Sketches.weightedBottomK(li.where(col("l_orderkey") % 2 === 1),
      col("id"), col("l_extendedprice"), col("l_quantity"), k, 7)
    val merged = tuples(s1.unionByName(s2)
      .orderBy(col("p").desc, col("h"), col("v")).limit(k + 1))
    assert(merged == whole,
      "weighted bottom-k of shard samples != weighted bottom-k of union")
  }

  test("weighted quantiles: realized weight-rank near q; exhaustive case exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val id = concat(col("l_orderkey"), lit("_"), col("l_linenumber"))
    val k = 256
    val sample = Sketches.weightedBottomK(li, id, col("l_extendedprice"),
      col("l_quantity"), k, 7)
    val qs = Seq(0.25, 0.5, 0.9)
    val est = Sketches.weightedSampleQuantiles(sample, k, qs)
      .as[(Double, Double, Long, Double)].collect()
    assert(est.forall(_._3 == k), "sample size should be exactly k")
    val wTotal = li.agg(sum(col("l_quantity").cast("long")))
      .as[Long].head().toDouble
    val byQ = est.map(r => r._1 -> r._2).toMap
    qs.foreach { q =>
      // realized WEIGHT rank of the estimate in the full data
      val rank = li.where(col("l_extendedprice") <= byQ(q))
        .agg(sum(col("l_quantity").cast("long"))).as[Long].head() / wTotal
      assert(math.abs(rank - q) < 0.1,
        s"q=$q estimate ${byQ(q)} realized weight-rank $rank")
      // the HT-estimated total weight is in the right ballpark too
      val wEst = est.find(_._1 == q).get._4
      assert(math.abs(wEst - wTotal) / wTotal < 0.25,
        s"w_est $wEst vs exact total $wTotal")
    }
    // n <= k: τ = 0, adjusted weights are the exact weights, and the
    // q=0.5 estimate IS Robust.weightedMedian's answer
    val tiny = Seq(("a", 1.0, 1L), ("b", 2.0, 1L), ("c", 3.0, 10L))
      .toDF("id", "v", "w")
    val exact = graft.operators.Robust.weightedMedian(
        tiny.withColumn("k", lit("g")), Seq("k"), col("v"), col("w"),
        Seq(col("id"))).head().getDouble(3)
    val sk = Sketches.weightedSampleQuantiles(
        Sketches.weightedBottomK(tiny, col("id"), col("v"), col("w"),
          k = 16, seed = 7), k = 16, Seq(0.5))
      .as[(Double, Double, Long, Double)].head()
    assert(sk._2 == exact && sk._4 == 12.0,
      s"exhaustive sketch must be exact: got ${sk._2} (median $exact)")
  }

  test("keyed weighted bottom-k: native aggregate == per-key global sketch, bounded rows") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val id = concat(col("l_orderkey"), lit("_"), col("l_linenumber"))
    val k = 16
    val keyed = Sketches.weightedBottomKByKey(li, Seq("l_returnflag"),
      id, col("l_extendedprice"), col("l_quantity"), k, 7)
    // the extension session must actually route through the native
    // bounded-state aggregate, not the window fallback
    assert(keyed.queryExecution.executedPlan.toString.contains("graft_wbk"),
      "keyed sketch did not plan the native graft_wbk aggregate")
    val got = keyed.collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // per key: <= k+1 rows, and exactly the GLOBAL sketch of that
    // key's slice (the group key must not leak into the hash)
    val flags = li.select("l_returnflag").distinct()
      .as[String].collect()
    flags.foreach { f =>
      val slice = Sketches.weightedBottomK(
          li.where(col("l_returnflag") === f), id,
          col("l_extendedprice"), col("l_quantity"), k, 7)
        .as[(Double, Double, Long, Double)].collect()
        .map { case (v, w, h, p) => (p, h, v, w) }.toSet
      assert(got(f).size <= k + 1)
      assert(got(f) == slice, s"keyed sketch for flag $f != sliced sketch")
    }
    // the window fallback is value-identical (kill-switch parity is
    // env-based, so replicate the fallback formulation inline)
    val two53 = 9007199254740992L
    val h = graft.functions.Text.md5Hash64(id.cast("string"), 7)
    val base = li.where(col("l_extendedprice").isNotNull &&
        col("l_quantity") > 0)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("v"),
        col("l_quantity").cast("double").as("w"), h.as("h"))
      .withColumn("p", col("w") /
        ((pmod(col("h"), lit(two53)) + lit(1L)).cast("double") /
          lit(two53.toDouble)))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("p").desc, col("h"), col("v"))
    val fb = base.withColumn("__rk", row_number().over(win))
      .where(col("__rk") <= k + 1)
      .select(col("l_returnflag"), col("p"), col("h"), col("v"), col("w"))
      .collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(fb == got, "window fallback diverged from the native aggregate")
    // keyed quantiles: an exhaustive key (n <= k) is EXACT
    val tiny = Seq(("g", "a", 1.0, 1L), ("g", "b", 2.0, 1L),
      ("g", "c", 3.0, 10L)).toDF("key", "id", "vv", "ww")
    val kq = Sketches.weightedKeyedQuantiles(
        Sketches.weightedBottomKByKey(tiny, Seq("key"), col("id"),
          col("vv"), col("ww"), k = 8, seed = 7),
        Seq("key"), k = 8, Seq(0.5)).head()
    assert(kq.getDouble(2) == 3.0 && kq.getDouble(4) == 12.0)
  }

  test("weighted bottom-k: a dominant weight is sampled and decides the median") {
    // 500 unit-weight noise rows + one row carrying 100x their total
    // mass — the case a UNIFORM sample gets wrong with high
    // probability but a weighted sample must nail
    val rows = (1 to 500).map(i => (s"n$i", i.toDouble, 1.0)) :+
      (("heavy", 42.0, 50000.0))
    val df = rows.toDF("id", "v", "w")
    val sample = Sketches.weightedBottomK(df, col("id"), col("v"),
      col("w"), k = 32, seed = 3)
    assert(sample.where(col("v") === 42.0).count() == 1,
      "the dominant-weight row must survive weighted sampling")
    val med = Sketches.weightedSampleQuantiles(sample, 32, Seq(0.5))
      .as[(Double, Double, Long, Double)].head()
    assert(med._2 == 42.0, s"median should be the heavy row, got ${med._2}")
  }

  test("overlapEstimate: inclusion-exclusion recovers known overlaps within 3·RSE") {
    // A = 1..2000, B = 1001..3000 (|∩| = 1000), C = 10001..12000 (disjoint)
    val rows =
      (1 to 2000).map(i => ("A", i.toLong)) ++
        (1001 to 3000).map(i => ("B", i.toLong)) ++
        (10001 to 12000).map(i => ("C", i.toLong))
    val df = rows.toDF("set_id", "elem")
    val out = Sketches.overlapEstimate(df, col("set_id"), col("elem"))
      .select("set_a", "set_b", "est_a", "est_b", "est_intersection")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    out.foreach { case (_, (ea, eb, _)) =>
      assert(math.abs(ea - 2000) / 2000.0 <= 0.05)
      assert(math.abs(eb - 2000) / 2000.0 <= 0.05)
    }
    // compounded IE bound: |err| <= 3·RSE·(|A| + |B| + |A∪B|)
    assert(math.abs(out(("A", "B"))._3 - 1000) <= 0.05 * (2000 + 2000 + 3000))
    assert(math.abs(out(("A", "C"))._3 - 0) <= 0.05 * (2000 + 2000 + 4000))
    assert(math.abs(out(("B", "C"))._3 - 0) <= 0.05 * (2000 + 2000 + 4000))
  }

  test("bloom semi-join reduction: fewer rows shuffle, identical join result") {
    val m = 1 << 12
    val seeds = Seq(1, 2, 3)
    val build = (1 to 50).map(_.toLong * 7).toDF("k") // sparse key set
    val fact = (1 to 5000).map(i => (i.toLong, i % 13)).toDF("k", "v")
    val bitmap = Sketches.bloomBitmap(build, col("k"), m, seeds)
    val prefiltered = fact.where(
      Sketches.bloomMightContain(col("k"), bitmap, m, seeds))
    val passed = prefiltered.count()
    // the map-side filter sheds most of the fact before any exchange ...
    assert(passed < 5000 / 4, s"bloom passed $passed of 5000")
    assert(passed >= 50, "no false negatives: every true match survives")
    // ... and the join answer is EXACTLY the unfiltered join's
    val viaBloom = prefiltered.join(build, "k").agg(
      count(lit(1)), sum("v")).as[(Long, Long)].collect().head
    val plain = fact.join(build, "k").agg(
      count(lit(1)), sum("v")).as[(Long, Long)].collect().head
    assert(viaBloom == plain && plain._1 == 50L)
  }

  test("misra-gries buffer: update bound, classic decrement, merge truncation") {
    import graft.functions.native.MisraGriesAgg
    // hand case, k=2: stream a a b c -> offer(c) against a full {a:2,b:1}
    // decrements all (b drops at 0), c never lands -> {a:1}
    val b = new MisraGriesAgg.Buf(2)
    Seq("a", "a", "b", "c").foreach(b.offer)
    assert(b.counts.toMap == Map("a" -> 1L))
    // merge truncation: {x:5, y:3} ++ {z:2} at k=2 -> subtract the
    // 3rd-largest (2) from all -> {x:3, y:1}
    val m1 = new MisraGriesAgg.Buf(2); val m2 = new MisraGriesAgg.Buf(2)
    m1.counts ++= Map("x" -> 5L, "y" -> 3L)
    m2.counts ++= Map("z" -> 2L)
    m1.mergeFrom(m2)
    assert(m1.counts.toMap == Map("x" -> 3L, "y" -> 1L))
  }

  test("misra-gries superset guarantee holds across partitionings") {
    // 1 key at 30% + 200 singleton tail keys; k=8 -> anything above
    // n/9 (~11%) MUST survive the summary whatever the partitioning
    val rows = Seq.fill(90)("heavy") ++ (1 to 200).map(i => s"t$i") ++
      Seq.fill(10)("semi") // 300 rows total; heavy=30%, semi ~3.3%
    for (parts <- Seq(1, 3, 7)) {
      val df = rows.toDF("key").repartition(parts)
      val summary = df.agg(call_function("graft_mg", col("key"), lit(8)))
        .as[Seq[(String, Long)]].collect().head
      assert(summary.map(_._1).contains("heavy"),
        s"heavy key missing at $parts partitions: $summary")
      assert(summary.size <= 8)
      // count lower bound: summary count never exceeds the true count
      val est = summary.toMap.getOrElse("heavy", 0L)
      assert(est <= 90L && est >= 90L - 300L / 9 - 1)
    }
  }

  test("heavyHitters: exact counts match a census; tail never leaks in") {
    val rows = Seq.fill(60)("hh1") ++ Seq.fill(40)("hh2") ++
      (1 to 150).map(i => s"tail$i") // n=250; hh1=24%, hh2=16%, tail 0.4%
    val df = rows.toDF("key").repartition(5)
    val out = Sketches.heavyHitters(df, col("key"), phi = 0.1, k = 16)
      .orderBy(desc("cnt")).as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(("hh1", 60L, 0.24), ("hh2", 40L, 0.16)))
    // fallback census path answers identically
    val exp = df.groupBy("key").count().where(col("count") >= 25)
      .as[(String, Long)].collect().toSet
    assert(out.map(r => (r._1, r._2)).toSet == exp)
  }

  test("heavyHitters: phi below the MG guarantee is rejected") {
    val df = Seq("a", "b").toDF("key")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, col("key"), phi = 0.001, k = 16)
    }
  }
}
