package graft

import graft.operators.Windows
import graft.sources.Sinks
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class SinksStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dynamic partition overwrite replaces only incoming partitions") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val v1 = Seq((1, "2024-01", 10.0), (2, "2024-02", 20.0), (3, "2024-03", 30.0))
      .toDF("id", "month", "v")
    Sinks.writePartitioned(v1, dir, Seq("month"))
    // rewrite ONLY february with new content
    val v2 = Seq((9, "2024-02", 99.0)).toDF("id", "month", "v")
    Sinks.writePartitioned(v2, dir, Seq("month"))
    val out = spark.read.parquet(dir).select("id", "month", "v")
      .as[(Int, String, Double)].collect().toSet
    assert(out == Set((1, "2024-01", 10.0), (9, "2024-02", 99.0), (3, "2024-03", 30.0)))
  }

  test("surgical overwrite leaves untouched partitions BYTE-stable") {
    // the reference's remove-key-then-append (GTFSHelper.py:169-171) is
    // per-key surgery across many year/month partitions: rewriting one
    // (yr, mo) must not even rewrite the files of the others
    val dir = Files.createTempDirectory("graft_sink_bytes").toString
    val v1 = Seq((1, 2024, 1, 10.0), (2, 2024, 2, 20.0), (3, 2024, 3, 30.0),
        (4, 2025, 1, 40.0))
      .toDF("id", "yr", "mo", "v")
    Sinks.writePartitioned(v1, dir, Seq("yr", "mo"))
    def snapshot(): Map[String, (Long, String)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .filter(f => f.getName.endsWith(".parquet"))
        .map { f =>
          val bytes = Files.readAllBytes(f.toPath)
          val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          f.getAbsolutePath -> (f.length(), md5.map("%02x".format(_)).mkString)
        }.toMap
    }
    val before = snapshot()
    Sinks.writePartitioned(
      Seq((9, 2024, 2, 99.0)).toDF("id", "yr", "mo", "v"), dir, Seq("yr", "mo"))
    val after = snapshot()
    val untouched = (k: String) => !k.contains("yr=2024/mo=2")
    assert(before.keySet.filter(untouched) == after.keySet.filter(untouched),
      "untouched partition file set changed")
    before.keySet.filter(untouched).foreach { k =>
      assert(before(k) == after(k), s"untouched partition file rewritten: $k")
    }
    assert(before.keySet.exists(k => k.contains("yr=2024/mo=2")) &&
      after.keySet.filter(k => k.contains("yr=2024/mo=2"))
        .forall(k => !before.contains(k) || before(k) != after(k)),
      "patched partition was not rewritten")
    val out = spark.read.parquet(dir).select("id", "v").as[(Int, Double)].collect().toSet
    assert(out == Set((1, 10.0), (9, 99.0), (3, 30.0), (4, 40.0)))
  }

  test("streaming tumbling-window counts match batch truncation counts") {
    val rows = Seq(
      (ts("2024-01-01 10:01:00"), "a", 1.0), (ts("2024-01-01 10:04:00"), "a", 1.0),
      (ts("2024-01-01 10:07:00"), "a", 1.0), (ts("2024-01-01 10:01:30"), "b", 1.0))
    val df = rows.toDF("ts", "event_type", "value")
    val dir = Files.createTempDirectory("graft_tumble").toString
    df.write.mode("overwrite").parquet(dir)
    val q = StreamOps.windowedCounts(
        spark.readStream.schema(df.schema).parquet(dir).withWatermark("ts", "1 minute"),
        "ts", "5 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("tumble_out").start()
    q.processAllAvailable()
    val got = spark.sql("SELECT w.start, event_type, n FROM tumble_out")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    q.stop()
    assert(got == Set(
      (ts("2024-01-01 10:00:00"), "a", 2L), (ts("2024-01-01 10:05:00"), "a", 1L),
      (ts("2024-01-01 10:00:00"), "b", 1L)))
  }

  test("watermark semantics: late events are dropped in append mode, finalized windows emit once") {
    val dir = Files.createTempDirectory("graft_late").toString
    val b1 = Seq(
      (ts("2024-01-01 10:01:00"), "a", 1.0),
      (ts("2024-01-01 10:03:00"), "a", 1.0),
      // this event advances the watermark to 10:25 (max event - 5 min),
      // past the 10:00-10:05 window's end -> that window finalizes
      (ts("2024-01-01 10:30:00"), "a", 1.0))
      .toDF("ts", "event_type", "value")
    b1.write.mode("overwrite").parquet(dir)
    val q = StreamOps.windowedCounts(
        spark.readStream.schema(b1.schema).parquet(dir)
          .withWatermark("ts", "5 minutes"),
        "ts", "5 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_out").start()
    q.processAllAvailable()
    // batch 2: an event for the ALREADY-FINALIZED 10:00 window — later
    // than the watermark, must be DROPPED, not re-emitted or double-counted
    Seq((ts("2024-01-01 10:02:00"), "a", 1.0))
      .toDF("ts", "event_type", "value")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    // close the 10:30 window too so everything emits
    Seq((ts("2024-01-01 11:00:00"), "b", 1.0))
      .toDF("ts", "event_type", "value")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    val got = spark.sql("SELECT w.start, event_type, n FROM late_out")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    q.stop()
    // the finalized 10:00 window holds 2, NOT 3 — the late event is gone;
    // it emitted exactly once (a set equality would fail on a duplicate
    // only if counts differed, so check multiplicity explicitly)
    val all = spark.sql("SELECT w.start, event_type, n FROM late_out")
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(all.length == all.toSet.size, "finalized windows re-emitted")
    assert(got((ts("2024-01-01 10:00:00"), "a", 2L)),
      s"late event leaked into a finalized window: $got")
    assert(got((ts("2024-01-01 10:30:00"), "a", 1L)))
  }

  test("stateful session update: out-of-order events extend, never rewind") {
    import graft.streaming.StatefulSessions
    import graft.streaming.StatefulSessions.{Ev, OpenSession}
    import org.apache.spark.sql.streaming.TestGroupState
    val state = TestGroupState.create[OpenSession](
      optionalState = org.apache.spark.api.java.Optional.of(OpenSession(
        ts("2024-01-01 10:00:00").getTime, ts("2024-01-01 10:00:00").getTime, 1, 1.0)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(0L),
      hasTimedOut = false)
    // an out-of-order event 30s BEFORE the session's last event
    val out = StatefulSessions.update(90 * 60000L)(
      1L, Iterator(Ev(1L, ts("2024-01-01 09:59:30"), 2.0)), state).toSeq
    assert(out.isEmpty)
    val s = state.get
    assert(s.lastMs == ts("2024-01-01 10:00:00").getTime, "lastMs must not rewind")
    assert(s.startMs == ts("2024-01-01 09:59:30").getTime, "startMs extends back")
    assert(s.n == 2 && s.sum == 3.0)
  }

  test("flatMapGroupsWithState closes sessions across batches and on timeout") {
    import graft.streaming.StatefulSessions
    import graft.streaming.StatefulSessions.Ev
    val dir = Files.createTempDirectory("graft_state").toString
    val batch1 = Seq(
      Ev(1L, ts("2024-01-01 10:00:00"), 1.0),
      Ev(1L, ts("2024-01-01 10:30:00"), 2.0), // same session
      Ev(1L, ts("2024-01-01 13:00:00"), 4.0)) // opens session 2 -> closes session 1
    spark.createDataset(batch1).write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(spark.createDataset(batch1).schema)
      .parquet(dir).withWatermark("ts", "1 minute").as[Ev]
    val q = StatefulSessions.sessions(in, gapMinutes = 90.0)
      .writeStream.outputMode("append").format("memory").queryName("state_out").start()
    q.processAllAvailable()
    val afterB1 = spark.sql("SELECT n_events, sum_value FROM state_out")
      .as[(Long, Double)].collect().toSet
    assert(afterB1 == Set((2L, 3.0))) // first session closed by the new one
    // batch 2: far-future event advances the watermark past session 2's
    // timeout -> the open session closes via EventTimeTimeout
    spark.createDataset(Seq(Ev(2L, ts("2024-01-02 10:00:00"), 9.0)))
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.processAllAvailable() // one more cycle for the timeout batch
    val afterB2 = spark.sql("SELECT user_id, n_events, sum_value FROM state_out")
      .as[(Long, Long, Double)].collect().toSet
    q.stop()
    assert(afterB2.contains((1L, 2L, 3.0)))
    assert(afterB2.contains((1L, 1L, 4.0)), s"timeout session missing: $afterB2")
  }

  test("streaming dedup keeps one doc per fingerprint; cross-batch dups dropped") {
    import graft.streaming.StreamOps
    val dir = Files.createTempDirectory("graft_sdedup").toString
    val batch1 = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "alpha doc"),
      (ts("2024-01-01 10:01:00"), 2L, "beta doc"),
      (ts("2024-01-01 10:02:00"), 3L, "Alpha   DOC")) // dup after normalize
      .toDF("ts", "doc_id", "text")
    batch1.write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(batch1.schema).parquet(dir)
    val q = StreamOps.streamingDedup(in, "ts", "text", "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_out").start()
    q.processAllAvailable()
    // batch 2: another alpha dup (inside the horizon, dropped) + a new doc
    Seq((ts("2024-01-01 10:05:00"), 4L, "alpha doc"),
        (ts("2024-01-01 10:06:00"), 5L, "gamma doc"))
      .toDF("ts", "doc_id", "text")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    val kept = spark.sql("SELECT doc_id FROM sdedup_out")
      .as[Long].collect().toSet
    q.stop()
    // exactly ONE of the intra-batch alpha dups survives (1 or 3 — batch
    // order is not a contract), the cross-batch dup (4) is dropped by
    // state, beta and gamma pass through
    assert(kept.size == 3 && kept(2L) && kept(5L) && !kept(4L), s"got $kept")
    assert((kept intersect Set(1L, 3L)).size == 1, s"got $kept")
  }

  test("stream-static incremental dedup flags corpus dups; batch parity") {
    import graft.streaming.StreamOps
    val dir = Files.createTempDirectory("graft_sincr").toString
    val corpus = Seq((100L, "known corpus document one"),
        (101L, "another corpus document"))
      .toDF("doc_id", "text")
    val corpusFps = corpus.select(
      graft.functions.Text.fingerprint(col("text")).as("fingerprint")).distinct()
    val incoming = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "KNOWN corpus   document ONE"), // dup of 100
      (ts("2024-01-01 10:01:00"), 2L, "a genuinely new document"),
      (ts("2024-01-01 10:02:00"), 3L, "a genuinely new document")) // in-stream dup
      .toDF("ts", "doc_id", "text")
    incoming.write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(incoming.schema).parquet(dir)
    val q = StreamOps.streamingIncrementalDedup(in, corpusFps, "ts", "text",
        "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sincr_out").start()
    q.processAllAvailable()
    val out = spark.sql("SELECT doc_id, is_known_dup FROM sincr_out")
      .as[(Long, Boolean)].collect().toMap
    q.stop()
    // in-stream dup collapsed to one survivor; corpus dup flagged
    assert(out.size == 2, s"got $out")
    assert(out(1L), "corpus duplicate must be flagged")
    assert((out - 1L).values.forall(!_), "new docs must not be flagged")
    // batch parity: the exact tier of incrementalNearDup agrees
    val batchAll = corpus.select(col("doc_id"), col("text"))
      .unionByName(incoming.select(col("doc_id"), col("text")))
    val batch = graft.operators.Dedup.incrementalNearDup(
        batchAll, "doc_id", "text", col("doc_id") < 100)
      .select(col("doc_id"), col("is_exact_dup"))
      .as[(Long, Boolean)].collect().toMap
    assert(batch(1L) && !batch(2L) && !batch(3L))
  }

  test("streaming bottom-k: shard states merge to the exact batch sample") {
    import graft.operators.Sketches
    import graft.streaming.StreamingSketch
    import graft.streaming.StreamingSketch.{BkRow, BkShard}
    val k = 32
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // pre-hash map-side (the batch operator's identical md5 hash);
    // 4 shards so the read-time rollup actually merges
    val all = ev.where(col("value").isNotNull && !isnan(col("value")))
      .select(col("value").cast("double").as("v"),
        graft.functions.Text.md5Hash64(col("event_id").cast("string"), 7)
          .as("h"))
      .select((pmod(col("h"), lit(4L))).cast("int").as("shard"),
        col("h"), col("v"))
      .as[BkRow].collect().toSeq
    val dir = Files.createTempDirectory("graft_sbk").toString
    val (b1, b2) = all.splitAt(all.size / 2)
    b1.toDF().write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(b1.toDF().schema).parquet(dir)
      .as[BkRow]
    val q = StreamingSketch.bottomKShards(in, k)
      .writeStream.outputMode(StreamingSketch.outputMode)
      .format("memory").queryName("sbk_out").start()
    q.processAllAvailable()
    b2.toDF().write.mode("append").parquet(dir)
    q.processAllAvailable()
    // every emission is a bottom-k of data-seen-so-far, so any true
    // global bottom-k row appears in some emission; merging ALL
    // emissions is therefore exact AND independent of sink row order
    val emissions = spark.sql("SELECT shard, hs, vs FROM sbk_out")
      .as[BkShard].collect().toSeq
    q.stop()
    val streamed = StreamingSketch.mergeShards(emissions, k)
      .map { case (h, v) => (v, h) }.toSet
    val batch = Sketches.bottomKSample(ev, col("event_id"), col("value"),
        k, 7).as[(Double, Long)].collect().toSet
    assert(streamed == batch,
      s"streamed sample != batch sample: ${streamed.size}/${batch.size}")
  }

  test("streaming weighted bottom-k: shard states merge to the batch sample + threshold") {
    import graft.operators.Sketches
    import graft.streaming.StreamingSketch
    import graft.streaming.StreamingSketch.{WBkRow, WBkShard}
    val k = 32
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val id = concat(col("l_orderkey"), lit("_"), col("l_linenumber"))
    // pre-compute priority map-side exactly like the batch operator:
    // u = (h mod 2^53 + 1)/2^53, p = w/u
    val two53 = 9007199254740992L
    val all = li
      .where(col("l_extendedprice").isNotNull && col("l_quantity") > 0)
      .select(col("l_extendedprice").cast("double").as("v"),
        col("l_quantity").cast("double").as("w"),
        graft.functions.Text.md5Hash64(id.cast("string"), 7).as("h"))
      .withColumn("p", col("w") /
        ((pmod(col("h"), lit(two53)) + lit(1L)).cast("double") /
          lit(two53.toDouble)))
      .select(pmod(col("h"), lit(4L)).cast("int").as("shard"),
        col("p"), col("h"), col("v"), col("w"))
      .as[WBkRow].collect().toSeq
    val dir = Files.createTempDirectory("graft_swbk").toString
    val (b1, b2) = all.splitAt(all.size / 2)
    b1.toDF().write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(b1.toDF().schema).parquet(dir)
      .as[WBkRow]
    val q = StreamingSketch.weightedBottomKShards(in, k)
      .writeStream.outputMode(StreamingSketch.outputMode)
      .format("memory").queryName("swbk_out").start()
    q.processAllAvailable()
    b2.toDF().write.mode("append").parquet(dir)
    q.processAllAvailable()
    val emissions = spark.sql("SELECT shard, ps, hs, vs, ws FROM swbk_out")
      .as[WBkShard].collect().toSeq
    q.stop()
    val streamed = StreamingSketch.mergeWeightedShards(emissions, k).toSet
    val batch = Sketches.weightedBottomK(li, id, col("l_extendedprice"),
        col("l_quantity"), k, 7)
      .select(col("p"), col("h"), col("v"), col("w"))
      .as[(Double, Long, Double, Double)].collect().toSet
    // k+1 rows INCLUDING the threshold row: τ — and so every adjusted
    // weight downstream — survives the streaming rollup exactly
    assert(streamed == batch,
      s"streamed weighted sample != batch: ${streamed.size}/${batch.size}")
  }

  test("streaming MG heavy hitters: superset + error bound across batches") {
    import graft.streaming.StreamingHeavyHitters
    import graft.streaming.StreamingHeavyHitters.{KeyRow, MgShard}
    val k = 8
    // head: 3 heavy keys at ~20% each; tail: 200 distinct singletons
    val head = Seq.fill(60)("hot1") ++ Seq.fill(50)("hot2") ++
      Seq.fill(40)("hot3")
    val tail = (1 to 200).map(i => s"t$i")
    val all = new scala.util.Random(3).shuffle(head ++ tail)
      .map(key => KeyRow(math.abs(key.hashCode) % 4, key))
    val dir = Files.createTempDirectory("graft_smg").toString
    val (b1, b2) = all.splitAt(all.size / 2)
    b1.toDF().write.mode("overwrite").parquet(dir)
    val in = spark.readStream.schema(b1.toDF().schema).parquet(dir)
      .as[KeyRow]
    val q = StreamingHeavyHitters.mgShards(in, k)
      .writeStream.outputMode(StreamingHeavyHitters.outputMode)
      .format("memory").queryName("smg_out").start()
    q.processAllAvailable()
    b2.toDF().write.mode("append").parquet(dir)
    q.processAllAvailable()
    val emissions = spark.sql("SELECT shard, keys, counts, n FROM smg_out")
      .as[MgShard].collect().toSeq
    q.stop()
    val (n, merged) = StreamingHeavyHitters.mergeShards(emissions)
    assert(n == all.size.toLong, "merged n is the exact stream length")
    val truth = (head ++ tail).groupBy(identity).view.mapValues(_.size.toLong)
    // superset guarantee: every key above n/(k+1) survives the merge
    val heavy = truth.filter(_._2 > n / (k + 1.0)).keys.toSet
    assert(heavy == Set("hot1", "hot2", "hot3"), "fixture sanity")
    assert(heavy.subsetOf(merged.keySet),
      s"lost a heavy key: $heavy vs ${merged.keySet}")
    // error bound: estimates undercount by at most n/(k+1), never over
    merged.foreach { case (key, est) =>
      val t = truth.getOrElse(key, 0L)
      assert(est <= t && est >= t - n / (k + 1.0) - 1,
        s"$key: est $est vs true $t out of MG bounds")
    }
  }

  test("streaming session_window matches batch sessionization session counts") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0), // same session
      (1L, ts("2024-01-01 13:00:00"), 3.0), // new session (150 min gap)
      (2L, ts("2024-01-01 09:00:00"), 4.0),
      (2L, ts("2024-01-02 09:00:00"), 5.0)) // new session next day
    val batchDf = rows.toDF("user_id", "ts", "value")

    // batch count via the W4 operator
    val batch = Windows.sessionize(
        batchDf.withColumn("event_id", col("value")),
        Seq("user_id"), "ts", Seq("event_id"), gapMinutes = 90.0)
      .groupBy("user_id").agg(countDistinct("session_id").as("n"))
      .as[(Long, Long)].collect().toMap

    // streaming: parquet source -> session_window -> memory sink
    val dir = Files.createTempDirectory("graft_stream").toString
    batchDf.write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream
      .schema(batchDf.schema)
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
    val q = StreamOps.sessionAggregate(streamIn, "ts", "user_id", "90 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out")
      .start()
    q.processAllAvailable()
    val streamed = spark.sql(
        "SELECT user_id, count(*) FROM sessions_out GROUP BY 1")
      .as[(Long, Long)].collect().toMap
    q.stop()
    assert(streamed == batch)
    // and the per-session aggregates are right
    val detail = spark.sql("SELECT user_id, n_events, sum_value FROM sessions_out")
      .as[(Long, Long, Double)].collect().toSet
    assert(detail == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0), (2L, 1L, 5.0)))
  }
}
