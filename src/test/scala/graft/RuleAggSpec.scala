package graft

import graft.agg.{AggMethod, AggRule, RuleAgg}
import org.apache.spark.sql.functions._

class RuleAggSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    // (key, x, w, ord)
    ("a", 10.0, 1.0, 1L),
    ("a", 20.0, 3.0, 2L),
    ("a", 30.0, 1.0, 3L),
    ("b", 5.0, 2.0, 1L),
    ("b", 0.0, 2.0, 2L)
  ).toDF("k", "x", "w", "ord")

  test("sum/mean/min/max/count") {
    val out = RuleAgg.aggregate(df, Seq("k"), Seq(
      AggRule("s", "x", AggMethod.Sum),
      AggRule("m", "x", AggMethod.Mean),
      AggRule("lo", "x", AggMethod.Min),
      AggRule("hi", "x", AggMethod.Max),
      AggRule("n", "x", AggMethod.Count),
      AggRule("nz", "x", AggMethod.CountNonZero),
      AggRule("nd", "x", AggMethod.CountDistinct)))
      .orderBy("k").collect()
    assert(out(0).getDouble(1) == 60.0 && out(0).getDouble(2) == 20.0)
    assert(out(1).getDouble(3) == 0.0 && out(1).getDouble(4) == 5.0)
    assert(out(0).getLong(5) == 3 && out(1).getLong(6) == 1 && out(1).getLong(7) == 2)
  }

  test("wgtAvg = sum(w*x)/sum(w); wgtSum = sum(w*x)") {
    val out = RuleAgg.aggregate(df, Seq("k"), Seq(
      AggRule("wa", "x", AggMethod.WgtAvg),
      AggRule("ws", "x", AggMethod.WgtSum)),
      weight = Some("w")).orderBy("k").collect()
    // a: (10*1 + 20*3 + 30*1)/5 = 100/5 = 20
    assert(out(0).getDouble(1) == 20.0 && out(0).getDouble(2) == 100.0)
  }

  test("wgtAvg divides by the TOTAL group weight, null-x rows included") {
    // Reference semantics (SFMuniDataAggregator.py:1162-1165): numerator
    // sum(w*x) skips null x, denominator is sum(w) over EVERY row.
    val withNull = Seq(
      ("c", Some(10.0), 1.0),
      ("c", Option.empty[Double], 3.0),   // weight counts in the denominator
      ("z", Option.empty[Double], 0.0)    // total weight 0 -> null, not error
    ).toDF("k", "x", "w")
    val out = RuleAgg.aggregate(withNull, Seq("k"), Seq(
      AggRule("wa", "x", AggMethod.WgtAvg)),
      weight = Some("w")).orderBy("k").collect()
    assert(out(0).getDouble(1) == 2.5) // 10*1 / (1+3)
    assert(out(1).isNullAt(1))
  }

  test("first/last deterministic under duplicate order keys") {
    val dup = Seq(("a", 1.0, 0L), ("a", 2.0, 0L), ("a", 3.0, 9L)).toDF("k", "x", "ord")
    val out = RuleAgg.aggregate(dup, Seq("k"), Seq(
      AggRule("f", "x", AggMethod.First),
      AggRule("l", "x", AggMethod.Last)),
      order = Some("ord")).collect()(0)
    // ties on ord fall through to the value: first = min(x) among ord=0
    assert(out.getDouble(1) == 1.0 && out.getDouble(2) == 3.0)
  }

  test("first/last skip nulls like pandas GroupBy.first/last") {
    val withNulls = Seq(
      ("a", Option.empty[Double], 1L),  // first position is null
      ("a", Some(2.0), 2L),
      ("a", Some(3.0), 3L),
      ("a", Option.empty[Double], 4L)   // last position is null
    ).toDF("k", "x", "ord")
    val out = RuleAgg.aggregate(withNulls, Seq("k"), Seq(
      AggRule("f", "x", AggMethod.First),
      AggRule("l", "x", AggMethod.Last)),
      order = Some("ord")).collect()(0)
    assert(out.getDouble(1) == 2.0 && out.getDouble(2) == 3.0)
  }

  test("meanTime: whole-second integer mean, truncation, all-null group") {
    val t = Seq(
      // "a": 10:00:00.900 and 10:00:03.900 -> whole seconds 0 and 3
      // since the hour -> mean floor((0+3)/2) = 1 -> 10:00:01
      ("a", Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00.9"))),
      ("a", Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:03.9"))),
      // "b": one null is SKIPPED (count of non-null divides), not zeroed
      ("b", Some(java.sql.Timestamp.valueOf("2024-01-01 12:00:10"))),
      ("b", None),
      ("c", None), // all-null group -> null mean
      // "d": pre-1970 — floor semantics, not truncate-toward-zero:
      // 23:59:59.5 floors to epoch second -1 (trunc would give 0), and
      // the mean floor((-1 + 2) / 2) = 0 (trunc of the old sum gave 1)
      ("d", Some(java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5"))),
      ("d", Some(java.sql.Timestamp.valueOf("1970-01-01 00:00:02")))
    ).toDF("k", "ts")
    val out = RuleAgg.aggregate(t, Seq("k"),
        Seq(AggRule("m", "ts", AggMethod.MeanTime)))
      .orderBy("k").select(col("m").cast("string"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2024-01-01 10:00:01"), Some("2024-01-01 12:00:10"),
      None, Some("1970-01-01 00:00:00")))
  }

  test("maxLevel filters rules") {
    val out = RuleAgg.aggregate(df, Seq("k"), Seq(
      AggRule("s", "x", AggMethod.Sum, maxLevel = 2),
      AggRule("m", "x", AggMethod.Mean, maxLevel = 5)), level = 3)
    assert(out.columns.toSeq == Seq("k", "m"))
  }
}
