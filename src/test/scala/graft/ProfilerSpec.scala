package graft

import graft.operators.Profiler
import org.apache.spark.sql.functions._

/** One-scan column profiling semantics. */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, distincts and typed min/max per column") {
    val df = Seq(
      (Some(1L), Some(2.5), Some("b")),
      (Some(1L), None, Some("a")),
      (None, Some(7.5), None))
      .toDF("k", "v", "s")
    val got = Profiler.profile(df, Seq("k", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = got("k")
    assert(k.getLong(1) == 2 && k.getLong(2) == 1 && k.getLong(3) == 1)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 1.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val v = got("v")
    assert(v.getDouble(4) == 2.5 && v.getDouble(5) == 7.5)
    val s = got("s")
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "b")
  }

  test("profile: an all-null column keeps typed nulls, not crashes") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "x")
    val got = Profiler.profile(df, Seq("x")).collect().head
    assert(got.getLong(1) == 0 && got.getLong(2) == 2 && got.getLong(3) == 0)
    assert(got.isNullAt(6) && got.isNullAt(7))
  }
}
