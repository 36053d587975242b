package graft

import graft.operators.Partials
import org.apache.spark.sql.functions._

/** Mergeable exact partials: the readout must be invariant to HOW the
  * data was batched (that's what makes the state a monoid), merges must
  * chain, and the finished numbers must equal a direct computation.
  */
class PartialsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 100).map(i =>
    (if (i % 3 == 0) "a" else "b", i.toDouble / 7))

  test("finish(merge(partials)) is invariant to the batch partition") {
    val df = rows.toDF("k", "v")
    def readout(splits: Seq[org.apache.spark.sql.DataFrame]) =
      Partials.finish(
          Partials.merge(splits.map(Partials.build(_, Seq("k"), col("v")))
            .reduce(_ unionByName _), Seq("k")), Seq("k"))
        .as[(String, Long, Double, Double, Double, Double, Double)]
        .collect().toSet
    val whole = readout(Seq(df))
    val byParity = readout(Seq(df.where(expr("v * 7 % 2 < 1")),
      df.where(expr("v * 7 % 2 >= 1"))))
    val byThirds = readout(Seq(
      df.limit(33), df.offset(33).limit(33), df.offset(66)))
    assert(whole == byParity && whole == byThirds && whole.nonEmpty)
  }

  test("merges chain: merge(merge(A,B),C) == merge(A,B,C)") {
    val df = rows.toDF("k", "v")
    val parts = Seq(df.limit(40), df.offset(40).limit(40), df.offset(80))
      .map(Partials.build(_, Seq("k"), col("v")))
    val flat = Partials.merge(parts.reduce(_ unionByName _), Seq("k"))
    val chained = Partials.merge(
      Partials.merge(parts(0).unionByName(parts(1)), Seq("k"))
        .unionByName(parts(2)), Seq("k"))
    val f = (d: org.apache.spark.sql.DataFrame) =>
      Partials.finish(d, Seq("k"))
        .as[(String, Long, Double, Double, Double, Double, Double)]
        .collect().toSet
    assert(f(flat) == f(chained))
  }

  test("finished moments equal the direct computation") {
    val df = rows.toDF("k", "v")
    val got = Partials.finish(
        Partials.merge(Partials.build(df, Seq("k"), col("v")), Seq("k")),
        Seq("k"))
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val a = rows.filter(_._1 == "a").map(_._2)
    assert(got("a")._2 == a.size.toLong)
    assert(math.abs(got("a")._6 - a.sum / a.size) < 1e-6)
    val popVar = a.map(x => x * x).sum / a.size -
      math.pow(a.sum / a.size, 2)
    assert(math.abs(got("a")._7 - popVar) < 1e-5)
    assert(got("a")._4 == a.min && got("a")._5 == a.max)
  }
}
