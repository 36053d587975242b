package graft

import graft.operators.Contracts
import graft.operators.Contracts.{FkRule, RowRule, UniqueRule}
import org.apache.spark.sql.functions._

/** Contract battery: every rule kind with planted violations and exact
  * expected counts, including the null-predicate-counts-as-violation
  * contract. */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  test("validate counts each rule kind exactly; nulls violate") {
    val df = Seq(
      (1, Some(5), "a"), (1, Some(60), "b"), // dup id; 60 out of range
      (2, None, "c"),                        // null value -> violation
      (3, Some(7), "zz")                     // orphan ref
    ).toDF("id", "v", "ref")
    val dim = Seq("a", "b", "c").toDF("r")
    val out = Contracts.validate(df,
        rowRules = Seq(RowRule("v_small", col("v") <= 50)),
        uniqueRules = Seq(UniqueRule("id_unique", Seq("id"))),
        fkRules = Seq(FkRule("ref_exists", Seq("ref"), dim, Seq("r"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // 60 > 50 is one violation, the NULL is another
    assert(out("v_small") == (4L, 2L, false))
    // both rows of the duplicated id count
    assert(out("id_unique") == (4L, 2L, false))
    assert(out("ref_exists") == (4L, 1L, false))
  }

  test("a clean table passes everything; row rules share one scan") {
    val df = Seq((1, 5, "a"), (2, 6, "b")).toDF("id", "v", "ref")
    val dim = Seq("a", "b").toDF("r")
    val out = Contracts.validate(df,
      rowRules = Seq(RowRule("pos", col("v") > 0),
        RowRule("small", col("v") < 100)),
      uniqueRules = Seq(UniqueRule("u", Seq("id"))),
      fkRules = Seq(FkRule("f", Seq("ref"), dim, Seq("r")))).collect()
    assert(out.forall(_.getBoolean(4)))
    assert(out.forall(_.getLong(3) == 0L))
    assert(out.length == 4)
  }

  test("empty table: zero checked, zero violations, all pass") {
    val df = Seq.empty[(Int, Int)].toDF("id", "v")
    val out = Contracts.validate(df,
      rowRules = Seq(RowRule("pos", col("v") > 0)),
      uniqueRules = Seq(UniqueRule("u", Seq("id")))).collect()
    assert(out.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getBoolean(4)))
  }

  test("corrMatrix: perfect, inverted, and constant-column cases") {
    import graft.operators.Profiler
    // b = 2a (corr 1), c = -a (corr -1), d constant (undefined -> null)
    val rows = (1 to 20).map(i =>
      (i.toDouble, 2.0 * i, -i.toDouble, 5.0))
    val got = Profiler.corrMatrix(rows.toDF("a", "b", "c", "d"),
        Seq("a", "b", "c", "d")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.size == 6 && got.forall(_._2 != null))
    assert(got(("a", "b")) == Some(1.0))
    assert(got(("a", "c")) == Some(-1.0))
    assert(got(("b", "c")) == Some(-1.0))
    assert(got(("a", "d")) == None, "zero-variance pair must be null")
    assert(got(("b", "d")) == None && got(("c", "d")) == None)
  }
}
