package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators: GPT-style sequence packing and
  * deterministic (stratified) sampling. Neither exists in the reference —
  * they are the operations a large-scale training-data pipeline runs
  * after the reference-style wrangling, and both are designed shard-local
  * so no stage ever needs a global order.
  */
object Packing {

  /** Concat-and-chunk sequence packing: within each shard, documents are
    * laid end-to-end in (orderCol) order and cut into fixed `seqLen`-token
    * sequences — the standard pretraining packing (documents may straddle
    * a cut; the rollup counts those boundary crossings). Per-shard window
    * cumsum: the widest window is one shard, so 1000 shards = 1000
    * independent tasks and NO global sort at any scale. Emits per doc:
    * token offset, first/last sequence index, offset within the first
    * sequence.
    */
  def packSequences(
      df: DataFrame, shardCols: Seq[String], orderCol: String,
      tokensCol: String, seqLen: Int): DataFrame = {
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tok = col(tokensCol).cast("long")
    df.withColumn("offset", sum(tok).over(w) - tok)
      .withColumn("start_seq", floor(col("offset") / seqLen))
      .withColumn("end_seq",
        when(tok > 0, floor((col("offset") + tok - 1) / seqLen))
          .otherwise(floor(col("offset") / seqLen)))
      .withColumn("start_offset", pmod(col("offset"), lit(seqLen.toLong)))
  }

  /** Per-sequence rollup of a packed shard: how many documents feed each
    * sequence and how many cross its leading boundary. */
  def sequenceStats(packed: DataFrame, shardCols: Seq[String], seqLen: Int): DataFrame =
    packed
      .withColumn("seq", explode(sequence(col("start_seq"), col("end_seq"))))
      .groupBy((shardCols :+ "seq").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("start_seq") < col("seq")).as("n_carryover"))

  /** Deterministic hash sampling: keep a row iff the md5-derived 64-bit
    * hash of its id lands below frac * 2^k — reproducible across runs,
    * engines, and cluster sizes (no RNG state), uniformly spread because
    * md5 bits are. `salt` decorrelates independent samples of the same
    * table. */
  def sampleHash(idCol: Column, frac: Column, salt: Int = 0): Column =
    pmod(Text.md5Hash64(idCol.cast("string"), salt), lit(1000000L)) <
      frac * 1000000L

  /** Stratified deterministic sampling: per-stratum keep fractions from a
    * broadcast config table (stratum, frac); strata missing from the
    * table fall back to `defaultFrac`. The training-data "source mix"
    * primitive. */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      fracs: DataFrame, defaultFrac: Double, salt: Int = 0): DataFrame =
    df.join(broadcast(fracs), Seq(stratumCol), "left")
      .withColumn("__frac", coalesce(col("frac"), lit(defaultFrac)))
      .where(sampleHash(col(idCol), col("__frac"), salt))
      .drop("frac", "__frac")

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each row gets the key
    * u^(1/w) with u a deterministic md5-derived uniform in (0,1), and
    * the k LARGEST keys per stratum are exactly a weighted sample
    * without replacement — the token-budget-proportional subsample
    * ("pick k docs per language, long docs proportionally more likely")
    * that a naive frac-filter cannot express.
    *
    * Engine-portable determinism: u = (md5-hash-64(id) mod 2^32 + 1) /
    * (2^32 + 1) — integer arithmetic plus one double division, so the
    * DuckDB oracle reproduces every uniform bit-for-bit. `pow` is the
    * one libm call; both engines are correctly-rounded to <= 1 ulp, so a
    * cross-engine ordering flip would need two keys within a last-ulp
    * interval — vanishing for continuous md5-derived keys, and the
    * id tie-break keeps the order total regardless.
    *
    * Plan: one map-side key projection + one keyed rank window per
    * stratum (WindowGroupLimit prunes to k per partition before the
    * shuffle on Spark 3.5+). Rows with weight <= 0 carry no sampling
    * mass (A-ES is undefined there) and are dropped.
    *
    * Returns the surviving rows (all input columns) + `es_rank` (1..k).
    */
  def weightedSample(
      df: DataFrame, idCol: String, stratumCols: Seq[String],
      weightCol: String, k: Int, salt: Int = 0): DataFrame = {
    require(k > 0, s"weightedSample needs k > 0, got $k")
    val u = (pmod(Text.md5Hash64(col(idCol).cast("string"), salt),
      lit(4294967296L)) + lit(1L)).cast("double") / lit(4294967297.0)
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(col("__es_key").desc, col(idCol))
    df.where(col(weightCol).cast("double") > 0)
      .withColumn("__es_key", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .withColumn("es_rank", row_number().over(w))
      .where(col("es_rank") <= k)
      .drop("__es_key")
  }

  /** Temperature-based source mixing (the multilingual-corpus sampling
    * rule: p_s proportional to n_s^alpha): per stratum the raw share, the
    * temperature-flattened sampling weight, and the implied epochs over
    * that stratum when the mixed corpus is resampled to `budget` rows.
    * alpha=1 keeps natural proportions; alpha->0 flattens to uniform.
    * One partial-aggregated groupBy; the normalizing total is attached
    * as a ONE-ROW broadcast nested-loop join — with a single-row build
    * side that IS the optimal plan (no hash table, no shuffle), and the
    * plan canary allowlists it on exactly that ground (a constant-key
    * equi-join variant gets constant-folded back to the same nested
    * loop by Catalyst anyway).
    */
  def temperatureMix(
      df: DataFrame, stratumCol: String, alpha: Double,
      budget: Long): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__pw", pow(col("n_docs").cast("double"), lit(alpha)))
    val totals = counts.agg(
      sum(col("n_docs")).as("__tot"), sum(col("__pw")).as("__ptot"))
    counts.crossJoin(broadcast(totals))
      .select(col(stratumCol), col("n_docs"),
        round(col("n_docs") / col("__tot"), 6).as("raw_share"),
        round(col("__pw") / col("__ptot"), 6).as("weight"),
        round(col("__pw") / col("__ptot") * budget / col("n_docs"), 6)
          .as("epochs"))
  }

  /** Length-aware pair packing ("zipper" pairing): within each shard,
    * rank documents by token length descending and pair rank r with rank
    * n+1-r — longest with shortest — so pair lengths concentrate around
    * the mean and fixed-capacity padding waste drops versus arbitrary
    * pairing (the classic sorted-batching heuristic behind
    * length-grouped batch samplers; first-fit-decreasing quality at
    * window-only cost). An odd shard leaves its median document as a
    * singleton pair.
    *
    * Everything is keyed by the md5-derived shard: 1000 shards = 1000
    * independent rank windows, no global sort at any scale. Returns one
    * row per pair: (shard, pair, n_docs, pair_tokens, padding, overflow)
    * where padding = capacity - pair_tokens when the pair fits and
    * overflow = the excess when it does not.
    */
  def zipperPack(
      df: DataFrame, idCol: String, tokensCol: String, shards: Int,
      capacity: Int, zipper: Boolean = true, salt: Int = 0): DataFrame = {
    require(shards > 0 && capacity > 0,
      s"zipperPack needs positive shards/capacity, got $shards/$capacity")
    val tok = col(tokensCol).cast("long")
    // zipper: rank by length desc (id tiebreak — total order) and fold the
    // ranking in half; baseline: adjacent pairs in arrival (id) order
    val order = if (zipper) Seq(tok.desc, col(idCol)) else Seq(col(idCol))
    val w = Window.partitionBy(col("shard")).orderBy(order: _*)
    val n = Window.partitionBy(col("shard"))
    val pair =
      if (zipper) least(col("__rk"), col("__n") + 1 - col("__rk"))
      else ((col("__rk") + 1) / 2).cast("long")
    df
      .withColumn("shard",
        pmod(Text.md5Hash64(col(idCol).cast("string"), salt), lit(shards.toLong)))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("pair", pair)
      .groupBy("shard", "pair")
      .agg(count(lit(1)).as("n_docs"), sum(tok).as("pair_tokens"))
      .withColumn("padding", greatest(lit(0L), lit(capacity.toLong) - col("pair_tokens")))
      .withColumn("overflow", greatest(lit(0L), col("pair_tokens") - capacity))
  }

  /** Deterministic corpus shuffle as (shard, position): the md5-derived
    * hash spreads rows uniformly over `shards` shards and orders them
    * within each shard — the reproducible global shuffle every training
    * run needs, WITHOUT a global rank (a single row_number over the
    * corpus would serialize into one task; per-shard windows are
    * embarrassingly parallel, and (shard asc, pos asc) IS a total
    * order). */
  def shuffleShard(
      df: DataFrame, idCol: String, shards: Int, salt: Int = 0): DataFrame = {
    val h = Text.md5Hash64(col(idCol).cast("string"), salt)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w) - 1)
      .drop("__h")
  }

  /** Rendezvous / highest-random-weight shard assignment (Thaler &
    * Ravishankar 1998) — the consistent sharding mod-hash can't give:
    * growing n→n+1 shards moves ONLY the keys the new shard wins
    * (≈ 1/(n+1) of them), where `pmod(h, n)` reshuffles ≈ n/(n+1) of
    * the corpus. At 100 TB that is the difference between reprocessing
    * one shard and reprocessing the fleet. Pure expression: score every
    * shard id with the engine-portable md5 hash and take the argmax
    * (struct max over (score, shard) — ties, cosmically unlikely on
    * 60-bit scores, break to the HIGHEST shard id in both engines).
    */
  def rendezvousShard(keyCol: Column, shards: Int): Column = {
    require(shards >= 1, "need at least one shard")
    array_max(transform(sequence(lit(0), lit(shards - 1)),
      i => struct(
        Text.md5Hash64Col(keyCol.cast("string"), i).as("h"),
        i.as("i"))))
      .getField("i")
  }

  /** Exact water-filling allocation of a hard budget across supply-
    * capped groups — the data-mixing solve a budgeted pretraining run
    * needs: allocate a_i = min(supply_i, L·target_i) with the unique
    * level L making Σa_i = budget (all supplies allocated when the
    * budget covers them). Closed form, not iteration: groups sort by
    * their cap-point r_i = supply_i/target_i; with every group before
    * breakpoint i capped, L_i = (budget − Σsupply_<i)/(Σtarget_≥i),
    * and the true level is the first L_i at or below its own r_i.
    *
    * Input: one row per group with `keyCol`, `supply` (BIGINT > 0),
    * `target` (6-dp-grid share summing ≈ 1), `budget` (BIGINT, same on
    * every row). Output adds (r, level, alloc, epochs, supply_capped).
    * The group dimension is config-scale, so the one global window is
    * a bounded single-partition sort; the two one-row aggregates ride
    * constKey broadcasts. Integer allocations use the floor(x + 0.5)
    * convention, so Σalloc lands within n/2 of the budget (the
    * continuous solve is exact). Engine-replayable throughout: exact
    * BIGINT/DECIMAL prefix sums, divisions re-gridded at 6 dp. */
  def waterFill(df: DataFrame, keyCol: String): DataFrame = {
    val tAgg = df.agg(
        sum(col("target").cast("decimal(18,6)")).cast("double").as("tott"))
      .withColumn("__k", Guards.constKey(col("tott")))
    // the solve's window is over the GROUP dimension — config-scale by
    // contract, so it runs under the Guards bounded-single-partition
    // regime (constant keyed partition + runtime row bound), never as a
    // partition-less sort of unbounded data
    val w = Window.partitionBy(Guards.constKey(col("r")))
      .orderBy(col("r"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = df
      .withColumn("r", round(col("supply") / col("target"), 6))
      .withColumn("__k", Guards.constKey(col(keyCol)))
      .join(broadcast(tAgg), "__k")
      .withColumn("cumS", Guards.bounded(
        coalesce(sum("supply").over(w), lit(0L)), col("r"),
        "water-fill group dimension"))
      .withColumn("cumT", coalesce(
        sum(col("target").cast("decimal(18,6)")).over(w).cast("double"),
        lit(0.0)))
      .withColumn("lcand",
        round((col("budget") - col("cumS")) / (col("tott") - col("cumT")), 6))
    val lRow = ranked.where(col("lcand") <= col("r"))
      .agg(min(struct(col("r").as("r"), col(keyCol).as("s"),
        col("lcand").as("l"))).as("b"))
      .select(col("b").getField("l").as("level"))
      .withColumn("__k", Guards.constKey(col("level")))
    ranked.withColumn("__k", Guards.constKey(col(keyCol)))
      .join(broadcast(lRow), "__k")
      .withColumn("alloc", when(col("level").isNull, col("supply"))
        .otherwise(least(col("supply"),
          floor(col("level") * col("target") + lit(0.5)).cast("long"))))
      .withColumn("epochs", round(col("alloc") / col("supply"), 4))
      .withColumn("supply_capped", col("alloc") === col("supply"))
      .drop("__k", "cumS", "cumT", "lcand", "tott")
  }
}
