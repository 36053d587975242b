package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond plain equi-joins (SURVEY.md §2.4).
  */
object Joins {

  /** J4 — interval join: fact rows match dimension rows valid for the
    * fact's date (`start <= t < end`), as in the reference's per-date
    * routeEquiv filtering (SFMuniDataHelper.py:587). With equi keys plus
    * the range predicate Catalyst plans a hash join with the range as a
    * post-filter; with a small dim side, broadcast it.
    */
  def intervalJoin(
      fact: DataFrame, dim: DataFrame, equiKeys: Seq[String],
      factTime: Column, dimStart: Column, dimEnd: Column,
      joinType: String = "left", broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    val equi = equiKeys.map(k => fact(k) === dim(k)).reduceOption(_ && _)
    val range = factTime >= dimStart && factTime < dimEnd
    fact.join(d, equi.map(_ && range).getOrElse(range), joinType)
  }

  /** J4 at scale, NO equi key: point-in-interval join via overlap
    * bucketing. Vanilla Spark plans a keyless range join as a
    * BroadcastNestedLoopJoin — every fact row against every interval, the
    * classic 100 TB cliff. Instead: each interval explodes to one row per
    * `bucketWidth`-sized bucket it overlaps, each fact maps to exactly ONE
    * bucket, and the join becomes a plain shuffled equi-join on the bucket
    * id refined by the exact range predicate. No duplicate matches (a
    * fact meets an interval only in the fact's own bucket), no nested
    * loop at any scale. Pick `bucketWidth` near the typical interval
    * length: cost is intervals x (length/width + 1) replication vs more
    * facts per bucket. Positions are numeric (cast dates to epoch days);
    * `dimEnd` exclusive; empty intervals (end <= start) match nothing.
    */
  def intervalJoinBucketed(
      fact: DataFrame, dim: DataFrame, factPos: Column,
      dimStart: Column, dimEnd: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    val d = dim
      .where(dimEnd > dimStart) // sequence() would DESCEND on an empty interval
      .withColumn("__ivl_start", dimStart.cast("long"))
      .withColumn("__ivl_end", dimEnd.cast("long"))
      .withColumn("__bucket", explode(sequence(
        floor(dimStart.cast("double") / bucketWidth).cast("long"),
        floor((dimEnd.cast("double") - 1) / bucketWidth).cast("long"))))
    val f = fact
      .withColumn("__pos", factPos.cast("long"))
      .withColumn("__bucket", floor(factPos.cast("double") / bucketWidth).cast("long"))
    f.join(d, Seq("__bucket"))
      .where(col("__pos") >= col("__ivl_start") && col("__pos") < col("__ivl_end"))
      .drop("__bucket", "__pos", "__ivl_start", "__ivl_end")
  }

  /** As-of join (backward): for each left row, the latest right row with
    * rightTs <= leftTs within the same key. The reference does this
    * per-date in driver loops; a 100 TB engine cannot. This is the
    * union-window technique: tag both sides, union, one window pass
    * carries the most recent right payload forward onto left rows —
    * a single shuffle on the key, NO join, no row explosion, skew-safe
    * relative to the naive join+argmax.
    *
    * `right` must be unique per (keys, rightTs) — pre-aggregate if not
    * (ties would otherwise be partition-order dependent).
    *
    * Returns left columns plus the right payload columns (null when no
    * earlier right row exists).
    */
  def asOfJoinBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val ts = "__asof_ts"
    val side = "__asof_side" // 0 = right, 1 = left; right sorts first at equal ts (inclusive match)
    val pay = "__asof_payload"
    // payloads carry as ONE struct, not per-column: independent
    // last(ignoreNulls) per column would mix values from different right
    // rows whenever a payload cell is null (fabricating rows that never
    // existed); the struct itself is non-null for every right row, so the
    // carry is atomic
    val pType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .withColumn(pay, lit(null).cast(pType))
      .select((leftCols.map(col) ++ Seq(col(pay), col(ts), col(side))): _*)
    val r = right
      .withColumn(ts, col(rightTs))
      .withColumn(side, lit(0))
      .withColumn(pay, struct(payloadCols.map(col): _*))
      .select((leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(pay), col(ts), col(side))): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
    // join semantics: NULL keys never match (window partitioning would
    // otherwise group null keys together and carry a payload onto them)
    val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
    carried.where(col(side) === 1)
      .withColumn(pay, when(anyKeyNull, lit(null).cast(pType)).otherwise(col(pay)))
      .select((leftCols.map(col) ++
        payloadCols.map(c => col(pay).getField(c).as(c))): _*)
  }

  /** Left-anti "missing dimension member" check
    * (SFMuniDataHelper.py:593-596 reports AVL routes absent from the
    * route-equiv file). */
  def missingKeys(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.select(key).distinct().join(dim, Seq(key), "left_anti")

  /** E6 — the mode-inference lookup cascade as DATA
    * (ClipperHelper.py:182-201): the reference's chain of np.where
    * overrides is a priority-ordered rules table — each later rule
    * overwrites earlier matches, so the HIGHEST-priority matching rule
    * wins; `default` applies when nothing matches. Rules are broadcast
    * (a lookup table is config-scale by construction); the winner is a
    * lexicographic struct-max, so one aggregate resolves the cascade with
    * no window. `matchCond` encodes the rule predicate — null rule fields
    * as wildcards, e.g.
    *   (rules("agency").isNull || rules("agency") === facts("agency")).
    *
    * PRECONDITION: `factKeys` must uniquely identify fact rows. Non-key
    * fact columns are carried through the groupBy with first(), so if two
    * distinct fact rows share a key tuple they silently collapse to one
    * output row with one arbitrary row's attributes. Callers with
    * non-unique keys must pre-aggregate (or add a row id to factKeys);
    * LookupCascadeSpec asserts this contract.
    */
  def lookupCascade(
      facts: DataFrame, factKeys: Seq[String], rules: DataFrame,
      matchCond: Column, priorityCol: String, valueCol: String,
      out: String, default: Column): DataFrame = {
    val carried = facts.columns.toSeq
    val joined = facts.join(broadcast(rules), matchCond, "left")
    val keep = carried.filterNot(factKeys.contains)
      .map(c => first(facts(c)).as(c))
    // guard the no-match row: its struct would be non-null with null
    // fields, and struct-with-null ordering is not what we want in max
    val best = max(when(rules(priorityCol).isNotNull,
      struct(rules(priorityCol), rules(valueCol)))).as("__best")
    val aggs = keep :+ best
    joined.groupBy(factKeys.map(facts(_)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn(out, coalesce(col(s"__best.$valueCol"), default))
      .drop("__best")
  }

  /** Skew-safe equi-join: salt the fact side with a DETERMINISTIC bucket
    * derived from hashing `saltFrom` columns (rand() would break retries
    * and oracle parity), replicate the dimension side across all salt
    * values, and join on (key, salt). Use when one key carries a large
    * share of the fact rows and AQE skew handling isn't available (e.g.
    * the join feeds a window on the same key). The dim side grows by
    * `buckets`x — keep it broadcast-sized.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFrom: Seq[Column], buckets: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltFrom: _*), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Fuzzy self-match on a name column (entity-resolution primitive):
    * pairs of distinct names within Levenshtein distance `maxDist`,
    * candidates blocked to names SHARING A WORD TOKEN plus the standard
    * length-difference pre-filter (|len(a)-len(b)| <= d is a lower
    * bound on edit distance, so it loses nothing). The expensive DP
    * runs only on surviving candidates. Blocking recall contract: a
    * pair differing in EVERY token is never considered — same candidate
    * semantics as the LSH/prefix families; at corpus scale cap the
    * blocking token's document frequency (the q135 rare-token bound)
    * so block sizes stay bounded per key.
    *
    * Both engines implement classic case-sensitive Levenshtein, so
    * distances — not just the pair set — compare exactly. */
  def fuzzyNameJoin(df: DataFrame, nameCol: String, maxDist: Int)
      : DataFrame = {
    require(maxDist >= 1, "maxDist must be positive")
    val names = df.select(col(nameCol).as("name")).where(col("name").isNotNull)
      .distinct().localCheckpoint(true)
    // raw single-space split, NOT Text.tokens: blocking must see the
    // name exactly as the output pairs carry it (no case folding or
    // whitespace collapse between the block key and the compared value)
    val toks = names.select(col("name"),
      explode(split(col("name"), " ")).as("tok"))
    toks.select(col("name").as("name_a"), col("tok"))
      .join(toks.select(col("name").as("name_b"), col("tok")), Seq("tok"))
      .where(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .select("name_a", "name_b").dropDuplicates("name_a", "name_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
  }

  /** Hybrid skew join — the broadcast-split alternative to
    * [[saltedJoin]]: an exact heavy-hitter census (one partial-agg'd
    * pass; hot keys combine map-side by definition) splits the fact into
    * a HOT slice, joined against the hot dim subset by BROADCAST (hot
    * rows never shuffle on the skewed key at all), and a COLD slice that
    * takes the ordinary shuffle join its now-balanced distribution can
    * afford. The union is exactly the plain join — split ∪ is a
    * partition of the fact, and each side joins the full set of its
    * matching dim rows. Prefer this over salting when hot keys are FEW
    * and their dim rows fit a broadcast; prefer salting when the hot
    * side of the dim is itself too big to ship.
    *
    * `hotThreshold` is in fact-rows-per-key. The hot-key frame must be
    * broadcast-small — that is the technique's applicability condition,
    * asserted here (loudly, driver-side) rather than assumed.
    */
  def skewHybridJoin(fact: DataFrame, dim: DataFrame, key: String,
                     hotThreshold: Long, maxHotKeys: Int = 100000)
      : DataFrame = {
    require(hotThreshold >= 2, "a hot threshold below 2 marks everything hot")
    val hot = fact.groupBy(key).agg(count(lit(1)).as("__n"))
      .where(col("__n") >= hotThreshold).select(key)
      .localCheckpoint()
    require(hot.count() <= maxHotKeys,
      s"[graft] skewHybridJoin: hot-key census exceeds $maxHotKeys keys; " +
        "the broadcast split does not apply — use saltedJoin")
    val factHot = fact.join(broadcast(hot), Seq(key), "left_semi")
    val factCold = fact.join(broadcast(hot), Seq(key), "left_anti")
    val dimHot = dim.join(broadcast(hot), Seq(key), "left_semi")
    factHot.join(broadcast(dimHot), Seq(key))
      .unionByName(factCold.join(dim, Seq(key)))
  }
}
