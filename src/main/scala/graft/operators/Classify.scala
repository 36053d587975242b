package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification (McCallum & Nigam 1998) —
  * the train-a-cheap-classifier-then-sweep-the-corpus stage of a curation
  * pipeline (the role fastText linear classifiers play in CCNet-style
  * setups): fit token log-likelihoods on a labeled split, then score
  * 100 TB with ONE equi-join against a vocabulary-scale weight table.
  *
  * Everything is relational and deterministic:
  *  - training is two counting aggregations (per-(label,token) and
  *    per-label) plus a distinct-vocabulary count — all bounded-output
  *    shuffles on corpus-scaled-but-vocabulary-bounded keys;
  *  - add-one (Laplace) smoothed log-likelihoods are rounded to 9 dp and
  *    carried as exact decimal(28,9) (the q115 CCNet discipline), so
  *    scores sum order-independently and the argmax is engine-portable;
  *  - the per-class prior/unseen defaults collect to literals — bounded
  *    by the number of classes, not the data;
  *  - scoring pivots the likelihood table WIDE (one column per class, a
  *    vocabulary-scale frame) so the corpus pays a single left join on
  *    the token key, then one groupBy(doc) with k decimal sums. No
  *    per-class join fan-out on the corpus side.
  */
object Classify {

  /** Trained model: `labels` sorted ascending; `prior`/`unseen` are the
    * collected per-class 9-dp decimals; `tokLikWide` is (tok,
    * llik_<label>...) — vocabulary-scale, suitable for a shuffle join
    * (never broadcast: vocabulary grows with the corpus). */
  final case class NbModel(
      labels: Seq[String],
      prior: Map[String, java.math.BigDecimal],
      unseen: Map[String, java.math.BigDecimal],
      tokLikWide: DataFrame)

  private def dec9(c: Column): Column = round(c, 9).cast("decimal(28,9)")

  /** Fit on a labeled frame. Label cardinality must be config-scale (the
    * class list and per-class scalars are collected); token counts stay
    * distributed. */
  def nbTrain(train: DataFrame, textCol: String, labelCol: String): NbModel = {
    val toks = train.select(col(labelCol).as("label"),
      explode(Text.tokens(col(textCol))).as("tok"))
    val cnts = toks.groupBy("label", "tok").agg(count(lit(1)).as("cnt"))
    val cls = toks.groupBy("label").agg(count(lit(1)).as("n_toks"))
    val nd = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    // distinct vocabulary from the already-deduped (label,tok) counts —
    // one bounded-output aggregate, no rescan of the token explode
    val vocab = cnts.select("tok").distinct().agg(count(lit(1)).as("v"))
      .withColumn("__k", Guards.constKey(col("v")))
    val tot = nd.agg(sum(col("n_docs")).cast("long").as("n_total"))
      .withColumn("__k", Guards.constKey(col("n_total")))

    // per-class prior and unseen-token default, computed by the SAME
    // round(log)->decimal expressions the likelihood table uses (driver
    // math would risk a different rounding path); k rows collected
    val model = nd.join(cls, "label")
      .withColumn("__k", Guards.constKey(col("label")))
      .join(broadcast(tot), "__k").join(broadcast(vocab), "__k")
      .select(col("label"),
        dec9(log(col("n_docs").cast("double") / col("n_total"))).as("prior"),
        dec9(log(lit(1.0) / (col("n_toks") + col("v")))).as("unseen"))
      .collect()
    val labels = model.map(_.getString(0)).sorted.toSeq
    val prior = model.map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val unseen = model.map(r => r.getString(0) -> r.getDecimal(2)).toMap

    val lik = cnts.join(broadcast(cls), "label")
      .withColumn("__k", Guards.constKey(col("tok")))
      .join(broadcast(vocab), "__k")
      .select(col("label"), col("tok"),
        dec9(log((col("cnt") + lit(1.0)) / (col("n_toks") + col("v"))))
          .as("llik"))
    val wide = labels.foldLeft(
      lik.groupBy("tok").pivot("label", labels).agg(first(col("llik")))
    )((df, l) => df.withColumnRenamed(l, s"llik_$l"))
    NbModel(labels, prior, unseen, wide)
  }

  /** Score and decide: returns (<idCol>, pred). Ties (exact decimal score
    * equality) break to the LARGEST label — a total order both engines
    * can replay (ORDER BY score DESC, label DESC). Zero-token documents
    * score prior-only (the null token row contributes exact zero, not
    * the unseen default). */
  def nbPredict(docs: DataFrame, idCol: String, textCol: String,
                model: NbModel): DataFrame = {
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(28,9)")
    val t = docs.select(col(idCol).as("__id"),
      explode_outer(Text.tokens(col(textCol))).as("tok"))
    val sums = t.join(model.tokLikWide, Seq("tok"), "left")
      .groupBy(col("__id"))
      .agg(
        sum(when(col("tok").isNull, zero)
          .otherwise(coalesce(col(s"llik_${model.labels.head}"),
            lit(model.unseen(model.labels.head)).cast("decimal(28,9)"))))
          .as(s"s_${model.labels.head}"),
        model.labels.tail.map { l =>
          sum(when(col("tok").isNull, zero)
            .otherwise(coalesce(col(s"llik_$l"),
              lit(model.unseen(l)).cast("decimal(28,9)"))))
            .as(s"s_$l")
        }: _*)
    sums.select(col("__id").as(idCol),
      array_max(array(model.labels.map { l =>
        struct((col(s"s_$l") + lit(model.prior(l)).cast("decimal(28,9)"))
          .as("score"), lit(l).as("lab"))
      }: _*)).getField("lab").as("pred"))
  }

  /** Exact ROC-AUC via the midrank Mann–Whitney statistic (Hanley &
    * McNeil 1982): AUC = (Σ midranks of positives − n₊(n₊+1)/2) /
    * (n₊·n₋), with ties getting the average rank of their group. The
    * whole computation is INTEGER until one final division: per
    * distinct score, (count, positives); one ordered cumulative pass
    * gives each group's rank offset; doubling the midrank formula
    * (2·midrank = 2·cum_before + cnt + 1) keeps everything in longs —
    * no float compare, no half-point anywhere until the pround'd
    * output. The cumulative pass is a single-partition window over the
    * DISTINCT-SCORE frame — Guards-bounded; at corpus scale the swap
    * is binned AUC over a score histogram (same formula, bin-grained
    * ties). Returns one row: (n_pos, n_neg, auc). */
  def aucExact(scored: DataFrame, scoreCol: Column, labelCol: Column,
               maxGroups: Long = 1000000L): DataFrame = {
    import graft.functions.Exprs.pround
    val g = scored.select(scoreCol.as("__z"), labelCol.cast("long").as("__y"))
      .groupBy(col("__z"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Guards.constKey(col("__z"))).orderBy(col("__z"))
    val cum = g.withColumn("__cb",
      Guards.bounded(sum(col("__c")).over(w) - col("__c"), col("__z"),
        "auc score groups", maxGroups))
    cum.agg(sum(col("__p")).as("np"),
        sum(col("__c") - col("__p")).as("nn"),
        sum(col("__p") * (lit(2) * col("__cb") + col("__c") + 1)).as("s2"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        pround((col("s2") - col("np") * (col("np") + 1)).cast("double") /
          (lit(2.0) * col("np") * col("nn")), 6).as("auc"))
  }

  /** Reliability-diagram bins (the calibration readout next to
    * [[aucExact]]'s discrimination readout): bucket predictions into
    * `bins` equal-width probability bins and compare the mean
    * predicted probability against the observed positive rate — a
    * well-calibrated scorer tracks the diagonal. Map-only bucketing +
    * one keyed aggregation; means run decimal-exact with pround
    * divisions. Returns (bin, n, mean_pred, frac_pos). */
  def calibrationBins(scored: DataFrame, probCol: Column,
                      labelCol: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, "calibrationBins needs bins >= 2")
    import graft.functions.Exprs.pround
    scored.select(
        // clamp BOTH ends: p = 1.0 lands in the top bin, and a
        // mis-scaled scorer feeding p < 0 must not mint negative bin
        // ids that silently skew the diagram
        greatest(lit(0),
          least(floor(probCol * bins).cast("int"), lit(bins - 1))).as("bin"),
        probCol.as("__p"), labelCol.cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        pround(sum(col("__p").cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 6).as("mean_pred"),
        pround(sum(col("__y")).cast("double") / count(lit(1)), 6)
          .as("frac_pos"))
  }

  /** EQUAL-FREQUENCY reliability bins — the variant that stays
    * readable when the scorer's probability range is compressed (a
    * weak classifier can land every prediction inside one fixed-width
    * bin, which is exactly when you most need the diagram). Deciles
    * are assigned per DISTINCT probability group by its cumulative
    * rank offset — floor(cum_before·bins/n) — so tied predictions
    * share a bin deterministically and both engines replay the
    * assignment; the cumulative pass is the [[aucExact]]
    * Guards-bounded distinct-score window. Returns
    * (bin, n, mean_pred, frac_pos). */
  def calibrationDeciles(scored: DataFrame, probCol: Column,
                         labelCol: Column, bins: Int = 10,
                         maxGroups: Long = 1000000L): DataFrame = {
    require(bins >= 2, "calibrationDeciles needs bins >= 2")
    import graft.functions.Exprs.pround
    val g = scored.select(probCol.as("__p"), labelCol.cast("long").as("__y"))
      .groupBy(col("__p"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__s"))
    val key = Guards.constKey(col("__p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col("__p"))
    val cum = g.withColumn("__cb",
        Guards.bounded(sum(col("__c")).over(w) - col("__c"), col("__p"),
          "calibration prob groups", maxGroups))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(key)))
    cum.withColumn("bin",
        floor((col("__cb") * bins).cast("double") / col("__n")).cast("int"))
      .groupBy(col("bin"))
      .agg(sum(col("__c")).as("n"),
        pround(sum(col("__p").cast("decimal(28,6)") * col("__c"))
          .cast("double") / sum(col("__c")), 6).as("mean_pred"),
        pround(sum(col("__s")).cast("double") / sum(col("__c")), 6)
          .as("frac_pos"))
  }
}
