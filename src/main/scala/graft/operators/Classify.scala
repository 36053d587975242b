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
}
