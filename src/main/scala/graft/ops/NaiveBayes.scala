package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over a text column — distributed TRAINING
  * (class priors + Laplace-smoothed word likelihoods) and INFERENCE
  * (per-document argmax of the joint log-probability), the baseline
  * text classifier every corpus-labeling pipeline starts from
  * (McCallum & Nigam, AAAI-98 workshop formulation).
  *
  * Exactness discipline: each log-likelihood θ(w,c) = ln((n_wc + 1) /
  * (tokens_c + V)) is computed ONCE per (word, class) and immediately
  * floor(θ·10⁹ + 0.5)-quantized to a long; document scores are then
  * PURE INTEGER sums (occurrence-count × θq + quantized prior), so
  * scoring, argmax, and the confusion rollup are bit-reproducible in
  * any engine — a libm last-ulp disagreement would have to flip one
  * of the V·C quantizations to change anything (odds ~10⁻⁷ each).
  *
  * Distributed shape: one corpus scan builds (doc, word, count); word
  * counts per class aggregate map-side; the dense (vocab × classes)
  * likelihood table is a crossJoin of the vocab against the bounded
  * class table, left-joined to observed counts (zero counts get the
  * smoothing mass); inference joins doc occurrences to likelihoods on
  * the WORD (hash join, co-partitioned with the count shuffle) and
  * sums per (doc, class). The argmax window partitions on one
  * document's C class rows — bounded by the label set, never the
  * corpus. */
object NaiveBayes {

  /** Train on (idCol, labelCol, textCol) and classify the same corpus;
    * returns the confusion matrix (label_true, label_pred, n),
    * ordered. Ties in the argmax break to the lexicographically
    * smallest label. */
  def confusionSelfTrain(df: DataFrame, idCol: String,
      labelCol: String, textCol: String): DataFrame = {
    val base = df.where(col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(labelCol).as("lab"),
        col(textCol).as("text"))
      .localCheckpoint(false)
    // (doc, word, cnt) occurrences
    val occ = base
      .select(col("id"), col("lab"),
        explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy("id", "lab", "w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val vocab = occ.select("w").distinct()
    val vSize = vocab.count()
    val docsTotal = base.count()
    // per-class doc counts and token totals
    val classes = base.groupBy("lab")
      .agg(count(lit(1)).as("n_docs"))
      .join(
        occ.groupBy("lab").agg(sum(col("cnt")).as("n_tokens")), "lab")
      .withColumn("prior_q",
        floor(log(col("n_docs").cast("double") / lit(docsTotal.toDouble))
          * lit(1e9) + lit(0.5)).cast("long"))
      .localCheckpoint(false)
    // dense (word, class) likelihoods, zero counts smoothed
    val wc = occ.groupBy("w", "lab").agg(sum(col("cnt")).as("n_wc"))
    val theta = vocab.crossJoin(
        classes.select(col("lab").as("c"), col("n_tokens")))
      .join(wc.select(col("w"), col("lab").as("c"), col("n_wc")),
        Seq("w", "c"), "left")
      .select(col("w"), col("c"),
        floor(log((coalesce(col("n_wc"), lit(0L)) + lit(1L))
            .cast("double") /
          (col("n_tokens") + lit(vSize)).cast("double"))
          * lit(1e9) + lit(0.5)).cast("long").as("theta_q"))
    // per-(doc, class) integer scores
    val scores = occ.select(col("id"), col("lab"), col("w"), col("cnt"))
      .join(theta, "w")
      .groupBy("id", "lab", "c")
      .agg(sum(col("cnt") * col("theta_q")).as("like_q"))
      .join(classes.select(col("lab").as("c"), col("prior_q")), "c")
      .select(col("id"), col("lab"),
        col("c"), (col("prior_q") + col("like_q")).as("score_q"))
    val w = Window.partitionBy("id")
      .orderBy(col("score_q").desc, col("c").asc)
    scores.withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1)
      .groupBy(col("lab").as("label_true"), col("c").as("label_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label_true", "label_pred")
  }
}
