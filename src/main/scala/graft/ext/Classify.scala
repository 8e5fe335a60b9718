package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multinomial Naive Bayes over token counts — the fastText-style
  * document classifier slot of the pipeline (quality classifiers,
  * domain routers, language verifiers are all this shape at heart:
  * linear scores over sparse token features). Trained relationally
  * from a labeled corpus; no driver-side model object — the "model"
  * IS two DataFrames (per-class priors, per-(token, class)
  * log-likelihoods), which is exactly what makes it a 100 TB
  * operator: training is two token-keyed aggregations, scoring is
  * one token-keyed join, and the model relation persists like any
  * other table.
  *
  * Cross-engine determinism (SURVEY.md §8.3): every log-probability
  * is quantized to DECIMAL(18,9) (ln differs ≤ 1 ulp between
  * engines, far inside the quantum); a document's class score is
  * then Σ tf·llh + prior in EXACT decimal arithmetic — tf enters as
  * DECIMAL(10,0) (rule 11: a long factor would silently drop the
  * scale), so addition order cannot flip a digit and the argmax
  * (score desc, label asc) is bit-stable under any partitioning.
  *
  * Scale shape: training = one (label, token) count shuffle
  * (map-side combined, vocabulary-sized output) + a vocabulary ×
  * classes grid built by a broadcast cross of the tiny class-totals
  * relation. Scoring = one (doc, token) tf aggregation, one
  * token-keyed join against the grid (C rows per token — C is the
  * class count, single digits), one per-doc roll-up. The corpus is
  * never joined to itself and never shuffled by token twice.
  */
object Classify {

  /** Laplace-smoothed per-(token, label) log-likelihoods over the
    * JOINT vocabulary: llh(t, c) = round(ln((count(t,c) + 1) /
    * (tokens(c) + V)), 9) as DECIMAL(18,9). Dense in the grid sense —
    * a token absent from a class still gets its smoothed floor row,
    * which is what lets scoring be a plain equi-join with no
    * missing-key fallback path.
    */
  def nbTokenLikelihoods(df: DataFrame, labelCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val toks = Dedup.spread(df, textCol)
      .select(col(labelCol).as("label"),
        explode_outer(TextStats.tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull)
    val cc = toks.groupBy("label", "token").agg(count(lit(1)).as("c"))
    val classTotals = cc.groupBy("label").agg(sum(col("c")).as("nt"))
    val vocabSize = cc.agg(countDistinct(col("token")).as("v"))
    val vocab = cc.select("token").distinct()
    vocab.crossJoin(broadcast(classTotals))
      .crossJoin(broadcast(vocabSize))
      .join(cc, Seq("token", "label"), "left")
      .select(col("token"), col("label"),
        round(log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("nt") + col("v")).cast("double")), 9)
          .cast(DecimalType(18, 9)).as("llh"))
  }

  /** Per-class log-priors: (label, n_docs, prior) with
    * prior = round(ln(n_docs / total_docs), 9) as DECIMAL(18,9).
    */
  def nbPriors(df: DataFrame, labelCol: String = "lang"): DataFrame = {
    val cd = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    cd.crossJoin(broadcast(cd.agg(sum(col("n_docs")).as("total"))))
      .select(col("label"), col("n_docs"),
        round(log(col("n_docs").cast("double") / col("total").cast("double")), 9)
          .cast(DecimalType(18, 9)).as("prior"))
  }

  /** Score every document against every class and keep the argmax:
    * (idCol, actual, predicted, score) — `score` the winning class's
    * exact decimal log-posterior rendered at 5 decimals, `predicted`
    * NULL for zero-token documents (nothing to score; real pipelines
    * route those to a fallback, and hiding them would be a silent
    * drop). Here the corpus scores itself (the self-train smoke of a
    * classifier slot); a train/apply split persists
    * [[nbTokenLikelihoods]]/[[nbPriors]] and joins them instead.
    */
  def nbPredict(df: DataFrame, labelCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val llh = nbTokenLikelihoods(df, labelCol, textCol)
    val priors = nbPriors(df, labelCol)
    val tf = Dedup.spread(df, textCol)
      .select(col(idCol),
        explode_outer(TextStats.tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull)
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val scores = tf.join(llh, "token")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("tf").cast(DecimalType(10, 0)) * col("llh")).as("s"))
      .join(broadcast(priors.select(col("label"), col("prior"))), "label")
      .select(col(idCol), col("label"), (col("s") + col("prior")).as("score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("label").asc)
    val best = scores.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("label").as("predicted"),
        round(col("score").cast("double"), 5).as("score"))
    df.select(col(idCol), col(labelCol).as("actual"))
      .join(best, Seq(idCol), "left")
  }

  /** Confusion matrix of the self-train prediction:
    * (actual, predicted, n_docs) — the classifier-quality dashboard
    * relation (diagonal = agreement with the labels).
    */
  def nbConfusion(df: DataFrame, labelCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    nbPredict(df, labelCol, idCol, textCol)
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).as("n_docs"))
}
