package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational logistic regression — the trainable quality-classifier
  * slot of the pipeline (the role fastText-style filters play in
  * CCNet/RefinedWeb-class curation). Where [[Classify]] is the
  * closed-form generative classifier, this is the discriminative one:
  * full-batch gradient descent over a handful of dense per-document
  * features, trained entirely as DataFrame aggregations — the "model"
  * is a 1-row weights relation, never a driver-side object.
  *
  * == Determinism (SURVEY.md §8.3) ==
  * Every per-row quantity that feeds a SUM is quantized first:
  * features are DECIMAL(8,5) (already 5-decimal metrics), the
  * sigmoid is rounded at 7 → DECIMAL(10,7) (libm exp differs ≤ 2 ulp
  * between engines — relative 4·10⁻¹⁶, eleven orders inside the
  * quantum), per-row log-loss at 7 → DECIMAL(18,7). Gradient sums are
  * then EXACT decimal arithmetic — identical under any partitioning —
  * and each weight update is one identically-shaped double expression
  * (wⱼ − lr·gⱼ/n) re-quantized to DECIMAL(18,9). So T iterations are
  * bit-stable across engines, which is what lets the DuckDB oracle
  * replay training round-for-round (OraclesExt.logregTrain).
  *
  * == Scale shape ==
  * One iteration = one broadcast of the 1-row weights relation + one
  * map-side-combined global aggregate (6 decimal sums + a count).
  * The corpus is scanned once per iteration and never shuffled by
  * anything (the aggregate's combine tree is the only exchange, and
  * it carries ONE row per task). T stays single digits — exactly the
  * regime where full-batch GD on cheap features is preferable to SGD
  * at 100 TB (no per-row state, no ordering sensitivity; a real run
  * would persist the feature projection once and iterate over it).
  */
object LogReg {

  private val DecF = DecimalType(8, 5) // feature quantum
  private val DecP = DecimalType(10, 7) // sigmoid quantum
  private val DecW = DecimalType(18, 9) // weight quantum

  /** Feature names in weight order (bias first) — shared with the
    * oracle twin so column order cannot drift.
    */
  val FeatureNames: Seq[String] = Seq("bias", "len", "stop", "punct", "alpha")

  /** Per-document feature projection: (doc_id, y, x1..x4) with
    * x1 = min(n_tokens, 100)/100 (the quality blend's length ramp),
    * x2..x4 the 5-decimal stopword/punctuation/alphabetic ratios from
    * [[TextStats.withDocStats]]; y = 1 where `label` holds. The bias
    * enters as the implicit x0 = 1 in [[train]].
    */
  def features(docs: DataFrame, label: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    featuresKeeping(docs, label, Nil, idCol, textCol)

  /** [[features]] carrying extra passthrough columns (group slices for
    * the prediction roll-up) so callers never re-join the corpus.
    */
  private def featuresKeeping(docs: DataFrame, label: Column,
      keep: Seq[String], idCol: String, textCol: String): DataFrame =
    TextStats.withDocStats(docs, textCol)
      .select((col(idCol) +: keep.map(col)) :+
        when(label, lit(1)).otherwise(lit(0)).cast(DecP).as("y") :+
        // integer/100.0 is exact in double for n ≤ 100; the round is a
        // no-op kept so the expression is the oracle's, shape for shape
        round(least(col("n_tokens"), lit(100L)).cast("double") / lit(100.0), 5)
          .cast(DecF).as("x1") :+
        col("stopword_ratio").cast(DecF).as("x2") :+
        col("punct_ratio").cast(DecF).as("x3") :+
        col("alpha_ratio").cast(DecF).as("x4"): _*)

  /** Sigmoid at the cross-engine quantum: round(1/(1+e^{−z}), 7),
    * clamped to [10⁻⁷, 1−10⁻⁷] so the log-loss can never hit ln(0)
    * however far a caller pushes iterations or learning rate.
    */
  private def sigmoidQ(z: Column): Column =
    least(greatest(round(lit(1.0) / (lit(1.0) + exp(-z.cast("double"))), 7),
      lit(1e-7)), lit(1.0 - 1e-7)).cast(DecP)

  /** Exact-decimal logit under a broadcast 1-row weights frame. */
  private def zExpr: Column =
    col("w0") + col("w1") * col("x1") + col("w2") * col("x2") +
      col("w3") * col("x3") + col("w4") * col("x4")

  /** One GD state: the 1-row frame (w0..w4 DECIMAL(18,9)). */
  private def zeroWeights(docs: DataFrame): DataFrame =
    docs.sparkSession.range(1).select(
      (0 to 4).map(j => lit(0).cast(DecW).as(s"w$j")): _*)

  /** Internal: per-iteration states. Returns (trace, finalWeights) —
    * trace rows are (iter, w0..w4 after the update, loss BEFORE the
    * update, i.e. the mean log-loss the gradient batch saw; iter 1's
    * loss is ln 2 by construction, the canonical from-zero check).
    */
  private def trainStates(docs: DataFrame, label: Column, iters: Int,
      lr: Double, idCol: String, textCol: String): (Seq[DataFrame], DataFrame) = {
    require(iters >= 1, "iters must be >= 1")
    val feat = features(docs, label, idCol, textCol)
    var w = zeroWeights(docs)
    val trace = (1 to iters).map { t =>
      val scored = feat.crossJoin(broadcast(w))
        .withColumn("__p", sigmoidQ(zExpr))
        .withColumn("__e", col("__p") - col("y"))
        .withColumn("__l",
          round(-(col("y").cast("double") * log(col("__p").cast("double")) +
            (lit(1.0) - col("y").cast("double")) *
              log(lit(1.0) - col("__p").cast("double"))), 7)
            .cast(DecimalType(18, 7)))
      val grads = scored.agg(
        count(lit(1)).as("n"),
        sum(col("__e")).as("g0"),
        sum(col("__e") * col("x1")).as("g1"),
        sum(col("__e") * col("x2")).as("g2"),
        sum(col("__e") * col("x3")).as("g3"),
        sum(col("__e") * col("x4")).as("g4"),
        sum(col("__l")).as("lsum"))
      val next = grads.crossJoin(broadcast(w)).select(
        lit(t).as("iter") +:
          (0 to 4).map(j =>
            round(col(s"w$j").cast("double") -
              lit(lr) * (col(s"g$j").cast("double") / col("n").cast("double")), 9)
              .cast(DecW).as(s"w$j")) :+
          round(col("lsum").cast("double") / col("n").cast("double"), 6)
            .as("loss"): _*)
      w = next.select("w0", "w1", "w2", "w3", "w4")
      next
    }
    (trace, w)
  }

  /** The trained model alone: the 1-row (w0..w4 DECIMAL(18,9)) frame
    * after `iters` updates — what a pipeline persists and what the
    * report family ([[predictByGroupFrom]], [[prCurveFrom]],
    * [[calibrationBinsFrom]]) scores against, so ONE training run
    * serves every downstream report (the suite's shared-frame rule).
    */
  def finalWeights(docs: DataFrame, label: Column, iters: Int = 3,
      lr: Double = 1.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    trainStates(docs, label, iters, lr, idCol, textCol)._2

  /** Full-batch GD training trace: one row per iteration —
    * (iter, w_bias, w_len, w_stop, w_punct, w_alpha, loss), weights
    * AFTER that iteration's update (as doubles — DECIMAL(18,9)→double
    * is the same IEEE cast on every engine), loss the batch mean
    * log-loss BEFORE it.
    */
  def train(docs: DataFrame, label: Column, iters: Int = 3,
      lr: Double = 1.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val (trace, _) = trainStates(docs, label, iters, lr, idCol, textCol)
    trace.reduce(_.union(_)).select(
      col("iter") +:
        FeatureNames.zipWithIndex.map { case (nm, j) =>
          col(s"w$j").cast("double").as(s"w_$nm")
        } :+ col("loss"): _*)
  }

  /** Precision/recall/F1 curve of the trained model over its SCORE
    * GRID: one row per distinct 4-decimal score value, read as "what
    * the gate gets if it keeps everything scoring ≥ this threshold" —
    * (threshold, n_pred_pos, n_true_pos, precision, recall, f1). The
    * operating-point picker for a quality gate: [[predictByGroup]]
    * fixes 0.5; this shows every choice at once.
    *
    * Scale shape: the corpus collapses map-side to ≤ 10⁴+1 grid rows
    * (4-decimal probabilities in [0,1]); the descending cumulative
    * window runs over THAT bounded relation, never the corpus — the
    * exact-quantile value-counts bound class (audited with that bound
    * in PlanHygieneSpec). Counts are exact integers; the only float
    * ops are the final per-row divisions, identically shaped in the
    * oracle.
    */
  def prCurve(docs: DataFrame, label: Column, iters: Int = 3,
      lr: Double = 1.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    prCurveFrom(docs, label,
      finalWeights(docs, label, iters, lr, idCol, textCol), idCol, textCol)

  /** [[prCurve]] against a PRECOMPUTED weights frame. */
  def prCurveFrom(docs: DataFrame, label: Column, wFinal: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grid = features(docs, label, idCol, textCol)
      .crossJoin(broadcast(wFinal))
      .select(round(sigmoidQ(zExpr).cast("double"), 4).as("threshold"),
        col("y").cast("long").as("__y"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
    val tot = grid.agg(sum(col("__np")).as("__np_all"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val prec = col("n_true_pos").cast("double") / col("n_pred_pos").cast("double")
    val rec = col("n_true_pos").cast("double") / col("__np_all").cast("double")
    // f1 = 2pr/(p+r) collapses algebraically to 2·tp/(pp+np_all): one
    // division instead of a multi-term rational blend (float-tie safe).
    val f1 = lit(2.0) * col("n_true_pos").cast("double") /
      (col("n_pred_pos") + col("__np_all")).cast("double")
    grid.crossJoin(broadcast(tot))
      .withColumn("n_pred_pos", sum(col("__n")).over(w))
      .withColumn("n_true_pos", sum(col("__np")).over(w))
      .select(col("threshold"), col("n_pred_pos"), col("n_true_pos"),
        round(prec, 5).as("precision"), round(rec, 5).as("recall"),
        when(col("n_true_pos") > 0, round(f1, 5))
          .otherwise(lit(0.0)).as("f1"))
      .orderBy(col("threshold").desc)
  }

  /** Reliability (calibration) bins of the trained model: decile bins
    * of the predicted probability — (bin, n_docs, avg_p, frac_pos,
    * gap), gap = |mean prediction − observed rate| per bin. The ECE
    * ingredients; a well-calibrated gate has small gaps, and a quality
    * threshold chosen on miscalibrated scores filters something other
    * than what it claims.
    *
    * One map-side-combined aggregate over the bounded bin domain;
    * mean predictions from exact decimal sums.
    */
  def calibrationBins(docs: DataFrame, label: Column, iters: Int = 3,
      lr: Double = 1.0, nBins: Int = 10, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    calibrationBinsFrom(docs, label,
      finalWeights(docs, label, iters, lr, idCol, textCol), nBins,
      idCol, textCol)

  /** [[calibrationBins]] against a PRECOMPUTED weights frame. */
  def calibrationBinsFrom(docs: DataFrame, label: Column,
      wFinal: DataFrame, nBins: Int = 10, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val avgRaw = col("__sp").cast("double") / col("n_docs").cast("double")
    val fracRaw = col("__np").cast("double") / col("n_docs").cast("double")
    features(docs, label, idCol, textCol)
      .crossJoin(broadcast(wFinal))
      .withColumn("__p", sigmoidQ(zExpr))
      .select(least(floor(col("__p").cast("double") * nBins),
        lit(nBins - 1L)).cast("int").as("bin"),
        col("__p"), col("y").cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("__p")).as("__sp"),
        sum(col("__y")).as("__np"))
      .select(col("bin"), col("n_docs"),
        round(avgRaw, 5).as("avg_p"), round(fracRaw, 5).as("frac_pos"),
        round(abs(avgRaw - fracRaw), 5).as("gap"))
      .orderBy("bin")
  }

  /** Exact per-group ROC AUC of the trained model
    * ([[Eval.aucByGroup]] over the quantized scores) — does the
    * classifier actually SEPARATE within each slice, or does one
    * easy source carry the aggregate number. Same grid-bounded plan
    * as the quality-score AUC.
    */
  def aucFrom(docs: DataFrame, label: Column, groupCol: String,
      wFinal: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Eval.aucByGroup(
      featuresKeeping(docs, label, Seq(groupCol), idCol, textCol)
        .crossJoin(broadcast(wFinal))
        .withColumn("__p", sigmoidQ(zExpr)),
      groupCol, col("y") === lit(1), col("__p"))

  /** Apply the trained model back to the corpus, rolled up per
    * `groupCol`: (groupCol, n_docs, n_pred_pos, avg_p) — how many
    * documents the classifier flags at p ≥ 0.5 and the exact-decimal
    * mean score, per slice. One broadcast + one map-side-combined
    * aggregate over the group domain.
    */
  def predictByGroup(docs: DataFrame, label: Column, groupCol: String,
      iters: Int = 3, lr: Double = 1.0, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    predictByGroupFrom(docs, label, groupCol,
      finalWeights(docs, label, iters, lr, idCol, textCol), idCol, textCol)

  /** Per-document quantized scores under a precomputed weights frame:
    * (idCol, y, p) — the raw material for score-level evaluators
    * ([[Eval.brierDecomposition]]); one broadcast, map-only.
    */
  def scoredDocsFrom(docs: DataFrame, label: Column, wFinal: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    features(docs, label, idCol, textCol)
      .crossJoin(broadcast(wFinal))
      .select(col(idCol), col("y").cast("long").as("y"),
        sigmoidQ(zExpr).as("p"))

  /** [[predictByGroup]] against a PRECOMPUTED weights frame. */
  def predictByGroupFrom(docs: DataFrame, label: Column, groupCol: String,
      wFinal: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    featuresKeeping(docs, label, Seq(groupCol), idCol, textCol)
      .crossJoin(broadcast(wFinal))
      .withColumn("__p", sigmoidQ(zExpr))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__p") >= 0.5, 1L).otherwise(0L)).as("n_pred_pos"),
        round(sum(col("__p")).cast("double") / count(lit(1)).cast("double"), 5)
          .as("avg_p"))
  }
}
