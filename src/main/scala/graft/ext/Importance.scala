package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
  * expressed relationally: score every raw document by how much more
  * likely its tokens are under a TARGET distribution (a trusted
  * reference corpus) than under the RAW pool's own distribution, then
  * resample the pool toward the target with deterministic Gumbel
  * top-k. This is the principled scale-out replacement for "train a
  * quality classifier": both distributions are plain token counts, so
  * the whole selector is two aggregates and a broadcast join.
  *
  * Model: unigram LMs with add-1 (Laplace) smoothing over the UNION
  * vocabulary. A document's weight is the mean per-token
  * log-likelihood ratio ln(p_target(t) / p_raw(t)) — positive means
  * "more target-like than pool-like".
  *
  * Cross-engine determinism (SURVEY.md §8.3, the [[TextStats]]
  * discipline): each token's ratio is ONE ln of an exact integer
  * quotient — (c_tgt+1)·(N_raw+V) and (c_raw+1)·(N_tgt+V) are exact
  * longs far inside 2⁵³ — quantized to DECIMAL(18,9) (ln differs ≤1
  * ulp between engines, ~1e-16 relative, far inside the 1e-9
  * quantum); per-document means use the exact HALF-UP
  * [[TextStats.decAvg5]], so addition order cannot flip a digit.
  *
  * Scale shape: one token shuffle per corpus builds the two count
  * relations (map-side combined); the vocabulary (full-outer of the
  * two, with a 1-row scalar relation for N_raw/N_tgt/V) BROADCASTS
  * back onto the raw token stream; the per-document roll-up shuffles
  * one partial row per (partition, doc). The target corpus is
  * typically a curated reference — orders of magnitude smaller than
  * the pool — so its scan is cheap; nothing here is quadratic and
  * nothing data-sized reaches the driver.
  */
object Importance {

  private def toks(df: DataFrame, idCol: String, textCol: String) =
    Dedup.spread(df, textCol)
      .select(col(idCol), explode_outer(TextStats.tokens(col(textCol))).as("token"))
      .filter(col("token").isNotNull)

  /** The MODEL: per-token (token, lr) log-likelihood-ratio relation
    * from the two corpus profiles — train once (a reference pool +
    * target pair), apply many times ([[scoreAgainst]], including to
    * later batches or a stream the model never saw). Tokens absent
    * from the union vocabulary score as the unseen-token ratio only
    * implicitly (they simply don't join; [[scoreAgainst]] counts them
    * at ratio 0 via its left join), a neutral default.
    */
  def tokenLogRatios(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cRaw = toks(raw, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("c_raw"))
    val cTgt = toks(target, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("c_tgt"))
    val vocab = cRaw.join(cTgt, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("c_raw"), lit(0L)).as("c_raw"),
        coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
    val scalars = vocab.agg(
      sum(col("c_raw")).as("n_raw"), sum(col("c_tgt")).as("n_tgt"),
      count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(scalars))
      .select(col("token"),
        round(log(
          ((col("c_tgt") + 1) * (col("n_raw") + col("v"))).cast("double") /
            ((col("c_raw") + 1) * (col("n_tgt") + col("v"))).cast("double")), 9)
          .cast(DecimalType(18, 9)).as("lr"))
  }

  /** Score a document set against a PRECOMPUTED ratio model: the
    * apply step of train-once/apply-many (new batches, streams,
    * held-out pools). Tokens outside the model's vocabulary are
    * counted but contribute ratio 0. Broadcast model join + one
    * doc-keyed roll-up; stateless, so it composes per micro-batch
    * inside `foreachBatch` for streaming ingest scoring.
    */
  def scoreAgainst(docs: DataFrame, model: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val per = toks(docs, idCol, textCol)
      .join(broadcast(model), Seq("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("__nt"),
        TextStats.decAvg5(coalesce(col("lr"),
          lit(0).cast(DecimalType(18, 9))), count(lit(1))).as("__lr"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nt"), lit(0L)).as("n_tokens"),
        coalesce(col("__lr"), lit(0.0)).as("log_ratio"))
  }

  /** Per-document importance weights: (idCol, n_tokens, log_ratio),
    * one row per RAW document (zero-token docs surface with weight 0).
    * Equivalent to `scoreAgainst(raw, tokenLogRatios(raw, target))` —
    * the in-vocabulary case where the left join always hits.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreAgainst(raw, tokenLogRatios(raw, target, idCol, textCol),
      idCol, textCol)

  /** DSIR selection: the `k` raw documents chosen by deterministic
    * Gumbel top-k over the importance weights — sampling WITHOUT
    * replacement with inclusion probability increasing in the weight
    * (the Gumbel-max trick: argmax of weight + Gumbel noise is a
    * sample from the softmax), but with the noise derived from
    * md5(salt|id) so the selected set is a pure function of
    * (corpus, target, salt). Returns
    * (idCol, n_tokens, log_ratio, sample_key, rank), rank 1..k.
    *
    * The top-k plans as TakeOrderedAndProject (per-partition heaps,
    * no global sort); the final rank window runs over the k selected
    * rows only (config-bounded, the hybridRerank justification).
    */
  def dsirResample(raw: DataFrame, target: DataFrame, k: Int,
      salt: String = "dsir", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dsirResampleFrom(importanceWeights(raw, target, idCol, textCol),
      k, salt, idCol)

  /** [[dsirResample]] over a PRECOMPUTED [[importanceWeights]]
    * relation — so one weight pass serves both the audit report and
    * the selection (the [[Curation]] verdict-reuse pattern).
    */
  def dsirResampleFrom(weights: DataFrame, k: Int,
      salt: String = "dsir", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // uniform in (0, 1): +0.5 keeps ln(u) finite at the hash's 0 bin
    val u = (conv(substring(md5(concat_ws("|", lit(salt),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val gumbel = round(-log(-log(u)), 9)
    weights
      .withColumn("sample_key", round(col("log_ratio") + gumbel, 9))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("sample_key").desc, col(idCol))).cast("int"))
      .select(col(idCol), col("n_tokens"), col("log_ratio"),
        col("sample_key"), col("rank"))
  }
}
