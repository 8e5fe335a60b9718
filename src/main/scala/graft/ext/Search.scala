package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Keyword relevance search over the corpus — pipeline extension
  * (SURVEY.md §7.5): the "find the documents about X" exploration /
  * filtered-subset step of corpus curation, scored with BM25
  * (Robertson/Spärck Jones; the `+1`-smoothed idf variant used by
  * Lucene).
  *
  * Scale shape: the token stream is filtered to the query's terms
  * BEFORE any aggregation (a handful of terms ⇒ the tf relation is
  * |docs|·|terms| at most, usually far less), document frequencies
  * and idf weights are a ≤|terms|-row broadcast, document lengths are
  * a map-side projection, and the corpus constants (N, exact-decimal
  * average length) are one tiny aggregate broadcast into the scoring
  * projection. Top-k plans as TakeOrderedAndProject — per-partition
  * heaps, never a full sort of the match set.
  *
  * Determinism: per-term scores are fixed IEEE expression trees
  * (idf is rounded to 5 decimals at the term level), quantized to
  * `decimal(18,9)` and summed EXACTLY per doc — so the final
  * 5-decimal score can never depend on partitioning or merge order.
  * The DuckDB twin interpolates the identical double constants
  * (Scala's `Double.toString` round-trips, DuckDB parses to the same
  * nearest double).
  */
object Search {

  /** Top-k docs for a bag-of-terms query: (idCol, n_terms_matched,
    * score), score desc / id asc, BM25 with parameters k1, b.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "query must have at least one term")
    val staged = Dedup.spread(docs, textCol)
      .withColumn("__toks", TextStats.tokens(col(textCol)))
    val lens = staged.select(col(idCol),
      size(col("__toks")).cast("long").as("__len"))
    // corpus constants: N docs and the exact-decimal mean length
    val consts = lens.agg(
      count(lit(1)).as("__n"),
      (sum(col("__len").cast(DecimalType(18, 6))).cast("double") /
        count(lit(1))).as("__avglen"))
    val tf = staged
      .select(col(idCol), explode_outer(col("__toks")).as("token"))
      .filter(col("token").isNotNull)
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("__tf"))
    // document frequency → Lucene-style smoothed idf, one row per
    // query term; rounded at 5 decimals so a 1-ulp libm `ln`
    // difference between engines cannot reach the summed score
    val idf = tf.groupBy("token").agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(consts))
      .select(col("token"), round(log(
        (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))
          + lit(1.0)), 5).as("__idf"))
    val termScore =
      col("__idf") * (col("__tf").cast("double") * lit(k1 + 1)) /
        (col("__tf").cast("double") +
          lit(k1) * (lit(1 - b) + lit(b) *
            (col("__len").cast("double") / col("__avglen"))))
    // exact-integer HALF-AWAY rounding of the 9-decimal-quantized sum
    // (see TextStats.decAvg5: a double `round` can flip on the exact
    // .5×10⁻⁵ ties that quantized sums land on)
    val su = (sum(col("__s")) * lit(1000000000L)).cast("long")
    val score5 = when(su < 0, lit(-1.0)).otherwise(lit(1.0)) *
      floor((abs(su) * 2 + 10000).cast("double") / 20000.0) / lit(100000.0)
    tf.join(broadcast(idf), "token")
      .join(lens, idCol)
      .crossJoin(broadcast(consts))
      .withColumn("__s", termScore.cast(DecimalType(18, 9)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_matched"), score5.as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
