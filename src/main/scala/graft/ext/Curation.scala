package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation decision — the operator that turns the
  * pipeline's signals (near-dup clustering, per-document quality
  * metrics) into the keep/drop verdict a training run consumes
  * (SURVEY.md §7.5). One row per document with an auditable
  * `reject_reason`, because a curation pipeline that only emits the
  * kept rows can't answer "why did we drop 40% of source X".
  *
  * Rejection rules, in PRIORITY order (first match wins — a document
  * that is both a near-dup and too short reports `near_duplicate`):
  *
  *  1. `near_duplicate` — not the canonical survivor of its MinHash
  *     near-dup cluster ([[Dedup.nearDupClusters]]: survivor = min doc
  *     id of the connected component).
  *  2. `too_short`     — fewer than `minTokens` whitespace tokens.
  *  3. `low_quality`   — quality_score below `minQuality`
  *     ([[TextStats.withDocStats]]'s Gopher-style blend).
  *
  * == Scale ==
  * The quality signals are map-only projections; the dedup signal is
  * the MinHash+LSH pipeline (near-linear, see Dedup); the final join
  * is id-keyed equi — every piece is the 100 TB shape already graded
  * on its own query, composed. No new shuffle kinds appear here.
  */
object Curation {

  /** Flagship-query thresholds — shared with the DuckDB oracle twin
    * (OraclesExt.curate) so the two engines cannot drift.
    */
  val DefaultMinTokens: Long = 40L
  val DefaultMinQuality: Double = 0.55

  def curate(df: DataFrame, minTokens: Long, minQuality: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val stats = TextStats.withDocStats(df, textCol)
      .select(col(idCol), col("n_tokens"), col("quality_score"))
    val clusters = Dedup.nearDupClusters(df, idCol = idCol, textCol = textCol)
      .select(col(idCol), col("is_survivor"))
    val reason =
      when(!col("is_survivor"), lit("near_duplicate"))
        .when(col("n_tokens") < minTokens, lit("too_short"))
        .when(col("quality_score") < minQuality, lit("low_quality"))
    stats.join(clusters, idCol)
      .select(col(idCol), col("n_tokens"), col("quality_score"),
        reason.isNull.as("keep"), reason.as("reject_reason"))
  }
}
