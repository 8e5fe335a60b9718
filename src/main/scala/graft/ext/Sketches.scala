package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollups — the 100 TB pattern behind "distinct
  * users per anything, instantly": materialize a small HLL sketch per
  * fine-grained group ONCE (one scan of the raw events), then answer
  * any coarser distinct-count rollup by merging sketches — no second
  * scan of the raw data, ever. Spark's Datasketches-backed
  * `hll_sketch_agg` / `hll_union_agg` are associative and
  * merge-order-independent (register-wise max), so re-aggregation is
  * exact over the sketch (the estimate itself is ±~2% at the default
  * lgConfigK).
  *
  * Verification: approximate by construction, so no DuckDB twin —
  * ExtSpec pins the estimate against the exact distinct count within
  * the sketch's error envelope, and asserts merged-daily ≡
  * straight-from-raw sketches (the mergeability contract).
  */
object Sketches {

  /** One row per (key, day): an HLL sketch of the distinct users plus
    * the exact event count — the materialization a pipeline would
    * write to parquet (the sketch is a binary column) once per
    * ingestion day.
    */
  def dailyUserSketches(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", userCol: String = "user_id"): DataFrame =
    events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(userCol)).as("user_sketch"),
        count(lit(1)).as("n_events"))

  /** Any-granularity rollup from the materialized sketches: merge the
    * per-day sketches per key and estimate — touches sketch rows
    * only, never the raw events.
    */
  def rollupDistinctUsers(daily: DataFrame,
      keyCol: String = "event_type"): DataFrame =
    daily.groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch")))
        .as("approx_distinct_users"),
        sum("n_events").as("n_events"))

  /** Per-day mergeable VALUE-COUNT relations — the exact counterpart
    * to [[dailyUserSketches]]: where HLL registers merge with bounded
    * error, value counts merge by ADDITION with none. One map-side-
    * combined shuffle keyed by (type, day, value); the relation's
    * size is Σ per-day distinct values, the materialization a
    * warehouse keeps per ingest batch.
    */
  def dailyValueCounts(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame =
    events.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
          .as("day_num"),
        col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))

  /** EXACT quantiles at any coarser granularity from the daily
    * value-count relations — no raw-event rescan and no sketch
    * error: counts merge by addition, so the weekly (or monthly,
    * or all-time) quantiles computed from merged counts are exactly
    * the quantiles of the combined raw data
    * (Quantiles.groupQuantilesFromCounts; ExtSpec asserts rollup ≡
    * direct). This is what percentile sketches are usually accepted
    * for — here the mergeable summary is exact.
    */
  def rollupQuantiles(daily: DataFrame, ps: Seq[(String, Double)],
      keyCol: String = "event_type", daysPerBucket: Long = 7L): DataFrame =
    Quantiles.groupQuantilesFromCounts(
      daily.withColumn("bucket_num",
        floor(col("day_num") / daysPerBucket).cast("long")),
      Seq(keyCol, "bucket_num"), "v", "cnt", ps)
}
