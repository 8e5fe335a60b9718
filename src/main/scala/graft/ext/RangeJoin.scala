package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-lookup join: attach to each fact row the dimension band
  * whose `[lo, hi)` interval contains its value — the IP→geo /
  * value→tier lookup shape. Spark plans a raw
  * `value >= lo AND value < hi` join as BroadcastNestedLoopJoin:
  * every fact row tests every band, O(|facts|·|bands|), and with a
  * non-broadcastable dimension it degenerates to a cartesian product.
  *
  * The scale shape is bucket expansion: pick a bucket width, explode
  * each band into the integer buckets its interval overlaps (a band
  * spanning w buckets becomes w rows — bounded, dimension-sized
  * blow-up), bucket the fact side by `floor(value / width)` (map-only,
  * one expression), and EQUI-join on the bucket before re-checking
  * the exact range. The nested loop becomes a hash join whose probe
  * work is O(|facts| · bands-per-bucket).
  *
  * Bands must not overlap if the caller expects one output row per
  * fact row (standard lookup contract; overlapping bands emit one row
  * per match, which is the correct relational semantics).
  */
object RangeJoin {

  /** Interval-OVERLAP join of two half-open interval relations on
    * integer coordinates: one output row per (left, right) pair with
    * `[lLo, lHi) ∩ [rLo, rHi) ≠ ∅`. The general form of [[bucketed]]
    * (a point is a width-1 interval): both sides expand into the
    * integer buckets they overlap, the equi-join runs on the bucket,
    * and each qualifying pair is emitted EXACTLY ONCE — from the
    * canonical bucket holding the overlap's start, `greatest(lLo,
    * rLo) div width`, a bucket both intervals necessarily occupy — so
    * no distinct pass is needed after the join.
    *
    * Coordinates are integral AND non-negative (µs, days, byte
    * offsets) and all bucket arithmetic is integer `div` — exact past
    * 2⁵³ where double division is not. (Non-negative matters: SQL
    * `div` truncates toward zero, so a negative `lo` could bucket one
    * step off its floor and miss the canonical emission — shift
    * negative domains before joining.) Expansion is
    * interval-length/width rows per input row; pick `width` near the
    * typical interval length so both blow-up and per-bucket candidate
    * lists stay small.
    */
  def intervalOverlapBucketed(left: DataFrame, right: DataFrame,
      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
      width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    def expand(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bucket", explode(sequence(
        expr(s"`$lo` div $width"),
        // hi exclusive ⇒ the last occupied bucket is (hi−1) div width
        expr(s"(`$hi` - 1) div $width"))))
    expand(left, lLoCol, lHiCol)
      .join(expand(right, rLoCol, rHiCol), Seq("__bucket"))
      .where(col(lLoCol) < col(rHiCol) && col(rLoCol) < col(lHiCol))
      .where(col("__bucket") ===
        expr(s"greatest(`$lLoCol`, `$rLoCol`) div $width"))
      .drop("__bucket")
  }

  /** Inner range join of `facts.valueCol` into `bands[loCol, hiCol)`.
    * `bucketWidth` trades dimension blow-up (small width ⇒ more
    * expanded rows) against probe selectivity (large width ⇒ more
    * false candidates filtered by the exact predicate).
    */
  def bucketed(facts: DataFrame, bands: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val expanded = bands
      .withColumn("__bucket",
        explode(sequence(
          floor(col(loCol) / bucketWidth).cast("long"),
          // hi is exclusive, but a band ending exactly on a bucket
          // boundary still overlaps that boundary's bucket start
          floor(col(hiCol) / bucketWidth).cast("long"))))
    val bucketedFacts = facts
      .withColumn("__bucket", floor(col(valueCol) / bucketWidth).cast("long"))
    bucketedFacts
      .join(expanded, Seq("__bucket"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
