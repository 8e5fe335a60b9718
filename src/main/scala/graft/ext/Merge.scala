package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-INTO semantics over immutable snapshots — the table-
  * maintenance operator every warehouse pipeline needs: apply a
  * change set (upserts + deletes) to a base snapshot, producing the
  * next snapshot. Spark has no built-in MERGE against plain parquet
  * (that lives in table formats like Delta/Iceberg); this is the
  * engine-side equivalent expressed as relational algebra, so it runs
  * on any DataFrame.
  *
  * Semantics (keyed by `keyCol`, which must be unique in BOTH
  * inputs):
  *   - base rows whose key appears in the change set are REPLACED
  *     (op = upsert) or REMOVED (op = delete)
  *   - change rows with op = upsert and a new key are INSERTED
  *
  * Plan: ONE anti-join of base against change keys (Catalyst
  * broadcasts the key set when it fits — the common case: a day's
  * changes vs a 100 TB snapshot; otherwise a key-partitioned shuffle
  * the snapshot rewrite needs anyway), then a shuffle-free UNION with
  * the upsert rows. No window functions, no driver-side state.
  */
object Merge {

  val OpCol = "op"
  val Upsert = "upsert"
  val Delete = "delete"

  /** Apply `changes` (payload columns ∪ {op}) to `base` (payload
    * columns). Output schema = base's.
    */
  def applyChangeSet(base: DataFrame, changes: DataFrame,
      keyCol: String): DataFrame = {
    val survivors = base.join(
      changes.select(col(keyCol)), Seq(keyCol), "left_anti")
    val upserts = changes.where(col(OpCol) === Upsert).drop(OpCol)
    survivors.unionByName(upserts)
  }

  /** Row-level snapshot diff — [[applyChangeSet]]'s inverse: given two
    * snapshots of a keyed table, report every key as `added` /
    * `removed` / `changed` (unchanged rows are omitted — at 100 TB the
    * diff is the small output, the snapshots are the big inputs). The
    * engine-side generalization of the reference's table-diff
    * workflow (/root/reference/aws-athena.sh:175-196 diffs PROFILES;
    * this diffs the rows themselves).
    *
    * Plan: each side collapses to (key, digest of the compare
    * columns) — map-only projections — then ONE full-outer shuffle
    * join on the key. Change detection compares the digests, so wide
    * payloads never travel through the join. The digest is INJECTIVE
    * over the column tuple (modulo md5 collisions): each column is
    * md5'd individually — fixed 32-hex-char tokens, so concatenation
    * can never re-segment across column boundaries (a separator-based
    * scheme is stuffable by values CONTAINING the separator) — and a
    * NULL column contributes the literal token "N", which no md5
    * output can equal: null ≠ any string ≠ absent row, for arbitrary
    * byte content.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCol: String, compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    def digested(df: DataFrame) = df.select(
      col(keyCol),
      md5(concat_ws("",
        compareCols.map(c => coalesce(md5(col(c).cast("string")),
          lit("N"))): _*)).as("__h"))
    val o = digested(oldSnap).withColumnRenamed("__h", "__ho")
    val n = digested(newSnap).withColumnRenamed("__h", "__hn")
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") =!= col("__hn"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col(keyCol), col("status"))
  }

  /** Incremental maintenance of a grouped (count, sum) materialized
    * view under a change set — the IVM counterpart of
    * [[applyChangeSet]]: instead of re-aggregating the post-merge
    * snapshot, the view is updated by DELTA algebra
    * (retract the old row of every changed key from its group, add
    * every upsert row to its — possibly different — group), so the
    * base relation is touched only by one key equi-join that fetches
    * the retracted rows. Returns the maintained view
    * (groupCol, n_rows, sum_value), group order, empty groups
    * dropped — row-for-row what a full re-aggregation of
    * applyChangeSet(base, changes) produces (the oracle recomputes
    * it that way, so the delta algebra itself is hash-checked).
    *
    * Determinism: counts are exact longs; the value sum accumulates
    * in exact DECIMAL(18,6) on both the view and the delta side
    * (retractions enter as exact negations), rendered once.
    *
    * Scale shape: the change-key join against base broadcasts the
    * key set when it fits (a day's changes vs a 100 TB base — the
    * applyChangeSet posture); the delta aggregate is
    * map-side-combined and group-sized; the final full-outer merge
    * joins two GROUP-CARDINALITY relations. In production the
    * grouped view is the stored relation and the one base scan here
    * is its initial materialization; each subsequent change set costs
    * only the key join + group-sized merge, never a re-scan.
    */
  def incrementalAgg(base: DataFrame, changes: DataFrame,
      keyCol: String, groupCol: String, valueCol: String): DataFrame =
    renderAggView(applyDeltaToView(
      aggViewExact(base, groupCol, valueCol), base, changes,
      keyCol, groupCol, valueCol), groupCol)

  // -- the delta algebra as separable pieces, so a streaming
  //    maintainer (EventStream.maintainAggView) can fold micro-batch
  //    deltas into a STORED exact view instead of re-deriving it from
  //    base each time. The accumulator is (__n long, __s
  //    decimal(28,6)) — the exact sum type of the base aggregation,
  //    re-pinned after every merge so the stored schema is stable
  //    across batches; decimal addition is exact and associative, so
  //    ANY batch split folds to the identical view.
  private val AccDec = org.apache.spark.sql.types.DecimalType(28, 6)

  /** Exact accumulator view of `base`: (groupCol, __n, __s). */
  private[graft] def aggViewExact(base: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast(dec)).cast(AccDec).as("__s"))
  }

  /** One delta step: retract every changed key's old row from its
    * group (fetched from `base` by ONE key equi-join — broadcast when
    * the change-key set fits), add every upsert row to its group,
    * merge into the view. Groups emptied to zero rows drop out.
    */
  private[graft] def applyDeltaToView(view: DataFrame, base: DataFrame,
      changes: DataFrame, keyCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val zero = lit(0).cast(AccDec)
    val retractions = base
      .join(changes.select(col(keyCol)).distinct(), Seq(keyCol))
      .select(col(groupCol), lit(-1L).as("__dn"),
        (-col(valueCol).cast(dec)).as("__dv"))
    val additions = changes.where(col(OpCol) === Upsert)
      .select(col(groupCol), lit(1L).as("__dn"),
        col(valueCol).cast(dec).as("__dv"))
    val delta = retractions.unionByName(additions)
      .groupBy(col(groupCol))
      .agg(sum(col("__dn")).as("__dn"),
        sum(col("__dv")).cast(AccDec).as("__dv"))
    view.join(delta, Seq(groupCol), "full")
      .select(col(groupCol),
        (coalesce(col("__n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("__n"),
        (coalesce(col("__s"), zero) + coalesce(col("__dv"), zero))
          .cast(AccDec).as("__s"))
      .filter(col("__n") > 0)
  }

  /** Render an accumulator view as the public (groupCol, n_rows,
    * sum_value) relation, group order.
    */
  private[graft] def renderAggView(view: DataFrame,
      groupCol: String): DataFrame =
    view.select(col(groupCol), col("__n").as("n_rows"),
        round(col("__s").cast("double"), 5).as("sum_value"))
      .orderBy(groupCol)
}
