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
}
