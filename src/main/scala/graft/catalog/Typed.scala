package graft.catalog

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row model for the documents table — one case class per
  * catalog table where row-level type safety pays for itself.
  */
case class Document(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    n_chars: Long)

/** The typed (`Dataset[T]`) face of the catalog — where case-class
  * Encoders genuinely help, and nothing more.
  *
  * The division of labor this module encodes:
  *
  *  - **I/O boundaries are typed.** `as[Document]` makes the analyzer
  *    check the parquet schema against the case class at plan time —
  *    a renamed or re-typed column fails the READ, not a downstream
  *    expression three operators later.
  *  - **Predicates and projections stay relational**, even on a
  *    `Dataset[T]`: `ds.filter(col("n_chars") >= n)` keeps the static
  *    type AND reaches the scan as a PushedFilter. A typed lambda
  *    (`ds.filter(_.n_chars >= n)`) is an opaque black box to
  *    Catalyst — no pushdown, no pruning, full deserialization per
  *    row — which is why the engine's operators are DataFrame-first
  *    (SURVEY.md §4).
  *  - **Typed lambdas are reserved for true object logic** —
  *    arbitrary row-vs-row reduction that has no Column form.
  *    `groupByKey(...).reduceGroups(...)` still aggregates map-side
  *    (ReduceAggregator merges partial winners per partition), so the
  *    shuffle carries one candidate per (partition, key), never the
  *    corpus.
  */
object Typed {

  /** The documents table as a typed Dataset — schema validated
    * against [[Document]] at analysis time.
    */
  def documents(spark: SparkSession, sfDir: String): Dataset[Document] = {
    Tables.register(spark, sfDir)
    import spark.implicits._
    spark.table("documents").as[Document]
  }

  /** Column-expression filter on a typed Dataset: static row type
    * preserved, predicate pushed to the scan (asserted in spec).
    */
  def atLeastChars(ds: Dataset[Document], minChars: Long): Dataset[Document] =
    ds.filter(col("n_chars") >= minChars)

  /** The longest document of each source — object-level argmax, the
    * kind of row-vs-row logic with no Column encoding. Ties break on
    * doc_id so the winner is deterministic under any partitioning.
    */
  def longestPerSource(ds: Dataset[Document]): Dataset[(String, Document)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.source).reduceGroups { (a, b) =>
      if (a.n_chars > b.n_chars || (a.n_chars == b.n_chars && a.doc_id < b.doc_id)) a
      else b
    }
  }
}
