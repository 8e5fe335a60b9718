package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checks — the validation report a pipeline
  * runs before admitting a batch (training-data extension, SURVEY.md
  * §7.5; the reference has no validation surface). Modeled on the
  * declarative check style of data-validation libraries: each
  * constraint yields one report row
  * `(check_name, total, violations, passed)`, so the report is both
  * machine-gateable (`passed` conjunction) and auditable (violation
  * counts, not just booleans).
  *
  * Constraint families:
  *  - [[NotNull]] / [[AcceptedValues]] / [[NumericBounds]] — row-local
  *    predicates. ALL of them fold into ONE aggregate over ONE scan
  *    (conditional-count expressions with map-side partials): adding
  *    a tenth row-local check costs zero extra passes.
  *  - [[UniqueKey]] — duplicate-key mass via one keyed group-by:
  *    violations = Σ (group size − 1); the shuffle carries one row
  *    per DISTINCT key (map-side combined), never the raw table.
  *  - [[ForeignKey]] — referential integrity via one left join
  *    against the parent's distinct keys: violations = child rows
  *    whose key finds no parent. An equi-join on the key — at scale
  *    it shuffles by key (or broadcasts a small parent); never a
  *    nested loop.
  *
  * Every count is an exact integer — the report is bit-identical on
  * any engine and any partitioning.
  */
object Checks {

  sealed trait Check { def name: String }

  /** `column` must never be null. */
  final case class NotNull(column: String) extends Check {
    def name = s"not_null($column)"
  }

  /** Non-null values of `column` must come from `values`. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Check {
    def name = s"accepted_values($column)"
  }

  /** Non-null numeric `column` must lie in [lo, hi]. */
  final case class NumericBounds(column: String, lo: Double, hi: Double)
      extends Check {
    def name = s"bounds($column)"
  }

  /** `columns` must be a key: no two rows share a value tuple. */
  final case class UniqueKey(columns: Seq[String]) extends Check {
    def name = s"unique(${columns.mkString(",")})"
  }

  /** Every child row's `columns` tuple must exist in
    * `parent(parentColumns)` (null keys count as violations — an
    * orphan is an orphan whether the key is missing or null).
    */
  final case class ForeignKey(columns: Seq[String], parent: DataFrame,
      parentColumns: Seq[String], parentName: String) extends Check {
    def name = s"fk(${columns.mkString(",")}->$parentName)"
  }

  /** The row-level "this row violates c" predicate — shared by the
    * batch [[report]] (conditional count) and the streaming-safe
    * [[withValidation]] (per-row flags).
    */
  private def violatedCond(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case AcceptedValues(col0, vs) =>
      col(col0).isNotNull && !col(col0).isin(vs.map(v => v: Any): _*)
    case NumericBounds(col0, lo, hi) =>
      col(col0).isNotNull &&
        (col(col0).cast("double") < lo || col(col0).cast("double") > hi)
    case _ => throw new IllegalArgumentException(s"not row-local: $c")
  }

  private def violations(c: Check): Column =
    sum(when(violatedCond(c), 1L).otherwise(0L))

  /** Per-row validation verdict: appends `failed_checks` (names of
    * every violated row-local check) and `valid`. Purely map-side —
    * no shuffle, no state — so it runs unchanged on a STREAMING
    * DataFrame: the canonical dead-letter split is
    * `v.filter(col("valid"))` to the main sink and
    * `v.filter(!col("valid"))` to the quarantine sink, each with the
    * full audit of which constraints the row broke. Only row-local
    * checks are accepted (uniqueness/FK need cross-row state — in a
    * stream that is a watermarked aggregation, a different operator).
    */
  def withValidation(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "withValidation needs at least one check")
    require(checks.forall {
      case _: NotNull | _: AcceptedValues | _: NumericBounds => true
      case _ => false
    }, "withValidation accepts only row-local checks")
    val flags = checks.map(c => when(violatedCond(c), lit(c.name)))
    df.withColumn("failed_checks",
        filter(array(flags: _*), x => x.isNotNull))
      .withColumn("valid", size(col("failed_checks")) === 0)
  }

  /** Run every check; one report row per check, sorted by name. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    val rowLocal = checks.filter {
      case _: NotNull | _: AcceptedValues | _: NumericBounds => true
      case _ => false
    }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowLocal.nonEmpty) {
      // one scan, one aggregate row, unpivoted to report rows
      val aggs = count(lit(1)).as("__total") +:
        rowLocal.zipWithIndex.map { case (c, i) => violations(c).as(s"__v$i") }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = rowLocal.zipWithIndex.flatMap { case (c, i) =>
        Seq(lit(c.name), col(s"__v$i"))
      }
      parts += one.select(
        stack(Seq(lit(rowLocal.size)) ++ stackArgs: _*)
          .as(Seq("check_name", "violations")),
        col("__total").as("total"))
        .select(col("check_name"), col("total"), col("violations"))
    }
    checks.foreach {
      case c @ UniqueKey(cols) =>
        parts += df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(
            coalesce(sum(col("__n")), lit(0L)).as("total"),
            coalesce(sum(when(col("__n") > 1, col("__n") - 1L)
              .otherwise(0L)), lit(0L)).as("violations"))
          .select(lit(c.name).as("check_name"), col("total"),
            col("violations"))
      case c @ ForeignKey(cols, parent, pCols, _) =>
        val pk = parent.select(pCols.map(col): _*).distinct()
          .toDF(cols.map("__p_" + _): _*)
        val cond = cols.map(k => col(k) === col(s"__p_$k")).reduce(_ && _)
        parts += df.select(cols.map(col): _*).join(pk, cond, "left")
          .agg(
            count(lit(1)).as("total"),
            sum(when(col(s"__p_${cols.head}").isNull, 1L).otherwise(0L))
              .as("violations"))
          .select(lit(c.name).as("check_name"), col("total"),
            col("violations"))
      case _ => ()
    }
    parts.reduce(_ union _)
      .select(col("check_name"), col("total"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        (coalesce(col("violations"), lit(0L)) === 0L).as("passed"))
      .orderBy("check_name")
  }
}
