package graft.profile

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exec.ResultSet
import graft.render.TsvRenderer

/** Two-table profile comparison — the reference's flagship `vimdiff`
  * workflow (/root/reference/aws-athena.sh:160-196): profile both
  * tables, render both as aligned text (`base_result.tsv` /
  * `target_result.tsv`, aws-athena.sh:194-195), and diff.
  *
  * The reference diffs *textually* (interactive vimdiff,
  * aws-athena.sh:196). We keep that rendered-text surface for fidelity
  * AND add what the text diff only approximates: a structured per-cell
  * comparison, as a relational full-outer join of the two long-form
  * profiles on (column_name, agg_type) — an engine-side improvement
  * the survey calls out (SURVEY.md §2.3). The join inputs are 8×N-row
  * aggregates, so the join is trivially broadcastable at any data
  * scale.
  */
object TableDiff {

  /** A profile failure attributed to one side of the diff, with the
    * reference's exact per-table message (aws-athena.sh:183-190 —
    * "second argument" = base table, "third argument" = target).
    */
  final class TableDiffException(val argumentOrdinal: String,
      val table: String, cause: Throwable)
    extends RuntimeException(
      s"Failed on the table provided as the $argumentOrdinal argument.", cause)

  /** Builds one side's long profile, wrapping any failure (missing
    * table, no numeric columns, malformed name) with the side's
    * attribution. The reference detects failure at query execution;
    * here Spark's analysis surfaces the same classes of error at plan
    * construction — same observable attribution, earlier.
    */
  private def profileSide(spark: SparkSession, table: String,
      ordinal: String): DataFrame =
    try TableProfiler.profileLong(graft.catalog.Tables.table(spark, table))
    catch { case e: Exception => throw new TableDiffException(ordinal, table, e) }

  /** Structured diff: one row per (column_name, agg_type) in either
    * profile, with both values and an equality verdict. NULL-vs-NULL
    * is equal (<=> semantics). Fails fast on the base (second
    * argument) before touching the target (third), like the
    * reference's early exit.
    */
  def diff(spark: SparkSession, baseTable: String, targetTable: String): DataFrame =
    diffFrom(profileSide(spark, baseTable, "second"),
      profileSide(spark, targetTable, "third"))

  /** [[diff]] over two PRECOMPUTED long profiles — the reference's
    * actual workflow shape (profile both tables, THEN diff the
    * results, aws-athena.sh:183-196): a pipeline that has already
    * materialized the per-table profiles diffs them here without
    * re-profiling. Inputs are `(column_name, agg_type, result)`
    * relations ([[TableProfiler.profileLong]]'s shape).
    */
  def diffFrom(baseLong: DataFrame, targetLong: DataFrame): DataFrame = {
    val base = baseLong.withColumnRenamed("result", "base_result")
    val target = targetLong.withColumnRenamed("result", "target_result")
    base.join(target, Seq("column_name", "agg_type"), "full_outer")
      .withColumn("equal", col("base_result") <=> col("target_result"))
      .orderBy("column_name", "agg_type")
  }

  /** Only the differing cells (empty ⇔ profiles identical). */
  def differences(spark: SparkSession, baseTable: String, targetTable: String): DataFrame =
    diff(spark, baseTable, targetTable).filter(!col("equal"))

  /** The reference's file outputs: two aligned-text profile renders
    * (aws-athena.sh:194-195). Returns (basePath, targetPath); outDir
    * stands in for the reference's CWD.
    */
  def renderPair(spark: SparkSession, baseTable: String, targetTable: String,
      outDir: String): (Path, Path) = {
    Files.createDirectories(Paths.get(outDir))
    def write(table: String, file: String, ordinal: String): Path = {
      val profiled =
        try TableProfiler.profileTable(spark, table)
        catch { case e: Exception => throw new TableDiffException(ordinal, table, e) }
      val text = TsvRenderer.aligned(ResultSet.fromDataFrame(profiled))
      val p = Paths.get(outDir, file)
      Files.writeString(p, text + "\n")
      p
    }
    // base fully renders (and fails) before the target — the
    // reference's sequential get_query_results ordering
    (write(baseTable, "base_result.tsv", "second"),
      write(targetTable, "target_result.tsv", "third"))
  }
}
