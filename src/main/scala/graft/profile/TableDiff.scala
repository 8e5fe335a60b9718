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

  /** Structured diff: one row per (column_name, agg_type) in either
    * profile, with both values and an equality verdict. NULL-vs-NULL
    * is equal (<=> semantics).
    */
  def diff(spark: SparkSession, baseTable: String, targetTable: String): DataFrame = {
    val base = TableProfiler.profileLong(graft.catalog.Tables.table(spark, baseTable))
      .withColumnRenamed("result", "base_result")
    val target = TableProfiler.profileLong(graft.catalog.Tables.table(spark, targetTable))
      .withColumnRenamed("result", "target_result")
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
    def write(table: String, file: String): Path = {
      val profiled = TableProfiler.profileTable(spark, table)
      val text = TsvRenderer.aligned(ResultSet.fromDataFrame(profiled))
      val p = Paths.get(outDir, file)
      Files.writeString(p, text + "\n")
      p
    }
    (write(baseTable, "base_result.tsv"), write(targetTable, "target_result.tsv"))
  }
}
