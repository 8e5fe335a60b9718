package graft.catalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `information_schema.columns` — metadata as a queryable table.
  *
  * The reference treats the catalog itself as a relation: the profiler
  * starts from
  * `SELECT * FROM catalog.information_schema.columns WHERE
  *  table_catalog = ... AND table_schema = ... AND table_name = ...`
  * (/root/reference/aws-athena.sh:175-176) and consumes the result
  * positionally — $1=catalog, $2=schema, $3=table, $4=column_name,
  * $8=data_type (aws-athena.sh:68,81,117) — so the 8-column layout and
  * ordering below are a hard contract. A query for a nonexistent table
  * must succeed with zero rows (aws-athena.sh:174).
  *
  * Spark has no built-in information_schema; this builds one from the
  * session catalog. It is pure metadata (a handful of rows per table),
  * so driver-side construction is correct at any data scale.
  */
object InfoSchema {

  val ViewName = "information_schema_columns"

  val schema: StructType = StructType(Seq(
    StructField("table_catalog", StringType, nullable = false),
    StructField("table_schema", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("ordinal_position", IntegerType, nullable = false),
    StructField("column_default", StringType, nullable = true),
    StructField("is_nullable", StringType, nullable = false),
    StructField("data_type", StringType, nullable = false)))

  /** Metadata rows for one table (empty if the table is unknown —
    * mirrors aws-athena.sh:174's succeed-empty behavior).
    */
  def rowsFor(spark: SparkSession, table: String): Seq[Row] = {
    // Only "table or view not found" maps to succeed-empty; genuine
    // errors (corrupt files, IO failures) must propagate.
    val fields: Seq[StructField] =
      try spark.table(table).schema.fields.toSeq
      catch { case _: org.apache.spark.sql.AnalysisException => Seq.empty }
    fields.zipWithIndex.map { case (f, i) =>
      Row(Tables.DefaultCatalog, Tables.DefaultSchema, table, f.name,
        i + 1, null, if (f.nullable) "YES" else "NO", TrinoTypes.name(f.dataType))
    }
  }

  /** The full information_schema.columns relation for a set of tables. */
  def columns(spark: SparkSession, tables: Seq[String]): DataFrame = {
    val rows = tables.flatMap(t => rowsFor(spark, t))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Filtered exactly like the reference's WHERE clause
    * (aws-athena.sh:175-176).
    */
  def columnsOf(spark: SparkSession, catalog: String, db: String,
      table: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    columns(spark, Seq(table))
      .filter(col("table_catalog") === catalog &&
        col("table_schema") === db && col("table_name") === table)
  }

  def register(spark: SparkSession, tables: Seq[String]): Unit =
    columns(spark, tables).createOrReplaceTempView(ViewName)
}
