package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{InfoSchema, Tables}
import graft.profile.TableProfiler

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * §7.5 extension); [[oracleSql]] carries its DuckDB twin, aliased
  * column-for-column (the driver sorts columns by name and
  * hash-compares values).
  */
object SparkEntry {

  /** lineitem schema fixture (FIXTURES.md) in Trino type names — used
    * only to author the VALUES-literal oracles for the metadata
    * queries; the Spark side reads the real catalog.
    */
  private val lineitemTypes: Seq[(String, String)] = Seq(
    "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
    "l_suppkey" -> "bigint", "l_linenumber" -> "integer",
    "l_quantity" -> "double", "l_extendedprice" -> "double",
    "l_discount" -> "double", "l_tax" -> "double",
    "l_returnflag" -> "varchar", "l_linestatus" -> "varchar",
    "l_shipdate" -> "timestamp(3)")

  private val lineitemNumeric = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private val ordersNumeric = Seq("o_orderkey", "o_custkey", "o_totalprice")

  /** TPC-H Q1-shaped pricing summary — ANSI SQL that parses identically
    * in Spark and DuckDB, exercising the `query`/`file` SQL-passthrough
    * surface (/root/reference/aws-athena.sh:140,155). Sums accumulate
    * in decimal for cross-engine determinism.
    */
  private val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(cast(sum(cast(l_quantity as decimal(18,6))) as double), 5) AS sum_qty,
      | round(cast(sum(cast(l_extendedprice as decimal(18,6))) as double), 5) AS sum_base_price,
      | round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 5) AS sum_disc_price,
      | round(cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(18,6))) as double), 5) AS sum_charge,
      | round(avg(l_quantity), 5) AS avg_qty,
      | round(avg(l_extendedprice), 5) AS avg_price,
      | round(avg(l_discount), 5) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue per nation — multi-way join exercise (joins are absent
    * from the reference's own code, SURVEY.md §2.3, but flow through
    * the SQL passthrough; Catalyst broadcasts the small dimensions).
    */
  private val revenueByNationSql: String =
    """SELECT n_name,
      | round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,6))) as double), 5) AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.register(spark, "/root/testdata/sf0.001")
    TableProfiler.profileTable(spark, "lineitem")
  }

  private def withTables(f: SparkSession => DataFrame): (SparkSession, String) => DataFrame =
    (spark, sfDir) => { Tables.register(spark, sfDir); f(spark) }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4/§3.2 — the flagship profiler, wide (pivoted) and long forms.
    "q_profile_lineitem" -> withTables { s =>
      TableProfiler.profileTable(s, "lineitem")
    },
    "q_profile_lineitem_long" -> withTables { s =>
      TableProfiler.profileLong(s.table("lineitem"))
        .orderBy("column_name", "agg_type")
    },
    "q_profile_orders" -> withTables { s =>
      TableProfiler.profileTable(s, "orders")
    },
    // §2.1/§1.1 — information_schema.columns scan with the reference's
    // conjunctive WHERE (aws-athena.sh:175-176).
    "q_infoschema_lineitem" -> withTables { s =>
      InfoSchema.columnsOf(s, "spark_catalog", "default", "lineitem")
        .orderBy("ordinal_position")
    },
    // §2.2 — numeric-type regex predicate (aws-athena.sh:68).
    "q_infoschema_numeric_filter" -> withTables { s =>
      InfoSchema.columnsOf(s, "spark_catalog", "default", "lineitem")
        .filter(col("data_type").rlike(graft.catalog.TrinoTypes.NumericTypeRegex))
        .orderBy("ordinal_position")
        .select("table_name", "column_name", "data_type")
    },
    // §3.1 — arbitrary-SQL passthrough (query/file commands).
    "q_pricing_summary" -> withTables { s => s.sql(pricingSummarySql) },
    "q_revenue_by_nation" -> withTables { s => s.sql(revenueByNationSql) })

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_profile_lineitem" -> Oracles.profilePivot("lineitem", lineitemNumeric),
    "q_profile_lineitem_long" -> Oracles.profileLong("lineitem", lineitemNumeric),
    "q_profile_orders" -> Oracles.profilePivot("orders", ordersNumeric),
    "q_infoschema_lineitem" -> Oracles.infoSchemaValues("lineitem", lineitemTypes),
    "q_infoschema_numeric_filter" -> Oracles.numericFilterValues("lineitem", lineitemTypes),
    "q_pricing_summary" -> pricingSummarySql,
    "q_revenue_by_nation" -> revenueByNationSql)
}
