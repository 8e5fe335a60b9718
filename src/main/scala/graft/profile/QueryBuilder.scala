package graft.profile

/** Re-implementation of the reference's `query_builder` SQL codegen
  * (/root/reference/aws-athena.sh:64-125, its largest unit of logic):
  * given a table's numeric columns, emit the Trino-dialect profiling
  * query — per column, 8 scalar-subquery statistics labeled
  * `1. count` … `8. sum` (aws-athena.sh:81-100), UNION ALL'd into a
  * long (column_name, agg_type, result) relation (aws-athena.sh:
  * 73-110), pivoted wide with `map_agg` + `kv['col']` subscripts
  * (aws-athena.sh:112-122), ordered by agg_type.
  *
  * The emitted text is what the reference would send to its engine;
  * run it through [[graft.exec.TrinoDialect.translate]] +
  * [[graft.exec.QueryManager]] for end-to-end parity (the native
  * [[TableProfiler]] produces the same relation from 2 scans instead
  * of this query's 8×N scalar subqueries — SURVEY.md §4).
  */
object QueryBuilder {

  /** The 8 statistics exactly as the reference generates them —
    * note `approx_percentile` for the median (aws-athena.sh:96) and
    * double-quoted identifiers throughout (aws-athena.sh:81).
    */
  val statExprs: Seq[(String, String => String)] = Seq(
    "1. count" -> (c => s"""count("$c")"""),
    "2. count_distinct" -> (c => s"""count(distinct "$c")"""),
    "3. mean" -> (c => s"""round(avg("$c"), 5)"""),
    "4. std" -> (c => s"""round(stddev("$c"), 5)"""),
    "5. min" -> (c => s"""round(min("$c"), 5)"""),
    "6. median" -> (c => s"""round(approx_percentile("$c", 0.5), 5)"""),
    "7. max" -> (c => s"""round(max("$c"), 5)"""),
    "8. sum" -> (c => s"""round(sum("$c"), 5)"""))

  /** The long-form UNION ALL relation: one scalar-subquery SELECT per
    * (column, statistic) — 8×N branches, first branch without the
    * `union all` prefix (aws-athena.sh:80-110).
    */
  def longSql(qualifiedTable: String, numericCols: Seq[String]): String = {
    val branches = for {
      c <- numericCols
      (label, expr) <- statExprs
    } yield s"select '$c' as column_name, '$label' as agg_type, " +
      s"(select ${expr(c)} from $qualifiedTable) as result"
    branches.mkString("\n    union all\n    ")
  }

  /** The full generated profile query: long relation → `map_agg`
    * pivot keyed by agg_type → `kv['col']` wide projection →
    * `order by agg_type` (aws-athena.sh:112-122).
    */
  def profileSql(qualifiedTable: String, numericCols: Seq[String]): String = {
    val kvCols = numericCols
      .map(c => s"""kv['$c'] as "$c"""").mkString(", ")
    s"""select agg_type, $kvCols
       |from (
       |  select agg_type, map_agg(column_name, result) as kv
       |  from (
       |    ${longSql(qualifiedTable, numericCols)}
       |  )
       |  group by agg_type
       |)
       |order by agg_type""".stripMargin
  }
}
