package graft.exec

/** Minimal Trino→Spark SQL dialect shim for the reference's own query
  * shapes (SURVEY.md §7.6 item 5). The reference emits Trino-dialect
  * SQL (/root/reference/aws-athena.sh:73-122) whose only
  * Spark-incompatible constructs are:
  *
  *  - double-quoted identifiers (`count("col")`, aws-athena.sh:81) —
  *    Spark quotes identifiers with backticks;
  *  - `map_agg(k, v)` (aws-athena.sh:120) — Spark spells it
  *    `map_from_entries(collect_list(struct(k, v)))`.
  *
  * Everything else the reference generates (scalar subqueries,
  * UNION ALL, round/count/avg/stddev/min/max/sum, approx_percentile,
  * map subscript `kv['c']`, GROUP BY / ORDER BY) parses natively.
  * This is a scoped text shim for those shapes, not a general Trino
  * frontend; arbitrary Trino SQL beyond them is out of scope
  * (documented dialect delta).
  */
object TrinoDialect {

  /** Replace double-quoted identifiers with backtick-quoted ones,
    * leaving single-quoted string literals (with `''` escapes)
    * untouched.
    */
  def quoteIdentifiers(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    var inString = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inString) {
        out.append(c)
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            out.append('\''); i += 1 // escaped quote stays inside the string
          } else inString = false
        }
      } else c match {
        case '\'' => inString = true; out.append(c)
        case '"' => out.append('`')
        case _ => out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Rewrite every `map_agg(<args>)` call to
    * `map_from_entries(collect_list(struct(<args>)))`, with a
    * quote-aware balanced-paren scan (arguments may contain nested
    * calls and string literals).
    */
  def rewriteMapAgg(sql: String): String = {
    val lower = sql.toLowerCase
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val at = lower.indexOf("map_agg", i)
      val isCall = at >= 0 &&
        (at == 0 || !Character.isLetterOrDigit(sql.charAt(at - 1)) && sql.charAt(at - 1) != '_') && {
          var j = at + "map_agg".length
          while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
          j < sql.length && sql.charAt(j) == '('
        }
      if (at < 0) {
        out.append(sql.substring(i)); i = sql.length
      } else if (!isCall) {
        out.append(sql.substring(i, at + "map_agg".length))
        i = at + "map_agg".length
      } else {
        out.append(sql.substring(i, at))
        var j = sql.indexOf('(', at) // start of the argument list
        var depth = 0
        var inString = false
        var end = -1
        while (end < 0 && j < sql.length) {
          val c = sql.charAt(j)
          if (inString) {
            if (c == '\'') {
              if (j + 1 < sql.length && sql.charAt(j + 1) == '\'') j += 1
              else inString = false
            }
          } else c match {
            case '\'' => inString = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        require(end > 0, s"unbalanced parentheses in map_agg call at offset $at")
        val args = sql.substring(sql.indexOf('(', at) + 1, end)
        out.append(s"map_from_entries(collect_list(struct($args)))")
        i = end + 1
      }
    }
    out.toString
  }

  /** Resolve `catalog.schema.table` names in the engine's default
    * namespace to bare view names — the SQL-text twin of
    * Tables.table's programmatic resolution (the engine's tables are
    * session views, which Spark SQL can only address by bare name).
    * Names in other namespaces are left for Spark to reject, matching
    * Tables.table's validation.
    */
  def resolveDefaultNamespace(sql: String,
      catalog: String = graft.catalog.Tables.DefaultCatalog,
      schema: String = graft.catalog.Tables.DefaultSchema): String =
    sql.replaceAll(
      s"\\b${java.util.regex.Pattern.quote(catalog)}\\.${java.util.regex.Pattern.quote(schema)}\\.([A-Za-z_][A-Za-z0-9_]*)",
      "$1")

  /** Full translation for the reference's generated query shapes. */
  def translate(sql: String): String =
    resolveDefaultNamespace(rewriteMapAgg(quoteIdentifiers(sql)))
}
