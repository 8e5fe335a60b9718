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
  *
  * Beyond the reference's own shapes, the shim also rewrites the
  * hand-written Athena constructs a real user hits first:
  *  - `ARRAY[...]` literals → `array(...)` ([[rewriteArrayLiteral]]);
  *  - weighted `approx_percentile(x, w, p)` → `percentile(x, p, w)`
  *    ([[rewriteApproxPercentile]]);
  *  - single-array `UNNEST(a) AS t(c)` → `[LATERAL] explode`
  *    ([[rewriteUnnest]]).
  *
  * This is a scoped text shim, not a general Trino frontend. The
  * documented REMAINING unsupported list: multi-array UNNEST /
  * `WITH ORDINALITY` / `LEFT JOIN UNNEST ... ON TRUE`, Trino lambda
  * syntax (`x -> f(x)` differences are minor but untested), `TRY`/
  * `TRY_CAST` (Spark spells it `try_cast`), `at_timezone`, and row
  * constructors with field names.
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
    val lit = literalMask(sql)
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val at = lower.indexOf("map_agg", i)
      val isCall = at >= 0 && !lit(at) &&
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

  /** Index of the `)` closing the `(` at `open`, honoring nested
    * parens and string literals; -1 if unbalanced.
    */
  private def closingParen(sql: String, open: Int): Int = {
    var j = open; var depth = 0; var inString = false
    while (j < sql.length) {
      val c = sql.charAt(j)
      if (inString) {
        if (c == '\'') {
          if (j + 1 < sql.length && sql.charAt(j + 1) == '\'') j += 1
          else inString = false
        }
      } else c match {
        case '\'' => inString = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    -1
  }

  /** Split an argument list at top-level commas (quote / paren /
    * bracket aware).
    */
  private def splitTopLevel(args: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0; var depth = 0; var inString = false; var i = 0
    while (i < args.length) {
      val c = args.charAt(i)
      if (inString) {
        if (c == '\'') {
          if (i + 1 < args.length && args.charAt(i + 1) == '\'') i += 1
          else inString = false
        }
      } else c match {
        case '\'' => inString = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 => out += args.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += args.substring(start)
    out.result()
  }

  /** Per-character mask: true where the character sits inside a
    * single-quoted string literal (quotes included). Lets the
    * indexOf-driven rewrites skip matches that are DATA, not syntax —
    * the property suite feeds literals like 'UNNEST(a)' that must
    * survive byte-for-byte.
    */
  private def literalMask(sql: String): Array[Boolean] = {
    val m = new Array[Boolean](sql.length)
    var i = 0; var inString = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inString) {
        m(i) = true
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            m(i + 1) = true; i += 1
          } else inString = false
        }
      } else if (c == '\'') { m(i) = true; inString = true }
      i += 1
    }
    m
  }

  /** True iff `sql(at)` starts keyword `kw` at a word boundary on both
    * sides (case-insensitive).
    */
  private def isKeywordAt(sql: String, at: Int, kw: String): Boolean = {
    def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    at >= 0 && at + kw.length <= sql.length &&
      sql.regionMatches(true, at, kw, 0, kw.length) &&
      (at == 0 || !isWordChar(sql.charAt(at - 1))) &&
      (at + kw.length == sql.length || !isWordChar(sql.charAt(at + kw.length)))
  }

  /** Trino `ARRAY[e1, e2]` literals → Spark `array(e1, e2)` —
    * Trino's bracket syntax (used for multi-percentile argument lists
    * and IN-list-style constants) has no Spark spelling; the function
    * form does. Nested literals (`ARRAY[ARRAY[1]]`) convert in one
    * pass via a bracket stack; map subscripts (`kv['c']`) and Trino's
    * paren TYPE syntax (`CAST(x AS ARRAY(varchar))`) are untouched
    * (neither is an `ARRAY[` keyword-bracket pair).
    */
  def rewriteArrayLiteral(sql: String): String = {
    val out = new StringBuilder(sql.length)
    // stack entry per open '[': true = this bracket was an ARRAY[
    var stack = List.empty[Boolean]
    var i = 0; var inString = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inString) {
        out.append(c)
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            out.append('\''); i += 1
          } else inString = false
        }
        i += 1
      } else if (isKeywordAt(sql, i, "array") && {
        var j = i + 5
        while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
        j < sql.length && sql.charAt(j) == '['
      }) {
        out.append("array(")
        i += 5
        while (Character.isWhitespace(sql.charAt(i))) i += 1
        i += 1 // consume the '['
        stack = true :: stack
      } else {
        c match {
          case '\'' => inString = true; out.append(c)
          case '[' => stack = false :: stack; out.append(c)
          case ']' =>
            val isArr = stack.headOption.contains(true)
            if (stack.nonEmpty) stack = stack.tail
            out.append(if (isArr) ')' else ']')
          case _ => out.append(c)
        }
        i += 1
      }
    }
    out.toString
  }

  /** Trino's WEIGHTED `approx_percentile(x, w, percentage)` →
    * Spark `percentile(x, percentage, w)` (Spark's exact weighted
    * percentile — exactness is a valid implementation of "approx",
    * and Spark's own 3-arg form means (x, percentage, accuracy), so
    * the Trino argument order cannot be passed through). The 1- and
    * 2-argument forms (and the array-percentage form, after
    * [[rewriteArrayLiteral]]) parse natively in Spark and pass
    * through untouched.
    */
  def rewriteApproxPercentile(sql: String): String = {
    val lower = sql.toLowerCase
    val lit = literalMask(sql)
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val at = lower.indexOf("approx_percentile", i)
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (lit(at) || !isKeywordAt(sql, at, "approx_percentile")) {
        out.append(sql.substring(i, at + 17)); i = at + 17
      } else {
        var j = at + 17
        while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
        if (j >= sql.length || sql.charAt(j) != '(') {
          out.append(sql.substring(i, at + 17)); i = at + 17
        } else {
          val end = closingParen(sql, j)
          require(end > 0, s"unbalanced parentheses in approx_percentile at offset $at")
          val args = splitTopLevel(sql.substring(j + 1, end))
          if (args.length == 3) {
            // nested calls inside the swapped args still rewrite
            val a = args.map(rewriteApproxPercentile)
            out.append(sql.substring(i, at))
            out.append(s"percentile(${a(0)},${a(2)},${a(1)})")
            i = end + 1
          } else {
            // Spark-native form: byte-identical passthrough; the scan
            // continues INTO the argument list, so nested calls are
            // still visited
            out.append(sql.substring(i, at + 17))
            i = at + 17
          }
        }
      }
    }
    out.toString
  }

  /** Trino `UNNEST(expr) [AS] t (c)` → Spark's `explode` table
    * function, with `LATERAL` inserted when the call follows
    * `CROSS JOIN` or an implicit-join comma (Spark requires the
    * keyword for a correlated table-function reference; Trino
    * correlates implicitly). Scope: the single-array single-column
    * form — multi-array UNNEST, `WITH ORDINALITY`, and
    * `LEFT JOIN UNNEST ... ON TRUE` remain on the documented
    * unsupported list.
    */
  def rewriteUnnest(sql: String): String = {
    val lower = sql.toLowerCase
    val lit = literalMask(sql)
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val at = lower.indexOf("unnest", i)
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (lit(at) || !isKeywordAt(sql, at, "unnest") || {
        var j = at + 6
        while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
        j >= sql.length || sql.charAt(j) != '('
      }) {
        out.append(sql.substring(i, at + 6)); i = at + 6
      } else {
        out.append(sql.substring(i, at))
        // LATERAL when preceded by a comma or a JOIN keyword
        var p = at - 1
        while (p >= 0 && Character.isWhitespace(sql.charAt(p))) p -= 1
        val needsLateral = p >= 0 && (sql.charAt(p) == ',' ||
          (p >= 3 && sql.regionMatches(true, p - 3, "join", 0, 4) &&
            isKeywordAt(sql, p - 3, "join")))
        if (needsLateral) out.append("LATERAL ")
        out.append("explode")
        i = at + 6
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

  /** Full translation for the reference's generated query shapes plus
    * the most common hand-written Athena constructs (array literals,
    * weighted approx_percentile, single-array UNNEST).
    */
  def translate(sql: String): String =
    resolveDefaultNamespace(
      rewriteUnnest(
        rewriteApproxPercentile(
          rewriteArrayLiteral(
            rewriteMapAgg(
              quoteIdentifiers(sql))))))
}
