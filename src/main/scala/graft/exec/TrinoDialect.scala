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
  *  - weighted `approx_percentile(x, w, p)` and
  *    `approx_percentile(x, w, p, accuracy)` → `percentile(x, p, w)`
  *    ([[rewriteApproxPercentile]]);
  *  - `UNNEST` in all four Trino forms ([[rewriteUnnest]]):
  *    single-array → `explode`, multi-array → zipped `inline`
  *    (null-padded to the longest array, Trino's rule),
  *    `WITH ORDINALITY` → a 1-based last ordinal column, and
  *    `LEFT JOIN UNNEST(..) .. ON TRUE` → `LEFT JOIN LATERAL`
  *    (Spark's lateral generator under LEFT JOIN .. ON TRUE already
  *    emits the row-preserving null row, verified empirically);
  *  - `TRY(CAST(x AS t))` → `try_cast(x AS t)` ([[rewriteTry]]);
  *    bare `TRY_CAST` parses natively in Spark 3.2+ and passes
  *    through (parity-spec'd, not rewritten);
  *  - bare `VARCHAR` / `VARBINARY` type names → `STRING` / `BINARY`
  *    ([[rewriteBareTypes]]; `VARCHAR(n)` parses natively).
  *
  * Every scanner is comment-aware: `--` line comments and
  * slash-star block comments are masked exactly like string
  * literals, so an
  * apostrophe in a comment can't flip the in-string state and trigger
  * tokens inside comments are never rewritten (ADVICE r6).
  *
  * Trino's lambda syntax (`x -> f(x)`, `(s, x) -> s + x`) parses
  * natively in Spark with the same core function names
  * (filter/transform/reduce) — parity-spec'd passthrough, no rewrite.
  *
  * This is a scoped text shim, not a general Trino frontend. The
  * documented REMAINING unsupported list: `TRY` around anything but a
  * single CAST (Trino's TRY catches arbitrary scalar errors; Spark
  * only has the try_* function family), UNNEST of a map argument in
  * the MULTI-array form (single-map `UNNEST(m) AS t(k, v)` works via
  * explode), `at_timezone` (Spark timestamps are not zone-carrying,
  * so there is no faithful spelling), and Trino's paren-style
  * ARRAY/MAP TYPE syntax inside a ROW type (`ROW(x ARRAY(int))`).
  * The Trino-only lambda-predicate names any_match / all_match /
  * none_match rewrite to exists / forall / NOT exists
  * ([[rewriteMatchFns]]); `ROW` constructors and `CAST(.. AS
  * ROW(..))` types rewrite to struct / STRUCT&lt;&gt;
  * ([[rewriteRow]]).
  */
object TrinoDialect {

  /** Replace double-quoted identifiers with backtick-quoted ones,
    * leaving single-quoted string literals (with `''` escapes) and
    * comments untouched.
    */
  def quoteIdentifiers(sql: String): String = {
    val lit = literalMask(sql)
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      out.append(if (c == '"' && !lit(i)) '`' else c)
      i += 1
    }
    out.toString
  }

  /** Rewrite every `map_agg(<args>)` call to
    * `map_from_entries(collect_list(struct(<args>)))`, with a
    * mask-aware balanced-paren scan (arguments may contain nested
    * calls, string literals, and comments).
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
        val open = sql.indexOf('(', at)
        val end = closingParen(sql, open, lit)
        require(end > 0, s"unbalanced parentheses in map_agg call at offset $at")
        val args = sql.substring(open + 1, end)
        out.append(s"map_from_entries(collect_list(struct($args)))")
        i = end + 1
      }
    }
    out.toString
  }

  /** Index of the `)` closing the `(` at `open`, honoring nested
    * parens, string literals, and comments; -1 if unbalanced.
    */
  private def closingParen(sql: String, open: Int,
      lit: Array[Boolean]): Int = {
    var j = open; var depth = 0
    while (j < sql.length) {
      if (!lit(j)) sql.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    -1
  }

  /** Split an argument list at top-level commas (quote / comment /
    * paren / bracket aware).
    */
  private[exec] def splitTopLevel(args: String): Seq[String] = {
    val lit = literalMask(args)
    val out = Seq.newBuilder[String]
    var start = 0; var depth = 0; var i = 0
    while (i < args.length) {
      if (!lit(i)) args.charAt(i) match {
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
    * single-quoted string literal (quotes included), a `--` line
    * comment (through the newline-exclusive end), or a standard
    * non-nesting slash-star block comment (delimiters included). Lets
    * the indexOf-driven rewrites skip matches that are DATA or
    * commentary, not syntax — the property suite feeds literals like
    * 'UNNEST(a)' that must survive byte-for-byte, and a `-- don't`
    * comment must not flip the in-string state (ADVICE r6).
    * Backtick-quoted identifiers (the output of [[quoteIdentifiers]])
    * are masked too, so a column literally named `varchar` or
    * `unnest` is never treated as a keyword by later rewrites.
    */
  private[exec] def literalMask(sql: String): Array[Boolean] = {
    val m = new Array[Boolean](sql.length)
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '`') {
        m(i) = true; i += 1
        while (i < sql.length && sql.charAt(i) != '`') { m(i) = true; i += 1 }
        if (i < sql.length) { m(i) = true; i += 1 }
      } else if (c == '\'') {
        // string literal with '' escapes
        m(i) = true; i += 1
        var closed = false
        while (i < sql.length && !closed) {
          m(i) = true
          if (sql.charAt(i) == '\'') {
            if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
              m(i + 1) = true; i += 1
            } else closed = true
          }
          i += 1
        }
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') { m(i) = true; i += 1 }
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        // the closing '*' must sit INSIDE the comment body (index >=
        // open+2) — otherwise '/*/' would match the opener's own '*'
        // as the close and mis-mask everything after an unterminated
        // comment
        val bodyStart = i + 2
        m(i) = true; m(i + 1) = true; i += 2
        var closed = false
        while (i < sql.length && !closed) {
          m(i) = true
          if (sql.charAt(i) == '/' && i - 1 >= bodyStart &&
            sql.charAt(i - 1) == '*') closed = true
          i += 1
        }
      } else i += 1
    }
    m
  }

  /** True iff `sql(at)` starts keyword `kw` at a word boundary on both
    * sides (case-insensitive).
    */
  private[exec] def isKeywordAt(sql: String, at: Int, kw: String): Boolean = {
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
    val lit = literalMask(sql)
    val out = new StringBuilder(sql.length)
    // stack entry per open '[': true = this bracket was an ARRAY[
    var stack = List.empty[Boolean]
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (lit(i)) { out.append(c); i += 1 }
      else if (isKeywordAt(sql, i, "array") && !lit(i) && {
        var j = i + 5
        while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
        j < sql.length && sql.charAt(j) == '[' && !lit(j)
      }) {
        out.append("array(")
        i += 5
        while (Character.isWhitespace(sql.charAt(i))) i += 1
        i += 1 // consume the '['
        stack = true :: stack
      } else {
        c match {
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

  /** Trino's WEIGHTED `approx_percentile(x, w, percentage)` and
    * `approx_percentile(x, w, percentage, accuracy)` →
    * Spark `percentile(x, percentage, w)` (Spark's exact weighted
    * percentile — exactness is a valid implementation of "approx",
    * and Spark's own 3-arg form means (x, percentage, accuracy), so
    * the Trino argument order cannot be passed through; the 4-arg
    * form's accuracy hint is dropped, which can only IMPROVE on the
    * requested accuracy). The 1- and 2-argument forms (and the
    * array-percentage form, after [[rewriteArrayLiteral]]) parse
    * natively in Spark and pass through untouched.
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
          val end = closingParen(sql, j, lit)
          require(end > 0, s"unbalanced parentheses in approx_percentile at offset $at")
          val args = splitTopLevel(sql.substring(j + 1, end))
          if (args.length == 3 || args.length == 4) {
            // nested calls inside the swapped args still rewrite;
            // a 4th (accuracy) argument is dropped
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

  /** Trino `UNNEST(...)` → Spark's generator table functions, all
    * four Trino forms:
    *
    *  - `UNNEST(a) AS t(c)` → `explode(a) AS t(c)` (also the
    *    single-MAP form, where explode yields the same 2 columns);
    *  - `UNNEST(a, b) AS t(x, y)` → `inline(arrays_zip(a, b))
    *    AS t(x, y)` — arrays_zip null-pads to the longest array,
    *    which is exactly Trino's multi-array rule;
    *  - `... WITH ORDINALITY AS t(.., i)` → an extra zipped
    *    `slice(sequence(0, n), 2, n)` ordinal array (1-based, LAST
    *    column — Trino's ordering; the slice form stays empty-safe
    *    where `sequence(1, 0)` would count down);
    *  - `LEFT JOIN UNNEST(a) AS t(c) ON TRUE` → `LEFT JOIN LATERAL
    *    explode(a) AS t(c) ON TRUE` — Spark's lateral generator under
    *    a row-preserving join emits Trino's null row for empty/null
    *    arrays, so only the LATERAL keyword needs inserting.
    *
    * `LATERAL` is inserted whenever the call follows a JOIN keyword
    * or an implicit-join comma (Spark requires the keyword for a
    * correlated table-function reference; Trino correlates
    * implicitly).
    */
  def rewriteUnnest(sql: String): String = {
    val lower = sql.toLowerCase
    val lit = literalMask(sql)
    val out = new StringBuilder(sql.length)
    def skipWs(k0: Int): Int = {
      var k = k0
      while (k < sql.length && Character.isWhitespace(sql.charAt(k))) k += 1
      k
    }
    var i = 0
    while (i < sql.length) {
      val at = lower.indexOf("unnest", i)
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (lit(at) || !isKeywordAt(sql, at, "unnest") || {
        val j = skipWs(at + 6)
        j >= sql.length || sql.charAt(j) != '(' || lit(j)
      }) {
        out.append(sql.substring(i, at + 6)); i = at + 6
      } else {
        val open = skipWs(at + 6)
        val close = closingParen(sql, open, lit)
        require(close > 0, s"unbalanced parentheses in UNNEST at offset $at")
        val args = splitTopLevel(sql.substring(open + 1, close))
          .map(_.trim).map(rewriteUnnest) // nested calls still rewrite
        // optional WITH ORDINALITY — consumed, not passed through
        var rest = skipWs(close + 1)
        var ordinality = false
        if (isKeywordAt(sql, rest, "with")) {
          val j2 = skipWs(rest + 4)
          if (isKeywordAt(sql, j2, "ordinality")) {
            ordinality = true
            rest = skipWs(j2 + "ordinality".length)
          }
        }
        // LATERAL when preceded by a comma or a JOIN keyword
        var p = at - 1
        while (p >= 0 && Character.isWhitespace(sql.charAt(p))) p -= 1
        val needsLateral = p >= 0 && (sql.charAt(p) == ',' ||
          (p >= 3 && sql.regionMatches(true, p - 3, "join", 0, 4) &&
            isKeywordAt(sql, p - 3, "join")))
        out.append(sql.substring(i, at))
        if (needsLateral) out.append("LATERAL ")
        if (args.length == 1 && !ordinality) {
          out.append(s"explode(${args.head})")
        } else {
          val sizes = args.map(a => s"size($a)")
          val n = if (sizes.length == 1) sizes.head
                  else sizes.mkString("greatest(", ", ", ")")
          val zipped =
            if (ordinality) args :+ s"slice(sequence(0, $n), 2, $n)"
            else args
          out.append(s"inline(arrays_zip(${zipped.mkString(", ")}))")
        }
        // alias (and everything after) passes through verbatim; a
        // single separating space replaces the consumed span
        if (rest < sql.length && rest > close + 1) out.append(' ')
        i = rest
      }
    }
    out.toString
  }

  /** Trino `TRY(CAST(x AS t))` / `TRY(TRY_CAST(x AS t))` →
    * Spark `try_cast(x AS t)` — the dominant TRY idiom in hand-written
    * Athena SQL (tolerant casts over dirty columns). TRY around any
    * OTHER expression has no general Spark spelling (Spark's
    * error-tolerant forms are the enumerated try_* functions) and is
    * rejected with a clear message rather than silently mistranslated.
    * Bare `TRY_CAST(x AS t)` parses natively in Spark and is not
    * touched by this rewrite.
    */
  def rewriteTry(sql: String): String = {
    val lower = sql.toLowerCase
    val lit = literalMask(sql)
    val out = new StringBuilder(sql.length)
    def skipWs(k0: Int): Int = {
      var k = k0
      while (k < sql.length && Character.isWhitespace(sql.charAt(k))) k += 1
      k
    }
    var i = 0
    while (i < sql.length) {
      val at = lower.indexOf("try", i)
      val isCall = at >= 0 && !lit(at) && isKeywordAt(sql, at, "try") && {
        val j = skipWs(at + 3)
        j < sql.length && sql.charAt(j) == '(' && !lit(j)
      }
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (!isCall) {
        out.append(sql.substring(i, at + 3)); i = at + 3
      } else {
        val open = skipWs(at + 3)
        val close = closingParen(sql, open, lit)
        require(close > 0, s"unbalanced parentheses in TRY at offset $at")
        val inner = sql.substring(open + 1, close).trim
        val innerLower = inner.toLowerCase
        val castPrefix =
          if (innerLower.startsWith("cast")) Some(4)
          else if (innerLower.startsWith("try_cast")) Some(8)
          else None
        val castBody = castPrefix.flatMap { pl =>
          val innerLit = literalMask(inner)
          val po = {
            var k = pl
            while (k < inner.length && Character.isWhitespace(inner.charAt(k))) k += 1
            k
          }
          if (po < inner.length && inner.charAt(po) == '(' &&
              closingParen(inner, po, innerLit) == inner.length - 1)
            Some(inner.substring(po + 1, inner.length - 1))
          else None
        }
        castBody match {
          case Some(body) =>
            out.append(sql.substring(i, at))
            out.append(s"try_cast($body)")
            i = close + 1
          case None =>
            throw new IllegalArgumentException(
              s"TRY(...) is only supported around a single CAST/TRY_CAST " +
                s"(offset $at): Spark has no general error-tolerant wrapper; " +
                "use the try_* function family explicitly")
        }
      }
    }
    out.toString
  }

  /** Trino `ROW` → Spark, both positions:
    *
    *  - constructor `ROW(a, b)` → `struct(a, b)`;
    *  - type `AS ROW(name T, ...)` (inside CAST) →
    *    `AS STRUCT<name: T, ...>`, recursing into nested row types.
    *
    * Position is decided by the preceding keyword: a `ROW(` directly
    * after `AS` is a type, anywhere else it is the constructor —
    * exactly where Trino's grammar allows each.
    */
  def rewriteRow(sql: String): String = {
    val lower = sql.toLowerCase
    val lit = literalMask(sql)
    def convertType(t: String): String = {
      // inside a type, every row(...) is a nested row TYPE
      val tl = t.toLowerCase
      val at = tl.indexOf("row")
      if (at < 0) t
      else if (!isKeywordAt(t, at, "row") || {
        var j = at + 3
        while (j < t.length && Character.isWhitespace(t.charAt(j))) j += 1
        j >= t.length || t.charAt(j) != '('
      }) t.substring(0, at + 3) + convertType(t.substring(at + 3))
      else {
        val open = t.indexOf('(', at)
        val close = closingParen(t, open, literalMask(t))
        require(close > 0, "unbalanced parentheses in ROW type")
        val fields = splitTopLevel(t.substring(open + 1, close)).map { f =>
          val ft = f.trim
          val sp = ft.indexWhere(Character.isWhitespace)
          require(sp > 0, s"ROW type field needs 'name type': <$ft>")
          s"${ft.substring(0, sp)}: ${convertType(ft.substring(sp + 1).trim)}"
        }
        t.substring(0, at) + s"STRUCT<${fields.mkString(", ")}>" +
          convertType(t.substring(close + 1))
      }
    }
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      val at = lower.indexOf("row", i)
      val isCall = at >= 0 && !lit(at) && isKeywordAt(sql, at, "row") && {
        var j = at + 3
        while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
        j < sql.length && sql.charAt(j) == '(' && !lit(j)
      }
      if (at < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (!isCall) {
        out.append(sql.substring(i, at + 3)); i = at + 3
      } else {
        // type position iff the previous keyword is AS
        var p = at - 1
        while (p >= 0 && Character.isWhitespace(sql.charAt(p))) p -= 1
        val isType = p >= 1 && isKeywordAt(sql, p - 1, "as")
        val open = sql.indexOf('(', at)
        val close = closingParen(sql, open, lit)
        require(close > 0, s"unbalanced parentheses in ROW at offset $at")
        out.append(sql.substring(i, at))
        if (isType) out.append(convertType(sql.substring(at, close + 1)))
        else // nested ROW constructors in the args still rewrite
          out.append(s"struct(${rewriteRow(sql.substring(open + 1, close))})")
        i = close + 1
      }
    }
    out.toString
  }

  /** Trino's lambda-predicate function NAMES → Spark's:
    * `any_match(a, f)` → `exists(a, f)`, `all_match(a, f)` →
    * `forall(a, f)`, `none_match(a, f)` → `(NOT exists(a, f))` —
    * the lambda bodies themselves pass through (shared grammar).
    */
  /** Rename every CALL of function `from` to `to` (call = the name
    * followed by `(` outside literals/comments, not a substring of a
    * longer identifier); with `negate`, additionally wrap the call as
    * `(NOT to(...))`. The shared engine of [[rewriteMatchFns]] and
    * [[rewriteScalarFns]].
    */
  private def renameCall(s: String, from: String, to: String,
      negate: Boolean): String = {
      val lower = s.toLowerCase
      val lit = literalMask(s)
      val out = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val at = lower.indexOf(from, i)
        val isCall = at >= 0 && !lit(at) && isKeywordAt(s, at, from) && {
          var j = at + from.length
          while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
          j < s.length && s.charAt(j) == '(' && !lit(j)
        }
        if (at < 0) { out.append(s.substring(i)); i = s.length }
        else if (!isCall) {
          out.append(s.substring(i, at + from.length)); i = at + from.length
        } else if (!negate) {
          out.append(s.substring(i, at)).append(to)
          i = at + from.length
        } else {
          val open = s.indexOf('(', at)
          val close = closingParen(s, open, lit)
          require(close > 0, s"unbalanced parentheses in $from at offset $at")
          out.append(s.substring(i, at))
          out.append(s"(NOT $to${s.substring(open, close + 1)})")
          i = close + 1
        }
      }
      out.toString
  }

  def rewriteMatchFns(sql: String): String =
    renameCall(
      renameCall(
        renameCall(sql, "any_match", "exists", negate = false),
        "all_match", "forall", negate = false),
      "none_match", "exists", negate = true)

  /** Trino scalar/aggregate function names whose Spark equivalent has
    * IDENTICAL argument order and semantics — a pure rename, one pair
    * per line. Names that LOOK renameable but are not stay out:
    * `contains` (Trino array-contains vs Spark string-contains),
    * `codepoint` (non-BMP), `to_unixtime` (double vs long),
    * `date_diff` (argument reorder, not a rename).
    */
  private val ScalarRenames: Seq[(String, String)] = Seq(
    "approx_distinct" -> "approx_count_distinct",
    "strpos" -> "instr",
    "arbitrary" -> "any_value",
    "json_extract_scalar" -> "get_json_object",
    "levenshtein_distance" -> "levenshtein",
    "starts_with" -> "startswith")

  def rewriteScalarFns(sql: String): String =
    ScalarRenames.foldLeft(sql) { case (s, (from, to)) =>
      renameCall(s, from, to, negate = false)
    }

  /** Bare Trino type names with no Spark spelling: `VARCHAR` (no
    * length) → `STRING`, `VARBINARY` → `BINARY`. `VARCHAR(n)` parses
    * natively in Spark and is untouched (the `(`-lookahead guard).
    */
  def rewriteBareTypes(sql: String): String = {
    def replaceKw(s: String, kw: String, to: String,
        guardParen: Boolean): String = {
      val lower = s.toLowerCase
      val m = literalMask(s)
      val out = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val at = lower.indexOf(kw, i)
        if (at < 0) { out.append(s.substring(i)); i = s.length }
        else if (m(at) || !isKeywordAt(s, at, kw) || (guardParen && {
          var j = at + kw.length
          while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
          j < s.length && s.charAt(j) == '('
        })) {
          out.append(s.substring(i, at + kw.length)); i = at + kw.length
        } else {
          out.append(s.substring(i, at)).append(to)
          i = at + kw.length
        }
      }
      out.toString
    }
    replaceKw(replaceKw(sql, "varchar", "STRING", guardParen = true),
      "varbinary", "BINARY", guardParen = false)
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
    * weighted approx_percentile, all four UNNEST forms, TRY(CAST),
    * bare VARCHAR/VARBINARY).
    */
  def translate(sql: String): String =
    resolveDefaultNamespace(
      rewriteScalarFns(
      rewriteMatchFns(
        rewriteBareTypes(
          rewriteRow(
            rewriteTry(
              rewriteUnnest(
                rewriteApproxPercentile(
                  rewriteArrayLiteral(
                    rewriteMapAgg(
                      quoteIdentifiers(sql)))))))))))
}
