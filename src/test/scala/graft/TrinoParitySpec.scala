package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Tables
import graft.exec.{QueryManager, TrinoDialect}
import graft.profile.{QueryBuilder, TableProfiler}

/** End-to-end parity with the reference's OWN generated SQL: the
  * query_builder output (aws-athena.sh:64-125) must run through this
  * engine's SQL passthrough and agree with the native profiler.
  */
class TrinoParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dialect: double-quoted identifiers become backticks, strings survive") {
    assert(TrinoDialect.quoteIdentifiers("""select count("c") from t""") ==
      "select count(`c`) from t")
    assert(TrinoDialect.quoteIdentifiers("""select '"not an ident"' as s""") ==
      """select '"not an ident"' as s""")
    assert(TrinoDialect.quoteIdentifiers("""select 'it''s "quoted"' as s""") ==
      """select 'it''s "quoted"' as s""")
  }

  test("dialect: map_agg rewrites with nested calls and literals") {
    assert(TrinoDialect.rewriteMapAgg("select map_agg(k, v) from t") ==
      "select map_from_entries(collect_list(struct(k, v))) from t")
    assert(TrinoDialect.rewriteMapAgg("map_agg(f(a, ')'), g(b))") ==
      "map_from_entries(collect_list(struct(f(a, ')'), g(b))))")
    // not a call, not a rewrite
    assert(TrinoDialect.rewriteMapAgg("select my_map_agg_col from t") ==
      "select my_map_agg_col from t")
  }

  test("the reference's generated profile SQL runs and matches the native profiler") {
    Tables.register(spark, TestSpark.sfDir)
    val cols = TableProfiler.numericColumnsFromCatalog(spark, "lineitem")
    val sql = QueryBuilder.profileSql("spark_catalog.default.lineitem", cols)
    val qm = new QueryManager(spark)

    val generated = qm.queryTrino(sql)
    val native = graft.exec.ResultSet.fromDataFrame(
      TableProfiler.profileTable(spark, "lineitem"))

    assert(generated.labels == native.labels)
    assert(generated.rows.size == 8 && native.rows.size == 8)
    val nativeByLabel = native.rows.map(r => r.head -> r.tail).toMap
    generated.rows.zip(native.rows).foreach { case (g, n) =>
      assert(g.head == n.head) // agg_type label
      if (g.head == "6. median") {
        // the reference emits approx_percentile (aws-athena.sh:96) —
        // rank-accurate, not value-accurate — while the native
        // profiler computes the exact interpolated median. The sound
        // assertion is the order statistic's invariant: min ≤ m ≤ max.
        val mins = nativeByLabel("5. min").map(_.toDouble)
        val maxs = nativeByLabel("7. max").map(_.toDouble)
        g.tail.zipWithIndex.foreach { case (gv, i) =>
          val gd = gv.toDouble
          assert(gd >= mins(i) && gd <= maxs(i),
            s"approx median out of range: $gd not in [${mins(i)}, ${maxs(i)}]")
        }
      } else {
        assert(g == n, s"row '${g.head}' differs:\n  generated=$g\n  native=$n")
      }
    }
  }
}
