package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{InfoSchema, Tables}

class InfoSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("information_schema.columns has the 8-column positional contract") {
    Tables.register(spark, TestSpark.sfDir)
    val df = InfoSchema.columnsOf(spark, "spark_catalog", "default", "lineitem")
    assert(df.columns.toSeq == Seq("table_catalog", "table_schema",
      "table_name", "column_name", "ordinal_position", "column_default",
      "is_nullable", "data_type"))
    val rows = df.orderBy("ordinal_position").collect()
    assert(rows.length == 11)
    assert(rows.head.getString(3) == "l_orderkey")
    assert(rows.head.getString(7) == "bigint")
    assert(rows.head.getInt(4) == 1)
    assert(rows.last.getString(3) == "l_shipdate")
    assert(rows.last.getString(7) == "timestamp(3)")
  }

  test("nonexistent table succeeds with zero rows (aws-athena.sh:174)") {
    Tables.register(spark, TestSpark.sfDir)
    val df = InfoSchema.columnsOf(spark, "spark_catalog", "default", "no_such_table")
    assert(df.count() == 0)
  }

  test("wrong catalog/schema filters to zero rows") {
    Tables.register(spark, TestSpark.sfDir)
    assert(InfoSchema.columnsOf(spark, "other_catalog", "default", "lineitem").count() == 0)
  }

  test("3-part name validation (aws-athena.sh:165-167)") {
    assert(Tables.splitThreePart("cat.db.tbl") == ("cat", "db", "tbl"))
    intercept[IllegalArgumentException](Tables.splitThreePart("db.tbl"))
    intercept[IllegalArgumentException](Tables.splitThreePart("a.b.c.d"))
    intercept[IllegalArgumentException](Tables.splitThreePart("a..c"))
  }
}
