package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RewriteHofDotProduct optimizer rule: the declarative HOF dot
  * product must optimize to the native expression with identical
  * semantics, in both the DataFrame API and passthrough SQL.
  */
class RewriteRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y),
    lit(0.0), (acc, v) => acc + v)

  test("HOF dot product is rewritten to dot_product_double") {
    // parquet-backed input: literal inputs constant-fold away before
    // user rules run (which is itself correct behavior)
    graft.catalog.Tables.register(spark, TestSpark.sfDir)
    val emb = spark.table("embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("a"),
        transform(col("embedding"), x => x.cast("double")).as("b"))
    val q = emb.select(hofDot.as("dot"))
    assert(q.queryExecution.optimizedPlan.toString.contains("dot_product_double"))
    // self dot product = squared norm > 0
    assert(q.head.getDouble(0) > 0.0)
  }

  test("rewrite preserves HOF null and length-mismatch semantics") {
    val df = Seq(
      (1, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0)),
      (2, Array[java.lang.Double](1.0, null), Array[java.lang.Double](3.0, 4.0)),
      (3, Array[java.lang.Double](1.0), Array[java.lang.Double](3.0, 4.0)),
      (4, null, Array[java.lang.Double](3.0)))
      .toDF("id", "a", "b")
    val out = df.select(col("id"), hofDot.as("dot")).orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1)) // null element
    assert(out(2).isNullAt(1)) // length mismatch
    assert(out(3).isNullAt(1)) // null array
  }

  test("SQL spelling is rewritten too") {
    graft.catalog.Tables.register(spark, TestSpark.sfDir)
    val q = spark.sql(
      """SELECT aggregate(zip_with(cast(embedding AS array<double>),
        |                          cast(embedding AS array<double>),
        |                          (x, y) -> x * y),
        |                 0d, (acc, v) -> acc + v) AS dot
        |FROM embeddings""".stripMargin)
    assert(q.queryExecution.optimizedPlan.toString.contains("dot_product_double"))
    assert(q.head.getDouble(0) > 0.0)
  }

  test("non-matching HOF aggregates are left alone") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    // sum of sums, not a dot product — must NOT be rewritten
    val q = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x + y),
      lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("dot_product_double"))
    assert(q.head.getDouble(0) == 10.0)
  }
}
