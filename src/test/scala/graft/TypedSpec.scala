package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{Document, Typed}

/** The typed catalog face: Encoder-validated reads, pushdown-preserving
  * column predicates on Dataset[T], and object-level reduceGroups.
  */
class TypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("documents reads as Dataset[Document] and round-trips fields") {
    val ds = Typed.documents(spark, TestSpark.sfDir)
    val d = ds.orderBy("doc_id").head()
    assert(d.doc_id == 0L && d.text.nonEmpty && d.n_chars == d.text.length)
  }

  test("column predicate on the typed Dataset still pushes to the scan") {
    val ds = Typed.atLeastChars(Typed.documents(spark, TestSpark.sfDir), 500L)
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars,500)"),
      s"predicate must reach the parquet scan:\n$plan")
    assert(ds.collect().forall(_.n_chars >= 500L))
  }

  test("longestPerSource: typed argmax equals the window-function answer") {
    val ds = Typed.documents(spark, TestSpark.sfDir)
    val typed = Typed.longestPerSource(ds).collect()
      .map { case (s, d) => s -> d.doc_id }.toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val relational = ds.toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("doc_id"))
      .toMap
    assert(typed == relational)
    // and the typed path aggregated map-side (no raw-row shuffle):
    // the plan shows a partial aggregate below the exchange
    val plan = Typed.longestPerSource(ds).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      "reduceGroups must plan as a partial-capable aggregate")
  }
}
