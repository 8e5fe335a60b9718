package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off probe for the q_text_entropy sf0.1 tie investigation
  * (doc 4905). Ad-hoc tooling like Scratch — rewrite freely.
  */
object EntropyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalog.Tables.register(spark, "/root/testdata/sf0.1")
    val df = spark.table("documents").filter(col("doc_id") === 4905L)
    val toks = df.select(col("doc_id"),
      explode_outer(graft.ext.TextStats.tokens(col("text"))).as("token"))
      .filter(col("token").isNotNull)
    val counts = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("doc_id")
    val terms = counts
      .withColumn("n", sum(col("c")).over(w))
      .withColumn("lg", log(col("n").cast("double") / col("c").cast("double")))
      .withColumn("q", round(col("lg"), 9))
      .withColumn("wq",
        col("c").cast(org.apache.spark.sql.types.DecimalType(10, 0)) *
        round(log(col("n").cast("double") / col("c").cast("double")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
    terms.select("token", "c", "n", "lg", "q", "wq").collect()
      .sortBy(_.getString(0))
      .foreach { r =>
        println(s"${r.getString(0)} c=${r.getLong(1)} " +
          s"lgbits=${java.lang.Double.doubleToLongBits(r.getDouble(3))} " +
          s"q=${r.getDouble(4)} wq=${r.getDecimal(5)}")
      }
    val su = (sum(col("wq")) * lit(1000000000L)).cast("long")
    val d = max(col("n")) * lit(10000L)
    terms.groupBy("doc_id").agg(
      sum(col("wq")).as("sumwq"), su.as("su"), d.as("d"),
      (floor((su * 2 + d).cast("double") / (d * 2).cast("double")) /
        lit(100000.0)).as("h"))
      .show(false)
    spark.stop()
  }
}
