package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ad-hoc timing harness (not part of the library surface). */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    time("warm count")(df.count())

    def base = cols.flatMap { c => Seq(
      count(col(c)), round(avg(col(c)), 5), round(stddev_samp(col(c)), 5),
      round(min(col(c)).cast(DoubleType), 5), round(max(col(c)).cast(DoubleType), 5),
      round(sum(col(c).cast(DecimalType(38, 10))).cast(DoubleType), 5)) }

    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("base 6x8, wholeStage=false")(df.agg(base.head, base.tail: _*).collect())
    time("base 6x8, wholeStage=false (2nd)")(df.agg(base.head, base.tail: _*).collect())
    val dists = cols.map(c => countDistinct(col(c)))
    time("countDistinct x8, ws=false")(df.agg(dists.head, dists.tail: _*).collect())
    val meds = cols.map(c => round(percentile(col(c), lit(0.5)), 5))
    time("percentile x8, ws=false")(df.agg(meds.head, meds.tail: _*).collect())

    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    time("base 6x8, NO_CODEGEN too")(df.agg(base.head, base.tail: _*).collect())
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    // decimal(18,6) compact sums vs decimal(38,10)
    val base18 = cols.flatMap { c => Seq(
      count(col(c)), round(avg(col(c)), 5), round(stddev_samp(col(c)), 5),
      round(min(col(c)).cast(DoubleType), 5), round(max(col(c)).cast(DoubleType), 5),
      round(sum(col(c).cast(DecimalType(18, 6))).cast(DoubleType), 5)) }
    time("base 6x8 decimal(18,6), ws=true")(df.agg(base18.head, base18.tail: _*).collect())
    time("base 6x8 decimal(18,6) (2nd)")(df.agg(base18.head, base18.tail: _*).collect())

    // distinct via 8 independent 2-col aggs, single job using unioned column-long form
    time("distinct via melt+groupBy") {
      val melted = df.select(posexplode(array(cols.map(c => col(c).cast(DoubleType)): _*))
        .as(Seq("cidx", "v")))
      melted.groupBy("cidx").agg(countDistinct(col("v"))).collect()
    }
    spark.stop()
  }
}
