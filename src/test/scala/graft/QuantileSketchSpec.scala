package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantileSketch.logBucketMedian

/** The deterministic median sketch (log_bucket_median): relative-error
  * accuracy vs the exact median, partitioning invariance (the reason
  * it exists — percentile_approx's GK merge is partition-order
  * dependent), sign/zero/null handling, and SQL-registry resolution.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val alpha = 0.005

  private def sketchMedian(xs: Seq[Double], parts: Int): Option[Double] =
    xs.toDF("v").repartition(parts)
      .agg(logBucketMedian(col("v"), alpha).as("m"))
      .collect()(0) match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getDouble(0))
      }

  private def exactMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  test("relative-error bound vs exact median on varied distributions") {
    val gen = new scala.util.Random(42)
    val cases = Seq(
      Seq.tabulate(1001)(i => (i + 1).toDouble),                 // uniform positive, odd n
      Seq.tabulate(1000)(i => math.exp(gen.nextDouble() * 10)),  // log-uniform, even n
      Seq.tabulate(999)(_ => gen.nextGaussian() * 100),          // mixed sign
      Seq.tabulate(500)(i => -(i + 1).toDouble),                 // all negative
      Seq.fill(100)(7.25)                                        // constant
    )
    for (xs <- cases) {
      val exact = exactMedian(xs)
      val got = sketchMedian(xs, 7).get
      // each reported middle value is within alpha of a true stored
      // value at that rank; the even-n average adds no extra error
      // beyond alpha of the larger magnitude
      val tol = alpha * math.max(math.abs(exact), xs.map(math.abs).max * alpha) + 1e-12
      assert(math.abs(got - exact) <= alpha * math.abs(exact) + tol,
        s"median of ${xs.take(3)}... exact=$exact got=$got")
    }
  }

  test("bit-identical under ANY partitioning (the determinism pin)") {
    val gen = new scala.util.Random(7)
    val xs = Seq.tabulate(5000)(_ => math.exp(gen.nextGaussian() * 5)) ++
      Seq.tabulate(500)(_ => -gen.nextDouble() * 1e6) ++ Seq.fill(30)(0.0)
    val results = Seq(1, 2, 7, 32).map(p => sketchMedian(xs, p).get)
    assert(results.distinct.length == 1,
      s"sketch median must not depend on partitioning: $results")
  }

  test("zeros, nulls and NaN: ignored/counted per SQL convention") {
    // exact zeros land in the dedicated zero bucket — median of
    // {-1, 0, 1} is exactly 0, no log-bucket distortion
    assert(sketchMedian(Seq(-1.0, 0.0, 1.0), 3).get == 0.0)
    // nulls and NaNs ignored; all-null => NULL
    val withNulls = Seq[(Integer, java.lang.Double)]((1, 5.0), (2, null),
      (3, Double.NaN), (4, 5.0), (5, 5.0)).toDF("id", "v")
    val m = withNulls.agg(logBucketMedian(col("v"), alpha)).collect()(0).getDouble(0)
    assert(math.abs(m - 5.0) <= alpha * 5.0)
    val allNull = Seq[(Integer, java.lang.Double)]((1, null)).toDF("id", "v")
    assert(allNull.agg(logBucketMedian(col("v"), alpha)).collect()(0).isNullAt(0))
    // empty input => NULL
    assert(sketchMedian(Seq.empty, 1).isEmpty)
  }

  test("resolves from passthrough SQL via the session registry") {
    Seq(1.0, 2.0, 100.0).toDF("v").createOrReplaceTempView("lbm_t")
    val m = spark.sql("SELECT log_bucket_median(v, 0.005) AS m FROM lbm_t")
      .collect()(0).getDouble(0)
    assert(math.abs(m - 2.0) <= alpha * 2.0)
    // group-by shape: one sketch per group
    val g = spark.sql(
      "SELECT v > 10 AS big, log_bucket_median(v, 0.005) AS m " +
      "FROM lbm_t GROUP BY 1 ORDER BY 1").collect()
    assert(g.length == 2)
    assert(math.abs(g(0).getDouble(1) - 1.5) <= alpha * 2.0 + 1e-9)
    assert(math.abs(g(1).getDouble(1) - 100.0) <= alpha * 100.0)
    // non-literal alpha is rejected eagerly
    val e = intercept[Exception] {
      spark.sql("SELECT log_bucket_median(v, v) FROM lbm_t").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("integer-typed input is implicitly cast (profiler call shape)") {
    val m = Seq(1, 2, 3, 4, 5).toDF("v")
      .agg(logBucketMedian(col("v"), alpha)).collect()(0).getDouble(0)
    assert(math.abs(m - 3.0) <= alpha * 3.0)
  }

  test("log_bucket_quantile: arbitrary q within alpha of the exact quantile") {
    import graft.functions.QuantileSketch.logBucketQuantile
    val gen = new scala.util.Random(11)
    val xs = Seq.tabulate(2000)(_ => math.exp(gen.nextGaussian() * 3))
    val sorted = xs.sorted.toIndexedSeq
    def exactQ(q: Double): Double = {
      // Spark Percentile continuous interpolation on the sorted multiset
      val pos = q * (sorted.length - 1)
      val lo = sorted(pos.toInt)
      val hi = sorted(math.ceil(pos).toInt)
      val g = pos - math.floor(pos)
      lo * (1 - g) + hi * g
    }
    val df = xs.toDF("v").repartition(9)
    for (q <- Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0)) {
      val got = df.agg(logBucketQuantile(col("v"), alpha, q))
        .collect()(0).getDouble(0)
      val want = exactQ(q)
      assert(math.abs(got - want) <= alpha * want + 1e-12,
        s"q=$q: got $got want $want")
    }
    // q=0.5 IS log_bucket_median (same rank convention, same value)
    val viaMedian = df.agg(logBucketMedian(col("v"), alpha)).collect()(0).getDouble(0)
    val viaQ = df.agg(logBucketQuantile(col("v"), alpha, 0.5)).collect()(0).getDouble(0)
    assert(viaMedian == viaQ)
    // p99 from SQL, partitioning-invariant
    xs.toDF("v").createOrReplaceTempView("lbq_t")
    val sql1 = spark.sql(
      "SELECT log_bucket_quantile(v, 0.005, 0.99) AS p FROM lbq_t")
      .collect()(0).getDouble(0)
    val sql2 = xs.toDF("v").repartition(31)
      .agg(logBucketQuantile(col("v"), alpha, 0.99)).collect()(0).getDouble(0)
    assert(sql1 == sql2, "p99 must be partitioning-invariant")
  }
}
