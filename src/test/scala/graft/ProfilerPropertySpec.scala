package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.profile.TableProfiler

/** Property-based profiler invariants (SURVEY.md §5.3) on
  * deterministic scalacheck-generated columns. The strongest check
  * pins the distributed value-counts median
  * (TableProfiler.exactLong) against Spark's own exact
  * `percentile(c, 0.5)` — bit-equality, since the implementation
  * claims Percentile-identical interpolation.
  */
class ProfilerPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val colGen: Gen[List[Double]] = for {
    n <- Gen.chooseNum(1, 300)
    // duplicates are likely (small value space) — exercises the
    // value-counts path's cnt > 1 branches and interpolation ties
    xs <- Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(-50, 50).map(_.toDouble),
      Gen.chooseNum(-5.0, 5.0),
      Gen.oneOf(0.0, 1.0, -1.0, 0.5)))
  } yield xs

  private def sample(i: Int): List[Double] =
    colGen.pureApply(Gen.Parameters.default, Seed(42L + i))

  test("weighted quantiles == unweighted quantiles over the unrolled frame") {
    val rowGen: Gen[List[(String, Double, Int)]] = for {
      n <- Gen.chooseNum(1, 120)
      xs <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.oneOf(
          Gen.chooseNum(-20, 20).map(_.toDouble),
          Gen.oneOf(0.0, 1.0, 0.5, -1.0))
        w <- Gen.chooseNum(0, 4) // zero weights must vanish
      } yield (g, v, w))
    } yield xs
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    (1 to 6).foreach { i =>
      val xs = rowGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      if (xs.exists(_._3 > 0)) {
        val df = xs.toDF("g", "v", "w")
        val weighted = graft.ext.Quantiles.groupQuantilesWeighted(
          df, "g", "v", "w", ps).orderBy("g").collect().toSeq
        val unrolled = xs.flatMap { case (g, v, w) => Seq.fill(w)((g, v)) }
          .toDF("g", "v")
        val direct = graft.ext.Quantiles.groupQuantiles(
          unrolled, "g", "v", ps).orderBy("g").collect().toSeq
        assert(weighted == direct,
          s"case $i: weighted != unrolled\n$weighted\n$direct")
      }
    }
  }

  test("profile invariants and median == percentile on generated columns") {
    (1 to 8).foreach { i =>
      val xs = sample(i)
      val df = xs.toDF("a")
      val p = TableProfiler.profile(df).collect()
        .map(r => r.getString(0) -> r).toMap
      def stat(l: String) = p(l).getDouble(1)

      assert(stat("2. count_distinct") <= stat("1. count"))
      assert(stat("1. count") == xs.size.toDouble)
      assert(stat("5. min") <= stat("6. median") && stat("6. median") <= stat("7. max"))
      assert(stat("3. mean") >= stat("5. min") && stat("3. mean") <= stat("7. max"))

      // the distributed median must equal Spark's exact percentile
      val sparkMedian = df.agg(round(percentile(col("a"), lit(0.5)), 5)).head.getDouble(0)
      assert(stat("6. median") == sparkMedian,
        s"case $i: value-counts median ${stat("6. median")} != percentile $sparkMedian")

      // doubling the table doubles count and sum, keeps distinct
      val doubled = TableProfiler.profile(df.union(df)).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(doubled("1. count").getDouble(1) == 2 * stat("1. count"))
      assert(doubled("2. count_distinct").getDouble(1) == stat("2. count_distinct"))
      // sums accumulate in exact decimal, so doubling is exact up to
      // the final 5-decimal rounding of each result
      assert(math.abs(doubled("8. sum").getDouble(1) - 2 * stat("8. sum")) <= 2e-5)
    }
  }

  test("stddev of a constant column is 0; distinct of a constant is 1") {
    val df = List.fill(100)(3.14).toDF("a")
    val p = TableProfiler.profile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(p("4. std").getDouble(1) == 0.0)
    assert(p("2. count_distinct").getDouble(1) == 1.0)
    assert(p("6. median").getDouble(1) == 3.14)
  }

  test("valuesAtPositions == naive sorted lookup on generated weighted frames") {
    // the shard-pruned position lookup (round 5) must agree with the
    // trivially-correct reference: unroll (v, cnt) to a sorted
    // sequence and index it — for random frames, random positions,
    // and BOTH join regimes (broadcast and shuffle)
    val frameGen: Gen[List[(String, Double, Int)]] = for {
      n <- Gen.chooseNum(1, 150)
      xs <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.oneOf(
          Gen.chooseNum(-30, 30).map(_.toDouble),
          Gen.oneOf(0.0, 1.0, 0.5, -1.0))
        c <- Gen.chooseNum(1, 4)
      } yield (g, v, c))
    } yield xs
    for (i <- 0 until 4; bcast <- Seq(true, false)) {
      val rows = frameGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val vc = rows.toDF("g", "v", "cnt0")
        .groupBy("g", "v").agg(sum($"cnt0").cast("decimal(10,0)").as("cnt"))
      val unrolled: Map[String, Vector[Double]] = rows
        .groupBy(_._1).map { case (g, rs) =>
          g -> rs.flatMap(r => Vector.fill(r._3)(r._2)).sorted.toVector
        }
      val posRows = unrolled.toSeq.flatMap { case (g, vs) =>
        val wanted = Seq(0L, vs.size - 1L, vs.size / 2L,
          (37L * (i + 1)) % vs.size).distinct
        wanted.map(p => (g, p))
      }
      val pos = posRows.toDF("g", "__pos")
      val got = graft.ext.Quantiles
        .valuesAtPositions(vc, Seq("g"), "v", "cnt", pos, shards = 4,
          broadcastGroups = bcast)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      posRows.foreach { case (g, p) =>
        assert(got.get((g, p)).contains(unrolled(g)(p.toInt)),
          s"seed=$i bcast=$bcast g=$g pos=$p: got ${got.get((g, p))}, " +
            s"want ${unrolled(g)(p.toInt)}")
      }
      assert(got.size == posRows.size, s"seed=$i bcast=$bcast: extra/missing rows")
    }
  }

  test("valuesAtPositions stays exact with exchange reuse disabled") {
    // The boundary-sketch once-only invariant must be STRUCTURAL
    // (picked is checkpointed), not planner-contingent: with
    // spark.sql.exchange.reuse=false a reuse-dependent design would
    // evaluate percentile_approx twice with scheduling-dependent GK
    // merge orders, and the pruning intervals could disagree with the
    // offsets, dropping the shard that holds a position. Re-run the
    // naive-reference comparison with reuse off to prove the result
    // doesn't hinge on exchange dedup.
    val prev = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val rows = (for {
        g <- Seq("a", "b"); i <- 0 until 60
      } yield (g, ((i * 37) % 23 - 11).toDouble, i % 3 + 1)).toList
      val vc = rows.toDF("g", "v", "cnt0")
        .groupBy("g", "v").agg(sum($"cnt0").cast("decimal(10,0)").as("cnt"))
      val unrolled: Map[String, Vector[Double]] = rows
        .groupBy(_._1).map { case (g, rs) =>
          g -> rs.flatMap(r => Vector.fill(r._3)(r._2)).sorted.toVector
        }
      val posRows = unrolled.toSeq.flatMap { case (g, vs) =>
        Seq(0L, vs.size - 1L, vs.size / 2L, vs.size / 4L).distinct.map(p => (g, p))
      }
      for (bcast <- Seq(true, false)) {
        val got = graft.ext.Quantiles
          .valuesAtPositions(vc, Seq("g"), "v", "cnt",
            posRows.toDF("g", "__pos"), shards = 4, broadcastGroups = bcast)
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
          .toMap
        posRows.foreach { case (g, p) =>
          assert(got.get((g, p)).contains(unrolled(g)(p.toInt)),
            s"reuse=off bcast=$bcast g=$g pos=$p")
        }
        assert(got.size == posRows.size, s"reuse=off bcast=$bcast: extra/missing rows")
      }
    } finally spark.conf.set("spark.sql.exchange.reuse", prev)
  }

  test("all-null column: distinct 0, median null (value-counts path edges)") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (null, 1.0), (null, 2.0)).toDF("a", "b")
    val p = TableProfiler.profile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(p("2. count_distinct").getDouble(1) == 0.0)
    assert(p("6. median").isNullAt(1))
    assert(p("6. median").getDouble(2) == 1.5) // interpolated even-count median
  }
}
