package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Stats

/** Specs for the Stats module: Misra–Gries heavy hitters, Lorenz/
  * Gini, Benford, CUSUM, Kaplan–Meier, CUPED and k-anonymity. The
  * recurring shape: brute-force the definition on the driver, then
  * assert the distributed operator matches it bit-for-bit under more
  * than one partitioning.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")

  // ---- Misra–Gries / heavy hitters ----

  test("misraGries retains every token above the n/(cap+1) guarantee") {
    // skewed stream: token i appears 2^(9-i) times, shuffled
    val stream = scala.util.Random.shuffle(
      (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"t$i")).toList)
    val n = stream.size
    for (cap <- Seq(2, 5, 17)) {
      val kept = Stats.misraGries(stream.iterator, cap).toList
      val (sentinel, cands) = kept.partition(_._1 == "")
      assert(sentinel == List(("", n.toLong)), "sentinel must carry the count")
      assert(cands.size <= cap, "summary can never exceed its capacity")
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val mustKeep = exact.collect {
        case (t, c) if c.toLong * (cap + 1) > n => t
      }.toSet
      assert(mustKeep.subsetOf(cands.map(_._1).toSet),
        s"cap=$cap dropped a guaranteed heavy hitter")
    }
  }

  test("heavyHitters equals brute force and ignores partitioning") {
    // vocabulary far above capacity so the sketch actually prunes
    val docs = (0 until 200).map { i =>
      val heavy = if (i % 2 == 0) "alpha alpha beta" else "alpha gamma"
      s"$heavy rare${i} rare${i % 97} x${i % 53}"
    }.toDF("text")
    val exact = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val cap = 8
    val want = exact.filter { case (_, c) => c * (cap + 1) > n }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    for (parts <- Seq(1, 7)) {
      val got = Stats.heavyHitters(docs.repartition(parts), "text", cap)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(got == want, s"parts=$parts: sketch changed the ANSWER")
    }
  }

  // ---- Lorenz / Gini ----

  test("lorenzGini matches the brute-force rank formula") {
    val vals = Seq(1.0, 1.0, 2.0, 4.0, 4.0, 8.0, 20.0, 20.0, 20.0, 120.0)
    val df = vals.toDF("v")
    val rows = Stats.lorenzGini(df, "v").collect()
    // brute force on the driver: sorted ranks, Σ(2r−n−1)x / (nΣx)
    val sorted = vals.sorted
    val nn = sorted.size
    val sx = sorted.sum
    val gini = sorted.zipWithIndex
      .map { case (x, i) => (2.0 * (i + 1) - nn - 1) * x }.sum / (nn * sx)
    assert(rows.forall(r =>
      math.abs(r.getDouble(4) - gini) < 1e-5), "gini off the definition")
    // shares accumulate to exactly 1 and the decile sizes cover n
    assert(rows.map(_.getLong(1)).sum == nn)
    assert(rows.last.getDouble(3) == 1.0)
    val cums = rows.map(_.getDouble(3)).toSeq
    assert(cums == cums.sorted, "cumulative share must be monotone")
  }

  test("lorenzGini is partitioning-independent") {
    val df = (1 to 500).map(i => ((i * i) % 997 + 1).toDouble).toDF("v")
    val a = Stats.lorenzGini(df.repartition(1), "v").collect().toSeq
    val b = Stats.lorenzGini(df.repartition(13), "v").collect().toSeq
    assert(a == b)
  }

  // ---- Benford ----

  test("benfordReport extracts first significant digits exactly") {
    val df = Seq(1.00, 19.99, 123.45, 999.99, 0.05, 2.50, 21.0, 30000.0)
      .toDF("amt")
    val got = Stats.benfordReport(df, "amt").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // leading digits: 1, 1, 1, 9, 5, 2, 2, 3 (0.05 → 5 cents → digit 5)
    assert(got(1) == 3 && got(2) == 2 && got(3) == 1 &&
      got(5) == 1 && got(9) == 1)
    assert((2 to 9).filterNot(Set(2, 3, 5, 9)).forall(got(_) == 0L))
  }

  test("benford chi2 is ~0 on a perfect Benford sample") {
    // counts proportional to log10(1+1/d) out of 1000
    val counts = (1 to 9).map(d =>
      d -> math.round(1000 * math.log10(1.0 + 1.0 / d)).toInt)
    val df = counts.flatMap { case (d, c) =>
      Seq.fill(c)(d * 100.0) }.toDF("amt")
    val rows = Stats.benfordReport(df, "amt").collect()
    assert(rows.map(_.getDouble(4)).sum < 1.0,
      "chi2 should be tiny when observed ≈ expected")
  }

  // ---- CUSUM ----

  test("cusumChangepoint localizes a mean shift and telescopes to zero") {
    // 10 days at 5 events/day then 10 days at 15 — shift after day 10
    val events = ((1 to 10).flatMap(d => Seq.fill(5)(ts(d))) ++
      (11 to 20).flatMap(d => Seq.fill(15)(ts(d)))).toDF("ts")
    val rows = Stats.cusumChangepoint(events, "ts").collect()
    assert(rows.length == 20)
    // the scaled cusum telescopes: last value is exactly 0
    assert(rows.last.getLong(2) == 0L)
    val flagged = rows.filter(_.getBoolean(3)).map(_.getDate(0).toString)
    assert(flagged.toSeq == Seq("2024-01-10"),
      s"changepoint should be the last pre-shift day, got $flagged")
  }

  // ---- Kaplan–Meier ----

  private val evSchema = Seq("user_id", "event_type", "ts")

  test("kaplanMeier matches the hand-computed curve with censoring") {
    val ev = Seq(
      (1L, "signup", ts(1)), (1L, "purchase", ts(2)),
      (2L, "signup", ts(1)), (2L, "purchase", ts(3)),
      (3L, "signup", ts(1)),
      (4L, "signup", ts(1)),
      // horizon-setting unrelated event at day 6
      (5L, "click", ts(6))).toDF(evSchema: _*)
    val rows = Stats.kaplanMeier(ev, "signup", "purchase")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // t=1: risk 4, 1 event → S=0.75; t=2: risk 3, 1 event → S=0.5;
    // t=5: risk 2, censored 2 → S stays 0.5
    assert(rows.toSeq == Seq(
      (1, 4L, 1L, 0L, 0.75),
      (2, 3L, 1L, 0L, 0.5),
      (5, 2L, 0L, 2L, 0.5)))
  }

  test("kaplanMeier pins survival to 0 when the risk set empties") {
    val ev = Seq(
      (1L, "signup", ts(1)), (1L, "purchase", ts(4)),
      (2L, "signup", ts(1)), (2L, "purchase", ts(4))).toDF(evSchema: _*)
    val rows = Stats.kaplanMeier(ev, "signup", "purchase").collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 2L && rows.head.getLong(2) == 2L)
    assert(rows.head.getDouble(4) == 0.0, "r=d must yield S=0, not ln(0)")
  }

  test("kaplanMeier ignores pre-signup purchases") {
    val ev = Seq(
      (1L, "purchase", ts(1)), // before signup — must not count
      (1L, "signup", ts(3)), (1L, "purchase", ts(5)),
      (2L, "signup", ts(3))).toDF(evSchema: _*)
    val rows = Stats.kaplanMeier(ev, "signup", "purchase")
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    // u1 converts at t=2 (day5−day3); u2 censored at t=2 (horizon day5)
    assert(rows.toSeq == Seq((2, 1L, 1L)))
  }

  // ---- CUPED ----

  test("cupedReport reproduces the closed-form theta and shrinks variance") {
    // y strongly correlated with x: user u has pre value u, post 2u+noise
    val ev = (1 to 40).flatMap { u =>
      Seq((u.toLong, ts(5), u.toDouble),
        (u.toLong, ts(20), 2.0 * u + (u % 3))) }
      .toDF("user_id", "ts", "value")
    val out = Stats.cupedReport(ev, "user_id", "value", "ts",
      "2024-01-16 00:00:00", Seq(("a", 0.5), ("b", 0.5)), "s")
      .collect()
    // driver-side closed form over the same exact per-user sums
    val xs = (1 to 40).map(_.toDouble)
    val ys = (1 to 40).map(u => 2.0 * u + (u % 3))
    val n = xs.size.toDouble
    val covXY = n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum
    val varX = n * xs.map(a => a * a).sum - xs.sum * xs.sum
    val varY = n * ys.map(a => a * a).sum - ys.sum * ys.sum
    val theta = covXY / varX
    val rho2 = covXY * covXY / (varX * varY)
    out.foreach { r =>
      assert(math.abs(r.getDouble(4) - theta) < 1e-4)
      assert(math.abs(r.getDouble(5) - rho2) < 1e-4)
      assert(r.getDouble(5) > 0.99, "near-linear y~x must report ρ²≈1")
    }
    assert(out.map(_.getLong(1)).sum == 40L)
  }

  test("cupedReport is partitioning-independent") {
    val ev = (1 to 60).flatMap { u =>
      Seq((u.toLong, ts(3), (u % 7).toDouble),
        (u.toLong, ts(25), (u % 5) * 3.0)) }
      .toDF("user_id", "ts", "value")
    def run(p: Int) = Stats.cupedReport(ev.repartition(p), "user_id",
      "value", "ts", "2024-01-16 00:00:00",
      Seq(("a", 0.5), ("b", 0.5)), "s").collect().toSeq
    assert(run(1) == run(11))
  }

  // ---- isotonic calibration ----

  test("isotonicCalibration matches the driver-side PAV sweep") {
    // scores correlated with labels but with violations to pool
    val rows = (0 until 400).map { i =>
      val s = (i % 100) / 100.0
      val y = (i * 37 % 100) < (s * 80 + 10)
      (s, y)
    }
    val df = rows.toDF("score", "label")
    val got = graft.ext.Eval.isotonicCalibration(df, col("label"),
      col("score"), bins = 20).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    // driver PAV over the same integer-binned data
    val binned = rows.groupBy { case (s, _) =>
      math.min(math.round(s * 100000) * 20 / 100000, 19).toInt }
    val ordered = binned.toSeq.sortBy(_._1).map { case (b, rs) =>
      (b, rs.size.toLong, rs.count(_._2).toLong) }
    // pool-adjacent-violators with weighted means
    case class Blk(w: Long, s: Long, bins: List[Int]) {
      def mean: Double = s.toDouble / w.toDouble
    }
    val pooled = ordered.foldLeft(List.empty[Blk]) { case (acc, (b, w, s)) =>
      var st = Blk(w, s, List(b)) :: acc
      while (st.lengthCompare(2) >= 0 && st(1).mean >= st.head.mean) {
        val a :: bb :: rest = st: @unchecked
        st = Blk(a.w + bb.w, a.s + bb.s, bb.bins ++ a.bins) :: rest
      }
      st
    }.reverse
    val want = pooled.flatMap(bl => bl.bins.map(b => b ->
      math.round(bl.mean * 100000) / 100000.0)).toMap
    got.foreach { case (b, _, cal) =>
      assert(math.abs(cal - want(b)) < 2e-5,
        s"bin $b: minimax $cal vs PAV ${want(b)}")
    }
    // the fit is monotone non-decreasing in the bin
    val cals = got.sortBy(_._1).map(_._3).toSeq
    assert(cals == cals.sorted, "isotonic fit must be monotone")
    // and preserves the total positive mass (within rounding)
    val mass = got.map { case (_, n, cal) => n * cal }.sum
    assert(math.abs(mass - rows.count(_._2)) < 0.1)
  }

  // ---- OLS ----

  test("olsRegression recovers exact linear coefficients with R²=1") {
    val df = (1 to 100).map { i =>
      val x1 = (i % 10).toDouble; val x2 = (i % 7).toDouble
      ("g", 2.0 + 3.0 * x1 - 4.0 * x2, x1, x2)
    }.toDF("grp", "y", "x1", "x2")
    val r = Stats.olsRegression(df, "grp", "y", "x1", "x2").collect()
    assert(r.length == 1)
    assert(r.head.getDouble(2) == 2.0 && r.head.getDouble(3) == 3.0 &&
      r.head.getDouble(4) == -4.0 && r.head.getDouble(5) == 1.0)
  }

  test("olsRegression returns NULLs for a singular design") {
    val df = (1 to 50).map(i => ("g", i.toDouble, 5.0, 5.0))
      .toDF("grp", "y", "x1", "x2") // constant predictors → det = 0
    val r = Stats.olsRegression(df, "grp", "y", "x1", "x2").collect()
    assert(r.head.isNullAt(2) && r.head.isNullAt(3) &&
      r.head.isNullAt(4) && r.head.isNullAt(5))
  }

  test("olsRegression is partitioning-independent") {
    val df = (1 to 300).map { i =>
      (s"g${i % 3}", (i % 13).toDouble + 0.5 * (i % 5),
        (i % 13).toDouble, (i % 5).toDouble) }
      .toDF("grp", "y", "x1", "x2")
    val a = Stats.olsRegression(df.repartition(1), "grp", "y", "x1", "x2")
      .collect().toSeq
    val b = Stats.olsRegression(df.repartition(17), "grp", "y", "x1", "x2")
      .collect().toSeq
    assert(a == b)
  }

  // ---- log-rank / DiD / power ----

  /** Driver-side replica of the md5 bucket fraction (Sampling
    * convention): first 8 hex digits of md5(salt|unit) / 2³².
    */
  private def mdFrac(salt: String, unit: Long): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt|$unit".getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  test("logRank: no cohort difference gives chi2 = 0; a real shift is loud") {
    val users = (1L to 40L)
    val (ca, cb) = users.partition(u => mdFrac("s", u) < 0.5)
    assert(ca.nonEmpty && cb.nonEmpty)
    // one shared conversion time: O = E exactly and the hypergeometric
    // variance is zero (d = n), so chi2 is NULL — undefined, not a
    // fabricated 0/0
    val same = users.flatMap(u =>
      Seq((u, "signup", ts(1)), (u, "purchase", ts(3))))
      .toDF(evSchema: _*)
    val r0 = graft.ext.Stats.logRank(same, "signup", "purchase", "s")
      .collect().head
    assert(r0.getLong(0) == ca.size && r0.getLong(1) == cb.size)
    assert(r0.getDouble(4) == r0.getLong(2).toDouble,
      "expected events must equal observed when behavior is identical")
    assert(r0.isNullAt(5), "zero-variance design must yield NULL chi2")
    // cohort a converts at day 1, cohort b at day 9 → large chi2
    val shifted = users.flatMap { u =>
      val d = if (mdFrac("s", u) < 0.5) 2 else 10
      Seq((u, "signup", ts(1)), (u, "purchase", ts(d)))
    }.toDF(evSchema: _*)
    val r1 = graft.ext.Stats.logRank(shifted, "signup", "purchase", "s")
      .collect().head
    assert(r1.getDouble(5) > 10.0,
      s"a 8-day shift must be significant, got chi2=${r1.getDouble(5)}")
  }

  test("diffInDiff recovers a constructed treatment effect exactly") {
    val users = (1L to 60L)
    val ev = users.flatMap { u =>
      val treat = mdFrac("s", u) >= 0.5
      val pre = 10.0
      val post = if (treat) 17.0 else 12.0 // common trend +2, effect +5
      Seq((u, ts(5), pre), (u, ts(20), post))
    }.toDF("user_id", "ts", "value")
    val rows = graft.ext.Stats.diffInDiff(ev, "user_id", "value", "ts",
      "2024-01-16 00:00:00", "s").collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getDouble(4) == 5.0,
      s"did must isolate the +5 effect, got ${r.getDouble(4)}"))
    val means = rows.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(3)).toMap
    assert(means(("control", "pre")) == 10.0 &&
      means(("control", "post")) == 12.0 &&
      means(("treat", "post")) == 17.0)
  }

  test("abPower matches the closed-form MDE on constructed arms") {
    val users = (1L to 200L)
    val ev = users.map(u => (u, ts(10), (u % 10).toDouble))
      .toDF("user_id", "ts", "value")
    val variants = Seq(("control", 0.5), ("treat_a", 0.5))
    val out = graft.ext.Stats.abPower(ev, "user_id", "value",
      variants, "s").collect()
    assert(out.length == 1)
    val r = out.head
    // driver-side closed form over the same per-user values
    val byArm = users.groupBy(u =>
      if (mdFrac("s", u) < 0.5) "control" else "treat_a")
      .view.mapValues(_.map(u => (u % 10).toDouble).toSeq).toMap
    val (cs, ts_) = (byArm("control"), byArm("treat_a"))
    assert(r.getLong(1) == cs.size && r.getLong(2) == ts_.size)
    def ssq(v: Seq[Double]) = v.map(x => x * x).sum - math.pow(v.sum, 2) / v.size
    val sp2 = (ssq(cs) + ssq(ts_)) / (cs.size + ts_.size - 2)
    val mde = 2.801585219 * math.sqrt(sp2 * (1.0 / cs.size + 1.0 / ts_.size))
    assert(math.abs(r.getDouble(5) - mde) < 1e-4,
      s"mde ${r.getDouble(5)} vs closed form $mde")
    assert(r.getDouble(6) > 0 && r.getDouble(4) > 0)
  }

  // ---- funnel latency / Theil–Sen ----

  test("funnelLatency measures first-to-first-after hops per user") {
    val ev = Seq(
      // u1: signup day1 → click day2 (86400s), click→purchase day2→day4
      (1L, "signup", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(4)),
      // u2: click BEFORE signup must not count; the day-5 one does
      (2L, "click", ts(1)), (2L, "signup", ts(3)), (2L, "click", ts(5)),
      // u3: signup only — no transitions
      (3L, "signup", ts(1))).toDF(evSchema: _*)
    val rows = graft.ext.Events.funnelLatency(ev,
      Seq("signup", "click", "purchase"), Seq(("p50", 0.5)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val m = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    val dayUs = 86400e6
    // signup→click: u1 1 day, u2 2 days → p50 = 1.5 days
    assert(m("1_signup_to_click") == ((2L, 1.5 * dayUs)))
    // click→purchase: only u1 (2 days from the qualifying click)
    assert(m("2_click_to_purchase") == ((1L, 2.0 * dayUs)))
  }

  test("theilSen shrugs off the outlier day that drags least squares") {
    // perfect line c = 3d + 2 over 11 days, one wrecked day
    val ev = (0 to 10).flatMap { d =>
      val c = if (d == 5) 500 else 3 * d + 2
      Seq.fill(c)(("t", ts(d + 1)))
    }.toDF("event_type", "ts")
    val r = graft.ext.Events.theilSen(ev).collect().head
    assert(r.getLong(1) == 11L)
    assert(r.getDouble(2) == 3.0,
      s"pairwise-median slope must ignore the outlier, got ${r.getDouble(2)}")
    // intercept from the residual median: day_num offset folds in, so
    // recover c at the first fixture day and compare to the true line
    val day0 = 19723 // 2024-01-01
    assert(math.abs((r.getDouble(2) * day0 + r.getDouble(3)) - 2.0) < 1e-6)
  }

  test("theilSen is partitioning-independent") {
    val ev = (0 to 20).flatMap { d =>
      Seq.fill((d * 7) % 13 + 1)(("t", ts(d + 1))) }.toDF("event_type", "ts")
    val a = graft.ext.Events.theilSen(ev.repartition(1)).collect().toSeq
    val b = graft.ext.Events.theilSen(ev.repartition(7)).collect().toSeq
    assert(a == b)
  }

  // ---- label propagation ----

  /** Driver replica of the synchronous LPA round (self-vote, count
    * DESC / label ASC tie rule).
    */
  private def lpaBrute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nodes = sym.map(_._1).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 0 until iters) {
      lab = nodes.map { n =>
        val votes = (sym.filter(_._1 == n).map(m => lab(m._2)) :+ lab(n))
          .groupBy(identity).view.mapValues(_.size).toSeq
        n -> votes.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lab
  }

  test("labelPropagation: triangle and pendant edge settle to two communities") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = graft.ext.Graph.labelPropagation(edges, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L)))
  }

  test("labelPropagation matches the driver replica and ignores partitioning") {
    val raw = (1 to 60).flatMap(i =>
      Seq((i.toLong, ((i * 7) % 60 + 1).toLong),
        (i.toLong, ((i * 13) % 60 + 1).toLong)))
      .filter { case (a, b) => a < b }.distinct
    val want = lpaBrute(raw, 4)
    for (parts <- Seq(1, 9)) {
      val got = graft.ext.Graph.labelPropagation(
        raw.toDF("id_a", "id_b").repartition(parts), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts diverged from the driver replica")
    }
  }

  // ---- k-anonymity ----

  test("kAnonymity flags small equivalence classes and counts diversity") {
    val df = Seq(
      ("US", "A", 1), ("US", "A", 2), ("US", "A", 2),
      ("US", "B", 1),
      ("DE", "A", 3), ("DE", "A", 3)).toDF("country", "seg", "sens")
    val rows = Stats.kAnonymity(df, Seq("country", "seg"), "sens", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(rows == Seq(
      ("DE", "A", 2L, 1L, true),
      ("US", "A", 3L, 2L, false),
      ("US", "B", 1L, 1L, true)))
  }

  test("spearmanByGroup: monotone ±1, hand-computed ties, singleton NULL") {
    val df = Seq(
      // group "up": y strictly increasing with x -> rho = 1
      ("up", 1L, 10.0), ("up", 2L, 20.0), ("up", 3L, 30.0), ("up", 4L, 40.0),
      // group "down": y strictly decreasing with x -> rho = -1
      ("down", 1L, 9.0), ("down", 2L, 7.0), ("down", 3L, 5.0),
      // group "tie": x = (1,2,2,4), y = (1,3,2,4)
      //   avg ranks x: 1, 2.5, 2.5, 4 ; y: 1, 3, 2, 4
      //   d = (0, -.5, .5, 0), sum d^2 = 0.5 -> rho = 1 - 3/ (4*15) = 0.95
      ("tie", 1L, 1.0), ("tie", 2L, 3.0), ("tie", 2L, 2.0), ("tie", 4L, 4.0),
      // singleton group: rho undefined -> NULL
      ("one", 5L, 5.0)
    ).toDF("g", "x", "y")
    val rows = Stats.spearmanByGroup(df, "g", "x", "y").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows == Seq(
      ("down", 3L, Some(-1.0)),
      ("one", 1L, None),
      ("tie", 4L, Some(0.95)),
      ("up", 4L, Some(1.0))))
  }

  test("seasonalDow: weekly rhythm flattens to a constant deseasonalized series") {
    // 2024-01-01 is a Monday (dow 0). Two full weeks: Mondays get 10
    // events, every other day 5 — the multiplicative index must be
    // 1.75 on Mondays, 0.875 elsewhere, and deseasonalization must
    // flatten the whole series to the same constant.
    val ev = (1 to 14).flatMap { d =>
      val c = if (d == 1 || d == 8) 10 else 5
      Seq.fill(c)(("t", ts(d)))
    }.toDF("event_type", "ts")
    val rows = graft.ext.Events.seasonalDow(ev).collect()
    assert(rows.length == 14)
    val monday = rows.filter(_.getInt(2) == 0)
    assert(monday.length == 2 && monday.forall(_.getDouble(4) == 1.75))
    val rest = rows.filter(_.getInt(2) != 0)
    assert(rest.forall(_.getDouble(4) == 0.875))
    // index = count/overall-mean ratio, so count/index is constant
    assert(rows.forall(_.getDouble(5) == 5.71429),
      s"deseasonalized series must be flat: ${rows.map(_.getDouble(5)).toSeq}")
  }

  test("acfDaily: alternating series anti-correlates at lag 1, zero-filling absent days") {
    // events only on odd days 1,3,5,7 (4 each); even days ABSENT from
    // the input — the spine must zero-fill them, giving the series
    // [4,0,4,0,4,0,4] whose exact ACF is -1152/1344 at lag 1 and
    // 944/1344 at lag 2 (hand-computed integer rational).
    val ev = Seq(1, 3, 5, 7).flatMap { d =>
      Seq.fill(4)(("t", ts(d))) }.toDF("event_type", "ts")
    val rows = graft.ext.Events.acfDaily(ev, maxLag = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq((1, 6L, -0.85714), (2, 5L, 0.70238)),
      s"got ${rows.toSeq}")
  }

  test("acfDaily: constant series yields NULL acf; partitioning-independent") {
    val flat = (1 to 10).flatMap(d => Seq.fill(3)(("t", ts(d))))
      .toDF("event_type", "ts")
    val r = graft.ext.Events.acfDaily(flat, maxLag = 3).collect()
    assert(r.length == 3 && r.forall(_.isNullAt(3)))
    val ev = (1 to 20).flatMap { d =>
      Seq.fill((d * 5) % 7 + 1)(("t", ts(d))) }.toDF("event_type", "ts")
    val a = graft.ext.Events.acfDaily(ev.repartition(1), 4).collect().toSeq
    val b = graft.ext.Events.acfDaily(ev.repartition(7), 4).collect().toSeq
    assert(a == b)
  }

  test("conformalOls: perfect fit recovers the line with zero-width intervals") {
    // y = 2 + 3x exactly everywhere: residuals are 0 on every split,
    // so qhat = 0 and every test row is covered
    val df = (1L to 400L).map(i => (i, "g", i.toDouble, 2.0 + 3.0 * i))
      .toDF("doc_id", "g", "x", "y")
    val r = Stats.conformalOls(df, "g", "y", "x").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getDouble(3) == 2.0 && row.getDouble(4) == 3.0)
    assert(row.getDouble(5) == 0.0, "perfect fit -> zero half-width")
    assert(row.getDouble(7) == 1.0, "zero residuals -> full coverage")
  }

  test("conformalOls: constant predictor surfaces NULLs, never an artifact") {
    val df = (1L to 100L).map(i => (i, "g", 5.0, i.toDouble))
      .toDF("doc_id", "g", "x", "y")
    val r = Stats.conformalOls(df, "g", "y", "x").collect().head
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(7))
  }

  test("conformalOls: qhat is the ceil((n+1)·9/10)-th smallest calibration residual") {
    // train rows sit exactly on y = 2 + 3x (so the fit is exact);
    // cal/test rows get a known per-id deviation id/1000.0 — the
    // expected qhat and coverage are recomputed here independently
    // from the SAME md5 split the operator uses.
    import graft.ext.Sampling
    val ids = (1L to 600L)
    val u = ids.toDF("doc_id")
      .withColumn("u", Sampling.hashUniform(col("doc_id"), "conformal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def split(i: Long) =
      if (u(i) < 0.5) "train" else if (u(i) < 0.75) "cal" else "test"
    val df = ids.map { i =>
      val dev = if (split(i) == "train") 0.0 else i / 1000.0
      (i, "g", i.toDouble, 2.0 + 3.0 * i + dev)
    }.toDF("doc_id", "g", "x", "y")
    val r = Stats.conformalOls(df, "g", "y", "x").collect().head
    val calDevs = ids.filter(split(_) == "cal").map(_ / 1000.0).sorted
    val k = math.min(((calDevs.length + 1) * 9 + 9) / 10, calDevs.length)
    val qhat = calDevs(k - 1)
    assert(r.getLong(1) == calDevs.length)
    assert(math.abs(r.getDouble(5) - qhat) < 1e-9,
      s"qhat ${r.getDouble(5)} vs expected $qhat")
    val testIds = ids.filter(split(_) == "test")
    val covered = testIds.count(i => i / 1000.0 <= qhat + 1e-12)
    assert(r.getLong(6) == covered.toLong,
      s"n_covered ${r.getLong(6)} vs expected $covered")
  }

  test("psiDrift: zero for the pool-identical group, symmetric shifts rank") {
    // single group: group distribution IS the pool -> every bin has
    // p = q exactly (same counts, same totals) -> PSI = 0
    val solo = Seq(("s", 1L), ("s", 5L), ("s", 9L)).toDF("g", "v")
    val soloOut = Stats.psiDrift(solo, "g", "v", nBins = 4).collect()
    assert(soloOut.length == 1 && soloOut(0).getDouble(2) == 0.0)

    // two mirror-image groups: lo concentrated in the bottom bin,
    // hi in the top -> equal positive PSI by symmetry
    val two = (Seq.fill(8)(("lo", 0L)) ++ Seq(("lo", 9L)) ++
      Seq.fill(8)(("hi", 9L)) ++ Seq(("hi", 0L))).toDF("g", "v")
    val rows = Stats.psiDrift(two, "g", "v", nBins = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(rows.map(_._2) == Seq(9L, 9L))
    assert(rows(0)._3 == rows(1)._3 && rows(0)._3 > 0.25,
      s"mirror groups must drift equally and strongly: $rows")
  }
}
