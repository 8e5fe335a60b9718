package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{abs => fabs, _}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Distribution / population statistics over corpus-scale relations:
  * sketch-pruned heavy hitters, Lorenz/Gini concentration,
  * Benford-law data-quality scoring, CUSUM changepoint localization,
  * Kaplan–Meier survival, CUPED experiment variance reduction and a
  * k-anonymity privacy audit. Reference scope: the reference
  * delegates all SQL to Athena (/root/reference/aws-athena.sh:140)
  * and has no statistics surface; this module is part of the §7.5
  * training-data extension — the measurement toolkit a pipeline needs
  * BEFORE it commits 100 TB to a mixture (who dominates the corpus,
  * did ingest drift, which experiment arm actually moved the metric).
  *
  * House exactness rule throughout: integer/decimal arithmetic all
  * the way to one final float division (or a per-term
  * `round(ln …, 9)` quantization before an exact decimal sum), so
  * every output is a pure function of the DATA — bit-identical on any
  * engine and any partitioning.
  */
object Stats {

  private val Dec186 = DecimalType(18, 6)
  private val Dec189 = DecimalType(18, 9)
  private val Dec380 = DecimalType(38, 0)

  // ---------------------------------------------------------------
  // Heavy hitters: Misra–Gries candidates + exact recount
  // ---------------------------------------------------------------

  /** One Misra–Gries pass over a partition's token stream with
    * `capacity` counters, emitting the surviving candidate keys
    * (count field 0) plus ONE sentinel row (`""`, partitionTokens) —
    * the empty string can never be a real token (the tokenizer drops
    * it), so the sentinel rides the same relation and the total needs
    * no second scan.
    *
    * Retention guarantee (the classic one): any token with partition
    * count > n_p/(capacity+1) survives, because each decrement round
    * consumes `capacity`+1 units of stream mass (the arriving token
    * plus one from each resident counter), so at most
    * n_p/(capacity+1) rounds occur and a heavier token cannot reach
    * zero. Amortized O(1) per token: a round costs O(capacity) and at
    * most n_p/(capacity+1) rounds fire.
    */
  /** One Misra–Gries counter update (shared by the batch pass and the
    * streaming shard state): count the arrival, admit below capacity,
    * else decrement-all (over a snapshot — no mutation mid-iteration).
    */
  private[graft] def mgUpdate(m: scala.collection.mutable.HashMap[String, Long],
      t: String, capacity: Int): Unit =
    m.get(t) match {
      case Some(c) => m.update(t, c + 1L)
      case None if m.size < capacity => m.update(t, 1L)
      case None =>
        m.toArray.foreach { case (k, c) =>
          if (c == 1L) m.remove(k) else m.update(k, c - 1L)
        }
    }

  private[graft] def misraGries(it: Iterator[String],
      capacity: Int): Iterator[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var seen = 0L
    while (it.hasNext) {
      mgUpdate(m, it.next(), capacity)
      seen += 1L
    }
    m.keysIterator.map((_, 0L)) ++ Iterator(("", seen))
  }

  /** Exact heavy hitters above frequency 1/(capacity+1): (token,
    * n_occurrences) for every token whose exact corpus count
    * satisfies count·(capacity+1) > N, (count DESC, token) order.
    *
    * The scalable two-pass shape (the reason this is not just
    * `q_top_tokens`): pass 1 is a per-partition Misra–Gries sketch —
    * per-partition candidates UNION to a guaranteed superset of every
    * global heavy hitter (pigeonhole: C > N/(cap+1) forces
    * C_p > n_p/(cap+1) in at least one partition, where MG retains
    * it). Pass 2 recounts ONLY the candidates (a broadcast semi-join;
    * ≤ capacity × partitions keys regardless of vocabulary size) and
    * applies the exact integer threshold. The final set is therefore
    * a pure function of the data — the sketch affects WORK, never the
    * answer — and no shuffle ever carries the full vocabulary.
    *
    * The sketch relation is consumed ONCE: the token total (the
    * sentinel rows' sum) is attached to every candidate row by a
    * global window over the aggregated sketch — a frame bounded at
    * capacity × partitions + 1 rows by construction, never the
    * corpus — so the recount's inner join delivers both the candidate
    * pruning and the threshold operand in one broadcast. (The naive
    * two-filters-over-one-frame shape re-executes the Misra–Gries
    * pass per consumer: object-typed MapPartitions subtrees do not
    * canonicalize equal, so AQE cannot reuse their exchanges —
    * measured on the final adaptive plan.)
    */
  def heavyHitters(df: DataFrame, textCol: String,
      capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = Dedup.spread(df, textCol)
      .select(explode(TextStats.tokens(col(textCol))).as("token"))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cands = toks.as[String]
      .mapPartitions(it => misraGries(it, capacity))
      .toDF("token", "__pn")
      .groupBy("token").agg(sum(col("__pn")).as("__pn"))
      .withColumn("__total", sum(col("__pn")).over(all))
      .filter(col("token") =!= "")
      .select("token", "__total")
    toks.join(broadcast(cands), Seq("token"))
      .groupBy("token", "__total").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * lit(capacity + 1L) > col("__total"))
      .select(col("token"), col("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
  }

  // ---------------------------------------------------------------
  // Lorenz curve / Gini concentration
  // ---------------------------------------------------------------

  /** Concentration report of a positive value distribution: one row
    * per rank-decile (1 = smallest values) with (decile, n_rows,
    * value_share, cum_value_share) plus the exact Gini coefficient
    * repeated on every row — the "what fraction of revenue do the top
    * 10% hold" card, and the inequality scalar in one result.
    *
    * Exact with NO global sort: the input collapses to a value-counts
    * grid, [[Quantiles.shardedCumsum]] supplies each distinct value's
    * global cumulative count via the two-phase range-sharded prefix
    * sum (32-row offset pass; boundary placement provably cannot
    * change the cumsum), and the Gini rank sum needs only per-VALUE
    * arithmetic from there: rows holding value v with count c and C
    * rows strictly below contribute Σ(2r−n−1)·v = v·c·(2C+c−n)
    * exactly, summed in DECIMAL(38,6). A value's rows share one rank
    * range, so its decile is the range-END decile ⌈cum·D/n⌉ —
    * deterministic under ties by construction. One float division per
    * output cell, rounded to 5 decimals.
    *
    * Width: the decimal rank-sum factor c·(2C+c−n) runs in
    * DECIMAL(38,0) — long multiplication would wrap near n ≈ 2³², and
    * 100 TB of rows is past that.
    */
  def lorenzGini(df: DataFrame, valueCol: String,
      deciles: Int = 10): DataFrame = {
    require(deciles >= 2, s"need >= 2 deciles, got $deciles")
    val vc = df.select(col(valueCol).cast(Dec186).as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__c"))
      .withColumn("__g", lit(0))
    val cum = Quantiles.shardedCumsum(vc, Seq("__g"), "__v", "__c")
    val tot = vc.agg(sum(col("__c")).as("__n"),
      sum(col("__v") * col("__c").cast(Dec380)).as("__sx"))
    val contrib = cum.crossJoin(broadcast(tot))
      .withColumn("__below", col("cum") - col("__c"))
      .withColumn("__num", col("__v") * (col("__c").cast(Dec380) *
        (col("__below") * 2 + col("__c") - col("__n")).cast(Dec380)))
      .withColumn("decile",
        expr(s"(cum * $deciles + __n - 1) div __n").cast("int"))
    val gini = contrib
      .agg(sum(col("__num")).as("__gnum"), max(col("__n")).as("__n2"),
        max(col("__sx")).as("__sx2"))
      .select(round(col("__gnum").cast("double") /
        (col("__n2").cast("double") * col("__sx2").cast("double")), 5)
        .as("gini"))
    val perDecile = contrib.groupBy("decile")
      .agg(sum(col("__c")).as("n_rows"),
        sum(col("__v") * col("__c").cast(Dec380)).as("__dx"),
        max(col("__sx")).as("__sx"))
    // bounded global window: exactly `deciles` rows by construction
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDecile
      .withColumn("value_share",
        round(col("__dx").cast("double") / col("__sx").cast("double"), 5))
      .withColumn("cum_value_share",
        round(sum(col("__dx")).over(w).cast("double") /
          col("__sx").cast("double"), 5))
      .crossJoin(broadcast(gini))
      .select(col("decile"), col("n_rows"), col("value_share"),
        col("cum_value_share"), col("gini"))
      .orderBy("decile")
  }

  // ---------------------------------------------------------------
  // Benford first-digit data-quality test
  // ---------------------------------------------------------------

  /** First-significant-digit distribution of a positive amount column
    * against Benford's law: (digit, n, observed_frac, expected_frac,
    * chi2_contrib) for digits 1–9 — the classic fabricated-or-
    * truncated-amounts smoke alarm for a financial fact table.
    *
    * Digit extraction is integer-exact: amounts are cent-quantized
    * (round(x·100) as long — scaling by 10² never changes the leading
    * significant digit) and the digit is the first character of the
    * integer's decimal rendering, so no log/pow float edge can
    * misclassify values sitting on a power of ten. The expected
    * probability log₁₀(1+1/d) is quantized per-digit to 9 decimals
    * BEFORE any arithmetic (the OraclesExt ln-quantization rule), so
    * the chi-square composition runs on identical doubles in any
    * engine. Counts are one map-side-combined 9-group aggregation;
    * everything downstream is a 9-row frame.
    */
  def benfordReport(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val cents = round(col(valueCol) * 100).cast(LongType)
    val counts = df
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val digits = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val tot = counts.agg(sum(col("n")).as("__N"))
    val e = round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 9)
    val expN = e * col("__N").cast("double")
    digits.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__N").cast("double"), 5)
          .as("observed_frac"),
        e.as("expected_frac"),
        round((col("n").cast("double") - expN) *
          (col("n").cast("double") - expN) / expN, 5).as("chi2_contrib"))
      .orderBy("digit")
  }

  // ---------------------------------------------------------------
  // CUSUM changepoint localization
  // ---------------------------------------------------------------

  /** Cumulative-sum changepoint scan over the daily event-count
    * series: (day, n_events, cusum_scaled, is_changepoint), where
    * cusum_scaled(k) = Σ_{i≤k} (cᵢ·D − T) = D·Σ(cᵢ − mean) — the
    * plain CUSUM statistic scaled by the day count D so it stays in
    * EXACT integer arithmetic (no float mean, no drift by evaluation
    * order). The flagged day(s) are the argmax of |cusum|: the
    * maximum-likelihood single-changepoint location for a mean shift
    * (Page 1954's statistic; ties flag every maximizer — a
    * deterministic set, not a pick).
    *
    * Scale shape: one map-side-combined day roll-up collapses the
    * stream to its calendar grid; the cumulative window and argmax
    * join run over one-row-per-day input (bounded: thousands of rows
    * for years of data), with totals cross-joined from broadcast
    * 1-row frames.
    */
  def cusumChangepoint(df: DataFrame, tsCol: String): DataFrame = {
    val daily = df.select(to_date(col(tsCol)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_events"))
    val tot = daily.agg(count(lit(1)).as("__d"), sum(col("n_events")).as("__t"))
    // bounded global window: one row per calendar day
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = daily.crossJoin(broadcast(tot))
      .withColumn("cusum_scaled",
        sum(col("n_events") * col("__d") - col("__t")).over(w))
    val mx = cs.agg(max(fabs(col("cusum_scaled"))).as("__mx"))
    cs.crossJoin(broadcast(mx))
      .select(col("day"), col("n_events"), col("cusum_scaled"),
        (fabs(col("cusum_scaled")) === col("__mx")).as("is_changepoint"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------
  // Kaplan–Meier survival
  // ---------------------------------------------------------------

  /** Kaplan–Meier estimate of time-to-conversion: per user, the
    * duration in days from their first `startType` event to their
    * first `endType` event AT OR AFTER it; users who never convert
    * are right-CENSORED at the corpus horizon (max ts) — exactly the
    * survival-analysis treatment that a naive "average days to
    * purchase over converters" gets wrong (it silently drops the
    * non-converters and biases the curve optimistic). Output: one row
    * per distinct duration day t — (t, n_at_risk, n_events,
    * n_censored, survival) with S(t) = Π_{t'≤t} (1 − d_t'/r_t').
    *
    * Determinism: each factor ln((r−d)/r) is quantized to 9 decimals
    * and cumulated in exact DECIMAL(18,9) (the OraclesExt
    * ln-quantization rule), with a single exp + round(5) at the end;
    * if the risk set ever empties exactly (r = d), survival is pinned
    * to 0.0 from that day on rather than fed to ln(0). Convention:
    * events and censorings AT t both leave the risk set after t.
    *
    * Scale shape: per-user firsts are map-side-combined min
    * aggregations; the join of start-users to end events is keyed on
    * the unit; everything after collapses to the day-duration grid
    * (bounded by the study span — one row per distinct day count), so
    * the cumulative windows never see corpus-sized input. The horizon
    * is a broadcast 1-row frame.
    */
  def kaplanMeier(ev: DataFrame, startType: String, endType: String,
      typeCol: String = "event_type", unitCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val starts = ev.filter(col(typeCol) === startType)
      .groupBy(col(unitCol)).agg(min(col(tsCol)).as("__t0"))
    val ends = ev.filter(col(typeCol) === endType)
      .select(col(unitCol), col(tsCol).as("__te"))
    val horizon = ev.agg(max(col(tsCol)).as("__tmax"))
    val firstEnd = starts.join(ends, Seq(unitCol), "left")
      .withColumn("__teq", when(col("__te") >= col("__t0"), col("__te")))
      .groupBy(col(unitCol), col("__t0"))
      .agg(min(col("__teq")).as("__tc"))
    val dur = firstEnd.crossJoin(broadcast(horizon))
      .select(
        when(col("__tc").isNotNull,
          datediff(to_date(col("__tc")), to_date(col("__t0"))))
          .otherwise(datediff(to_date(col("__tmax")), to_date(col("__t0"))))
          .as("t"),
        col("__tc").isNotNull.as("__ev"))
    val grid = dur.groupBy("t").agg(
      sum(when(col("__ev"), 1L).otherwise(0L)).as("n_events"),
      sum(when(!col("__ev"), 1L).otherwise(0L)).as("n_censored"))
    val nTot = dur.agg(count(lit(1)).as("__n"))
    // bounded global windows: one row per distinct duration day
    val before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val incl = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(nTot))
      .withColumn("n_at_risk", col("__n") - coalesce(
        sum(col("n_events") + col("n_censored")).over(before), lit(0L)))
      // the r = d row would feed ln(0): its factor is pinned to 0 and
      // the __dead flag pins survival to 0.0 from that row on instead
      .withColumn("__lf", when(col("n_events") === 0L ||
          col("n_events") === col("n_at_risk"), lit(0d).cast(Dec189))
        .otherwise(round(log((col("n_at_risk") - col("n_events"))
          .cast("double") / col("n_at_risk").cast("double")), 9)
          .cast(Dec189)))
      .withColumn("__dead",
        max(when(col("n_events") === col("n_at_risk"), 1).otherwise(0))
          .over(incl))
      .withColumn("survival", when(col("__dead") === 1, lit(0.0))
        .otherwise(round(exp(sum(col("__lf")).over(incl).cast("double")), 5)))
      .select(col("t"), col("n_at_risk"), col("n_events"),
        col("n_censored"), col("survival"))
      .orderBy("t")
  }

  // ---------------------------------------------------------------
  // Log-rank test (two-cohort survival comparison)
  // ---------------------------------------------------------------

  /** Log-rank test comparing time-to-conversion between two md5
    * cohorts (frac < split → `cohortA`): ONE summary row (n_a, n_b,
    * d_a, d_b, expected_a, chi2) — "did the treatment actually change
    * WHEN users convert", the hypothesis test that belongs next to
    * the [[kaplanMeier]] curve (comparing the curves by eye is not a
    * test, and comparing mean durations ignores censoring).
    *
    * Statistic: at each distinct event time t, observed events in A
    * vs the hypergeometric expectation e_t = d·n_A/n and variance
    * v_t = d·(n_A/n)·(n_B/n)·(n−d)/(n−1); χ² = (Σ(d_A−e))²/Σv ~ χ²₁
    * under H₀. Per-term e_t and v_t are quantized to 9 decimals and
    * summed in exact DECIMAL — float sums over the duration grid
    * would be addition-order-dependent, the same trap the ln-
    * quantization rule exists for. Everything upstream (risk sets,
    * event counts) is integer on the day-duration grid; one rounded
    * division at the end.
    *
    * Scale shape: identical to [[kaplanMeier]] — per-unit firsts,
    * unit-keyed join, then a duration-grid-bounded frame; the cohort
    * dimension multiplies the grid by 2, nothing more.
    */
  def logRank(ev: DataFrame, startType: String, endType: String,
      salt: String, split: Double = 0.5, typeCol: String = "event_type",
      unitCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(split > 0 && split < 1, s"split must be in (0,1): $split")
    val starts = ev.filter(col(typeCol) === startType)
      .groupBy(col(unitCol)).agg(min(col(tsCol)).as("__t0"))
    val ends = ev.filter(col(typeCol) === endType)
      .select(col(unitCol), col(tsCol).as("__te"))
    val horizon = ev.agg(max(col(tsCol)).as("__tmax"))
    val frac = conv(substring(md5(concat_ws("|", lit(salt),
      col(unitCol).cast("string"))), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)
    val dur = starts.join(ends, Seq(unitCol), "left")
      .withColumn("__teq", when(col("__te") >= col("__t0"), col("__te")))
      .groupBy(col(unitCol), col("__t0"))
      .agg(min(col("__teq")).as("__tc"))
      .crossJoin(broadcast(horizon))
      .select(
        when(frac < split, lit("a")).otherwise(lit("b")).as("__g"),
        when(col("__tc").isNotNull,
          datediff(to_date(col("__tc")), to_date(col("__t0"))))
          .otherwise(datediff(to_date(col("__tmax")), to_date(col("__t0"))))
          .as("t"),
        col("__tc").isNotNull.as("__ev"))
    val grid = dur.groupBy("t").agg(
      sum(when(col("__ev") && col("__g") === "a", 1L).otherwise(0L))
        .as("da"),
      sum(when(col("__ev") && col("__g") === "b", 1L).otherwise(0L))
        .as("db"),
      sum(when(col("__g") === "a", 1L).otherwise(0L)).as("xa"),
      sum(when(col("__g") === "b", 1L).otherwise(0L)).as("xb"))
    val tots = dur.groupBy().agg(
      sum(when(col("__g") === "a", 1L).otherwise(0L)).as("__na0"),
      sum(when(col("__g") === "b", 1L).otherwise(0L)).as("__nb0"))
    // risk sets from the departures strictly before t (grid-bounded)
    val before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val rk = grid.crossJoin(broadcast(tots))
      .withColumn("na", col("__na0") -
        coalesce(sum(col("xa")).over(before), lit(0L)))
      .withColumn("nb", col("__nb0") -
        coalesce(sum(col("xb")).over(before), lit(0L)))
      .withColumn("n", col("na") + col("nb"))
      .withColumn("d", col("da") + col("db"))
      .filter(col("d") > 0 && col("na") > 0 && col("nb") > 0)
      .withColumn("__e", round(col("d").cast("double") *
        col("na").cast("double") / col("n").cast("double"), 9)
        .cast(Dec189))
      .withColumn("__v", when(col("n") > 1,
        round(col("d").cast("double") * col("na").cast("double") *
          col("nb").cast("double") * (col("n") - col("d")).cast("double") /
          (col("n").cast("double") * col("n").cast("double") *
            (col("n") - 1).cast("double")), 9).cast(Dec189))
        .otherwise(lit(0d).cast(Dec189)))
    rk.agg(sum(col("da")).as("d_a"), sum(col("db")).as("d_b"),
      sum(col("__e")).as("__se"), sum(col("__v")).as("__sv"),
      max(col("__na0")).as("n_a"), max(col("__nb0")).as("n_b"))
      .select(col("n_a"), col("n_b"), col("d_a"), col("d_b"),
        round(col("__se").cast("double"), 5).as("expected_a"),
        when(col("__sv") > 0,
          round((col("d_a").cast("double") - col("__se").cast("double")) *
            (col("d_a").cast("double") - col("__se").cast("double")) /
            col("__sv").cast("double"), 5)).as("chi2"))
  }

  // ---------------------------------------------------------------
  // Difference-in-differences
  // ---------------------------------------------------------------

  /** Difference-in-differences readout over the 2×2 (cohort ×
    * pre/post) design: one row per cell — (cohort, period, n_events,
    * mean_value, did) with the DiD effect
    * (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)
    * repeated on every row. The estimator that separates "the
    * treatment moved the metric" from "the metric moved for
    * everyone" when assignment is a cohort, not a coin flip per
    * event. Cohorts are the md5 convention (frac < split → control).
    *
    * Exactness: per-cell sums in DECIMAL(18,6), counts integer, four
    * double divisions and three subtractions composed identically in
    * both engines, rounded once. One map-side-combined aggregation
    * to a 4-row frame; the DiD scalar is a broadcast 1-row join.
    */
  def diffInDiff(ev: DataFrame, unitCol: String, valueCol: String,
      tsCol: String, splitTs: String, salt: String,
      split: Double = 0.5): DataFrame = {
    val cut = lit(splitTs).cast("timestamp")
    val frac = conv(substring(md5(concat_ws("|", lit(salt),
      col(unitCol).cast("string"))), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)
    val cells = ev.select(
      when(frac < split, lit("control")).otherwise(lit("treat"))
        .as("cohort"),
      when(col(tsCol) < cut, lit("pre")).otherwise(lit("post"))
        .as("period"),
      col(valueCol).cast(Dec186).as("__v"))
      .groupBy("cohort", "period")
      .agg(count(lit(1)).as("n_events"), sum(col("__v")).as("__s"))
      .withColumn("mean_value",
        round(col("__s").cast("double") / col("n_events").cast("double"), 5))
    def cell(c: String, p: String) = max(when(col("cohort") === c &&
      col("period") === p, col("__s").cast("double") /
        col("n_events").cast("double")))
    val did = cells.agg(
      round(cell("treat", "post") - cell("treat", "pre") -
        (cell("control", "post") - cell("control", "pre")), 5).as("did"))
    cells.crossJoin(broadcast(did))
      .select(col("cohort"), col("period"), col("n_events"),
        col("mean_value"), col("did"))
      .orderBy("cohort", "period")
  }

  // ---------------------------------------------------------------
  // A/B power / minimum detectable effect
  // ---------------------------------------------------------------

  /** Experiment power readout: for each non-control variant of the
    * [[Sampling.abSrmReport]] bucketing, the minimum detectable
    * effect on the per-unit post metric at α = 0.05 (two-sided) and
    * 80% power — (variant, n_control, n_variant, mean_control,
    * sd_pooled, mde_abs, mde_rel). The "could this test even have
    * seen the effect you hoped for" check that should run BEFORE a
    * null result is read as no effect.
    *
    * MDE = (z_{α/2} + z_β)·√(s²_pooled·(1/n_c + 1/n_v)) with the
    * standard normal constants as shared literals. Variances come
    * from exact decimal moments (the CUPED widening discipline); the
    * final expression is a fixed IEEE dag (√ is correctly rounded in
    * both engines), rounded once. One unit-keyed aggregation, then
    * variant-domain-bounded roll-ups.
    */
  def abPower(ev: DataFrame, unitCol: String, valueCol: String,
      variants: Seq[(String, Double)], salt: String): DataFrame = {
    require(variants.size >= 2, "need a control and at least one variant")
    // z_{0.025} + z_{0.80}, pre-summed as ONE shared literal so both
    // engines parse the identical double (a Scala-side sum could
    // differ from the oracle's parsed literal in the last ulp)
    val zSum = 2.801585219
    val per = ev.groupBy(col(unitCol))
      .agg(sum(col(valueCol).cast(Dec186)).cast(Dec186).as("__y"))
    val cumB = variants.map(_._2).scanLeft(0.0)(_ + _).tail.init :+ 1.0
    val frac = conv(substring(md5(concat_ws("|", lit(salt),
      col(unitCol).cast("string"))), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)
    val arms = per.withColumn("variant",
      variants.map(_._1).zip(cumB).reverse
        .foldLeft(lit(variants.last._1)) { case (rest, (name, hi)) =>
          when(frac < hi, lit(name)).otherwise(rest)
        })
      .groupBy("variant")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__s"),
        sum((col("__y") * col("__y")).cast(DecimalType(38, 12)))
          .as("__ss"))
    val control = variants.head._1
    val c = arms.filter(col("variant") === control)
      .select(col("n").as("n_control"), col("__s").as("__cs"),
        col("__ss").as("__css"))
    def ssq(nC: Column, sC: Column, ssC: Column): Column =
      ssC.cast("double") - sC.cast("double") * sC.cast("double") /
        nC.cast("double")
    arms.filter(col("variant") =!= control)
      .crossJoin(broadcast(c))
      .withColumn("__sp2",
        (ssq(col("n_control"), col("__cs"), col("__css")) +
          ssq(col("n"), col("__s"), col("__ss"))) /
          (col("n_control") + col("n") - 2).cast("double"))
      .withColumn("__mc",
        col("__cs").cast("double") / col("n_control").cast("double"))
      .withColumn("__mde", lit(zSum) * sqrt(col("__sp2") *
        (lit(1.0) / col("n_control").cast("double") +
          lit(1.0) / col("n").cast("double"))))
      .select(col("variant"), col("n_control"), col("n").as("n_variant"),
        round(col("__mc"), 5).as("mean_control"),
        round(sqrt(col("__sp2")), 5).as("sd_pooled"),
        round(col("__mde"), 5).as("mde_abs"),
        round(col("__mde") / col("__mc"), 5).as("mde_rel"))
      .orderBy("variant")
  }

  // ---------------------------------------------------------------
  // CUPED variance reduction
  // ---------------------------------------------------------------

  /** CUPED-adjusted experiment readout (Deng et al. 2013): per
    * variant, the post-period metric mean and its covariate-adjusted
    * version ŷ_a − θ·(x̄_a − x̄), where x is each unit's PRE-period
    * metric, θ = cov(x,y)/var(x) fitted on ALL units pooled, plus the
    * achieved variance-reduction factor ρ² — the standard trick that
    * makes an A/B test read as if it had 1/(1−ρ²)× the traffic.
    * Output: (variant, n_units, mean_post, mean_adj, theta,
    * var_reduction), variant order.
    *
    * Buckets are the [[Sampling.abSrmReport]] convention — the first
    * 8 md5 hex digits of (salt|unit) as a uniform fraction against
    * cumulative weight bounds — so assignment is a pure function of
    * (salt, unit) on any engine. Moments run as EXACT decimal sums
    * (per-unit pre/post sums in DECIMAL(18,6), cross-products in
    * DECIMAL(38,12)); θ and every mean are then a fixed dag of IEEE
    * double ops over those exact inputs, rounded once to 5 decimals.
    * Scale shape: one unit-keyed aggregation over the event stream,
    * then variant-domain-bounded roll-ups; nothing after the first
    * groupBy exceeds (variants+1) rows.
    */
  def cupedReport(ev: DataFrame, unitCol: String, valueCol: String,
      tsCol: String, splitTs: String,
      variants: Seq[(String, Double)], salt: String): DataFrame = {
    require(variants.nonEmpty && variants.forall(_._2 > 0),
      "variant weights must be positive")
    val cut = lit(splitTs).cast("timestamp")
    // per-unit sums pinned back to DECIMAL(18,6): keeps the
    // cross-product widths at (18,6)² → (37,12), inside BOTH engines'
    // exact-decimal multiply range (DuckDB silently converts a >38-
    // width decimal product to DOUBLE — the exactness contract dies
    // there, not in Spark)
    val per = ev.groupBy(col(unitCol)).agg(
      sum(when(col(tsCol) < cut, col(valueCol)).otherwise(lit(0.0))
        .cast(Dec186)).cast(Dec186).as("__x"),
      sum(when(col(tsCol) >= cut, col(valueCol)).otherwise(lit(0.0))
        .cast(Dec186)).cast(Dec186).as("__y"))
    val cumB = variants.map(_._2).scanLeft(0.0)(_ + _).tail.init :+ 1.0
    val frac = conv(substring(md5(concat_ws("|", lit(salt),
      col(unitCol).cast("string"))), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)
    val assigned = per.withColumn("variant",
      variants.map(_._1).zip(cumB).reverse
        .foldLeft(lit(variants.last._1)) { case (rest, (name, hi)) =>
          when(frac < hi, lit(name)).otherwise(rest)
        })
    val g = assigned.agg(count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum((col("__x") * col("__x")).cast(DecimalType(38, 12))).as("__sxx"),
      sum((col("__x") * col("__y")).cast(DecimalType(38, 12))).as("__sxy"),
      sum((col("__y") * col("__y")).cast(DecimalType(38, 12))).as("__syy"))
    val n = col("__n").cast("double")
    val covXY = n * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")
    val varX = n * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val varY = n * col("__syy").cast("double") -
      col("__sy").cast("double") * col("__sy").cast("double")
    val global = g.select(
      round(covXY / varX, 5).as("theta"),
      round(covXY * covXY / (varX * varY), 5).as("var_reduction"),
      round(col("__sx").cast("double") / n, 5).as("__mx"))
    assigned.groupBy("variant").agg(count(lit(1)).as("n_units"),
      sum(col("__x")).as("__ax"), sum(col("__y")).as("__ay"))
      .crossJoin(broadcast(global))
      .select(col("variant"), col("n_units"),
        round(col("__ay").cast("double") / col("n_units").cast("double"), 5)
          .as("mean_post"),
        round(col("__ay").cast("double") / col("n_units").cast("double") -
          col("theta") * (col("__ax").cast("double") /
            col("n_units").cast("double") - col("__mx")), 5).as("mean_adj"),
        col("theta"), col("var_reduction"))
      .orderBy("variant")
  }

  // ---------------------------------------------------------------
  // Closed-form OLS (two predictors)
  // ---------------------------------------------------------------

  /** Per-group ordinary least squares y ~ b0 + b1·x1 + b2·x2 via the
    * closed-form normal equations: (group, n, b0, b1, b2, r2). The
    * regression an analyst reaches for first — here as ONE
    * map-side-combined moment aggregation per group (n, Σx, Σy and
    * the five cross-moments), then a fixed Cramer-rule solve on the
    * group row. Nothing iterates and nothing is ever wider than one
    * row per group, however many rows the fact table has.
    *
    * Determinism: every moment is an exact DECIMAL sum (operands
    * pre-widened to (19,6) so both engines' decimal multiply stays
    * exact); the centered second moments, determinant and
    * coefficients are then a fixed dag of IEEE double ops over those
    * exact inputs, rounded once at the output. Groups where the
    * centered system is singular (constant predictor, or n too small)
    * return NULL coefficients rather than a division artifact.
    */
  def olsRegression(df: DataFrame, groupCol: String, yCol: String,
      x1Col: String, x2Col: String): DataFrame = {
    val d196 = DecimalType(19, 6)
    def dec(c: String) = col(c).cast(Dec186).cast(d196)
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(dec(x1Col)).as("__s1"), sum(dec(x2Col)).as("__s2"),
        sum(dec(yCol)).as("__sy"),
        sum(dec(x1Col) * dec(x1Col)).as("__s11"),
        sum(dec(x2Col) * dec(x2Col)).as("__s22"),
        sum(dec(x1Col) * dec(x2Col)).as("__s12"),
        sum(dec(x1Col) * dec(yCol)).as("__s1y"),
        sum(dec(x2Col) * dec(yCol)).as("__s2y"),
        sum(dec(yCol) * dec(yCol)).as("__syy"))
    val n = col("n").cast("double")
    def m(c: String) = col(c).cast("double")
    val sqq = n * m("__s11") - m("__s1") * m("__s1")
    val sdd = n * m("__s22") - m("__s2") * m("__s2")
    val sqd = n * m("__s12") - m("__s1") * m("__s2")
    val sqy = n * m("__s1y") - m("__s1") * m("__sy")
    val sdy = n * m("__s2y") - m("__s2") * m("__sy")
    val syy = n * m("__syy") - m("__sy") * m("__sy")
    val det = sqq * sdd - sqd * sqd
    val b1 = (sqy * sdd - sdy * sqd) / det
    val b2 = (sdy * sqq - sqy * sqd) / det
    val b0 = (m("__sy") - b1 * m("__s1") - b2 * m("__s2")) / n
    val ok = det =!= 0.0 && syy =!= 0.0
    g.select(col(groupCol), col("n"),
      when(ok, round(b0, 5)).as("b0"),
      when(ok, round(b1, 5)).as("b1"),
      when(ok, round(b2, 5)).as("b2"),
      when(ok, round((b1 * sqy + b2 * sdy) / syy, 5)).as("r2"))
      .orderBy(groupCol)
  }

  // ---------------------------------------------------------------
  // k-anonymity audit
  // ---------------------------------------------------------------

  /** k-anonymity / l-diversity audit of a table against a
    * quasi-identifier set: one row per equivalence class with
    * (quasiCols…, class_size, l_diversity, at_risk) — classes
    * smaller than k re-identify their members by the quasi-identifier
    * combination alone, and classes with one distinct sensitive value
    * leak it even at size ≥ k. The release-gate check a
    * training-data pipeline runs BEFORE shipping a table derived from
    * user data.
    *
    * Exact and one-pass: a single map-side-combined aggregation on
    * the quasi-identifier key (count + exact distinct of the
    * sensitive column per class — bounded by class size, no
    * Expand-based multi-distinct since there is one distinct
    * aggregate). Deterministic class order.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("at_risk", col("class_size") < k)
      .orderBy(quasiCols.map(col): _*)
  }

  /** Mann–Whitney U rank-sum test comparing an integer-valued metric
    * between two named cohorts — ONE summary row (group_a, group_b,
    * n_a, n_b, u_a, z, rank_biserial). The pipeline use: the
    * nonparametric "did source A's documents get longer/better than
    * source B's" check that a t-test gets wrong on the heavy-tailed,
    * outlier-ridden length/quality distributions a crawl produces —
    * U depends only on ranks, so one pathological document cannot
    * move it.
    *
    * Statistic: U_A = Σ_v cA(v)·(cumB(<v) + cB(v)/2) over the
    * DISTINCT-value grid (ties contribute half), kept DOUBLED so it
    * stays integer (2U_A = Σ cA·(2·cumB(<v) + cB) — the doubled-rank
    * trick of [[spearmanByGroup]]); z uses the tie-corrected normal
    * approximation σ² = nA·nB·(n³−n−T)/(12·n·(n−1)) with
    * T = Σ_v t³−t, and rank_biserial = (2U_A − nA·nB)/(nA·nB) is the
    * effect size. All operands are exact DECIMAL(38,0) up to ONE
    * double division each for z and the effect size (§8.3 rule 4);
    * the variance ratio is one exact-over-exact division before one
    * sqrt — IEEE-identical on both engines.
    *
    * Scale shape: one value-grid groupBy (map-side combinable), a
    * window cumsum over the DISTINCT-value domain (bounded by the
    * metric's value range, never the corpus — the exactLong
    * convention), and a single-row final aggregate. Degenerate
    * cohorts (either side empty, or every value tied) yield NULL z.
    */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "cohorts must differ")
    val vc = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("__cb"))
    // bounded global window: one row per distinct metric value
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = (col("__ca") + col("__cb")).cast(Dec380)
    val agg = vc
      .withColumn("__cbBefore", sum(col("__cb")).over(w) - col("__cb"))
      .agg(
        sum(col("__ca").cast(Dec380) *
          (lit(2).cast(Dec380) * col("__cbBefore") + col("__cb"))).as("__u2a"),
        sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        sum(t * t * t - t).as("__tie"))
    val na = col("n_a").cast(Dec380)
    val nb = col("n_b").cast(Dec380)
    val n = na + nb
    // exact integer numerator/denominator; ONE division, ONE sqrt
    val varNum = na * nb * (n * n * n - n - col("__tie"))
    val varDen = (n * (n - 1)) * 12
    val num = (col("__u2a") - na * nb).cast("double")
    val sigma2 = varNum.cast("double") / varDen.cast("double")
    agg.select(
      lit(groupA).as("group_a"), lit(groupB).as("group_b"),
      col("n_a"), col("n_b"),
      (col("__u2a").cast("double") / 2.0).as("u_a"),
      when(col("n_a") > 0 && col("n_b") > 0 && varNum > 0,
        round(num / (sqrt(sigma2) * 2.0), 5))
        .otherwise(lit(null).cast("double")).as("z"),
      when(col("n_a") > 0 && col("n_b") > 0,
        round(num / (na * nb).cast("double"), 5))
        .otherwise(lit(null).cast("double")).as("rank_biserial"))
  }

  /** Wald's sequential probability ratio test (SPRT) over the daily
    * event stream: treat every event as a Bernoulli trial
    * (success = `successType`), accumulate the log-likelihood ratio
    * of H₁: p = p1 vs H₀: p = p0 day by day, and report the decision
    * state per day against Wald's thresholds
    * A = ln((1−β)/α), B = ln(β/(1−α)) — the early-stopping monitor a
    * fixed-horizon test ([[abPower]]) cannot give: on a strong
    * effect the stream crosses a boundary in days, with the
    * classical α/β guarantees intact. One row per calendar day:
    * (day_num, n_trials_cum, n_success_cum, llr, decision,
    * is_first_decision).
    *
    * Determinism: the four ln constants are computed ONCE driver-side
    * and quantized to DECIMAL(18,9) — both engines consume identical
    * literals, so no libm agreement is ever needed; the daily LLR is
    * cumS·l1 + cumF·l0 with integer cumulatives pre-narrowed to
    * DECIMAL(12,0) (rule 11: the product keeps scale 9 below ~10¹²
    * cumulative trials), and `llr` is the exact decimal's direct
    * double rendering — no round, no float accumulation.
    *
    * Scale shape: one (day)-grid map-side-combined count; every
    * window runs on the calendar-day grid (the [[cusumChangepoint]]
    * bound).
    */
  def sprtMonitor(ev: DataFrame, successType: String, p0: Double,
      p1: Double, alpha: Double, beta: Double,
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      "need distinct p0, p1 in (0, 1)")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "need alpha, beta in (0, 1)")
    def q9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)
    val l1 = q9(math.log(p1 / p0))
    val l0 = q9(math.log((1 - p1) / (1 - p0)))
    val thA = q9(math.log((1 - beta) / alpha))
    val thB = q9(math.log(beta / (1 - alpha)))
    val dec120 = DecimalType(12, 0)
    val daily = ev.filter(col(tsCol).isNotNull)
      .groupBy(datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
        .as("day_num"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(typeCol) === successType, 1L).otherwise(0L)).as("__s"))
    // bounded global windows: one row per calendar day
    val w = Window.orderBy("day_num")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val llr = col("n_success_cum").cast(dec120) * lit(l1) +
      (col("n_trials_cum") - col("n_success_cum")).cast(dec120) * lit(l0)
    daily
      .withColumn("n_trials_cum", sum(col("__n")).over(w))
      .withColumn("n_success_cum", sum(col("__s")).over(w))
      .withColumn("__llr", llr)
      .withColumn("decision",
        when(col("__llr") >= lit(thA), lit("accept_h1"))
          .when(col("__llr") <= lit(thB), lit("accept_h0"))
          .otherwise(lit("continue")))
      .withColumn("is_first_decision",
        col("decision") =!= "continue" &&
          col("day_num") === min(when(col("decision") =!= "continue",
            col("day_num"))).over(all))
      .select(col("day_num"), col("n_trials_cum"), col("n_success_cum"),
        col("__llr").cast("double").as("llr"), col("decision"),
        col("is_first_decision"))
      .orderBy("day_num")
  }

  /** Kruskal–Wallis H test across ALL groups at once — the k-group
    * generalization of [[mannWhitney]] ("do ANY of the sources differ
    * in this metric's distribution", one test instead of k² pairwise
    * comparisons and their multiplicity problem). One summary row:
    * (n_groups, n_total, kw_h) with H tie-corrected;
    * H ~ χ²(k−1) under H₀.
    *
    * Exactness: pooled doubled midranks r2 = 2·cum − c + 1 from the
    * distinct-value grid; per-group doubled rank sums R2_g and
    * deviations D_g = R2_g − n_g·(N+1) are exact integers; each
    * rational D_g²/n_g is quantized at scale 9 by integer HALF_UP
    * ((2a+b) div 2b — the [[TextStats.rakeKeywords]] convention) and
    * summed exactly; the tie-corrected
    * H = 3·Σ·(N³−N) / (10⁹·N(N+1)·(N³−N−T)) is ONE division of two
    * exact decimal products. (Decimal-38 headroom bounds group sizes
    * at ~10⁷ rows — the [[spearmanByGroup]] width class; beyond that,
    * sample.)
    *
    * Scale shape: one value-grid aggregate, one bounded grid cumsum,
    * one (group × value)-domain join, k-row final frame.
    */
  def kruskalWallis(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"))
    val gv = base.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__cg"))
    val vc = gv.groupBy("__v").agg(sum(col("__cg")).as("__c"))
    // bounded global window: one row per distinct metric value
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = col("__c").cast(Dec380)
    val ranked = vc
      .withColumn("__cum", sum(col("__c")).over(w))
      .select(col("__v"),
        (lit(2).cast(Dec380) * col("__cum") - col("__c") + 1).as("__r2"),
        (t * t * t - t).as("__t3"))
    val ties = ranked.agg(sum(col("__t3")).as("__tie"))
    val perG = gv.join(ranked.select("__v", "__r2"), Seq("__v"))
      .groupBy("__g")
      .agg(sum(col("__cg")).as("__ng"),
        sum(col("__cg").cast(Dec380) * col("__r2")).as("__rs"))
    val nTot = perG.agg(sum(col("__ng")).as("__n"),
      count(lit(1)).as("n_groups"))
    val dev = col("__rs") - col("__ng").cast(Dec380) * (col("__n") + 1)
    perG.crossJoin(broadcast(nTot)).crossJoin(broadcast(ties))
      .select(col("__n"), col("n_groups"), col("__tie"),
        dev.as("__d"), col("__ng"))
      // t9 = HALF_UP(D²·10⁹ / n_g), exact integer per group
      .withColumn("__t9", expr(
        "(cast(__d as decimal(38,0)) * __d * 2000000000 + __ng) div (2 * __ng)"))
      .groupBy(col("__n"), col("n_groups"), col("__tie"))
      .agg(sum(col("__t9")).as("__s9"))
      .select(col("n_groups"), col("__n").as("n_total"),
        when(col("__n") > 1 &&
            (t3n(col("__n")) - col("__tie")) > 0,
          round((lit(3).cast(Dec380) * col("__s9") *
              (t3n(col("__n")))).cast("double") /
            (lit(1000000000L).cast(Dec380) * col("__n") * (col("__n") + 1) *
              (t3n(col("__n")) - col("__tie"))).cast("double"), 5))
          .otherwise(lit(null).cast("double")).as("kw_h"))
  }

  /** Population Stability Index of an integer metric's distribution
    * per group against the whole corpus — THE industry drift score
    * for "has this source's length/quality profile shifted away from
    * the pool" (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken).
    * Bins are `nBins` equal-width buckets of the observed global
    * [min, max] (exact integer bucketing — no float edges), and both
    * distributions are add-one (Laplace) smoothed so empty bins are
    * well-defined without the classic epsilon hack:
    * p_b = (c_gb+1)/(n_g+B), q_b = (c_b+1)/(N+B).
    * Returns (group, n_rows, psi), group order, psi = Σ_b
    * (p_b − q_b)·ln(p_b/q_b) rounded at 5.
    *
    * Determinism (§8.3): each bin's log-ratio is ln of ONE exact
    * integer rational ((c_gb+1)(N+B)) / ((c_b+1)(n_g+B)), rounded to
    * 9 decimals into DECIMAL(18,9) (the [[TextStats.sourceDiversity]]
    * log-sum convention); (p_b − q_b) is kept as its exact integer
    * numerator over the constant denominator (n_g+B)(N+B), so the
    * PSI sum is an EXACT decimal sum of integer-weighted terms and
    * the only float operation is the final single division.
    *
    * Scale shape: one map-side-combined (group, bin) count — the
    * joined relations are bounded by |groups|·B and B, and the global
    * min/max roll-up is a 1-row broadcast, never a driver collect.
    */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
    val mm = vals.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    // exact integer bucketing: (v - lo)·B div (hi - lo + 1) ∈ [0, B-1]
    val binned = vals.crossJoin(broadcast(mm))
      .select(col("__g"),
        expr(s"((__v - __lo) * $nBins) div (__hi - __lo + 1)").as("__b"))
    val gb = binned.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__cgb"))
    val gTot = gb.groupBy("__g").agg(sum(col("__cgb")).as("__ng"))
    val cb = gb.groupBy("__b").agg(sum(col("__cgb")).as("__cb"))
    val nTot = cb.agg(sum(col("__cb")).as("__n"))
    // dense (group × bin) grid — PSI needs the empty bins too
    val grid = gTot.crossJoin(
        broadcast(mm.select(explode(sequence(lit(0L),
          lit(nBins - 1L))).as("__b"))))
      .join(gb, Seq("__g", "__b"), "left")
      .join(broadcast(cb), Seq("__b"), "left")
      .crossJoin(broadcast(nTot))
      .select(col("__g"), col("__ng"), col("__n"),
        (coalesce(col("__cgb"), lit(0L)) + 1).as("__p1"),
        (coalesce(col("__cb"), lit(0L)) + 1).as("__q1"))
    val pNum = col("__p1").cast(Dec380) * (col("__n") + nBins)
    val qNum = col("__q1").cast(Dec380) * (col("__ng") + nBins)
    grid
      .withColumn("__llr9",
        round(log(pNum.cast("double") / qNum.cast("double")), 9)
          .cast(DecimalType(18, 9)))
      .groupBy(col("__g"), col("__ng"), col("__n"))
      // weight cast to DECIMAL(18,0) keeps the product at (37,9) —
      // inside 38 on both engines (the sourceDiversity convention);
      // bound: |c·N| < 10¹⁸, i.e. corpora to ~10⁹ rows per the larger
      // factor — beyond that, feed pre-binned shard counts
      .agg(sum((pNum - qNum).cast(DecimalType(18, 0)) * col("__llr9"))
        .as("__s"))
      .select(col("__g").as(groupCol), col("__ng").as("n_rows"),
        round(col("__s").cast("double") /
          ((col("__ng") + nBins).cast(Dec380) * (col("__n") + nBins))
            .cast("double"), 5).as("psi"))
      .orderBy(groupCol)
  }

  /** Jensen-Shannon drift of each group's CATEGORICAL distribution
    * from the pool — [[graft.ext.TextStats.jsDrift]]'s integer-exact
    * machinery generalized from (source, token) to any
    * (group, item) pair: here the flagship use is the DAILY
    * event-type mix vs the period's overall mix (the release-night
    * "error share exploded" detector), with `threshold` flagging
    * actionable days. Returns (group, n_rows, jsd, drifted),
    * group order.
    *
    * Determinism: the [[graft.ext.TextStats.jsDrift]] ladder
    * verbatim — exact mixture rationals, scale-9 integer log units,
    * closed-form absent-item ln 2 mass, ONE division by 2AB·10⁹.
    * `drifted` compares the UNROUNDED quotient against the exact
    * threshold literal (both engines compute the identical double).
    *
    * Scale shape: counts bounded by |groups|·|items| (days × types
    * here) after one map-side-combined roll-up of the corpus.
    */
  def categoricalJsDrift(df: DataFrame, group: Column, item: Column,
      threshold: Double): DataFrame = {
    val dec380 = Dec380
    val dec120 = DecimalType(12, 0)
    val ln2u = lit(693147181L)
    val gt = df.select(group.as("__g"), item.as("__i"))
      .groupBy("__g", "__i").agg(count(lit(1)).as("__a"))
    val pool = gt.groupBy("__i").agg(sum(col("__a")).as("__b"))
    val aTot = gt.groupBy("__g").agg(sum(col("__a")).as("__ta"))
    val bTot = pool.agg(sum(col("__b")).as("__tb"))
    val mix = col("__a").cast(dec380) * col("__tb") +
      col("__b").cast(dec380) * col("__ta")
    def lu(x: Column) =
      (round(log(x), 9).cast(DecimalType(18, 9)) * 1000000000L)
        .cast(DecimalType(20, 0))
    val q = gt.join(pool, "__i")
      .join(broadcast(aTot), "__g")
      .crossJoin(broadcast(bTot))
      .select(col("__g"), col("__ta"), col("__tb"), col("__a"), col("__b"),
        lu((col("__a").cast(dec380) * col("__tb") * 2).cast("double") /
          mix.cast("double")).as("__lpu"),
        lu((col("__b").cast(dec380) * col("__ta") * 2).cast("double") /
          mix.cast("double")).as("__lqu"))
      .groupBy(col("__g"), col("__ta"), col("__tb"))
      .agg(
        sum(col("__a").cast(dec120) * col("__lpu")).as("__s1"),
        sum(col("__b").cast(dec120) * col("__lqu")).as("__s2"),
        sum(col("__b")).as("__bPres"))
    val jsdRaw =
      (col("__tb").cast(dec120) * col("__s1").cast(DecimalType(25, 0)) +
        col("__ta").cast(dec120) * col("__s2").cast(DecimalType(25, 0)) +
        col("__ta").cast(dec120) *
          ((col("__tb") - col("__bPres")).cast(dec120) * ln2u))
        .cast("double") /
        (col("__ta").cast(dec120) * col("__tb").cast(dec120) *
          lit(2000000000L)).cast("double")
    q.select(col("__g").as("group"), col("__ta").as("n_rows"),
        round(jsdRaw, 5).as("jsd"), (jsdRaw >= threshold).as("drifted"))
      .orderBy("group")
  }

  /** N³ − N in DECIMAL(38,0) — shared by the tie corrections. */
  private def t3n(n: Column): Column = {
    val nd = n.cast(Dec380)
    nd * nd * nd - nd
  }

  /** Per-group Spearman rank correlation between two columns —
    * (group, n_docs, spearman_rho) via the classic 1 − 6Σd²/(n(n²−1))
    * on AVERAGE ranks (ties share the mean of their rank run; no tie
    * correction term — a defined, deterministic statistic, documented
    * as such). The pipeline use: the length-bias audit — quality
    * classifiers notoriously correlate with document length, and a
    * gate trained on a length-confounded score silently filters short
    * documents; rho per source quantifies that confound before the
    * gate ships.
    *
    * Exactness (§8.3): the average rank is kept DOUBLED —
    * r2 = 2·(cum − c) + c + 1, an INTEGER — so d² sums as the integer
    * S4 = Σ(r2x − r2y)² = 4Σd² in DECIMAL(38,0), and
    * rho = (2n(n²−1) − 3·S4) / (2n(n²−1)) is ONE division of exact
    * operands (no 1 − x float subtraction after a division).
    *
    * Scale shape: ranks come from the DISTINCT-value domain (counts
    * per (group, value), window cumsum over distinct values — the
    * exactLong convention; never a row-domain rank window), joined
    * back value-keyed; the final roll-up is map-side combinable.
    */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df
      .select(col(groupCol).as("__g"), col(xCol).as("__x"), col(yCol).as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def doubledRanks(vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("__g")).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col("__g"), col(vCol)).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(w))
        .select(col("__g"), col(vCol),
          (lit(2L) * (col("__cum") - col("__c")) + col("__c") + lit(1L))
            .as(out))
    }
    val n = col("n_docs").cast(Dec380)
    val den = (n * (n * n - 1)) * 2
    base
      .join(doubledRanks("__x", "__rx2"), Seq("__g", "__x"))
      .join(doubledRanks("__y", "__ry2"), Seq("__g", "__y"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_docs"),
        // widen BEFORE squaring: the doubled-rank diff reaches 2n, so
        // its square wraps a long past ~1.5e9 rows
        sum((col("__rx2") - col("__ry2")).cast(Dec380) *
          (col("__rx2") - col("__ry2")).cast(Dec380)).as("__s4"))
      .select(col("__g").as(groupCol), col("n_docs"),
        when(col("n_docs") > 1,
          round((den - col("__s4") * 3).cast("double") / den.cast("double"), 5))
          .otherwise(lit(null).cast("double")).as("spearman_rho"))
  }

  /** Split-conformal prediction intervals around a per-group simple
    * OLS fit of `yCol` on `xCol` — one row per group with the fit,
    * the conformal half-width q̂, and the realized test-set coverage.
    * The distribution-free error bar for a learned data-quality
    * scorer: fit on the train split, take q̂ = the
    * ⌈(n_cal+1)·covNum/covDen⌉-th smallest absolute calibration
    * residual, and |y − ŷ| ≤ q̂ then covers ≥ covNum/covDen of fresh
    * rows by the exchangeability argument (Vovk et al.; Lei et al.
    * 2018) — no normality assumption the heavy-tailed quality/length
    * distributions would break.
    *
    * Splits are the [[Sampling.hashUniform]] md5 membership on the id
    * (train u < 1/2, calibration 1/2 ≤ u < 3/4, test u ≥ 3/4) —
    * partitioning-independent and leak-proof under joins, like every
    * split in this repo.
    *
    * Determinism (§8.3): the OLS moments are exact DECIMAL(19,6)
    * sums; slope/intercept/residuals are then a FIXED dag of IEEE
    * double ops over those exact inputs (the [[olsRegression]]
    * convention), so residual magnitudes are bit-identical on both
    * engines; the rank-k order statistic ties break by ascending id;
    * the conformal rank k = ⌈(n_cal+1)·covNum/covDen⌉ is pure
    * integer arithmetic (clamped to n_cal when the target coverage
    * is unattainable at that calibration size); coverage renders via
    * the exact integer HALF-UP rule, never a double blend. Groups
    * with a singular fit (constant x) or an empty calibration split
    * surface NULL q̂/coverage rather than an artifact.
    *
    * Scale shape: one group-keyed aggregate over the train split
    * (map-side combinable), the fit broadcast back onto the
    * calibration and test rows (map-only scoring), ONE rank window
    * partitioned by group on the calibration split (~1/4 of rows,
    * WindowGroupLimit-free but group-partitioned — never global),
    * and one final group-sized aggregate.
    */
  def conformalOls(df: DataFrame, groupCol: String, yCol: String,
      xCol: String, covNum: Int = 9, covDen: Int = 10,
      idCol: String = "doc_id", salt: String = "conformal"): DataFrame = {
    require(covNum >= 1 && covNum < covDen,
      s"target coverage must be a proper fraction, got $covNum/$covDen")
    val d196 = DecimalType(19, 6)
    val u = Sampling.hashUniform(col(idCol), salt)
    val split = when(u < 0.5, lit("train"))
      .when(u < 0.75, lit("cal")).otherwise(lit("test"))
    val rows = df.select(col(groupCol).as("__g"),
        col(idCol).cast("long").as("__id"),
        col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"),
        split.as("__split"))
    def dec(c: Column) = c.cast(Dec186).cast(d196)
    val fit = rows.filter(col("__split") === "train")
      .groupBy("__g")
      .agg(count(lit(1)).as("n_train"),
        sum(dec(col("__x"))).as("__sx"), sum(dec(col("__y"))).as("__sy"),
        sum(dec(col("__x")) * dec(col("__x"))).as("__sxx"),
        sum(dec(col("__x")) * dec(col("__y"))).as("__sxy"))
    val nT = col("n_train").cast("double")
    val det = nT * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val slope = (nT * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")) / det
    val fitted = fit.select(col("__g"), col("n_train"),
      when(det =!= 0.0, slope).as("__b"),
      when(det =!= 0.0,
        (col("__sy").cast("double") - slope * col("__sx").cast("double")) / nT)
        .as("__a"))
    val scored = rows.filter(col("__split") =!= "train")
      .join(broadcast(fitted), Seq("__g"))
      .withColumn("__r", fabs(col("__y") - (col("__a") + col("__b") * col("__x"))))
    val byResid = Window.partitionBy("__g")
      .orderBy(col("__r").asc, col("__id").asc)
    val cal = scored.filter(col("__split") === "cal")
      .withColumn("__rn", row_number().over(byResid))
    val calN = cal.groupBy("__g").agg(count(lit(1)).as("n_cal"))
    // k = ceil((n_cal + 1)·covNum / covDen), clamped to n_cal — the
    // decAvg5 floor-of-exact-double-division idiom (operands < 2⁵³)
    val k = least(
      floor(((col("n_cal") + 1) * covNum + covDen - 1).cast("double") /
        lit(covDen.toDouble)).cast("long"),
      col("n_cal"))
    val qhat = cal.join(broadcast(calN.select(col("__g"), k.as("__k"))),
        Seq("__g"))
      .filter(col("__rn") === col("__k"))
      .select(col("__g"), col("__r").as("__qhat"))
    val test = scored.filter(col("__split") === "test")
      .join(broadcast(qhat), Seq("__g"), "left")
      .groupBy("__g")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__r") <= col("__qhat"), 1L).otherwise(0L))
          .as("n_covered"),
        first(col("__qhat")).as("__q"),
        first(col("__a")).as("__fa"), first(col("__b")).as("__fb"))
    // HALF_UP(n_covered/n_test, 5 dp) by the decAvg5 rule: one exact
    // integer expression, one double division of integers < 2⁵³
    val coverage = floor(
      (col("n_covered") * 200000 + col("n_test")).cast("double") /
        (col("n_test") * 2).cast("double")) / lit(100000.0)
    test.join(broadcast(calN), Seq("__g"), "left")
      .select(col("__g").as(groupCol),
        coalesce(col("n_cal"), lit(0L)).as("n_cal"), col("n_test"),
        round(col("__fa"), 5).as("intercept"),
        round(col("__fb"), 5).as("slope"),
        round(col("__q"), 5).as("qhat"),
        when(col("__q").isNotNull, col("n_covered")).as("n_covered"),
        when(col("__q").isNotNull && col("n_test") > 0, coverage)
          .as("coverage"))
      .orderBy(groupCol)
  }
}
