package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic sampling and selection operators for training-data
  * curation — pipeline extensions (SURVEY.md §7.5; the reference has
  * no sampling surface). A corpus pipeline needs samples that are
  * REPRODUCIBLE (re-running the job yields the same training set),
  * SEEDABLE (different salts give independent samples), and stable
  * under ANY re-partitioning at 100 TB.
  *
  * Spark's own `df.sample`/`sampleBy` are none of these at pipeline
  * scale: they seed a per-partition RNG, so the selected ROWS change
  * whenever partitioning, file order, or split size changes. Here
  * every membership decision is `uniform(id) < rate` with the uniform
  * derived from md5(salt|id) — a pure, codegen'd column expression,
  * identical output on any engine with md5 (the DuckDB oracle twins
  * recompute it bit-for-bit). [[bernoulliSample]] /
  * [[stratifiedSample]] / [[trainTestSplit]] are fully map-only (no
  * shuffle at all — asserted in PlanHygieneSpec);
  * [[rebalanceToMixture]] adds one stratum-count-sized aggregate +
  * broadcast join to derive its rates from the corpus itself; and
  * [[topKPerGroup]] is rank-based selection (WindowGroupLimit), not
  * hash membership.
  */
object Sampling {

  /** Deterministic uniform in [0, 1): the first 8 hex digits of
    * md5(salt|id) scaled by 2⁻³². 32 bits of the digest is plenty for
    * sampling-rate resolution; the integer→double conversion is exact
    * (< 2⁵³), so every engine computes the identical double.
    */
  def hashUniform(id: Column, salt: String): Column =
    conv(substring(md5(concat_ws("|", lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Deterministic Bernoulli sample: keeps a row iff
    * uniform(salt|id) < fraction. Expected |out| = fraction·|in|;
    * membership depends only on (salt, id).
    */
  def bernoulliSample(df: DataFrame, fraction: Double,
      idCol: String = "doc_id", salt: String = "sample"): DataFrame =
    df.filter(hashUniform(col(idCol), salt) < lit(fraction))

  /** EXACT-size deterministic sample: the `n` rows with the smallest
    * md5(salt|id) — the deterministic stand-in for reservoir sampling
    * (same fixed output budget, but membership is a pure function of
    * (salt, id): any engine, any partitioning, any run picks the
    * identical set, and growing the corpus only ever swaps members
    * out, never reshuffles survivors' relative ranks). Plans as
    * TakeOrderedAndProject: per-partition top-n heaps, never a full
    * sort.
    */
  def fixedSizeSample(df: DataFrame, n: Int, idCol: String = "doc_id",
      salt: String = "sample"): DataFrame = {
    require(n >= 1, s"fixedSizeSample needs n >= 1, got $n")
    df.withColumn("__rk",
        md5(concat_ws("|", lit(salt), col(idCol).cast("string"))))
      .orderBy(col("__rk"), col(idCol))
      .limit(n)
      .drop("__rk")
  }

  /** Near-dup-LEAKAGE-FREE train/test split: membership is decided
    * per near-dup CLUSTER (md5 uniform of the cluster's canonical
    * min-id), so a document and its near-duplicates can never
    * straddle the split — the eval-hygiene guard row-level and even
    * group-level splits miss (a paraphrased copy of a test document
    * in train silently inflates eval scores). The stronger sibling of
    * `trainTestSplit(idCol = source)`: leakage is blocked at the
    * similarity level, not the provenance level.
    *
    * Scale shape: clustering is the already-graded
    * [[Dedup.nearDupClusters]] (banded MinHash candidates +
    * size-switched connected components); the split itself is one
    * map-only hash decision plus an id-keyed join of the cluster
    * labels back onto the corpus.
    */
  def splitByCluster(df: DataFrame, testFraction: Double,
      salt: String = "csplit", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val clusters = Dedup.nearDupClusters(df, idCol = idCol, textCol = textCol)
      .select(col(idCol), col("cluster_id"))
    df.select(col(idCol)).join(clusters, idCol)
      .withColumn("split",
        when(hashUniform(col("cluster_id"), salt) < lit(testFraction),
          lit("test")).otherwise(lit("train")))
      .select(col(idCol), col("cluster_id"), col("split"))
  }

  /** Deterministic global training-order shuffle: every row gets a
    * reproducible position in one md5-random total order — the
    * materialized "shuffled dataset" a training run reads
    * sequentially. Breaking source/time ordering correlations before
    * training is standard practice, and doing it with a seeded hash
    * (not an engine RNG) makes the order a pure function of
    * (salt, id): any engine, any partitioning, any rerun produces the
    * identical epoch order, and two salts give two independent
    * epoch permutations.
    *
    * Returns (idCol, shard, shard_pos, global_pos): `shard` is the
    * contiguous hash-range bucket (first 4 md5 hex digits ÷
    * (65536/shards) — uniform, so shards balance), `shard_pos` the
    * 0-based rank within the shard, `global_pos` the 0-based rank in
    * the full order. Because shards are CONTIGUOUS ranges of the hash
    * order, global_pos = shard offset + shard_pos exactly equals the
    * rank a single global sort would assign — verified against the
    * oracle's naive global window.
    *
    * Scale shape (the [[Packing.packSequences]] two-phase pattern):
    * ONE exchange keyed by shard with a per-shard sort window — never
    * a global single-task window; the shard offsets are a
    * `shards`-row driver collect (config-bounded, and an eager action
    * at construction, like packing's). `shards` sizes parallelism and
    * driver state to the cluster, not the data.
    */
  def shuffleOrder(df: DataFrame, shards: Int = 32,
      salt: String = "shuffle", idCol: String = "doc_id"): DataFrame = {
    require(shards >= 1 && 65536 % shards == 0,
      s"shards must divide 65536 for exact contiguous hash ranges, got $shards")
    val span = 65536 / shards
    val h = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    val sharded = df.select(col(idCol), h.as("__h"))
      .withColumn("shard",
        expr(s"cast(conv(substring(__h, 1, 4), 16, 10) as int) div $span")
          .cast("int"))
    val totals = sharded.groupBy("shard")
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until shards).scanLeft(0L) { (acc, s) =>
      acc + totals.getOrElse(s, 0L)
    }
    val offsetDf = df.sparkSession.createDataFrame(
      (0 until shards).map(s => (s, offsets(s)))
    ).toDF("shard", "__base")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col(idCol))
    sharded.join(broadcast(offsetDf), "shard")
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("shard_pos"),
        (col("__base") + col("shard_pos")).as("global_pos"))
  }

  /** Deterministic k-fold assignment for cross-validation: fold =
    * (first 8 md5 hex digits of salt|id) mod k — pure integer
    * arithmetic on the shared md5 membership convention, so any
    * engine reproduces the identical folds and membership never
    * depends on partitioning or row order. Key `idCol` on a GROUP
    * column (e.g. source) to make folds leakage-free the same way
    * [[trainTestSplit]] does. Map-only: no shuffle, no state.
    */
  /** Neyman (variance-optimal) sample allocation: how to spend a
    * fixed labeling/eval budget across strata — n_h ∝ N_h·σ_h, the
    * allocation minimizing the stratified mean's variance. The
    * eval-set design relation: a pipeline that quality-samples
    * uniformly overpays on homogeneous strata and starves volatile
    * ones; this says exactly how many rows each stratum deserves.
    * Returns (stratumCol, n_rows, sigma, n_alloc), n_alloc =
    * floor(budget·weight) (Σ ≤ budget; the remainder is the caller's
    * tie-break policy).
    *
    * Determinism: per-stratum moments from exact DECIMAL(18,6) sums
    * (rule 2 — a raw double sum would be partition-order dependent);
    * σ and the allocation are one fixed-shape double expression per
    * stratum. Scale shape: one map-side-combined moment aggregate to
    * a stratum-domain-bounded frame; the weight total is a broadcast
    * 1-row cross.
    */
  def neymanAllocation(df: DataFrame, stratumCol: String,
      valueCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val x = col(valueCol).cast(DecimalType(18, 6))
    val st = df.filter(col(valueCol).isNotNull)
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_rows"), sum(x).as("__s1"),
        sum(x * x).as("__s2"))
      .withColumn("__std", sqrt(greatest(
        (col("__s2").cast("double") -
          col("__s1").cast("double") * col("__s1").cast("double") /
            col("n_rows")) / col("n_rows"), lit(0.0))))
      .withColumn("__w", col("n_rows").cast("double") * col("__std"))
    st.crossJoin(broadcast(st.agg(sum(col("__w")).as("__wsum"))))
      .where(col("__wsum") > 0)
      .select(col(stratumCol), col("n_rows"),
        round(col("__std"), 5).as("sigma"),
        floor(lit(budget.toDouble) * (col("__w") / col("__wsum")))
          .cast("long").as("n_alloc"))
      .orderBy(stratumCol)
  }

  /** Deterministic A/B experiment assignment + the SRM health check:
    * every distinct unit lands in a variant by salted md5 bucket
    * (weighted allocation), and the report is the per-variant
    * sample-ratio-mismatch evidence — (variant, n_units,
    * expected_frac, observed_frac, chi2_contrib). Σ chi2_contrib
    * against χ²(k−1) is the standard SRM alarm: a mismatched ratio
    * means broken bucketing/logging, and every downstream metric of
    * that experiment is garbage. Assignment is a pure function of
    * (salt, unit) — reproducible across engines, runs and
    * partitionings, the [[bernoulliSample]] membership convention.
    *
    * Scale shape: one distinct on the unit key, one map-side bucket
    * expression, one variant-domain-bounded roll-up; expected counts
    * from a broadcast 1-row total.
    */
  def abSrmReport(df: DataFrame, unitCol: String,
      variants: Seq[(String, Double)], salt: String): DataFrame = {
    require(variants.nonEmpty && variants.forall(_._2 > 0),
      "variant weights must be positive")
    require(math.abs(variants.map(_._2).sum - 1.0) < 1e-9,
      "variant weights must sum to 1")
    // cumulative upper bounds; the last is forced to 1.0 so no unit
    // can fall through on float accumulation
    val cum = variants.map(_._2).scanLeft(0.0)(_ + _).tail
      .init :+ 1.0
    val frac = conv(substring(md5(concat_ws("|", lit(salt),
      col(unitCol).cast("string"))), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)
    // innermost-out fold: the FIRST (lowest) matching bound wins
    val assigned = df.select(col(unitCol)).distinct()
      .withColumn("variant",
        variants.map(_._1).zip(cum).reverse
          .foldLeft(lit(variants.last._1)) { case (rest, (name, hi)) =>
            when(frac < hi, lit(name)).otherwise(rest)
          })
    val counts = assigned.groupBy("variant").agg(count(lit(1)).as("n_units"))
    val wdf = {
      val spark = df.sparkSession
      import spark.implicits._
      variants.toDF("variant", "expected_frac")
    }
    val tot = counts.agg(sum(col("n_units")).as("__n"))
    val exp = col("expected_frac") * col("__n").cast("double")
    wdf.join(counts, Seq("variant"), "left")
      .withColumn("n_units", coalesce(col("n_units"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("variant"), col("n_units"), col("expected_frac"),
        round(col("n_units").cast("double") / col("__n").cast("double"), 5)
          .as("observed_frac"),
        round((col("n_units").cast("double") - exp) *
          (col("n_units").cast("double") - exp) / exp, 5).as("chi2_contrib"))
      .orderBy("variant")
  }

  def kfold(df: DataFrame, k: Int, idCol: String = "doc_id",
      salt: String = "fold"): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    df.withColumn("fold",
      (conv(substring(md5(concat_ws("|", lit(salt), col(idCol).cast("string"))),
        1, 8), 16, 10).cast("long") % k).cast("int"))
  }

  /** Per-stratum deterministic sampling: each stratum value gets its
    * own rate (absent strata fall back to `defaultRate`) — the tool
    * for rebalancing a source/language mix into a target mixture.
    * The rate lookup compiles to a CASE chain over the (small, driver-
    * known) rate map; the membership test stays map-only.
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      idCol: String = "doc_id", salt: String = "strata"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === lit(k), lit(r)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol), salt) < rate)
  }

  /** Quality-weighted deterministic sampling: each row's acceptance
    * probability is its own `weightCol` (clamped to [0,1]) — the soft
    * alternative to a hard quality cutoff, preserving a calibrated
    * tail of lower-quality data instead of a cliff. Same md5
    * membership as [[bernoulliSample]] with a per-row rate: map-only,
    * reproducible, partitioning-independent.
    */
  def weightedSample(df: DataFrame, weightCol: String,
      idCol: String = "doc_id", salt: String = "weighted"): DataFrame =
    df.filter(hashUniform(col(idCol), salt) <
      least(greatest(col(weightCol), lit(0.0)), lit(1.0)))

  /** Rebalance a corpus to a target TOKEN mixture — the op behind
    * "train on 40% en / 15% each of the rest". Per-stratum totals
    * t_s are aggregated once (map-side combined, one row per
    * stratum), then the largest corpus achieving the exact mixture is
    * K = min_s(t_s / w_s) total tokens, giving per-stratum keep rates
    * rate_s = w_s·K / t_s ≤ 1 (= 1 for the binding stratum). Rows are
    * then kept by the same md5 membership as [[stratifiedSample]],
    * applied through a broadcast join of the stratum-count-sized rate
    * table — reproducible, oracle-recomputable (the rate arithmetic
    * is a fixed left-to-right IEEE expression both engines evaluate
    * identically), and fully lazy (no driver-side collect; the plan
    * is self-contained).
    *
    * @param df must carry an integral `tokensCol` (e.g.
    *   `size(TextStats.tokens(col("text")))`).
    */
  def rebalanceToMixture(df: DataFrame, strataCol: String,
      weights: Map[String, Double], idCol: String = "doc_id",
      tokensCol: String = "n_tokens", salt: String = "mixture"): DataFrame = {
    import df.sparkSession.implicits._
    val w = weights.toSeq.sortBy(_._1).toDF(strataCol, "__wt")
    // per-stratum totals, the binding constant K = min(t_s / w_s) and
    // the rates all live IN the plan (driver-literal weights joined
    // against a tiny aggregate) — the operator stays lazy, nothing
    // executes at construction time, and an empty corpus yields an
    // empty result (null K matches no row) instead of a driver error.
    // A stratum with no target weight fails AT EXECUTION via
    // raise_error, naming the stratum.
    val totals = df.groupBy(strataCol)
      .agg(sum(col(tokensCol).cast("long")).as("__t"))
      .join(broadcast(w), Seq(strataCol), "left")
      .withColumn("__wt", when(col("__wt").isNotNull, col("__wt"))
        .otherwise(raise_error(
          concat(lit("no target weight for stratum: "), col(strataCol)))))
    val k = totals.agg(min(col("__t").cast("double") / col("__wt")).as("__k"))
    // same left-to-right IEEE arithmetic as the oracle: w·K/t
    val rates = totals.crossJoin(broadcast(k))
      .select(col(strataCol),
        (col("__wt") * col("__k") / col("__t").cast("double")).as("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashUniform(col(idCol), salt) < col("__rate"))
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Data-constrained mixture planner (the repeats dimension the
    * rebalancers lack — Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models": when a stratum's corpus is
    * smaller than its budget share, you REPEAT it, up to a utility
    * cliff around ~4 epochs). Per stratum:
    * (corpus_tokens, target_tokens = budget·weight, repeats_needed =
    * target/corpus, epochs = the max-repeat-capped achievable rate,
    * deficit_tokens = target that cannot be met even at the cap —
    * the signal to re-weight or go find more data).
    *
    * Exactness: weights enter as INTEGER parts-per-million
    * (math.round(w·10⁶) — driver-side, deterministic), targets are
    * DECIMAL(38,0) integer division (budget·ppm div 10⁶ — the product
    * wraps a long once budget ≥ ~10¹³), the two rates are single
    * divisions rounded at 5.
    *
    * Scale shape: one map-side-combined token total per stratum, then
    * bounded-domain arithmetic (|strata| rows) against broadcast
    * literal weights. A stratum with no weight fails AT EXECUTION via
    * raise_error, naming it (the [[rebalanceToMixture]] convention).
    */
  /** Max–min fair (water-filling) token allocation: split
    * `budgetTokens` across strata so no stratum gets more than it
    * HAS, and the leftover is divided as evenly as integers allow —
    * the allocation that caps dominant sources without starving small
    * ones (the mixture designers' third dial next to
    * [[rebalanceToMixture]]'s fixed weights and
    * [[temperatureMixture]]'s power law: no weights to tune, the data
    * sizes ARE the input). A stratum is SATURATED when its whole
    * corpus fits under the water level; the rest share the remainder
    * q = R div m each, with the first R mod m of them (in the
    * deterministic (size, stratum) order) taking one extra token —
    * allocations sum to exactly min(budget, Σ available).
    *
    * Exactness: the saturation predicate a·m + S_below ≤ B and the
    * level split are pure integer arithmetic (products widened to
    * DECIMAL(38,0) — token totals × strata counts overflow a long
    * past ~10¹⁵ tokens); budget_share is integer HALF_UP at scale 5 —
    * alloc/budget is a ratio against a round denominator, the
    * terminating-decimal tie class (§8.3 rule 4, the
    * [[Compaction.plan]] fill_ratio lesson). Saturated strata form a PREFIX of the
    * ascending (available, stratum) order — the classic water-filling
    * invariant — which is what lets the whole solve run as windows
    * over the one-row-per-stratum frame.
    *
    * Scale shape: one map-side-combined per-stratum total, then
    * windows over the STRATUM domain (bounded by the mixture design,
    * never the corpus). Output: (stratum, available_tokens,
    * alloc_tokens, saturated, budget_share), stratum order.
    */
  def waterFillAllocation(df: DataFrame, strataCol: String,
      budgetTokens: Long, tokensCol: String = "n_tokens"): DataFrame = {
    require(budgetTokens > 0, "budget must be positive")
    val dec = DecimalType(38, 0)
    val t = df.groupBy(strataCol)
      .agg(sum(col(tokensCol).cast("long")).as("available_tokens"))
    // bounded global windows: one row per stratum
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("available_tokens"), col(strataCol))
    val before = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    t.withColumn("__i", row_number().over(ord))
      .withColumn("__sb", coalesce(sum(col("available_tokens")).over(before),
        lit(0L)))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__sat",
        col("available_tokens").cast(dec) * (col("__n") - col("__i") + 1) +
          col("__sb") <= lit(budgetTokens).cast(dec))
      .withColumn("__nsat",
        sum(when(col("__sat"), 1L).otherwise(0L)).over(all))
      .withColumn("__ssat",
        coalesce(sum(when(col("__sat"), col("available_tokens"))).over(all),
          lit(0L)))
      .withColumn("__m", col("__n") - col("__nsat"))
      .withColumn("__r", lit(budgetTokens) - col("__ssat"))
      .withColumn("alloc_tokens",
        when(col("__sat"), col("available_tokens"))
          .otherwise(expr("__r div __m") +
            when(col("__i") - col("__nsat") <= expr("__r % __m"), 1L)
              .otherwise(0L)))
      .select(col(strataCol), col("available_tokens"), col("alloc_tokens"),
        col("__sat").as("saturated"),
        // widened: alloc × 2·10⁵ wraps a long past ~5·10¹³-token budgets
        (expr(s"(cast(alloc_tokens as decimal(38,0)) * 200000 + " +
          s"${budgetTokens}L) div ${2 * budgetTokens}L").cast("double")
          / 100000.0).as("budget_share"))
      .orderBy(strataCol)
  }

  def epochPlan(df: DataFrame, strataCol: String,
      weights: Map[String, Double], budgetTokens: Long, maxRepeats: Int,
      tokensCol: String = "n_tokens"): DataFrame = {
    import df.sparkSession.implicits._
    require(budgetTokens > 0 && maxRepeats >= 1)
    val dec = DecimalType(38, 0)
    val w = weights.toSeq.sortBy(_._1)
      .map { case (s, d) => (s, math.round(d * 1000000L)) }
      .toDF(strataCol, "__ppm")
    val totals = df.groupBy(strataCol)
      .agg(sum(col(tokensCol).cast("long")).as("corpus_tokens"))
      .join(broadcast(w), Seq(strataCol), "left")
      .withColumn("__ppm", when(col("__ppm").isNotNull, col("__ppm"))
        .otherwise(raise_error(
          concat(lit("no target weight for stratum: "), col(strataCol)))))
    totals
      // integral `div` (SQL expr — the Column API has no integer
      // division), twin of the oracle's HUGEINT `//`
      .withColumn("target_tokens",
        expr(s"cast((cast($budgetTokens as decimal(38,0)) * __ppm) div 1000000 as long)"))
      .withColumn("__kept", least(col("target_tokens").cast(dec),
        col("corpus_tokens").cast(dec) * lit(maxRepeats)).cast("long"))
      .select(col(strataCol), col("corpus_tokens"), col("target_tokens"),
        when(col("corpus_tokens") > 0,
          round(col("target_tokens").cast("double") /
            col("corpus_tokens").cast("double"), 5))
          .otherwise(lit(null).cast("double")).as("repeats_needed"),
        when(col("corpus_tokens") > 0,
          round(col("__kept").cast("double") /
            col("corpus_tokens").cast("double"), 5))
          .otherwise(lit(null).cast("double")).as("epochs"),
        (col("target_tokens") - col("__kept")).as("deficit_tokens"))
  }

  /** Temperature-flattened mixture (α = 1/2): down-sample each
    * stratum toward the sqrt of its observed share — the standard
    * "don't let the web crawl drown the small languages" rebalance
    * (UniMax-style). Setting target weights w_s ∝ t_s^α in
    * [[rebalanceToMixture]]'s arithmetic and using that keep rates
    * are invariant to a common weight scale, everything collapses to
    *
    *   rate_s = sqrt(t_min) · sqrt(t_s) / t_s
    *
    * — the smallest stratum keeps everything, a stratum 100× larger
    * keeps 10×, not 100×, as many tokens. α is FIXED at 1/2 because
    * sqrt is the one power IEEE 754 requires correctly rounded: both
    * engines compute bit-identical rates with no libm `pow` variance
    * and no cross-engine normalization-sum ordering. Same plan shape
    * as rebalanceToMixture: one stratum-total aggregate, a broadcast
    * rate table, the shared md5 membership — fully lazy, no driver
    * collect.
    */
  def temperatureMixture(df: DataFrame, strataCol: String,
      idCol: String = "doc_id", tokensCol: String = "n_tokens",
      salt: String = "temperature"): DataFrame = {
    val totals = df.groupBy(strataCol)
      .agg(sum(col(tokensCol).cast("long")).as("__t"))
    val kMin = totals.agg(min(sqrt(col("__t").cast("double"))).as("__k"))
    val rates = totals.crossJoin(broadcast(kMin))
      .select(col(strataCol),
        (sqrt(col("__t").cast("double")) * col("__k") /
          col("__t").cast("double")).as("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashUniform(col(idCol), salt) < col("__rate"))
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Keep the k best rows per group by a score column — the
    * "highest-quality N documents per language/source" selection step.
    * Deterministic: ties are broken by ascending id, so the kept set
    * is a pure function of the data. Plans as a rank window
    * partitioned by the group with the `<= k` predicate pushed into
    * WindowGroupLimit (per-partition top-k heaps on BOTH the map and
    * reduce side of the group exchange — no group ever materializes
    * more than k+ rows, so a skewed group cannot OOM a task).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      k: Int, idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Deterministic train/test split: adds a `split` column
    * ("test" iff uniform(salt|id) < testFraction, else "train").
    * Because membership is a function of the id alone, the split is
    * stable across reruns AND leak-proof under dedup: joining any
    * derived table back by id can never move a row across the split.
    */
  def trainTestSplit(df: DataFrame, testFraction: Double,
      idCol: String = "doc_id", salt: String = "split"): DataFrame =
    df.withColumn("split",
      when(hashUniform(col(idCol), salt) < lit(testFraction), lit("test"))
        .otherwise(lit("train")))

  /** Poisson(λ=1) CDF thresholds for k = 0..7 (weight 8 past the
    * tail, cumulative mass < 1e-5). Shared verbatim with the oracle
    * SQL so both engines bucket the same uniforms identically.
    */
  val PoissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** Inverse-CDF Poisson(1) draw from a deterministic uniform. */
  def poissonWeight(u: Column): Column =
    PoissonCdf1.zipWithIndex.reverse
      .foldLeft(lit(PoissonCdf1.size).cast("int")) {
        case (acc, (t, k)) => when(u < lit(t), lit(k)).otherwise(acc)
      }

  /** Deterministic Poisson bootstrap: error bars for an aggregate
    * without materializing resamples. Each (row, replicate) pair
    * draws a Poisson(1) weight from md5(salt|id:rep) — the classic
    * streaming-bootstrap trick (a with-replacement resample of n
    * rows gives each row a Binomial(n, 1/n) ≈ Poisson(1) count) —
    * and each replicate reports its weighted count and mean of
    * `valueCol`. The spread across replicate means IS the bootstrap
    * standard error of the corpus mean.
    *
    * Determinism: weights are pure column expressions of (salt, id,
    * rep); per-replicate means are exact decimal sums with one final
    * double division — identical rows in any engine, any
    * partitioning.
    *
    * Scale shape: the ×replicates expansion happens MAP-SIDE
    * (explode over a literal range) and collapses map-side again via
    * partial aggregation — the shuffle carries `replicates` partial
    * rows per task, never the expanded data. Rows with weight 0 are
    * dropped before aggregation (≈ 37% of the expansion).
    */
  def poissonBootstrap(df: DataFrame, valueCol: String,
      replicates: Int = 32, idCol: String = "doc_id",
      salt: String = "boot"): DataFrame = {
    df.select(col(idCol).cast("string").as("__id"),
        col(valueCol).cast("double").as("__v"))
      .withColumn("rep", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__u", hashUniform(
        concat(col("__id"), lit(":"), col("rep").cast("string")), salt))
      .withColumn("__w", poissonWeight(col("__u")))
      .filter(col("__w") > 0)
      .groupBy("rep")
      .agg(
        sum(col("__w").cast("long")).as("n_eff"),
        round(
          sum(col("__v").cast(org.apache.spark.sql.types.DecimalType(18, 6)) *
            col("__w")).cast("double") /
            sum(col("__w").cast("long")), 5).as("mean_v"))
      .select(col("rep").cast("long").as("rep"), col("n_eff"), col("mean_v"))
      .orderBy("rep")
  }
}
