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
    *  - sum/mean accumulate in DECIMAL(27,6): double addition is not
    *    associative, so a shuffle-order-dependent double sum can flip
    *    the 5th decimal at scale; decimal accumulation is exact and
    *    deterministic regardless of partitioning. Precision 27 is the
    *    exact-multiply bound against the (10,0) counts ((27,6)×(10,0)
    *    = (38,6), never scale-reduced), putting the value envelope at
    *    |v| < 10²¹ with a loud raise_error guard past it; scale 6
    *    out-scales the 5-decimal display rounding. (Values that fit a
    *    compact Long still use Spark's fast Decimal representation —
    *    declared precision does not force the wide path.)
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
  private def baseStats(cols: Seq[String]): Seq[Column] =
    cols.zipWithIndex.flatMap { case (c, i) =>
      val x = col(c)
      val n = count(x)
      // same (27,6) quantization + loud envelope guard as exactLong
      // (the ProfilerSpec `==` assertion holds over the whole
      // envelope, not just below the old 10¹² edge)
      val s1 = sum(when(abs(x.cast(DoubleType)) < lit(1e21),
        x.cast(DecimalType(27, 6)))
        .otherwise(raise_error(lit(
          "profiler value envelope exceeded: |value| >= 1e21 overflows " +
            "the exact decimal(27,6) sum"))))
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
    *     map-side combined, key space = Σ distinct values]
    *   count / count_distinct / min / max  — trivial per-ci roll-ups
    *   sum / mean  — Σ decimal(27,6)(v)·cnt: exact decimal arithmetic
    *     (associative → partitioning-independent); mean = Σ/n in one
    *     double division
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
    * `decimal(27,6)` sum contract — |value| < 10²¹, loud-guarded
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
    val vc = spreadDf
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (ci, v)")
      .filter(col("v").isNotNull)
      .groupBy("ci", "v").agg(count(lit(1)).cast(DecimalType(10, 0)).as("cnt"))
    // Per-value quantization at decimal(27,6) — the exact-multiply
    // bound ((27,6)×(10,0) = (38,6), never reduced), putting the VALUE
    // envelope at |v| < 10²¹ (ADVICE r11: the old (18,6) cast nulled
    // SILENTLY past 10¹² under non-ANSI Spark while DuckDB threw —
    // wide surrogate keys crossed it at ~sf1). Past the envelope the
    // guard FAILS LOUDLY instead of dropping the value from s1 while
    // still counting it in n: a wrong mean is worse than no mean.
    val basic = vc.groupBy("ci").agg(
      sum(col("cnt").cast(LongType)).as("n"),
      count(lit(1)).cast(DoubleType).as("ndist"),
      min("v").as("minv"),
      max("v").as("maxv"),
      sum(when(abs(col("v")) < lit(1e21), col("v").cast(DecimalType(27, 6)))
        .otherwise(raise_error(concat(
          lit("profiler value envelope exceeded: |value| >= 1e21 " +
            "overflows the exact decimal(27,6) sum (got "),
          col("v").cast(StringType), lit(")"))))
        * col("cnt")).as("s1"))
      .withColumn("m", col("s1").cast(DoubleType) / col("n"))
    // pass 2 for stddev: exact decimal sum of (v-m)^2 around the mean.
    // Precision 27 everywhere is the exact-multiply bound: (27,s)×
    // (10,0) has ideal precision 38, so the ·cnt product NEVER
    // triggers Spark's precision-loss scale reduction — every branch
    // stays exact, associative, partition-order independent.
    // THREE σ-quantization regimes (ADVICE r11 found the coarse
    // branch's silent-null edge at range ≈ 3·10¹³): per column,
    // selected by its exact range (both engines compare the same
    // doubles) — fine ≤ 10⁷ quantizes each squared deviation at
    // 10⁻¹²; coarse ≤ 3·10¹³ at 10⁰ (dd ≤ range² = 9·10²⁶ fits
    // decimal(27,0) BY CONSTRUCTION — no guard needed); ultra beyond
    // quantizes dd/10¹² at 10⁰ and scales the sum back by 10¹²
    // (absolute error ≤ 0.5·10¹²·ndist against a Σ ≥ n·range²/4 ≫
    // 10²⁶ whenever ultra is selected — relative < 10⁻¹⁴, invisible
    // at the display). The ultra edge (dd ≥ 10³⁹, range ≳ 3·10¹⁹)
    // FAILS LOUDLY — past the widened 10²¹ value envelope anyway.
    val sq = vc
      .join(broadcast(basic.select(col("ci"), col("m"),
        (col("maxv") - col("minv") > lit(1e7)).as("__coarse"),
        (col("maxv") - col("minv") > lit(3e13)).as("__ultra"))), "ci")
      .withColumn("__dd",
        (col("v") - col("m")) * (col("v") - col("m")))
      .withColumn("d2f", when(col("__coarse"), lit(null))
        .otherwise(col("__dd").cast(DecimalType(27, 12))) * col("cnt"))
      .withColumn("d2c", when(col("__coarse") && !col("__ultra"),
        col("__dd").cast(DecimalType(27, 0)))
        .otherwise(lit(null)) * col("cnt"))
      .withColumn("d2u", when(col("__ultra"),
        when(col("__dd") < lit(1e39),
          (col("__dd") / lit(1e12)).cast(DecimalType(27, 0)))
          .otherwise(raise_error(lit(
            "profiler range envelope exceeded: squared deviation >= 1e39 " +
              "(column range >= ~3e19) overflows the ultra decimal(27,0) " +
              "quantization"))))
        .otherwise(lit(null)) * col("cnt"))
      .groupBy("ci")
      .agg(sum("d2f").as("s2f"), sum("d2c").as("s2c"),
        sum("d2u").as("s2u"))
    // median: position-targeted sharded lookup, Percentile-exact
    // interpolation. The general machinery is the range-SHARDED
    // two-phase prefix sum (graft.ext.Quantiles.shardedCumsum — a
    // single `partitionBy(ci)` window would sort ALL distinct values
    // of a column in ONE task); the median probes exactly TWO global
    // positions per column, so Quantiles.valuesAtPositions prunes the
    // sort-window to the one or two shards that hold them (32× less
    // window input) after the exact shard offsets are known. Boundary
    // sketch affects load balance only — shard totals are exact, so
    // the probed values are identical to the full cumsum's.
    val pos = lit(0.5) * (col("n") - 1).cast(DoubleType)
    val lower = floor(pos)
    val higher = ceil(pos)
    val wanted = basic.select(col("ci"), col("n"))
      .select(col("ci"), col("n"),
        explode(array_distinct(array(lower.cast(LongType),
          higher.cast(LongType)))).as("__pos"))
      .select("ci", "__pos")
    val hits = graft.ext.Quantiles
      .valuesAtPositions(vc, Seq("ci"), "v", "cnt", wanted)
      .join(broadcast(basic.select(col("ci"), col("n"))), "ci")
    val med = hits.groupBy("ci", "n")
      .agg(
        max(when(col("__pos") === lower.cast(LongType), col("v"))).as("lowv"),
        max(when(col("__pos") === higher.cast(LongType), col("v"))).as("highv"))
      .withColumn("median", round(
        when(lower === higher, col("lowv"))
          .otherwise(col("lowv") * (higher - pos) + col("highv") * (pos - lower)), 5))
      .select("ci", "median")
    val perCi = basic.join(sq, Seq("ci")).join(med, Seq("ci"))
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
