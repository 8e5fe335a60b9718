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
  *     ([[distinctAndMedianRow]]): groupBy (column, value) with
  *     map-side combine, then a tiny per-column roll-up and an N-way
  *     parallel window cumsum over DISTINCT values. No operator ever
  *     buffers raw rows in one task (Spark's own `percentile` and the
  *     Expand-based multi-distinct both do, which is what breaks at
  *     100 TB).
  *
  * The subsequent unpivot (`stack`) and pivot run on a 1-row / 8N-row
  * relation — trivial at any data scale. For the 100 TB fast path,
  * [[approxProfile]] swaps distinct/median for `approx_count_distinct`
  * / `percentile_approx` sketches (constant memory, associative
  * merge) when ±ε is acceptable.
  *
  * Local-bench caveat: the driver's parquet files contain a single
  * row group, so a scan's parallelism is 1 task per file no matter
  * the split size — profile wall-clock at sf0.1 is bounded by that
  * one task. A real table has thousands of row groups; we do NOT
  * repartition to fake parallelism because a shuffle would reorder
  * the double `avg` partial sums and break bit-determinism against
  * the oracle.
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

  /** Semantics of the 8 statistics:
    *
    *  - count / count_distinct are exact and unrounded
    *    (aws-athena.sh:81-85); the cast to double is lossless below
    *    2^53 rows.
    *  - mean/std/min/median/max/sum are `round(x, 5)`
    *    (aws-athena.sh:87-100).
    *  - median is EXACT `percentile(c, 0.5)` rather than the
    *    reference's `approx_percentile` (aws-athena.sh:96): Trino's
    *    t-digest, Spark's GK sketch and any oracle all disagree on
    *    approximate quantiles, so exactness is the only portable
    *    semantics (SURVEY.md §7.6). The sketch variant lives in
    *    [[approxProfile]].
    *  - sum accumulates in DECIMAL(18,6): double addition is not
    *    associative, so a shuffle-order-dependent double sum can flip
    *    the 5th decimal at scale; decimal accumulation is exact and
    *    deterministic regardless of partitioning. Precision 18 keeps
    *    Spark's Decimal in its compact-Long representation (~10×
    *    faster than precision>18), scale 6 out-scales the 5-decimal
    *    rounding, and the sum buffer is decimal(28,6) — headroom to
    *    ~1e22, enough for 100 TB-scale sums of 1e12-magnitude values.
    *
    * == Why three aggregation subtrees instead of one ==
    * A single `df.agg` mixing N exact `countDistinct`s (which plan as
    * an Expand ×(N+1) + re-keyed hash aggregate) with N `percentile`s
    * (TypedImperativeAggregate → ObjectHashAggregate) degenerates: the
    * whole aggregate becomes object-hash with millions of groups and
    * falls back to sort-based — measured 60-100 s on 600 k rows. Split
    * apart, each subtree keeps its natural physical shape:
    * declarative stats stay in whole-stage codegen, the distinct
    * aggregate stays a pure hash aggregate over the expand, and the
    * percentile aggregate runs object-hash with a single group. The
    * three 1-row results are then joined (broadcast of single rows —
    * free at any scale). Cost: 3 column-pruned scans instead of 1 —
    * still O(1) scans vs the reference's 8×N (aws-athena.sh:81-100).
    */
  private def baseStats(cols: Seq[String]): Seq[Column] =
    cols.zipWithIndex.flatMap { case (c, i) =>
      val x = col(c)
      Seq(
        count(x).cast(DoubleType).as(s"c${i}_1"),
        round(avg(x), 5).as(s"c${i}_3"),
        round(stddev_samp(x), 5).as(s"c${i}_4"),
        round(min(x).cast(DoubleType), 5).as(s"c${i}_5"),
        round(max(x).cast(DoubleType), 5).as(s"c${i}_7"),
        round(sum(x.cast(DecimalType(18, 6))).cast(DoubleType), 5).as(s"c${i}_8"))
    }

  /** One row with all 8×N stats as columns `c<i>_<j>` (sketch-based
    * distinct/median — the approxProfile path).
    */
  private def aggRow(df: DataFrame, cols: Seq[String],
      distinctAgg: String => Column, medianAgg: String => Column): DataFrame = {
    val bs = baseStats(cols)
    val base = df.agg(bs.head, bs.tail: _*)
    val dists = cols.zipWithIndex.map { case (c, i) =>
      distinctAgg(c).as(s"c${i}_2")
    }
    val meds = cols.zipWithIndex.map { case (c, i) =>
      medianAgg(c).as(s"c${i}_6")
    }
    val dist = df.agg(dists.head, dists.tail: _*)
    val med = df.agg(meds.head, meds.tail: _*)
    base.crossJoin(dist).crossJoin(med)
  }

  /** EXACT count_distinct and median for all N columns from ONE shared
    * value-counts relation — one scan, fully distributed.
    *
    * Why not `countDistinct`×N + `percentile`×N: the former plans as
    * Expand×(N+1) with an (N+1)-column distinct shuffle; the latter is
    * a TypedImperativeAggregate that buffers EVERY value per column in
    * one final task (measured: a 2-second serial merge at sf0.1 —
    * and a guaranteed OOM at 100 TB). Here instead:
    *
    *   unpivot (ci, value) → groupBy(ci, value) count   [one shuffle,
    *     map-side combined, key space = Σ distinct values]
    *   distinct(ci)  = count of rows per ci              [tiny]
    *   median(ci)    = window cumsum over value order    [N-way
    *     parallel sort of DISTINCT values, never raw rows]
    *
    * The interpolation reproduces Spark `Percentile.getPercentile`
    * bit-for-bit (lower·(higher−pos) + higher·(pos−lower)), so the
    * result is indistinguishable from `percentile(c, 0.5)` and the
    * DuckDB oracle keeps hash-matching.
    *
    * Values are compared as doubles: exact for all doubles and for
    * integers below 2⁵³ (the reference's own stats all cast to double
    * anyway — aws-athena.sh:81-100).
    */
  private def distinctAndMedianRow(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"'$i', cast(`$c` as double)" }.mkString(", ")
    val vc = df
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (ci, v)")
      .filter(col("v").isNotNull)
      .groupBy("ci", "v").agg(count(lit(1)).as("cnt"))
    val tot = vc.groupBy("ci")
      .agg(sum("cnt").as("n"), count(lit(1)).cast(DoubleType).as("ndist"))
    val pos = lit(0.5) * (col("n") - 1).cast(DoubleType)
    val lower = floor(pos)
    val higher = ceil(pos)
    val cum = vc.withColumn("cum", sum("cnt").over(
      Window.partitionBy("ci").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(tot), "ci")
    val picked = cum.groupBy("ci", "n", "ndist")
      .agg(
        max(when(col("cum") - col("cnt") <= lower && lower <= col("cum") - 1,
          col("v"))).as("lowv"),
        max(when(col("cum") - col("cnt") <= higher && higher <= col("cum") - 1,
          col("v"))).as("highv"))
      .withColumn("median", round(
        when(lower === higher, col("lowv"))
          .otherwise(col("lowv") * (higher - pos) + col("highv") * (pos - lower)), 5))
    // assemble the N (ci, ndist, median) rows into one wide row
    val cells = cols.indices.flatMap { i =>
      Seq(
        coalesce(max(when(col("ci") === i.toString, col("ndist"))), lit(0.0))
          .as(s"c${i}_2"),
        max(when(col("ci") === i.toString, col("median"))).as(s"c${i}_6"))
    }
    picked.agg(cells.head, cells.tail: _*)
  }

  /** One row with all 8×N stats — EXACT path: declarative base stats
    * in one codegen'd scan + the shared value-counts subtree for
    * distinct/median (one more scan). 2 column-pruned scans total vs
    * the reference's 8×N (aws-athena.sh:81-100).
    */
  private def exactAggRow(df: DataFrame, cols: Seq[String]): DataFrame = {
    val bs = baseStats(cols)
    val base = df.agg(bs.head, bs.tail: _*)
    base.crossJoin(distinctAndMedianRow(df, cols))
  }

  private def unpivot(one: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.zipWithIndex.flatMap { case (c, i) =>
      aggLabels.zipWithIndex.map { case (label, j) =>
        s"'${c}', '${label}', `c${i}_${j + 1}`"
      }
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size * aggLabels.size}, $stackArgs) AS (column_name, agg_type, result)")
  }

  /** Long-form profile: `(column_name, agg_type, result)` — the shape
    * of the reference's UNION ALL relation (aws-athena.sh:80-110) —
    * computed in 3 column-pruned scans and unpivoted with `stack`.
    */
  def profileLong(df: DataFrame): DataFrame = {
    val cols = numericColumns(df.schema)
    require(cols.nonEmpty, "no numeric columns to profile")
    unpivot(exactAggRow(df, cols), cols)
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
    */
  def approxProfile(df: DataFrame): DataFrame = {
    val cols = numericColumns(df.schema)
    require(cols.nonEmpty, "no numeric columns to profile")
    val one = aggRow(df, cols,
      c => approx_count_distinct(col(c)).cast(DoubleType),
      c => round(percentile_approx(col(c), lit(0.5), lit(10000)).cast(DoubleType), 5))
    unpivot(one, cols)
      .groupBy("agg_type")
      .pivot("column_name", cols)
      .agg(first("result"))
      .orderBy("agg_type")
  }
}
