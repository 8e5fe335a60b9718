package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation —
  * pipeline extensions (SURVEY.md §7.5; the reference has no sampling
  * surface). A corpus pipeline needs samples that are REPRODUCIBLE
  * (re-running the job yields the same training set), SEEDABLE
  * (different salts give independent samples), and JOIN-FREE (the
  * keep/drop decision is a pure function of the row — no global
  * state, no shuffle).
  *
  * Spark's own `df.sample`/`sampleBy` are none of these at pipeline
  * scale: they seed a per-partition RNG, so the selected ROWS change
  * whenever partitioning, file order, or split size changes. Here the
  * decision is `uniform(id) < rate` with the uniform derived from
  * md5(salt|id) — a pure, codegen'd column expression: map-only, no
  * shuffle, identical output on any engine with md5 (the DuckDB
  * oracle twins recompute it bit-for-bit), and stable under ANY
  * re-partitioning at 100 TB.
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
}
