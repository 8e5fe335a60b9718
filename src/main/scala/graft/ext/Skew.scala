package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers: two-phase (salted) aggregation.
  *
  * A `groupBy(key)` over a skewed key (few distinct values, or one
  * hot value) concentrates whole key-groups in single reducer tasks.
  * Salting splits each key into `salts` sub-groups for the first,
  * heavy aggregation — the shuffle spreads each hot key over `salts`
  * reducers — and a second, tiny aggregation merges the partials.
  * Only decomposable aggregates can be salted (count/sum/min/max —
  * anything with an associative merge).
  *
  * The salt is derived from a deterministic hash of a carrier column,
  * NOT from randomness or partition ids, so results and plans are
  * reproducible run-to-run (required by the oracle gate and by any
  * retry-safe production job — a task retry must re-salt rows
  * identically).
  */
object Skew {

  /** Deterministic salt in [0, salts) from a carrier column. */
  def saltOf(carrier: Column, salts: Int): Column =
    pmod(crc32(carrier.cast("string")), lit(salts.toLong))

  /** Salted count + decimal-exact sum per key:
    * phase 1 groups on (key, salt) — the wide shuffle, spread over
    * `salts` reducers per key; phase 2 merges `salts` partial rows
    * per key — trivially small. Decimal partials merge exactly, so
    * the result is bit-identical to the unsalted aggregation.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
      carrierCol: String, salts: Int): DataFrame =
    df
      .withColumn("__salt", saltOf(col(carrierCol), salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__n")).as("n_events"),
        round(sum(col("__s")).cast("double"), 5).as("sum_value"))

  /** Skew-salted equi-join: the big side is salted on a deterministic
    * carrier hash and the small side replicated `salts` times, so a
    * hot join key spreads over `salts` reducers instead of one. This
    * is the manual form of AQE's skew-join split for the case AQE
    * can't handle: a SINGLE key hot enough that even one runtime
    * sub-split of it overwhelms a task, or a build side that must
    * shuffle (too big to broadcast) against a skewed probe side.
    * Results are exactly the plain join's — the salt is an equi-key
    * refinement, never a filter.
    *
    * When the small side FITS in a broadcast, prefer a plain join
    * (Catalyst broadcasts it and there is no shuffle to skew); the
    * `shuffle_hash` hint here exists so the operator demonstrably
    * exercises the salted-shuffle plan it is for.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      carrierCol: String, salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      saltOf(col(carrierCol), salts).cast("int"))
    val expanded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(expanded.hint("shuffle_hash"), Seq(keyCol, "__salt"))
      .drop("__salt")
  }

  /** Skew diagnostic: the top-k heavy-hitter keys with their share of
    * all rows and a recommended salt factor (⌈key count / mean key
    * count⌉ — how many reducers the key needs to look average). The
    * operational companion to [[saltedAgg]]/[[saltedJoin]]: run this
    * first to decide WHETHER and how much to salt. One map-side-
    * combined count shuffle + a TakeOrderedAndProject over the
    * per-key counts (never a full sort) + a broadcast 1-row total.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__n_keys"))
    counts
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
      .crossJoin(broadcast(stats))
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("__total").cast("double"), 5)
          .as("share"),
        ceil(col("cnt").cast("double") * col("__n_keys").cast("double") /
          col("__total").cast("double")).cast("long").as("salt_factor"))
  }
}
