package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain multi-touch attribution with REMOVAL EFFECTS — the
  * data-driven member of the attribution family (first-touch,
  * last-touch/as-of and U-shaped are positional conventions; this one
  * measures each channel's causal-ish contribution as "how much
  * conversion disappears if the channel vanishes", Anderl et al.'s
  * removal-effect model).
  *
  * == Model ==
  * User journeys become a Markov chain over states {START, channels…,
  * CONV, NULL}: per user, events are ordered and segmented into
  * journeys at each conversion (the conversion belongs to the journey
  * it ends); START opens every journey, CONV absorbs converting ones,
  * NULL absorbs the trailing unconverted tail. P(conv) is the
  * absorption probability from START; channel c's removal effect is
  * 1 − P(conv | transitions into c re-routed to NULL), and shares
  * normalize the effects.
  *
  * == Scale + determinism ==
  * The HEAVY step — journey segmentation and transition counting —
  * is fully relational (user-partitioned windows, one count shuffle
  * keyed by the (from, to) domain). What reaches the driver is the
  * TRANSITION MATRIX, bounded by (|event types| + 3)² — the
  * documented bounded-collect class (the CC union-find precedent) —
  * never events. The absorption solve runs `iters` fixed
  * value-iteration rounds with every probability and state value
  * quantized to scale 9 (HALF_UP): products and sums are then exact
  * decimal arithmetic, so the fixpoint trajectory is bit-identical in
  * the DuckDB twin's unrolled rounds regardless of summation order or
  * convergence (geometric, so 60 rounds ≈ the fixpoint at scale 9 for
  * any chain without a near-1 self-loop; the CONTRACT is the quantized
  * 60-round value, which both engines replay exactly).
  */
object Attribution {

  private val Conv = "CONV"
  private val Absent = "NULL"
  private val Start = "START"

  /** The (from, to, n) journey-transition counts — the relational
    * half; see the class doc for the segmentation rules.
    */
  def journeyTransitions(events: DataFrame,
      conversionType: String = "purchase"): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val prevFrame = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val staged = events
      .select(col("user_id"), col("event_id"),
        Events.epochUs(col("ts")).as("ts_us"),
        when(col("event_type") === conversionType, lit(Conv))
          .otherwise(col("event_type")).as("st"))
      .withColumn("prev_st", lag(col("st"), 1).over(byUser))
      .withColumn("jid", coalesce(
        sum(when(col("st") === Conv, 1L).otherwise(0L)).over(prevFrame),
        lit(0L)))
      .withColumn("prev_jid", coalesce(lag(col("jid"), 1).over(byUser), lit(0L)))
      .withColumn("next_st", lead(col("st"), 1).over(byUser))
    val inner = staged
      .where(col("prev_st").isNotNull && col("prev_jid") === col("jid"))
      .select(col("prev_st").as("f"), col("st").as("t"))
    val starts = staged
      .where(col("prev_st").isNull || col("prev_jid") =!= col("jid"))
      .select(lit(Start).as("f"), col("st").as("t"))
    val tails = staged
      .where(col("next_st").isNull && col("st") =!= Conv)
      .select(col("st").as("f"), lit(Absent).as("t"))
    inner.unionByName(starts).unionByName(tails)
      .groupBy("f", "t").agg(count(lit(1)).as("n"))
  }

  private def round9(d: Double): BigDecimal =
    BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  private def round5(d: Double): Double =
    BigDecimal(d).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The full report: (channel, removal_effect, attribution_share),
    * one row per channel, empty when the corpus never converts.
    */
  def markovRemovalEffects(events: DataFrame,
      conversionType: String = "purchase", iters: Int = 60): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    // bounded collect: the (from, to) domain, never event rows
    val tm = journeyTransitions(events, conversionType).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val outSums = tm.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._3).sum }
    // the oracle's exact shape: one double division, HALF_UP at 9
    val p = tm.map { case (f, t, n) =>
      (f, t) -> round9(n.toDouble / outSums(f).toDouble)
    }.toMap
    val states = tm.map(_._1).distinct.sorted // every from-state, incl START
    val channels = states.filterNot(_ == Start)
    val scenarios = "BASE" +: channels
    // quantized value iteration, all arithmetic exact decimal
    var x: Map[(String, String), BigDecimal] =
      (for (sc <- scenarios; s <- states) yield (sc, s) -> BigDecimal(0)).toMap
    for (_ <- 1 to iters) {
      x = (for (sc <- scenarios; s <- states) yield {
        val total = tm.filter(_._1 == s).map { case (_, t, _) =>
          val v =
            if (t == sc) BigDecimal(0)
            else if (t == Conv) BigDecimal(1)
            else if (t == Absent) BigDecimal(0)
            else x((sc, t))
          p((s, t)) * v
        }.sum
        (sc, s) -> total.setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }).toMap
    }
    val base = x(("BASE", Start))
    val rows: Seq[(String, Double, Option[Double])] =
      if (base <= 0) Seq.empty
      else {
        val re = channels.map { c =>
          c -> round9(1.0 - x((c, Start)).toDouble / base.toDouble)
        }
        val tot = re.map(_._2).sum
        re.map { case (c, r) =>
          (c, round5(r.toDouble),
            if (tot > 0) Some(round5(r.toDouble / tot.toDouble)) else None)
        }
      }
    rows.toDF("channel", "removal_effect", "attribution_share")
      .orderBy("channel")
  }
}
