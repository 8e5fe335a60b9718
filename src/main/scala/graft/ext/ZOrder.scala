package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering — the data-skipping
  * organization trick: interleaving the bits of two columns makes
  * rows that are close in BOTH dimensions land close on the curve, so
  * range-partitioning + sorting by the Z key gives every file a tight
  * min/max envelope in each dimension, and scans filtered on either
  * column skip most files. This is what table formats call
  * `OPTIMIZE ... ZORDER BY`; here it is plain Spark: a pure bit-math
  * key column + `repartitionByRange` + `sortWithinPartitions`.
  *
  * The interleave is the classic magic-number bit spread; the step
  * constants are shared with the DuckDB oracle twin
  * (OraclesExt.zorder generates the same shift/mask chain), so the
  * key is verified bit-for-bit cross-engine.
  */
object ZOrder {

  /** (shift, mask) chain spreading a 16-bit value to even bit
    * positions of a 32-bit word.
    */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` to even bit positions (values are
    * masked to 16 bits first — callers bucket/modulo wider domains).
    */
  def spread16(c: Column): Column =
    SpreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) {
      case (acc, (s, m)) => acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of two 16-bit dimensions (`a` on even bits). */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster a DataFrame for 2-D data skipping: range-partition and
    * sort by the Morton key. The range exchange samples key bounds
    * (one pass), then each output file covers a contiguous Z range —
    * tight per-file min/max on both dimensions.
    */
  def clusterBy(df: DataFrame, aCol: String, bCol: String,
      partitions: Int): DataFrame =
    df.withColumn("zkey", morton2(col(aCol), col(bCol)))
      .repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions("zkey")

  /** Zone-map skipping-effectiveness report: quantifies what
    * [[clusterBy]] buys. Rows are laid out into `files` equal-row
    * files under two layouts — `linear` (sorted by `aCol` then
    * `bCol`) and `zorder` (sorted by the Morton key) — each file
    * keeps a (min,max) zone map per dimension, and three probe
    * classes replay against the maps: `a_only` (filter on the lead
    * column), `b_only` (the secondary column — the case a linear
    * layout cannot skip), and `point` (both). Output: (layout,
    * probe_class, n_files, n_probes, avg_files_scanned, scan_frac) —
    * the number every OPTIMIZE/ZORDER decision should be based on,
    * measured instead of assumed.
    *
    * Determinism and scale: the corpus is scanned ONCE — a
    * (a, b)-pair roll-up whose exchange every downstream consumer
    * (both layouts, all three probe classes) shares, because both
    * layout keys are pure functions of the pair and min/max zone
    * maps are multiplicity-blind. File assignment is the Gini
    * machinery's range-end rule ⌈cum·F/n⌉ over the key's
    * value-counts via [[Quantiles.shardedCumsum]] (two-phase, no
    * global sort task, partitioning-independent — and since each key
    * is unique per pair, the pair frame IS the value-counts frame:
    * no re-aggregation, no join back). Probes are the md5-least
    * `probes` distinct values per class — a pure function of the
    * data. The probe×file replay is a broadcast nested-loop over two
    * config-bounded frames (2·files × 3·probes rows). Counts stay
    * integer to one rounded division per output cell.
    */
  def skippingReport(df: DataFrame, aCol: String, bCol: String,
      files: Int = 64, probes: Int = 50): DataFrame = {
    require(files >= 2 && probes >= 1, s"bad files=$files probes=$probes")
    // ONE corpus aggregation; both layout keys derive from the pair.
    // The linear key is (a, b) lexicographic packed into one long
    // (16-bit b, like the Morton path's 16-bit dimensions).
    val pairs = df
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__klin", shiftleft(col("__a").bitwiseAND(lit(0xFFFFL)), 16)
        .bitwiseOR(col("__b").bitwiseAND(lit(0xFFFFL))))
      .withColumn("__kz", morton2(col("__a"), col("__b")))
      .withColumn("__g", lit(0))

    def zones(keyCol: String, layout: String): DataFrame = {
      val cum = Quantiles.shardedCumsum(pairs, Seq("__g"), keyCol, "__c")
      val tot = pairs.agg(sum(col("__c")).as("__n"))
      cum.crossJoin(broadcast(tot))
        .withColumn("__file",
          expr(s"(cum * $files + __n - 1) div __n").cast("int"))
        .groupBy("__file")
        .agg(min(col("__a")).as("__amin"), max(col("__a")).as("__amax"),
          min(col("__b")).as("__bmin"), max(col("__b")).as("__bmax"))
        .withColumn("layout", lit(layout))
    }
    val zoneMaps = zones("__klin", "linear").unionByName(zones("__kz", "zorder"))

    def probeSet(cols: Seq[Column], cls: String, pa: Column,
        pb: Column): DataFrame =
      pairs.select(cols: _*).distinct()
        .orderBy(
          md5(concat_ws("|",
            lit("probe") +: cols.map(_.cast("string")): _*)).asc +:
            cols.map(_.asc): _*)
        .limit(probes)
        .select(lit(cls).as("probe_class"), pa.as("__pa"), pb.as("__pb"))
    val ps = probeSet(Seq(col("__a")), "a_only", col("__a"),
        lit(null).cast("long"))
      .unionByName(probeSet(Seq(col("__b")), "b_only",
        lit(null).cast("long"), col("__b")))
      .unionByName(probeSet(Seq(col("__a"), col("__b")), "point",
        col("__a"), col("__b")))

    val hit = (col("__pa").isNull ||
        (col("__pa") >= col("__amin") && col("__pa") <= col("__amax"))) &&
      (col("__pb").isNull ||
        (col("__pb") >= col("__bmin") && col("__pb") <= col("__bmax")))
    val nf = zoneMaps.groupBy("layout").agg(count(lit(1)).as("n_files"))
    val np = ps.groupBy("probe_class").agg(count(lit(1)).as("n_probes"))
    zoneMaps.crossJoin(broadcast(ps))
      .groupBy("layout", "probe_class")
      .agg(sum(when(hit, 1L).otherwise(0L)).as("__scanned"))
      .join(broadcast(nf), "layout")
      .join(broadcast(np), "probe_class")
      .select(col("layout"), col("probe_class"), col("n_files"),
        col("n_probes"),
        round(col("__scanned").cast("double") /
          col("n_probes").cast("double"), 5).as("avg_files_scanned"),
        round(col("__scanned").cast("double") /
          (col("n_probes") * col("n_files")).cast("double"), 5)
          .as("scan_frac"))
      .orderBy("layout", "probe_class")
  }
}
