package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollups — the 100 TB pattern behind "distinct
  * users per anything, instantly": materialize a small HLL sketch per
  * fine-grained group ONCE (one scan of the raw events), then answer
  * any coarser distinct-count rollup by merging sketches — no second
  * scan of the raw data, ever. Spark's Datasketches-backed
  * `hll_sketch_agg` / `hll_union_agg` are associative and
  * merge-order-independent (register-wise max), so re-aggregation is
  * deterministic and agrees with a direct sketch within a fraction
  * of a percent — bit-equal while sketches stay sparse, slightly
  * divergent once the union promotes past sparse mode (the estimate
  * itself is ±~2% at the default lgConfigK).
  *
  * Verification: approximate by construction, so no DuckDB twin —
  * ExtSpec pins the estimate against the exact distinct count within
  * the sketch's error envelope, and asserts merged-daily ≡
  * straight-from-raw sketches (the mergeability contract).
  */
object Sketches {

  /** One row per (key, day): an HLL sketch of the distinct users plus
    * the exact event count — the materialization a pipeline would
    * write to parquet (the sketch is a binary column) once per
    * ingestion day.
    */
  def dailyUserSketches(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", userCol: String = "user_id"): DataFrame =
    events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(userCol)).as("user_sketch"),
        count(lit(1)).as("n_events"))

  /** Any-granularity rollup from the materialized sketches: merge the
    * per-day sketches per key and estimate — touches sketch rows
    * only, never the raw events.
    */
  def rollupDistinctUsers(daily: DataFrame,
      keyCol: String = "event_type"): DataFrame =
    daily.groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch")))
        .as("approx_distinct_users"),
        sum("n_events").as("n_events"))

  /** SELF-VALIDATING twin of the HLL rollup, giving the sketch path
    * an oracle-checkable driver gate (the raw estimate has no
    * portable SQL twin — engines' HLL registers differ): per key,
    * the exact facts the oracle recomputes (event count, exact
    * distinct users) plus three invariants that must hold if the
    * sketch path is correct, emitted as booleans the driver hashes
    * against literal `true`s — the rollup's event count matches the
    * direct count (sum-of-dailies identity), the estimate lands
    * inside the HLL error envelope, and merged-daily sketches
    * estimate within 1% of one direct sketch (the mergeability
    * contract; bit-equality holds only while every sketch is still
    * in sparse mode — measured at sf0.1: merged 1488 vs direct 1494
    * on 1500 exact, both inside the envelope).
    *
    * Scale shape: three map-side-combined aggregates of the same
    * scan joined on the key domain (broadcast-class); the exact
    * distinct count is the check's one intrinsic cost — this is a
    * diagnostic query run at audit time, not the serving path.
    */
  def rollupSelfCheck(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    val rolled = rollupDistinctUsers(
      dailyUserSketches(events, keyCol, tsCol, userCol), keyCol)
      .withColumnRenamed("n_events", "__ne_rolled")
    val direct = events.groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(userCol))).as("__direct"))
    val exact = events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("n_distinct_users"))
    exact.join(rolled, Seq(keyCol)).join(direct, Seq(keyCol))
      .select(col(keyCol),
        col("n_events"), col("n_distinct_users"),
        (col("__ne_rolled") === col("n_events")).as("events_exact"),
        (abs(col("approx_distinct_users").cast("double") -
          col("n_distinct_users").cast("double")) <=
          col("n_distinct_users").cast("double") * lit(0.05))
          .as("hll_within_5pct"),
        (abs(col("approx_distinct_users").cast("double") -
          col("__direct").cast("double")) <=
          greatest(lit(1.0), col("__direct").cast("double") * lit(0.01)))
          .as("merge_within_1pct"))
      .orderBy(keyCol)
  }

  /** Per-day mergeable VALUE-COUNT relations — the exact counterpart
    * to [[dailyUserSketches]]: where HLL registers merge with bounded
    * error, value counts merge by ADDITION with none. One map-side-
    * combined shuffle keyed by (type, day, value); the relation's
    * size is Σ per-day distinct values, the materialization a
    * warehouse keeps per ingest batch.
    */
  def dailyValueCounts(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame =
    events.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
          .as("day_num"),
        col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))

  /** EXACT quantiles at any coarser granularity from the daily
    * value-count relations — no raw-event rescan and no sketch
    * error: counts merge by addition, so the weekly (or monthly,
    * or all-time) quantiles computed from merged counts are exactly
    * the quantiles of the combined raw data
    * (Quantiles.groupQuantilesFromCounts; ExtSpec asserts rollup ≡
    * direct). This is what percentile sketches are usually accepted
    * for — here the mergeable summary is exact.
    */
  def rollupQuantiles(daily: DataFrame, ps: Seq[(String, Double)],
      keyCol: String = "event_type", daysPerBucket: Long = 7L): DataFrame =
    Quantiles.groupQuantilesFromCounts(
      daily.withColumn("bucket_num",
        floor(col("day_num") / daysPerBucket).cast("long")),
      Seq(keyCol, "bucket_num"), "v", "cnt", ps)

  // ---- deterministic KMV distinct-count sketch ----

  /** Per-(key, day) k-minimum-values sketch rows: the k smallest
    * md5(user) digests per group, as a RELATION (key, day_num, h) —
    * never a buffered array. The rank filter compiles to
    * WindowGroupLimit, so no task holds more than ~k rows per group
    * even on a hot key. Where HLL ([[dailyUserSketches]]) is
    * library-opaque and oracle-unverifiable, KMV is md5-deterministic:
    * any engine rebuilds the identical sketch, so the DuckDB twin
    * checks it cell-exact.
    */
  def dailyKmvSketches(events: DataFrame, k: Int,
      keyCol: String = "event_type", tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame = {
    val day = datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
    val hashed = events
      .select(col(keyCol), day.as("day_num"),
        md5(col(userCol).cast("string")).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("day_num")).orderBy(col("h"))
    hashed.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k).drop("__r")
  }

  /** Merge daily KMV sketches and estimate distinct users per key:
    * bottom-k of the UNION of bottom-ks is the bottom-k of the union
    * (KMV's mergeability), and the estimator is the classic
    * (k−1)/U(k) with U(k) = the kth smallest digest mapped to a
    * uniform in (0,1) from its first 15 hex digits. When a key has
    * fewer than k distinct digests the sketch IS the distinct set and
    * the count is exact. Deterministic end to end — md5 order and one
    * IEEE division — so the oracle recomputes it bit-for-bit.
    */
  def rollupDistinctKmv(daily: DataFrame, k: Int,
      keyCol: String = "event_type"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("h"))
    val ranked = daily.select(col(keyCol), col("h")).distinct()
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
    ranked.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), max(col("h")).as("__hk"))
      .select(col(keyCol),
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) /
            (conv(substring(col("__hk"), 1, 15), 16, 10).cast("double") /
              lit(1152921504606846976.0)), 5))
          .as("approx_distinct_users"))
  }

  // ---- deterministic Bloom filter (incremental "seen before" dedup) ----

  /** The `k` Bloom bit positions of a text value: position i is the
    * first 60 bits of md5("bloom<i>|" + text) mod `mBits`. Every
    * constant is derived from md5, so any engine (the DuckDB oracle
    * included) rebuilds the IDENTICAL filter — unlike library Bloom
    * implementations whose hash seeds are private. Map-only.
    */
  def bloomPositions(text: Column, mBits: Long, k: Int): Column =
    array((0 until k).map { i =>
      conv(substring(md5(concat(lit(s"bloom$i|"), text)), 1, 15), 16, 10)
        .cast("long") % lit(mBits)
    }: _*)

  /** Build the filter as a SPARSE (word_idx, bits) relation: explode
    * the k positions per document, pack into 63-BIT words with a
    * `bit_or` aggregate (63, not 64: the max shift is then 62, which
    * keeps the word inside a signed BIGINT on engines with checked
    * shifts — DuckDB rejects `1::BIGINT << 63`). One map-side-combined
    * shuffle of at most mBits/63 rows — the standard incremental-dedup
    * materialization (build once over yesterday's corpus, probe
    * today's crawl without rescanning yesterday). A 1-Gbit filter
    * (≈10⁸ docs at 1% fpr with k=7) is a ~130 MB relation —
    * broadcastable at probe time.
    */
  def bloomBuild(df: DataFrame, mBits: Long, k: Int,
      textCol: String = "text"): DataFrame =
    df.select(explode(bloomPositions(col(textCol), mBits, k)).as("pos"))
      .select(expr("pos div 63").as("word_idx"),
        expr("shiftleft(1L, int(pos % 63))").as("__b"))
      .groupBy("word_idx")
      .agg(expr("bit_or(__b)").as("bits"))

  /** Probe: a document is `maybe_seen` iff ALL k of its bits are set.
    * No false negatives ever; false positives at the standard
    * (1−e^(−kn/m))^k rate — the caller sizes mBits for the corpus.
    * Plan: explode k positions, equi-join the (broadcastable) filter
    * relation on word_idx, roll up per document — the probe corpus is
    * shuffled once, by its own id.
    */
  def bloomProbe(probe: DataFrame, bloom: DataFrame, mBits: Long, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    probe
      .select(col(idCol), explode(bloomPositions(col(textCol), mBits, k)).as("pos"))
      .select(col(idCol), expr("pos div 63").as("word_idx"),
        expr("shiftleft(1L, int(pos % 63))").as("__b"))
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .groupBy(idCol)
      .agg((count(when(col("bits").bitwiseAND(col("__b")) === col("__b"),
        lit(1))) === lit(k)).as("maybe_seen"))

  // ---- deterministic count-min sketch (mergeable frequency counts) ----

  /** Count-min bucket of an item for sketch row r: first 60 bits of
    * md5("cms<r>|" + item) mod `width` — md5-derived like
    * [[bloomPositions]], so sketches are bit-identical on any engine.
    */
  def cmsBucket(item: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$r|"), item.cast("string"))), 1, 15),
      16, 10).cast("long") % lit(width)

  /** Per-day count-min sketches of item frequency: one row per
    * (day, sketch row, bucket) with the bucket's count. Mergeable by
    * ADDITION (counters are sums), so any coarser time rollup is one
    * small aggregation over depth·width-row relations — the raw
    * events are scanned exactly once, at build time.
    */
  def cmsDailyCounts(events: DataFrame, depth: Int, width: Int,
      itemCol: String = "user_id", tsCol: String = "ts"): DataFrame =
    events.select(
      datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
        .as("day_num"),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsBucket(col(itemCol), r, width).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("day_num"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge daily sketches (counter addition) and answer point queries
    * for the given items: estimate = min over the depth rows of the
    * item's bucket counter — the classic CMS upper bound
    * (overestimates only, by at most εN with ε=e/width at the usual
    * depth=⌈ln 1/δ⌉). `items` must be small (each item is depth probe
    * rows; the merged sketch is depth·width rows — both tiny).
    */
  def cmsEstimate(daily: DataFrame, items: DataFrame, depth: Int,
      width: Int, itemCol: String = "user_id"): DataFrame = {
    val merged = daily.groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    val probes = items.select(col(itemCol),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsBucket(col(itemCol), r, width).as("bucket"))): _*))
        .as("rb"))
      .select(col(itemCol), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probes.join(merged, Seq("r", "bucket"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  // ---- KMV set operations (distinct INTERSECTION from sketches) ----

  /** Distinct-user overlap between two time periods per key, from
    * KMV sketches alone — the mergeable-sketch SET OPERATION
    * [[rollupDistinctKmv]]'s union estimate cannot give: "how many
    * users were active in BOTH halves of the month" without
    * rescanning either half. Periods split at `splitDate`
    * (period a < splitDate ≤ period b). Per key:
    * j = |union-bottom-k ∩ A ∩ B|, Jaccard ≈ j/k,
    * |A∪B| ≈ (k−1)·2⁶⁰/h(k), |A∩B| ≈ j·(k−1)·2⁶⁰/(k·h(k)); when the
    * union holds FEWER than k distinct digests both sketches are
    * exact sets and so are all three numbers. Returns (key, n_a,
    * n_b, j_common, jaccard_est, est_union, est_intersection), key
    * order.
    *
    * Determinism: md5 bottom-k sketches (the [[dailyKmvSketches]]
    * convention), integer j, and each estimate ONE division of exact
    * integer operands ((k−1)·2⁶⁰ and j(k−1)·2⁶⁰ in DECIMAL(38,0)).
    *
    * Scale shape: sketches bound every relation at k rows per
    * (key, period) regardless of corpus size; the membership joins
    * are hash-keyed joins between k-sized relations.
    */
  def kmvPeriodOverlap(events: DataFrame, k: Int, splitDate: String,
      keyCol: String = "event_type", tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame = {
    val dec380 = org.apache.spark.sql.types.DecimalType(38, 0)
    val two60 = lit(1152921504606846976L) // 2^60
    val hashed = events
      .select(col(keyCol),
        when(to_date(col(tsCol)) < lit(splitDate), lit("a"))
          .otherwise(lit("b")).as("__p"),
        md5(col(userCol).cast("string")).as("h"))
      .distinct()
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("__p")).orderBy(col("h"))
    val sk = hashed.withColumn("__r", row_number().over(wp))
      .filter(col("__r") <= k).drop("__r")
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("h"))
    val u = sk.select(col(keyCol), col("h")).distinct()
      .withColumn("__r", row_number().over(wu))
      .filter(col("__r") <= k).drop("__r")
    def member(p: String, name: String) = u
      .join(sk.filter(col("__p") === p).select(col(keyCol), col("h"))
          .withColumn(name, lit(1L)),
        Seq(keyCol, "h"), "left")
    val flagged = member("a", "__ina")
      .join(sk.filter(col("__p") === "b").select(col(keyCol), col("h"))
          .withColumn("__inb", lit(1L)),
        Seq(keyCol, "h"), "left")
    val sizes = sk.groupBy(col(keyCol))
      .agg(sum(when(col("__p") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__p") === "b", 1L).otherwise(0L)).as("n_b"))
    val agg = flagged.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__nu"), max(col("h")).as("__hk"),
        sum(when(col("__ina").isNotNull && col("__inb").isNotNull, 1L)
          .otherwise(0L)).as("j_common"))
    val hkInt = conv(substring(col("__hk"), 1, 15), 16, 10).cast(dec380)
    sizes.join(agg, keyCol)
      .select(col(keyCol), col("n_a"), col("n_b"), col("j_common"),
        when(col("__nu") < k,
          round(col("j_common").cast("double") / col("__nu").cast("double"), 5))
          .otherwise(round(col("j_common").cast("double") / lit(k.toDouble), 5))
          .as("jaccard_est"),
        when(col("__nu") < k, col("__nu").cast("double"))
          .otherwise(round(
            (lit(k - 1).cast(dec380) * two60).cast("double") /
              hkInt.cast("double"), 5)).as("est_union"),
        when(col("__nu") < k, col("j_common").cast("double"))
          .otherwise(round(
            (col("j_common").cast(dec380) * (k - 1) * two60).cast("double") /
              (hkInt * k).cast("double"), 5)).as("est_intersection"))
      .orderBy(keyCol)
  }
}
