package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — the streaming twin of
  * graft.ext.Events. The reference has no dataflow streaming at all
  * (its only loop is the control-plane status poll,
  * /root/reference/aws-athena.sh:39-60), so this module is
  * north-star extension (SURVEY.md §2.9, §7.5).
  *
  * Design: file-source `readStream` → event-time watermark →
  * tumbling-window aggregate → sink. The same logical plan a Kafka
  * source would feed; only the source/sink lines change. State is
  * bounded by the watermark (late rows beyond 1 hour are dropped and
  * window state is evicted), which is what makes the aggregation
  * runnable forever at production rates.
  */
object EventStream {

  /** Durable `v=N` version chains for the foreachBatch maintainers —
    * ONE implementation of list/commit so every chain shares the same
    * two properties (ADVICE r13):
    *
    *  - Hadoop-FS routed: listing, mkdirs and the commit rename
    *    resolve the FileSystem from the chain root's own URI scheme
    *    (the [[graft.ext.TableLog]] / [[graft.EngineScratch]]
    *    posture), so the chain lives wherever the cluster's storage
    *    does — java.io.File would list/rename only the driver's local
    *    disk while the parquet payload landed on the shared FS.
    *  - IDEMPOTENT commit: the staged dir replaces any existing
    *    `v=N`. A batch is replayed only after a failure BEFORE the
    *    checkpoint advanced, i.e. the surviving `v=N` is a complete
    *    artifact of the same deterministic fold over the same batch —
    *    overwriting it converges the chain, whereas rename-if-absent
    *    (the previous behavior) permanently wedged the query on
    *    replay.
    */
  private object VersionChain {
    import org.apache.hadoop.fs.{FileSystem, Path}
    private def fsOf(spark: SparkSession, p: Path): FileSystem =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def versions(spark: SparkSession, root: String): Seq[Long] = {
      val p = new Path(root)
      val fs = fsOf(spark, p)
      if (!fs.exists(p)) { fs.mkdirs(p); Seq.empty }
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("v=")).map(_.drop(2).toLong)
    }

    def latest(spark: SparkSession, root: String): Option[Long] =
      versions(spark, root).sorted.lastOption

    /** Stage `df` under `_tmp_v=N`, then atomically publish as `v=N`
      * (replacing a replayed batch's previous attempt).
      *
      * Replacement keeps SOME complete `v=N` visible at every instant
      * (ADVICE r14): the old version is renamed ASIDE (to `_old_v=N`,
      * a name [[versions]] never lists) before the staged one renames
      * into place — a delete-then-rename pair would open a window
      * where a reader that just resolved latest()=N finds nothing,
      * and a crash between the two steps would transiently regress
      * the chain head. The unavoidable residue shrinks to the instant
      * between two metadata renames; a crash exactly there leaves the
      * complete old content recoverable at `_old_v=N` and the next
      * replay's aside-cleanup converges the chain.
      */
    def commit(df: DataFrame, root: String, v: Long): Unit = {
      val spark = df.sparkSession
      val tmp = new Path(root, s"_tmp_v=$v")
      df.write.mode("overwrite").parquet(tmp.toString)
      val dest = new Path(root, s"v=$v")
      val aside = new Path(root, s"_old_v=$v")
      val fs = fsOf(spark, dest)
      if (fs.exists(aside)) fs.delete(aside, true) // prior crash leftover
      val hadPrev = fs.exists(dest) && fs.rename(dest, aside)
      require(fs.rename(tmp, dest), s"could not commit $dest")
      if (hadPrev) fs.delete(aside, true)
    }

    def read(spark: SparkSession, root: String, v: Long): DataFrame =
      spark.read.parquet(s"${root.stripSuffix("/")}/v=$v")
  }

  /** File-source stream of events with a proper event-time column.
    *
    * A file stream needs its schema up front, but the fixtures have
    * shipped `ts` as both TIMESTAMP(NANOS) (surfacing as a raw long)
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfacing as
    * TIMESTAMP_NTZ). Rather than hard-code one generation, read the
    * footer schema once at stream setup (a one-time driver-side
    * metadata read, same cost class as the stream's own file listing)
    * and normalize `ts` with the exact same rule the batch path uses
    * (Tables.normalizeEventTime) — batch/stream parity by
    * construction.
    */
  /** Contract schema of the events stream as currently generated
    * (`ts` = parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) →
    * TIMESTAMP_NTZ). Used only when the input directory has no
    * footers to infer from yet — the standard start-the-stream-first
    * deployment — so an empty directory starts cleanly and picks up
    * files as they land.
    */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Schema inference is BEST-EFFORT: any failure — empty dir
    // (AnalysisException), corrupt footer (IOException), transient FS
    // error wrapped in SparkException — falls back to the contract
    // schema rather than aborting stream setup, since
    // normalizeEventTime handles every known ts flavor from either
    // schema source. Only fatal JVM errors propagate.
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch { case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"events schema inference failed for $dir " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}); " +
            "using contract RawSchema")
        RawSchema
      }
    graft.catalog.Tables.normalizeEventTime(
      spark.readStream.schema(fileSchema).parquet(dir))
  }

  /** Tumbling 1-hour windowed aggregation with a 1-hour watermark:
    * counts + value sums per (window, event_type). Append-mode
    * compatible: a window finalizes once the watermark passes its
    * end, so each window row is emitted exactly once.
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 5).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming hopping (sliding) hourly windows, 30-minute slide —
    * the streaming twin of [[graft.ext.Events.hoppingHourly]]. Each
    * event updates TWO overlapping window states; watermark eviction
    * bounds the open-window count exactly as in the tumbling case
    * (state is windows × types partial aggregates, never raw events).
    */
  def hoppingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 5).as("sum_value"))
      .select(
        graft.ext.Events.epochUs(col("window.start")).as("win_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming distinct-user sketch per hourly window:
    * `approx_count_distinct` (HLL++) inside a watermarked window
    * aggregate. The state per open window is ONE fixed-size register
    * set — not the user-id set — so state is bounded by (windows ×
    * sketch size) regardless of event rate; an exact streaming
    * distinct would hold every key in state. The sketch is exact in
    * its sparse regime (small per-window cardinalities) and ±rsd
    * beyond — the batch twin is the accuracy oracle in the spec.
    */
  def distinctUsersHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("n_users"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_users"))

  /** Streaming exact dedup: drop events whose key was already seen
    * within the watermark horizon — the streaming twin of
    * graft.ext.Dedup.exact. State stores one entry per key and is
    * evicted once the watermark passes (bounded state at any rate);
    * duplicates arriving later than the horizon are out of contract,
    * exactly as in any watermarked pipeline.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String] = Seq("event_id"),
      horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming exact-content document dedup: the streaming twin of
    * `Dedup.exact`. Incoming docs are keyed by their content digest
    * (md5 of the text — the same canonical identity as the batch
    * operator) and duplicates arriving within the watermark horizon
    * are dropped; state per digest is bounded by the watermark, so a
    * forever-running ingest keeps O(docs-per-horizon) state, not
    * O(corpus). Emits the first-seen copy of each content, with its
    * `content_md5` attached for downstream lineage.
    *
    * @param docs streaming DataFrame with an event-time column
    *   `tsCol` (ingest time) and the text payload.
    */
  def dedupDocsStream(docs: DataFrame, horizon: String = "1 hour",
      textCol: String = "text", tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("content_md5", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_md5")

  /** One completed user session (streaming flatMapGroupsWithState
    * output record).
    */
  final case class Session(
      userId: Long, nEvents: Long, startUs: Long, endUs: Long)

  /** Per-user accumulator (public: encoder codegen must reach it). */
  final case class SessionState(
      nEvents: Long, startUs: Long, lastUs: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState: state
    * per user, processing-time timeout closes idle sessions. This is
    * the arbitrary-state API a production sessionizer needs (the
    * built-in session_window covers the simple case).
    *
    * State per key is O(1) (three longs), so executor state stores
    * stay tiny no matter how many events flow through — the property
    * that matters at production scale.
    */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800L)(
      implicit enc: SparkSession): Dataset[Session] = {
    import enc.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("user_id").as("userId"), graft.ext.Events.epochUs(col("ts")).as("tsUs"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val closed = state.getOption.map(s =>
              Session(userId, s.nEvents, s.startUs, s.lastUs))
            state.remove()
            closed.iterator
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            var cur = state.getOption
            val out = Seq.newBuilder[Session]
            sorted.foreach { ts =>
              cur match {
                case Some(s) if ts - s.lastUs <= gapUs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, lastUs = ts))
                case Some(s) =>
                  out += Session(userId, s.nEvents, s.startUs, s.lastUs)
                  cur = Some(SessionState(1L, ts, ts))
                case None =>
                  cur = Some(SessionState(1L, ts, ts))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapSeconds * 1000)
            }
            out.result().iterator
          }
      }
  }

  /** One debounce verdict (streaming [[graft.ext.Events.debounce]]
    * twin output record).
    */
  final case class Debounced(
      eventId: Long, userId: Long, eventType: String, tsUs: Long,
      kept: Boolean)

  /** Per-(user, type) debounce state: the last raw event time. */
  final case class DebounceState(lastUs: Long)

  /** Streaming debounce — the stateful twin of
    * `Events.debounce`: an event survives iff it is the first of its
    * (user, type) key or arrives more than `gapSeconds` after the
    * PREVIOUS RAW event of that key (a steady drumbeat stays
    * collapsed, exactly like the batch operator). State per key is
    * ONE long (the last seen event time) — flatMapGroupsWithState at
    * its cheapest; a processing-time timeout retires idle keys so a
    * forever-running ingest holds state only for active keys.
    *
    * Within a micro-batch, rows are ordered (tsUs, eventId) before
    * the state fold — the batch twin's tie rule, so a replay through
    * either engine yields identical verdicts.
    */
  def debounceStream(events: DataFrame, gapSeconds: Long = 60L,
      idleTimeoutSeconds: Long = 3600L)(
      implicit enc: SparkSession): Dataset[Debounced] = {
    import enc.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"), graft.ext.Events.epochUs(col("ts")).as("tsUs"))
      .as[(Long, Long, String, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[DebounceState, Debounced](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key: (Long, String), rows: Iterator[(Long, Long, String, Long)],
            state: GroupState[DebounceState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(r => (r._4, r._1))
            var last = state.getOption.map(_.lastUs)
            val out = sorted.map { case (id, uid, tpe, ts) =>
              val kept = last.forall(l => ts - l > gapUs)
              last = Some(ts)
              Debounced(id, uid, tpe, ts, kept)
            }
            last.foreach { l =>
              state.update(DebounceState(l))
              state.setTimeoutDuration(idleTimeoutSeconds * 1000)
            }
            out.iterator
          }
      }
  }

  /** One silence alert (heartbeat-monitor output record). */
  final case class SilenceAlert(
      eventType: String, lastSeenUs: Long, nSeen: Long)

  /** Per-type heartbeat state (public: encoder codegen). */
  final case class HeartbeatState(lastSeenUs: Long, nSeen: Long)

  /** Heartbeat / silence monitor: emits a [[SilenceAlert]] when an
    * event TYPE produces nothing for `silenceSeconds` of EVENT time —
    * the pipeline-health alarm for a dead producer, broken ingest
    * topic, or upstream schema change that silently filtered a
    * stream. Event-time timeouts (not processing-time): silence is
    * judged against the WATERMARK, so the alert is deterministic,
    * replayable, and fires in backfills exactly where it fired live —
    * a processing-time monitor would depend on wall-clock luck.
    *
    * State per key is two longs; an alerted key's state is removed
    * (re-arming on its next event), so the state store is bounded by
    * the live type domain. Requires a watermark on `tsCol` upstream.
    */
  def heartbeatStream(events: DataFrame, silenceSeconds: Long = 3600L,
      watermarkDelay: String = "10 minutes")(
      implicit enc: SparkSession): Dataset[SilenceAlert] = {
    import enc.implicits._
    val silenceMs = silenceSeconds * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      // the watermarked ts COLUMN must survive into the grouped
      // Dataset — event-time timeouts read its watermark metadata
      .select(col("event_type"), col("ts"),
        graft.ext.Events.epochUs(col("ts")).as("tsUs"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HeartbeatState, SilenceAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Long)],
            state: GroupState[HeartbeatState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SilenceAlert(key, st.lastSeenUs, st.nSeen))
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(HeartbeatState(0L, 0L))
            val last = math.max(prev.lastSeenUs, batch.map(_._3).max)
            state.update(HeartbeatState(last, prev.nSeen + batch.size))
            // silence deadline in EVENT time: fires when the watermark
            // passes last-seen + silence; clamped above the current
            // watermark. The reachable hazard: late-event FILTERING
            // uses the previous batch's watermark, but
            // setTimeoutTimestamp validates against the batch's
            // EVICTION watermark — so a backfill row that clears the
            // filter while the same batch advances the watermark past
            // its natural deadline (lastSeen + silence) would set an
            // at-or-below-watermark deadline, which Spark rejects with
            // IllegalArgumentException and kills the streaming query.
            // The clamped deadline fires on the next watermark
            // advance — the earliest legal moment. (Rows below the
            // filtering watermark never reach this function at all —
            // standard late-data drop.)
            val deadlineMs = last / 1000L + silenceMs
            state.setTimeoutTimestamp(
              math.max(deadlineMs, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** One emitted transition edge (streaming
    * [[graft.ext.Events.eventTransitions]] twin output record).
    */
  final case class Transition(
      userId: Long, fromType: String, toType: String, tsUs: Long)

  /** Per-user transition state: the last raw event. */
  final case class LastEvent(tsUs: Long, eventId: Long, eventType: String)

  /** Streaming Markov-edge extraction — the stateful twin of
    * `Events.eventTransitions`: every consecutive (from, to)
    * event-type pair in a user's stream is emitted as it happens;
    * downstream aggregation (memory table, counter service) owns the
    * roll-up. State per user is ONE last event; rows inside a batch
    * fold in (tsUs, eventId) order — the batch twin's tie rule — and
    * the state carries the chain across batches, so replays and live
    * runs emit identical edges.
    */
  def transitionsStream(events: DataFrame)(
      implicit enc: SparkSession): Dataset[Transition] = {
    import enc.implicits._
    events
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"), graft.ext.Events.epochUs(col("ts")).as("tsUs"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long, String, Long)],
            state: GroupState[LastEvent]) =>
          val sorted = rows.toSeq.sortBy(r => (r._4, r._1))
          var prev = state.getOption
          val out = Seq.newBuilder[Transition]
          sorted.foreach { case (id, _, tpe, ts) =>
            prev.foreach(p => out += Transition(userId, p.eventType, tpe, ts))
            prev = Some(LastEvent(ts, id, tpe))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming twin of `Events.transitionEntropy`, stage 1: the
    * stateful per-user transition extraction ([[transitionsStream]])
    * feeding a streaming (from_type, to_type) count aggregation.
    * Run in complete/update mode; the finalized counts are the SAME
    * relation the batch op builds with its lag window, so the
    * entropy report is `Events.entropyFromTransitionCounts(counts)`
    * — a finishing SELECT over the bounded type² domain, the
    * identical derivation on both sides (StreamingSpec pins
    * cell-exact equality).
    *
    * State: one LastEvent per user (the transition extractor) plus
    * one count per (from, to) pair — both bounded (users, types²).
    */
  def transitionCountsStream(events: DataFrame)(
      implicit enc: SparkSession): DataFrame =
    transitionsStream(events)
      .groupBy(col("fromType").as("from_type"),
        col("toType").as("to_type"))
      .agg(count(lit(1)).as("n"))

  /** An attributed conversion (streaming first-touch output record).
    * Touch fields are None when the user had no click at or before
    * the purchase instant — the batch twin's null row.
    */
  final case class AttributedConversion(
      eventId: Long, userId: Long, tsUs: Long, value: Double,
      firstTouchUs: Option[Long], usSinceFirstTouch: Option[Long])

  /** Per-user running first-click instant (one long of state). */
  final case class FirstTouchState(firstClickUs: Long)

  /** Streaming FIRST-touch attribution — the stateful twin of
    * `Events.firstTouchAttribution`: state per user is the running
    * minimum click instant; every purchase emits attributed to it as
    * it arrives. Rows inside a batch fold in (tsUs, click-first,
    * eventId) order — clicks at the same microsecond as a purchase
    * attribute it, matching the batch twin's `<=` rule — and the
    * state carries the first touch across batches, so a replay emits
    * exactly the batch rows. State per key is ONE long: unlike the
    * windowed stream-stream join ([[attributionJoin]], the LAST-touch
    * horizon model), first-touch needs no buffering and no watermark
    * to stay bounded at any scale.
    */
  def firstTouchStream(events: DataFrame)(
      implicit enc: SparkSession): Dataset[AttributedConversion] = {
    import enc.implicits._
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id").as("eventId"), col("user_id").as("userId"),
        col("event_type").as("eventType"),
        graft.ext.Events.epochUs(col("ts")).as("tsUs"), col("value"))
      .as[(Long, Long, String, Long, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[FirstTouchState, AttributedConversion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long, String, Long, Double)],
            state: GroupState[FirstTouchState]) =>
          val sorted = rows.toSeq
            .sortBy(r => (r._4, if (r._3 == "click") 0 else 1, r._1))
          var first = state.getOption.map(_.firstClickUs)
          val out = Seq.newBuilder[AttributedConversion]
          sorted.foreach { case (id, _, tpe, ts, v) =>
            if (tpe == "click") {
              if (first.forall(ts < _)) first = Some(ts)
            } else {
              out += AttributedConversion(id, userId, ts, v,
                first, first.map(ts - _))
            }
          }
          first.foreach(f => state.update(FirstTouchState(f)))
          out.result().iterator
      }
  }

  /** Stream-stream attribution join: each purchase joins every click
    * by the same user in the preceding `horizonMinutes` — the
    * watermarked STREAM×STREAM equi-join (Spark buffers both sides in
    * state; without the event-time range bound and watermarks that
    * state grows forever, which is why both are mandatory here).
    * State eviction: a click older than
    * `watermark(purchase) − horizon` can never match again and is
    * dropped; per-key state is bounded by rate × horizon at any
    * scale.
    *
    * Inner join on purpose: an outer stream-stream join emits its
    * null rows only on watermark advance, which makes test/backfill
    * runs trigger-sensitive; unattributed purchases are the batch
    * as-of join's department ([[graft.ext.Events.asofJoin]]).
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      horizonMinutes: Long = 60L, watermark: String = "2 hours"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("event_id"), col("user_id"), col("purchase_ts"),
        col("click_ts"), col("click_value"))
  }

  /** Stream-static enrichment join: attach broadcast dimension
    * attributes to every streamed event. The static side is planned
    * per micro-batch as an ordinary broadcast hash join — no
    * streaming state at all (unlike stream-stream joins), so no
    * watermark is required and the operator composes with any
    * downstream stateful step. Left-outer on purpose: an event whose
    * key is missing from the dimension must not silently vanish from
    * the stream (`coalesce` defaults belong downstream).
    */
  def enrich(events: DataFrame, dim: DataFrame,
      keyCol: String = "event_type"): DataFrame =
    events.join(broadcast(dim), Seq(keyCol), "left_outer")

  /** Streaming maintainer of the MERGEABLE per-day value-count
    * relation (the batch twin is Sketches.dailyValueCounts): each
    * finalized day window appends its (type, day, value, cnt) rows,
    * and because counts merge by ADDITION the streamed relation feeds
    * the exact same rollups (Sketches.rollupQuantiles — weekly exact
    * quantiles with no raw rescan) as a batch-built one. Watermarked
    * day windows bound the state; a day's rows emit once the
    * watermark passes its end — the standard incremental
    * materialization loop: stream maintains the summary, batch
    * queries roll it up.
    */
  def dailyValueCountsStream(events: DataFrame,
      horizon: String = "1 day"): DataFrame = {
    // day identity must MATCH the batch twin's: the batch side buckets
    // with session-timezone to_date(ts) while window() buckets at UTC
    // midnights, so the two agree only under a UTC session — enforce
    // rather than silently produce off-by-one day_nums (every entry
    // point in this engine pins UTC; see Tables.register)
    require(
      events.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
      "dailyValueCountsStream requires spark.sql.session.timeZone=UTC " +
        "so streamed day windows match the batch dailyValueCounts days")
    events.where(col("value").isNotNull)
      .withWatermark("ts", horizon)
      .groupBy(col("event_type"), window(col("ts"), "1 day"),
        col("value").cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        datediff(to_date(col("window.start")), lit("1970-01-01"))
          .cast("long").as("day_num"),
        col("v"), col("cnt"))
  }

  /** Streaming windowed value-quantile monitor: per (window,
    * event_type), the event count and the DETERMINISTIC approximate
    * median of `value` via the log-bucket sketch
    * ([[graft.functions.LogBucketQuantileAgg]], registered by
    * GraftExtensions) — the latency/size-percentile dashboard shape.
    *
    * Why this aggregate and not percentile_approx: streaming
    * aggregation MERGES partial buffers across micro-batches through
    * the state store, so a merge-order-dependent sketch (GK) makes
    * the reported percentile depend on batch arrival boundaries; the
    * log-bucket sketch merges by bucket-count addition, so a window's
    * finalized median is identical however its events were split
    * into batches — and equals the batch computation over the same
    * rows (the spec's pin). State per open (window, type) group is
    * one serialized bucket map, bounded by distinct buckets (≤ ~145k
    * worst-case over the double range, a few hundred in practice);
    * watermarked windows bound the group count.
    */
  def valueQuantileStream(events: DataFrame,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "10 minutes",
      alpha: Double = 0.005): DataFrame =
    events.where(col("value").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(graft.functions.QuantileSketch.logBucketMedian(
          col("value").cast("double"), alpha), 5).as("median_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("median_value"))

  /** Streaming CDC apply: maintain a keyed snapshot from a change
    * stream by running [[graft.ext.Merge.applyChangeSet]] inside
    * `foreachBatch` — the standard "change log in, current table out"
    * composition. Each micro-batch merges into the version THIS QUERY
    * last produced and writes the next one.
    *
    * Version chain: the base is tracked in the query's own state (a
    * var captured by foreachBatch — foreachBatch batches are strictly
    * sequential within a query), seeded from the newest complete
    * version on disk at start. Versions strictly increase across
    * runs, so a SECOND invocation on the same directory continues the
    * chain instead of colliding with (or reading around) earlier
    * runs' files — the stale-base/rerun trap of keying the base on a
    * directory max evaluated per batch. Commits go through
    * [[VersionChain]]: staged, atomically renamed, Hadoop-FS routed,
    * and IDEMPOTENT — a replayed batch after checkpoint recovery
    * re-merges the same changes into the same base and overwrites its
    * own previous `v=`, so the chain content converges.
    *
    * Requirements: `changes` carries the snapshot payload columns plus
    * `op` (upsert/delete); keys must be unique WITHIN a batch
    * (applyChangeSet's contract — dedup upstream with
    * [[latestSnapshot]]-style rn=1 if the log can repeat a key).
    */
  def maintainSnapshot(changes: DataFrame, snapshotDir: String,
      keyCol: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ext.Merge
    val spark = changes.sparkSession
    val payloadSchema = StructType(
      changes.schema.filterNot(_.name == Merge.OpCol))
    val ckpt = graft.EngineScratch.dir(spark, "graft-ckpt-snapshot")
    // the chain pointer: seeded once, advanced only by OUR completed
    // writes — never re-derived from the directory mid-run
    @volatile var baseVersion: Option[Long] =
      VersionChain.latest(spark, snapshotDir)
    changes.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val base = baseVersion match {
          case Some(v) => VersionChain.read(spark, snapshotDir, v)
          case None => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], payloadSchema)
        }
        val next = baseVersion.getOrElse(-1L) + 1L
        VersionChain.commit(
          Merge.applyChangeSet(base, batch.toDF(), keyCol),
          snapshotDir, next)
        baseVersion = Some(next)
        ()
      }
      .start()
  }

  /** Streaming embedding-quality ingest gate — the stream twin of
    * `Similarity.clusterOutliersFrom`'s decision. Each incoming vector
    * is scored against the TRAINED model (k-means centroids +
    * per-cluster cohesion moments from `Similarity.clusterStatsFrom`),
    * assigned with the batch assigner's exact argmax tie-break
    * (cscore desc, centroid_id asc), z-scored against its cluster's
    * moments, and emitted with an `accepted` verdict (rejected when
    * std > 0 and z ≤ −zThresh — the batch outlier predicate).
    *
    * The model is collected to DRIVER literals: both inputs are
    * nlist-bounded relations (the documented bounded-collect class),
    * which is what makes the gate STATELESS — pure per-row
    * expressions, no stream-static join, no state store, append-mode
    * clean at any throughput. Retraining is rebuilding the literal
    * and restarting the query: the standard model-rollout pattern for
    * ingest-time scoring.
    *
    * Returns (idCol, cluster_id, cscore, z, accepted); z is NULL for
    * a zero-variance cluster (no outlier is definable there — the
    * batch convention).
    */
  def outlierGateStream(vecs: DataFrame, centroids: DataFrame,
      stats: DataFrame, zThresh: Double = 1.5, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.ext.Similarity
    val st = stats
      .select(col("cluster_id").cast("long"), col("mean_cohesion"),
        col("std_cohesion"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val cents = centroids
      .select(col("centroid_id").cast("long"),
        Similarity.asDouble(col("centroid_vec")).as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val model = array(cents.map { case (cid, cv) =>
      val (m, s) = st.getOrElse(cid, (0.0, 0.0))
      struct(lit(cid).as("cid"), typedLit(cv).as("cv"),
        lit(m).as("mean"), lit(s).as("std"))
    }: _*)
    val scored = vecs
      .withColumn("__vd", Similarity.asDouble(col(vecCol)))
      .withColumn("__nrm", sqrt(Similarity.dot(col("__vd"), col("__vd"))))
      .withColumn("__nv", transform(col("__vd"), x => x / col("__nrm")))
      // lexicographic max over (cscore, −cid, …): highest score, then
      // LOWEST centroid id — exactly ivfAssign's (desc, asc) order
      .withColumn("__best", array_max(transform(model, c =>
        struct(round(Similarity.dot(col("__nv"), c.getField("cv")), 5).as("cs"),
          (-c.getField("cid")).as("negid"),
          c.getField("mean").as("mean"), c.getField("std").as("std")))))
      .withColumn("z",
        when(col("__best.std") > 0,
          round((col("__best.cs") - col("__best.mean")) / col("__best.std"), 5)))
    scored.select(col(idCol), (-col("__best.negid")).as("cluster_id"),
      col("__best.cs").as("cscore"), col("z"),
      (col("z").isNull || col("z") > -zThresh).as("accepted"))
  }

  /** Streaming NEAR-dup gate: the incremental-ingest twin of
    * `Dedup.minHashNearDupPairs`. Each micro-batch's documents are
    * MinHash-signed (the batch family's identical md5-affine
    * signatures), band keys are probed against the ACCUMULATED
    * signature store of previously accepted documents, and candidates
    * whose signature agreement (matching coordinates / k — the
    * standard MinHash Jaccard estimate) reaches `simThreshold` are
    * quarantined; survivors are appended to the store. Within a
    * batch, first-seen (smallest id) wins, the same survivorship rule
    * as the batch operator.
    *
    * State lives in the parquet store, NOT the streaming state store:
    * the probe is a band-key equi-join (collision-sized, never
    * |batch|·|corpus|), so a forever-running ingest holds zero
    * watermark state and the store scales like the corpus signature
    * table — the shape an incremental curation pipeline needs. The
    * verdict trail (doc_id, is_dup, best_est) is appended to
    * `verdictDir` for audit.
    */
  def nearDupGateStream(docs: DataFrame, storeDir: String,
      verdictDir: String, n: Int = 3, k: Int = 16, bands: Int = 4,
      simThreshold: Double = 0.8, idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ext.Dedup
    val spark = docs.sparkSession
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val storeFs = storePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    storeFs.mkdirs(storePath)
    val ckpt = graft.EngineScratch.dir(spark, "graft-ckpt-neardup")
    val storeSchema = StructType(Seq(
      StructField("id", LongType), StructField("bk", StringType),
      StructField("sig", ArrayType(LongType))))
    def readStore(): DataFrame = {
      // Hadoop-FS listing (the VersionChain posture): the store lives
      // wherever the appended parquet does, not on the driver's disk
      val files = storeFs.listStatus(storePath).toSeq
        .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
      else spark.read.schema(storeSchema).parquet(storeDir)
    }
    // agreement estimate from the two signatures riding the collision row
    def est(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / lit(k.toDouble)
    docs.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val sigs = Dedup.minHashSignatures(b, n, k, idCol, textCol)
          .select(col("id"),
            explode(Dedup.lshBandKeys(col("sig"), k, bands)).as("bk"),
            col("sig"))
          .localCheckpoint()
        val store = readStore()
        // vs the accepted corpus: any colliding stored partner ≥ threshold
        val vsStore = sigs.as("l").join(store.as("r"), col("l.bk") === col("r.bk"))
          .groupBy(col("l.id").as("id"))
          .agg(max(est(col("l.sig"), col("r.sig"))).as("est"))
          .filter(col("est") >= simThreshold)
        // vs earlier-in-batch survivors-to-be: smaller id wins
        val inBatch = sigs.as("l").join(sigs.as("r"),
            col("l.bk") === col("r.bk") && col("r.id") < col("l.id"))
          .groupBy(col("l.id").as("id"))
          .agg(max(est(col("l.sig"), col("r.sig"))).as("est"))
          .filter(col("est") >= simThreshold)
        val dups = vsStore.select("id", "est")
          .unionByName(inBatch.select("id", "est"))
          .groupBy("id").agg(max(col("est")).as("best_est"))
          .localCheckpoint()
        val verdicts = sigs.select("id").distinct()
          .join(dups, Seq("id"), "left")
          .select(col("id").as(idCol),
            col("best_est").isNotNull.as("is_dup"),
            coalesce(round(col("best_est"), 5), lit(0.0)).as("best_est"))
        verdicts.write.mode("append").parquet(verdictDir)
        sigs.join(dups.select("id"), Seq("id"), "left_anti")
          .write.mode("append").parquet(storeDir)
        ()
      }
      .start()
  }

  /** Streaming corpus-statistics maintenance — the statistics
    * counterpart of [[maintainSnapshot]]: each micro-batch's docs are
    * folded into a versioned per-(lang, source) stats table via the
    * MERGEABLE form (`TextStats.corpusStatsPartial`: sums and exact
    * scale-9 numerators, never finished averages — an average doesn't
    * merge; its numerator does). [[readCorpusStats]] finalizes the
    * latest version into EXACTLY what `TextStats.corpusStats` would
    * compute over all docs ever ingested — without ever rescanning
    * them. State per key is one row of longs; the raw corpus is
    * touched once, at ingest.
    */
  def maintainCorpusStats(docs: DataFrame,
      statsDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ext.TextStats
    val spark = docs.sparkSession
    val ckpt = graft.EngineScratch.dir(spark, "graft-ckpt-corpusstats")
    @volatile var baseVersion: Option[Long] =
      VersionChain.latest(spark, statsDir)
    docs.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val part = TextStats.corpusStatsPartial(batch.toDF())
        val merged = baseVersion match {
          case Some(v) => TextStats.mergeCorpusStats(
            VersionChain.read(spark, statsDir, v).unionByName(part))
          case None => part
        }
        val next = baseVersion.getOrElse(-1L) + 1L
        VersionChain.commit(merged, statsDir, next)
        baseVersion = Some(next)
        ()
      }
      .start()
  }

  /** Finalized view of the latest [[maintainCorpusStats]] version. */
  def readCorpusStats(spark: SparkSession, statsDir: String): DataFrame = {
    val v = VersionChain.latest(spark, statsDir)
      .getOrElse(sys.error(s"no stats versions under $statsDir"))
    graft.ext.TextStats.finalizeCorpusStats(
      VersionChain.read(spark, statsDir, v))
  }

  /** Latest snapshot version written by [[maintainSnapshot]]. */
  def readSnapshot(spark: SparkSession, snapshotDir: String): DataFrame = {
    val v = VersionChain.latest(spark, snapshotDir)
      .getOrElse(sys.error(s"no snapshot versions under $snapshotDir"))
    VersionChain.read(spark, snapshotDir, v)
  }

  /** Streaming twin of `Merge.incrementalAgg` — foreachBatch ∘ the
    * delta algebra (VERDICT r11/r12 board item). Each micro-batch of
    * changes (payload ∪ {op}) advances TWO version chains under
    * `dir`, both with [[VersionChain]]'s staged + atomic + idempotent
    * commit:
    *
    *   - `snap/v=N`: the applyChangeSet payload snapshot — the
    *     relation the NEXT batch's retractions are fetched from;
    *   - `view/v=N`: the maintained aggregate view as its EXACT
    *     accumulator (group, count, decimal sum — never the rounded
    *     rendering, which would poison later folds).
    *
    * Two-chain crash consistency (ADVICE r13): the SNAPSHOT commits
    * FIRST, so every published `view/v=N` has its matching
    * `snap/v=N` — [[readAggView]] (max view version) never serves a
    * view whose snapshot is missing. A crash between the two commits
    * leaves an orphan `snap/v=N`; on restart `cur` seeds from the
    * OLDER of the two chains' heads, the replayed batch recomputes
    * both artifacts from the same base, and the idempotent commit
    * overwrites the orphan — the wedge the previous
    * rename-if-absent + view-first ordering produced is structurally
    * gone.
    *
    * Per batch the base is touched only by the change-key equi-join
    * inside the delta (broadcast-class for a day's changes vs a
    * 100 TB base); the view merge joins two group-cardinality
    * relations. Decimal addition is exact and associative, so — GIVEN
    * each batch satisfies the delta algebra's unique-key-per-change-
    * set contract — the folded view is bit-identical to a full
    * re-aggregation of the final snapshot however the change log was
    * micro-batched (StreamingSpec pins stream ≡ batch ≡ full
    * recompute). That precondition is NOT free: Spark picks batch
    * boundaries (AvailableNow with no maxFilesPerTrigger folds the
    * ENTIRE change log into one batch), so a key changed twice in one
    * batch would silently duplicate rows. Pass `seqCol` — a column
    * that strictly orders each key's changes — and every batch is
    * collapsed to its LAST change per key before the fold (the
    * standard CDC compaction); without it, per-batch key uniqueness
    * is ASSERTED and the query fails loudly instead of corrupting the
    * view (ADVICE r13).
    */
  def maintainAggView(changes: DataFrame, dir: String, keyCol: String,
      groupCol: String, valueCol: String, seqCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ext.Merge
    val spark = changes.sparkSession
    val snapRoot = s"${dir.stripSuffix("/")}/snap"
    val viewRoot = s"${dir.stripSuffix("/")}/view"
    val payloadSchema = StructType(
      changes.schema.filterNot(_.name == Merge.OpCol))
    val ckpt = graft.EngineScratch.dir(spark, "graft-ckpt-aggview")
    // resume from the older chain head: snap commits first, so
    // min(snapHead, viewHead) is the newest version BOTH chains have
    // (an orphan snap one ahead is the replayed batch's overwrite
    // target, never the base)
    @volatile var cur: Option[Long] =
      (VersionChain.latest(spark, snapRoot),
        VersionChain.latest(spark, viewRoot)) match {
        case (Some(s), Some(v)) => Some(math.min(s, v))
        case _ => None
      }
    changes.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val changeSet = seqCol match {
          case Some(sc) =>
            // last change per key wins — rows_number over the strict
            // per-key order; earlier changes to the same key are
            // superseded within this batch by CDC semantics
            import org.apache.spark.sql.expressions.Window
            batch.toDF()
              .withColumn("__rn", row_number().over(
                Window.partitionBy(col(keyCol)).orderBy(col(sc).desc)))
              .filter(col("__rn") === 1).drop("__rn")
          case None =>
            val dup = batch.toDF().groupBy(col(keyCol))
              .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
              .limit(1).collect()
            require(dup.isEmpty,
              s"maintainAggView: key ${dup.headOption.map(_.get(0))} " +
                "changes more than once in one micro-batch — the delta " +
                "algebra's unique-key-per-change-set contract is " +
                "violated (AvailableNow can fold the whole log into ONE " +
                "batch). Pass seqCol to collapse to last-change-per-key.")
            batch.toDF()
        }
        val base = cur match {
          case Some(v) => VersionChain.read(spark, snapRoot, v)
          case None => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            payloadSchema)
        }
        val view = cur match {
          case Some(v) => VersionChain.read(spark, viewRoot, v)
          case None => Merge.aggViewExact(base, groupCol, valueCol)
        }
        val next = cur.getOrElse(-1L) + 1L
        VersionChain.commit(Merge.applyChangeSet(base, changeSet, keyCol),
          snapRoot, next)
        VersionChain.commit(Merge.applyDeltaToView(view, base, changeSet,
          keyCol, groupCol, valueCol), viewRoot, next)
        cur = Some(next)
        ()
      }
      .start()
  }

  /** The maintained view of [[maintainAggView]] at its latest
    * version, rendered as `Merge.incrementalAgg`'s public shape.
    */
  def readAggView(spark: SparkSession, dir: String,
      groupCol: String): DataFrame = {
    val viewRoot = s"${dir.stripSuffix("/")}/view"
    val v = VersionChain.latest(spark, viewRoot)
      .getOrElse(sys.error(s"no view versions under $dir/view"))
    graft.ext.Merge.renderAggView(
      VersionChain.read(spark, viewRoot, v), groupCol)
  }

  /** Drain all currently-available input through a streaming query
    * into an in-memory table (Trigger.AvailableNow — the batch-like
    * run mode used by tests and backfills), returning the result.
    */
  /** One per-(doc, word-shard) novelty partial: how many of the doc's
    * shingle positions routed to this shard, and how many were UNSET
    * in the shard's filter at the start of the micro-batch. Sum the
    * partials per doc (a plain batch roll-up over the sink — the
    * dailyValueCounts composition) for the doc's novelty rate.
    */
  final case class NoveltyPartial(
      docId: Long, shard: Int, nPositions: Long, nNovel: Long)

  /** Per-shard novelty-filter state: sparse 63-bit words. */
  final case class NoveltyShardState(words: Map[Long, Long])

  /** Streaming corpus-novelty monitor — "is today's crawl adding
    * anything, or re-fetching what we have?" — as a bounded-state
    * ingest gate. Each doc's distinct 3-gram shingles hash to ONE
    * Bloom position each (k = 1: position novelty is then decidable
    * inside a single word shard — a k-bit membership probe would
    * span shards; at k = 1 the filter is a novelty RATE meter with
    * the standard ~n/m false-"seen" rate, not a dedup verdict), the
    * position's 63-bit word routes to a hash shard, and each shard
    * keeps its words as state: TOTAL state across shards is ≤
    * mBits/63 words forever, however much text flows through.
    *
    * Probe semantics are BATCH-GRANULAR: every row tests the filter
    * as it stood at the START of its micro-batch, then the batch's
    * bits are folded in — no dependence on row order inside the
    * batch (the determinism trap of probe-as-you-go), and the
    * streamed result equals the batch twin ([[graft.ext.Sketches]]
    * bloomBuild/k=1 probe over the earlier batches) exactly — the
    * spec's pin.
    */
  def noveltyGateStream(docs: DataFrame, mBits: Long = 1L << 20,
      shards: Int = 16, textCol: String = "text",
      idCol: String = "doc_id")(
      implicit enc: SparkSession): Dataset[NoveltyPartial] = {
    import enc.implicits._
    require(shards >= 1 && mBits >= 63)
    val pos = element_at(
      graft.ext.Sketches.bloomPositions(col(textCol), mBits, 1), 1)
    docs
      .withColumn("__sh",
        graft.ext.Dedup.shingles(graft.ext.TextStats.tokens(col(textCol)), 3))
      .select(col(idCol).as("docId"), explode_outer(col("__sh")).as(textCol))
      .filter(col(textCol).isNotNull)
      .select(col("docId"), pos.as("__p"))
      .select(col("docId"), expr("__p div 63").as("wordIdx"),
        expr("shiftleft(1L, int(__p % 63))").as("bit"))
      .withColumn("shard", pmod(col("wordIdx"), lit(shards.toLong)).cast("int"))
      .as[(Long, Long, Long, Int)]
      .groupByKey(_._4)
      .flatMapGroupsWithState[NoveltyShardState, NoveltyPartial](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[(Long, Long, Long, Int)],
            state: GroupState[NoveltyShardState]) =>
          val words = state.getOption.map(_.words).getOrElse(Map.empty)
          val batch = rows.toSeq
          // probe against the BATCH-START filter (order-free), keyed
          // per doc; sort for a deterministic output row order
          val perDoc = batch.groupBy(_._1).toSeq.sortBy(_._1).map {
            case (doc, rs) =>
              val novel = rs.count { case (_, w, b, _) =>
                (words.getOrElse(w, 0L) & b) != b
              }
              NoveltyPartial(doc, shard, rs.size.toLong, novel.toLong)
          }
          // then fold the whole batch in
          val updated = batch.foldLeft(words) { case (m, (_, w, b, _)) =>
            m.updated(w, m.getOrElse(w, 0L) | b)
          }
          state.update(NoveltyShardState(updated))
          perDoc.iterator
      }
  }

  /** One streaming heavy-hitter summary row: the shard's current
    * Misra–Gries counter for a token, plus the shard's total token
    * count (monotone — readers keep the rows with the max
    * `shardTokens` per shard as the latest summary).
    */
  final case class HhCand(
      shard: Int, token: String, estimate: Long, shardTokens: Long)

  /** Per-shard Misra–Gries state: the counter map + tokens seen. */
  final case class MgShardState(counts: Map[String, Long], seen: Long)

  /** Streaming bounded-state heavy hitters — the ingest-time twin of
    * [[graft.ext.Stats.heavyHitters]]. Tokens route to `shards` hash
    * shards; each shard's state is ONE Misra–Gries summary, so the
    * total state is ≤ shards × capacity counters however much text
    * flows through — the property that makes a forever-running
    * vocabulary monitor possible, where an exact streaming
    * `groupBy(token)` would hold the whole (unbounded) vocabulary in
    * state.
    *
    * Guarantee (same pigeonhole as the batch twin, sharper because a
    * token's occurrences ALL land in its one hash shard): any token
    * whose true count since stream start exceeds
    * shardTokens/(capacity+1) of its shard is present in that shard's
    * summary, and every global heavy hitter above frequency
    * 1/(capacity+1) is a fortiori present. Counter values are lower
    * bounds, under-counting by at most shardTokens/(capacity+1).
    * After each micro-batch the shard emits its full current summary
    * (Update mode); the batch operator remains the exact oracle — the
    * stream is the always-on alarm, not the ledger.
    */
  def heavyHittersStream(docs: DataFrame, capacity: Int,
      shards: Int = 64, textCol: String = "text")(
      implicit enc: SparkSession): Dataset[HhCand] = {
    import enc.implicits._
    require(capacity >= 1 && shards >= 1, s"bad capacity/shards")
    docs
      .select(explode(graft.ext.TextStats.tokens(col(textCol))).as("token"))
      .select(pmod(xxhash64(col("token")), lit(shards)).cast("int")
        .as("shard"), col("token"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgShardState, HhCand](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[(Int, String)],
            state: GroupState[MgShardState]) =>
          val st = state.getOption.getOrElse(MgShardState(Map.empty, 0L))
          val m = scala.collection.mutable.HashMap
            .newBuilder[String, Long].addAll(st.counts).result()
          var seen = st.seen
          rows.foreach { case (_, t) =>
            graft.ext.Stats.mgUpdate(m, t, capacity)
            seen += 1L
          }
          state.update(MgShardState(m.toMap, seen))
          m.iterator.map { case (t, c) => HhCand(shard, t, c, seen) }
      }
  }

  def runAvailableNow(spark: SparkSession, streamed: DataFrame,
      tableName: String): DataFrame = {
    // Explicit checkpoint dir: the auto-created temporary checkpoint
    // is deleted on stop and races Hadoop's local-FS .crc renames.
    val ckpt = graft.EngineScratch.dir(spark, s"graft-ckpt-$tableName")
    val q = streamed.writeStream
      .format("memory")
      .queryName(tableName)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    spark.table(tableName)
  }
}
