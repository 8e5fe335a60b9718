package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines — a training-data
  * extension (SURVEY.md §7.5). Documents in id order are laid
  * head-to-tail on one conceptual token tape; pack p owns tape
  * positions [p·budget, (p+1)·budget). Each document reports the pack
  * where it STARTS and its offset inside that pack — the standard
  * concat-then-chunk shape used to fill fixed context windows
  * (documents may straddle a boundary; the packer's contract is the
  * tape coordinate, the trainer decides splitting/masking).
  *
  * == Scale design: a distributed prefix sum ==
  * The obvious implementation — one `Window.orderBy(id)` running sum —
  * is a SINGLE-TASK total sort at any scale (an unpartitioned window
  * collapses to one reducer holding the whole corpus). Instead the
  * classic two-phase scan:
  *
  *  1. deterministic RANGE shards: `shard = id / ceil((max(id)+1)/S)`
  *     — contiguous in id order, so per-shard order concatenates to
  *     global order (a hash shard would not);
  *  2. per-shard token totals (map-side-combined aggregate, S rows)
  *     → exclusive prefix offsets on the driver (S longs — bounded by
  *     the shard count, never by data);
  *  3. per-shard window cumsum (S-way parallel) + broadcast-joined
  *     shard offset ⇒ the global exclusive cumsum, exactly.
  *
  * All arithmetic is integer (token counts), so the result is
  * bit-identical to the single-window form — which is what the DuckDB
  * oracle twin computes (OraclesExt.packSequences).
  */
object Packing {

  /** Packs `df` rows (must carry an integral `tokenCol`) onto the
    * token tape. Returns (idCol, tokenCol, pack_id, pack_offset),
    * one row per input row.
    *
    * @param budget tokens per pack (the context-window size).
    * @param shards range-shard count — bounds BOTH the driver-held
    *   prefix state (S longs) and the cumsum parallelism; size it to
    *   the cluster's cores, not the data.
    */
  def packSequences(df: DataFrame, budget: Long, shards: Int = 64,
      idCol: String = "doc_id", tokenCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val rows = df.select(col(idCol), col(tokenCol))
    // phase 0: id range → deterministic contiguous shards. One
    // column-pruned scan for max(id); ids need not be dense.
    // max over zero rows is NULL — an empty corpus (e.g. a curation
    // gate rejected everything upstream) must pack to an empty
    // result, not NPE on getLong.
    val maxIdRow = rows.agg(max(col(idCol)).cast("long")).head()
    if (maxIdRow.isNullAt(0)) {
      return rows.select(col(idCol), col(tokenCol),
        lit(0L).as("pack_id"), lit(0L).as("pack_offset")).limit(0)
    }
    val maxId = maxIdRow.getLong(0)
    val span = math.max(1L, (maxId + shards) / shards) // ceil((maxId+1)/S)
    // `div`, not `/`: Column./ is DOUBLE division, inexact past 2⁵³ —
    // tape coordinates and ids are longs and must stay exact
    val sharded = rows.withColumn("__shard",
      expr(s"cast(`$idCol` as bigint) div $span").cast("int"))
    // phase 1: per-shard totals → driver-side exclusive prefix. The
    // collect is bounded by `shards` (config), not by data size.
    val totals = sharded.groupBy("__shard")
      .agg(sum(col(tokenCol).cast("long")).as("__total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until shards).scanLeft(0L) { (acc, s) =>
      acc + totals.getOrElse(s, 0L)
    }
    val offsetDf = sharded.sparkSession.createDataFrame(
      (0 until shards).map(s => (s, offsets(s)))
    ).toDF("__shard", "__base")
    // phase 2: S-way parallel within-shard cumsum + the shard base.
    val w = Window.partitionBy("__shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .join(broadcast(offsetDf), "__shard")
      .withColumn("__start",
        col("__base") + sum(col(tokenCol).cast("long")).over(w)
          - col(tokenCol).cast("long"))
      .select(col(idCol), col(tokenCol),
        expr(s"__start div $budget").as("pack_id"),
        (col("__start") % budget).as("pack_offset"))
  }

  /** Per-pack fill report off [[packSequences]]'s tape coordinates:
    * (pack_id, n_docs_started, tokens_started, n_straddlers) — how
    * many documents START in each pack, the token mass they bring,
    * and how many run past the pack boundary (the trainer's
    * split-or-mask workload). The packing-efficiency dashboard: a
    * pack list whose tokens_started wanders far from `budget` or
    * whose straddler count spikes flags a pathological document-length
    * distribution before a training run discovers it.
    *
    * One map-side-combined roll-up keyed by pack_id on top of the
    * packer's map-only output — no new shuffle shape.
    */
  def packEfficiency(packed: DataFrame, budget: Long,
      tokenCol: String = "n_tokens"): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs_started"),
        sum(col(tokenCol).cast("long")).as("tokens_started"),
        sum(when(col("pack_offset") + col(tokenCol) > budget, 1L)
          .otherwise(0L)).as("n_straddlers"))
      .orderBy("pack_id")

  /** Split each document into fixed-size token windows with overlap —
    * the context-length chunking step that precedes packing when
    * single documents exceed the window. Chunk i covers token offsets
    * [i·stride, i·stride + maxTokens) with stride = maxTokens −
    * overlap; starts advance while they are inside the document, so a
    * trailing runt chunk (shorter than maxTokens) is emitted rather
    * than silently dropping tail tokens, and an empty document yields
    * one empty chunk (no rows disappear).
    *
    * Returns (idCol, chunk_index, chunk_text, n_chunk_tokens) — one
    * row per chunk. Pure per-row explode + projections: map-only,
    * linear, no shuffle; `spread` only parallelizes few-row-group
    * local inputs.
    */
  def chunkDocuments(df: DataFrame, maxTokens: Int, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val staged = Dedup.spread(df, textCol)
      .withColumn("__toks", TextStats.tokens(col(textCol)))
    // chunk count = floor((n-1)/stride) + 1 for n ≥ 1 (starts 0,
    // stride, 2·stride, … while start < n); integer `div`, never
    // Column./ (double division)
    val nChunks = when(size(col("__toks")) > 0,
      expr(s"(size(__toks) - 1) div $stride") + 1).otherwise(lit(1))
    val start = (col("chunk_index") * stride) + 1 // slice is 1-based
    staged
      .select(col(idCol), col("__toks"),
        explode_outer(sequence(lit(0), (nChunks - 1).cast("int")))
          .as("chunk_index"))
      .filter(col("chunk_index").isNotNull)
      // stage the slice once (module convention — see withShingleSet):
      // both output columns reference it, and CollapseProject keeps a
      // multiply-referenced non-cheap alias un-inlined
      .withColumn("__chunk", slice(col("__toks"), start, lit(maxTokens)))
      .select(col(idCol), col("chunk_index"),
        concat_ws(" ", col("__chunk")).as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"))
  }
}
