package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads carried as
  * opaque `binary` columns with typed metadata, processed with
  * ordinary Spark column ops wherever possible and a clearly-fenced
  * partition-level decode hook where a real codec would sit.
  *
  * The container has no media codecs, so [[decodeStub]] is a
  * deterministic FAKE decode (parses synthetic "header" bytes) — the
  * Spark-side plumbing around it (schema, batching, partitioning,
  * chunk shapes) is real and tested. Swap `decodeStub` for a codec
  * call and nothing else changes.
  *
  * == Scale ==
  * Binary payloads dominate row width, so:
  *  - metadata-only ops (`withChecksums`, filters on `meta`) are pure
  *    map-side projections; Parquet column pruning means a
  *    metadata-only query never reads the payload bytes at all —
  *    the scan's ReadSchema is the check that matters at 100 TB;
  *  - [[chunk]] explodes payloads into bounded-size pieces so a
  *    downstream shuffle moves ~`chunkSize` units, never
  *    whole-asset blobs;
  *  - [[decodeBatches]] uses `mapPartitions` (one JVM call per
  *    partition, not per row) — the Scala-side shape of the
  *    vectorized-UDF batch contract.
  */
object Multimodal {

  /** Asset kinds, assigned round-robin for the synthetic table. */
  val Kinds: Seq[String] = Seq("image", "audio", "video")

  /** Deterministic synthetic asset table derived from `documents`:
    * the UTF-8 text bytes stand in for a media payload; `kind`
    * cycles image/audio/video. Metadata is a typed struct — the
    * pattern for real pipelines (payload opaque, metadata queryable).
    */
  def assetTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      element_at(
        array(Kinds.map(lit): _*),
        (col("doc_id") % Kinds.size).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        col("source").as("origin"),
        col("n_chars").cast("long").as("declared_bytes"),
        (col("doc_id") % 1920 + 1).cast("int").as("width"),
        (col("doc_id") % 1080 + 1).cast("int").as("height")).as("meta"))

  /** Payload facts computed without decoding: byte length and md5
    * checksum — dedup/integrity keys for binary columns.
    */
  def withChecksums(assets: DataFrame): DataFrame =
    assets
      .withColumn("byte_len", length(col("media")).cast("long"))
      .withColumn("checksum", md5(col("media")))

  /** Magic-byte signatures for payload sniffing — the standard
    * leading bytes of the common media containers.
    */
  val MagicSignatures: Seq[(String, Array[Byte])] = Seq(
    "png" -> Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte),
    "jpeg" -> Array(0xFF, 0xD8, 0xFF).map(_.toByte),
    "gif" -> "GIF8".getBytes("US-ASCII"),
    "riff" -> "RIFF".getBytes("US-ASCII")) // wav/avi/webp container

  /** Classify a binary payload by its magic bytes WITHOUT decoding —
    * the cheap integrity gate against the DECLARED kind (crawled
    * media lies about its content type constantly). Pure codegen'd
    * prefix comparisons over the first ≤8 bytes; at 100 TB this is a
    * map-only pass whose scan still prunes to (media-prefix, kind) —
    * no codec, no shuffle. Unrecognized payloads → "unknown".
    */
  def sniffKind(media: Column): Column =
    MagicSignatures.foldRight(lit("unknown"): Column) {
      case ((kind, sig), acc) =>
        when(substring(media, 1, sig.length) === lit(sig), lit(kind))
          .otherwise(acc)
    }

  /** Adds `sniffed_kind` and a `kind_matches` audit flag (does the
    * payload's magic agree with the declared `kind` column).
    */
  def withSniffedKind(assets: DataFrame,
      declaredCol: String = "kind"): DataFrame =
    assets
      .withColumn("sniffed_kind", sniffKind(col("media")))
      .withColumn("kind_matches",
        col("sniffed_kind") === col(declaredCol))

  /** Split a binary payload into fixed-size chunks (the shuffle-safe
    * unit). `substring` on binary is a codegen'd byte slice.
    */
  def chunk(media: Column, chunkSize: Int): Column =
    transform(
      sequence(lit(0), ceil(length(media).cast("double") / chunkSize).cast("int") - 1),
      i => media.substr(i * chunkSize + lit(1), lit(chunkSize)))

  /** Chunk-level content-addressable dedup report: the duplicated
    * `chunkSize`-byte pieces across the whole asset corpus —
    * (chunk_md5, n_copies, n_assets, keep_asset_id, chunk_bytes),
    * n_copies ≥ 2 only. This is the CAS-storage sizing relation: a
    * blob store keyed on chunk digests stores each listed chunk once
    * and saves (n_copies−1)·chunk_bytes; identical intros/outros/
    * padding across assets (the multimodal analogue of boilerplate)
    * surface here without any pairwise comparison.
    *
    * Scale shape: explode is ×(bytes/chunkSize) map-side; the only
    * shuffle keys on the chunk DIGEST (uniform however skewed the
    * content), map-side combined. Copies of a chunk are bytewise
    * identical, so min(length) is exact, not a sample.
    */
  def chunkDedup(assets: DataFrame, chunkSize: Int = 64): DataFrame =
    assets
      .select(col("asset_id"), explode(chunk(col("media"), chunkSize)).as("__c"))
      .groupBy(md5(col("__c")).as("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("asset_id")).as("n_assets"),
        min(col("asset_id")).as("keep_asset_id"),
        min(length(col("__c"))).cast("long").as("chunk_bytes"))
      .filter(col("n_copies") >= 2)

  /** Difference-hash bitstring of a binary payload: sample `bits`+1
    * strided bytes, bit i = 1 iff sample(i+1) > sample(i) — the dHash
    * construction (on a real image this runs over the resized
    * grayscale grid; here it runs over the payload bytes, which keeps
    * every downstream piece — banding, Hamming verify — production
    * real while the codec is stubbed). Represented as a '0'/'1'
    * STRING of length `bits`: portable to any engine (a 64-bit
    * integer hash hits sign/overflow asymmetries at bit 63), directly
    * band-sliceable with substring, and Hamming distance is a
    * position-wise compare. Pure codegen'd byte slices; empty
    * payloads hash to all-zeros.
    */
  def dhashBits(media: Column, bits: Int = 64): Column = {
    val len = length(media)
    // stride position floor((j·(len−1))/bits): double floor-division —
    // exact below 2^53, and the oracle mirrors the identical form
    def sampleAt(j: Column): Column =
      media.substr(
        floor((j * (len - 1)).cast("double") / lit(bits)).cast("int") + 1,
        lit(1))
    concat_ws("", transform(sequence(lit(0), lit(bits - 1)),
      i => when(sampleAt(i + 1) > sampleAt(i), lit("1")).otherwise(lit("0"))))
  }

  /** Perceptual near-duplicate pairs over binary payloads:
    * (id_a, id_b, hamming ≤ maxHamming) via banded dHash — the image
    * near-dup shape. With `bands` bands of 64/bands bits, any pair
    * within Hamming distance < bands shares at least one identical
    * band (pigeonhole), so candidates come from an equi-join on
    * (band_index, band_bits) — collision-sized, never all-pairs —
    * and only candidates pay the 64-position verify.
    *
    * Determinism: byte comparisons and integer positions only; the
    * verify is an exact position count. Requires maxHamming < bands
    * (the pigeonhole guarantee; a larger radius needs more bands).
    */
  def phashNearDupPairs(assets: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, bits: Int = 64): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole needs maxHamming < bands, got $maxHamming >= $bands")
    require(bits % bands == 0, "bands must divide bits")
    val bandLen = bits / bands
    // a payload shorter than bits+1 bytes can't fill the sample grid
    // (its hash degenerates toward all-zeros and false-pairs every
    // other short payload) — out of the perceptual contract
    val h = assets.filter(length(col("media")) > bits)
      .select(col("asset_id").as("id"),
        dhashBits(col("media"), bits).as("ph"))
    val banded = h.select(col("id"), col("ph"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => col("ph").substr(b * bandLen + 1, lit(bandLen)))))
      .select(col("id"), col("ph"), col("pos"), col("col").as("bk"))
    val cand = banded.as("l")
      .join(banded.as("r"), col("l.pos") === col("r.pos") &&
        col("l.bk") === col("r.bk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("l.ph").as("ph_a"),
        col("r.id").as("id_b"), col("r.ph").as("ph_b"))
      .distinct()
    cand
      .withColumn("hamming",
        size(filter(sequence(lit(1), lit(bits)), i =>
          col("ph_a").substr(i, lit(1)) =!= col("ph_b").substr(i, lit(1))))
          .cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Frame sampling: keep every `step`-th chunk (for video: every
    * n-th frame; for audio: strided windows). Pure array ops.
    */
  def sampleChunks(media: Column, chunkSize: Int, step: Int): Column =
    filter(chunk(media, chunkSize), (_, i) => i % step === 0)

  /** Decoded-asset schema — what a real decode would produce. */
  val DecodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("decoded_width", IntegerType, nullable = false),
    StructField("decoded_height", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB — deterministic fake decode. A real implementation would
    * hand `payload` to an image/audio codec; none exists in this
    * container, so dimensions come from the payload's first bytes and
    * the "feature vector" is a byte histogram (which IS a real,
    * testable feature extraction). Everything outside this function
    * is production plumbing.
    */
  def decodeStub(assetId: Long, kind: String, payload: Array[Byte]): Row = {
    val w = if (payload.isEmpty) 0 else (payload(0) & 0xff) + 1
    val h = if (payload.length < 2) 0 else (payload(1) & 0xff) + 1
    val hist = new Array[Double](8)
    payload.foreach(b => hist((b & 0xff) / 32) += 1.0)
    val n = math.max(payload.length, 1)
    Row(assetId, kind, w, h, payload.length, hist.map(_ / n).toSeq)
  }

  /** Partition-batched decode: one iterator per partition (the
    * mapPartitions analogue of a vectorized-UDF batch) — codec
    * initialization would amortize across the partition, and
    * payloads stream through without collecting.
    */
  def decodeBatches(spark: SparkSession, assets: DataFrame): DataFrame = {
    val rdd = assets.select("asset_id", "kind", "media").rdd.mapPartitions {
      rows =>
        // per-partition codec init would go here (amortized)
        rows.map(r => decodeStub(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    }
    spark.createDataFrame(rdd, DecodedSchema)
  }

  /** STUB — deterministic fake resize of a decoded asset to fit in a
    * target box, preserving aspect ratio (the real arithmetic a
    * resizer performs; only the pixel resampling itself is absent).
    * Operates on [[DecodedSchema]] rows with plain column expressions:
    * resize is metadata+buffer work, so unlike decode it needs no
    * partition-level hook.
    */
  def resizeDecoded(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val scale = least(
      lit(maxW.toDouble) / greatest(col("decoded_width"), lit(1)),
      lit(maxH.toDouble) / greatest(col("decoded_height"), lit(1)),
      lit(1.0)) // never upscale
    decoded
      .withColumn("resized_width",
        greatest(floor(col("decoded_width") * scale), lit(1L)).cast("int"))
      .withColumn("resized_height",
        greatest(floor(col("decoded_height") * scale), lit(1L)).cast("int"))
  }

  /** Frame-sampling schedule for the corpus' video assets: one row
    * per frame to extract — (asset_id, frame_idx, ts_ms, byte_offset)
    * at a fixed `intervalMs` cadence over the asset's duration, frame
    * 0 always included. This is the PLAN a downstream decoder
    * consumes (seek offsets precomputed, work fan-out row-per-frame);
    * the duration itself is the STUB part — derived as
    * payload_bytes · `msPerByte` (a fake constant-bitrate clock,
    * since no container parser exists here), exactly like
    * [[decodeStub]]'s fake dimensions; everything else (the explode
    * fan-out, ordering, offset arithmetic) is production plumbing.
    * Returns (asset_id, frame_idx), frame order.
    *
    * Determinism: pure integer arithmetic (div cadence and offsets).
    *
    * Scale shape: map-only explode bounded by duration/interval per
    * asset — the downstream frame-work relation scales with total
    * video TIME, never quadratically; no shuffle at all.
    */
  def frameSamplePlan(assets: DataFrame, intervalMs: Long = 500L,
      msPerByte: Long = 8L): DataFrame = {
    require(intervalMs >= 1 && msPerByte >= 1,
      "interval and byte clock must be positive")
    import org.apache.spark.sql.functions._
    assets.filter(col("kind") === "video")
      .select(col("asset_id"),
        (length(col("media")).cast("long") * msPerByte).as("__dur"))
      .select(col("asset_id"), col("__dur"),
        explode_outer(when(col("__dur") >= 1,
          sequence(lit(0L), expr(s"(__dur - 1) div $intervalMs"))))
          .as("frame_idx"))
      .filter(col("frame_idx").isNotNull)
      .select(col("asset_id"), col("frame_idx"),
        (col("frame_idx") * intervalMs).as("ts_ms"),
        expr(s"(frame_idx * $intervalMs) div $msPerByte").as("byte_offset"))
      .orderBy("asset_id", "frame_idx")
  }
}
