package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over an embedding column (`array<float>`) —
  * training-data-pipeline extension (SURVEY.md §7.5; absent from the
  * reference, whose only vector-adjacent surface is SQL passthrough).
  *
  * Three tiers:
  *
  *  - [[topK]] — brute-force cosine top-k: broadcast the (small) query
  *    set against the corpus, score with a codegen'd native dot
  *    product (no UDF), rank with a per-query window. The corpus is
  *    scanned once; there is no shuffle of corpus rows (broadcast join
  *    + map-side scoring) — suitable whenever |queries| is
  *    broadcastable, at any corpus size.
  *  - [[lshTopK]] / [[ivfTopK]] — bucketed approximate top-k: an
  *    equi-join on a deterministic bucket key (random-hyperplane sign
  *    bits / nearest-centroid cell) so each query meets only its
  *    bucket's corpus slice.
  *  - [[thresholdPairs]] — all pairs with cosine ≥ threshold via
  *    BANDED hyperplane LSH: candidates must share one band of sign
  *    bits (equi-join on band key), then candidates are verified with
  *    the exact normalized dot. Cost ~ O(corpus·bands) + O(collisions)
  *    — never the O(n²) cross join ([[thresholdPairsExact]] keeps the
  *    exact all-pairs semantics for small, broadcastable inputs).
  *
  * == Scoring (shared by every operator) ==
  * Vectors are normalized ONCE per row ([[normalized]]: cast
  * float→double exactly, divide by the L2 norm), so each scored pair
  * costs ONE dot product instead of three plus two sqrt — at n·k or
  * collision-set cardinality the per-pair constant is the whole cost.
  * All math is sequential-fold double arithmetic — deterministic and
  * reproducible bit-for-bit in the DuckDB oracle (which normalizes
  * with the identical expression).
  */
object Similarity {

  /** Elementwise float→double cast (exact by IEEE widening). */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays — a codegen'd
    * native expression (graft.functions.DotProductDouble). Identical
    * fold order (and therefore bit-identical results) to the
    * composable HOF form `aggregate(zip_with(a,b,_*_), 0d, _+_)`,
    * which Catalyst can only interpret — ~10× slower in the pair
    * inner loop.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotd(a, b)

  /** Cosine similarity of two float-array columns, in doubles.
    * (Three dots; the operators below avoid it by pre-normalizing —
    * kept as the one-shot composable form.)
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Replaces `vecCol` with its unit-L2-norm double form, staged as a
    * named attribute so the norm is computed exactly once per row.
    * After this, cosine(a, b) ≡ dot(a, b) — one dot per scored pair.
    */
  def normalized(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("__vd"))
      .withColumn("__nrm", sqrt(dot(col("__vd"), col("__vd"))))
      .select(col(idCol), transform(col("__vd"), x => x / col("__nrm")).as(vecCol))

  /** Brute-force cosine top-k.
    *
    * @param corpus  (idCol, vecCol) rows — any size.
    * @param queries (idCol, vecCol) rows — must be broadcastable.
    * @return (query_id, neighbor_id, score, rank), rank 1..k per
    *   query, deterministic tie-break on neighbor_id.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = normalized(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("ncv"))
    val q = normalized(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("nqv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(dot(col("nqv"), col("ncv")), 5))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** EXACT all-pairs cosine ≥ threshold. O(n²) scores by construction
    * — only for small, broadcastable inputs (validation sets, centroid
    * tables). The corpus-scale operator is [[thresholdPairs]].
    */
  def thresholdPairsExact(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = normalized(df, idCol, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("nv"))
    v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
      .withColumn("score", round(dot(col("l.nv"), col("r.nv")), 5))
      .filter(col("score") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("score"))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic hyperplane weights: plane p, dimension d →
    * uniform in [-1, 1) from the first 8 hex digits of md5("p,d").
    * Integer→double division is exact, so every engine computes the
    * identical plane. Computed ONCE on the driver and shipped as a
    * literal array: planes are per-OPERATOR constants, and the
    * column-expression form (transform + md5 per element) is not
    * constant-folded by Catalyst — it re-hashed planes·dims md5s per
    * ROW, which dominated the whole LSH pipeline. The DuckDB oracle
    * twins derive the identical doubles from the same md5 formula in
    * SQL (OraclesExt.embeddingNearDup/knnLsh), so results are
    * unchanged.
    */
  def planeWeights(p: Int, dims: Int): Column =
    typedLit((0 until dims).map { d =>
      java.lang.Long.parseLong(md5Hex(s"$p,$d").take(8), 16)
        .toDouble / 2147483648.0 - 1.0
    })

  /** Random-hyperplane bucket key: the P sign bits of dot(vec, plane_p)
    * packed into a long. Vectors within a bucket are cosine-close in
    * expectation (SimHash for angles). `vec` must already be a DOUBLE
    * array (both call sites pass [[normalized]] vectors) — a per-plane
    * float→double cast here would materialize `planes` copies of the
    * array per row.
    */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      when(dot(vec, planeWeights(p, dims)) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Adds the LSH `bucket` column. Map-only — no shuffle. */
  def withBucket(df: DataFrame, planes: Int, dims: Int,
      vecCol: String = "embedding"): DataFrame =
    df.withColumn("bucket", lshBucket(col(vecCol), planes, dims))

  /** Banded hyperplane LSH keys: `bands` keys per vector, band b
    * packing the sign bits of planes [b·r, (b+1)·r). Two vectors are
    * candidates iff they agree on ALL r sign bits of SOME band —
    * per-band match probability (1−θ/π)^r, overall recall
    * 1−(1−(1−θ/π)^r)^bands: more bands → recall, more planes/band →
    * precision, the same precision/recall dial as MinHash banding.
    */
  def bandKeys(vec: Column, bands: Int, planesPerBand: Int, dims: Int): Column =
    array((0 until bands).map { b =>
      val bits = (0 until planesPerBand).map { i =>
        when(dot(vec, planeWeights(b * planesPerBand + i, dims)) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      concat_ws(":", lit(b).cast("string"), bits.cast("string"))
    }: _*)

  /** All corpus pairs with cosine ≥ `threshold`, via banded
    * hyperplane LSH — the 100 TB embedding-near-dup path.
    *
    * Pipeline: normalize (map-only) → explode band keys → self-join on
    * band key (shuffle keyed by band hash; only band-colliding rows
    * meet) → distinct candidate pairs → fetch the two normalized
    * vectors → exact-dot verify ≥ threshold.
    *
    * Shuffle accounting (why candidates travel WITHOUT vectors): the
    * band self-join carries only (id, 10-byte key) rows, a pair
    * colliding in k bands is deduped to ONE candidate before any
    * vector is touched, and the vector-fetch joins are id-keyed
    * equi-joins sized by the deduped candidate set (broadcast when
    * the vector table is small). Scoring inline in the band join was
    * measured 2× slower: the join output materializes two dims-sized
    * arrays per COLLISION (pre-dedup, the largest row count in the
    * plan) where this shape materializes them once per candidate.
    *
    * Approximate: recall < 1 by construction — a pair can disagree
    * somewhere in every band (raise `bands` for recall, `planesPerBand`
    * for in-bucket selectivity; the oracle twin rebuilds identical
    * buckets, so results stay engine-reproducible). Sign-bit banding
    * is selective in the NEAR-DUP regime (cosine ≳ 0.7, per-plane
    * agreement ≥ 0.75); for mining low-threshold pairs on
    * cluster-free data the candidate density approaches all-pairs
    * for any banding — use [[cellPairs]] (SemDeDup-style cell
    * pruning) and accept its documented recall instead.
    */
  def thresholdPairs(df: DataFrame, threshold: Double, bands: Int = 8,
      planesPerBand: Int = 2, dims: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = normalized(df, idCol, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("nv"))
    val keyed = v.select(col("id"),
      explode(bandKeys(col("nv"), bands, planesPerBand, dims)).as("bk"))
    val candidates = keyed.as("l")
      .join(keyed.as("r"), col("l.bk") === col("r.bk") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    candidates
      .join(v.select(col("id").as("id_a"), col("nv").as("nv_a")), "id_a")
      .join(v.select(col("id").as("id_b"), col("nv").as("nv_b")), "id_b")
      .withColumn("score", round(dot(col("nv_a"), col("nv_b")), 5))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }

  /** SemDeDup-style cell-pruned threshold pairs — the LOW-threshold
    * companion to [[thresholdPairs]] (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication": cluster the corpus, compare only within
    * clusters). Each vector is assigned to its `nprobe` nearest of
    * `nlist` deterministic IVF centroids ([[ivfCentroids]] /
    * [[ivfAssign]] — the same index as [[ivfTopK]]); a pair is a
    * candidate iff the two cell sets intersect, scored once with the
    * exact normalized dot.
    *
    * Scale shape: centroids broadcast; assignment is map-side; the
    * only pair-generating join is an equi-join on centroid_id, so
    * per-cell work is Σ cell², bounded by scaling `nlist` with the
    * corpus (SemDeDup keeps cell size roughly constant — nlist ∝ n —
    * making total work O(n·cellSize), linear at fixed cell size).
    * Recall < 1 and data-dependent: a pair is missed when no probed
    * cell is shared (raise `nprobe`; recall is highest exactly where
    * it matters, on tightly-clustered near-duplicates).
    */
  def cellPairs(df: DataFrame, threshold: Double, nlist: Int,
      nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = normalized(df, idCol, vecCol)
    val cents = ivfCentroids(v, nlist, idCol, vecCol)
    val cells = ivfAssign(v, cents, nprobe, idCol, vecCol)
      .select(col(idCol).as("id"), col(vecCol).as("nv"), col("centroid_id"))
    val keyed = cells.select(col("id"), col("centroid_id"))
    val candidates = keyed.as("l")
      .join(keyed.as("r"), col("l.centroid_id") === col("r.centroid_id") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val vecs = v.select(col(idCol).as("id"), col(vecCol).as("nv"))
    candidates
      .join(vecs.select(col("id").as("id_a"), col("nv").as("nv_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("nv").as("nv_b")), "id_b")
      .withColumn("score", round(dot(col("nv_a"), col("nv_b")), 5))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }

  /** IVF (inverted-file) centroids: `nlist` corpus vectors selected
    * deterministically — the vectors whose md5(id) sorts smallest.
    * This is zero-iteration IVF (sampled centroids instead of k-means
    * training): the index structure, assignment, and nprobe search
    * are the real thing; only centroid QUALITY differs, and sampling
    * is the standard bootstrap before a training job refines them.
    * md5 selection means any engine rebuilds the identical index.
    * Input must be [[normalized]] (assignment scores with plain dot).
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nlist)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** One deterministic Lloyd refinement of IVF seed centroids: every
    * corpus vector joins its nearest seed's cell ([[ivfAssign]],
    * nprobe=1), the refined centroid is the per-cell per-dimension
    * MEAN — computed from exact `decimal(28,12)`-quantized sums, so
    * the result is bit-identical under any partitioning (a plain
    * float `avg` would not be) — then re-normalized so downstream
    * scoring stays one dot per pair. Every seed cell is non-empty
    * (the seed vector itself scores 1.0 in its own cell), so no
    * centroid is ever lost. Each call is one assignment + one
    * aggregation over the corpus — the standard k-means cost.
    */
  def ivfRefineOnce(normCorpus: DataFrame, seeds: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = ivfAssign(normCorpus, seeds, 1, idCol, vecCol)
    val means = cells
      .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("centroid_id", "dim")
      .agg((sum(col("v").cast(DecimalType(28, 12))).cast("double") /
        count(lit(1))).as("m"))
      // collect_list order is nondeterministic; sorting the (dim, m)
      // structs restores the dimension order deterministically
      .groupBy("centroid_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("centroid_id"),
        transform(col("dm"), x => x.getField("m")).as("mv"))
    means
      .withColumn("__nrm", sqrt(dot(col("mv"), col("mv"))))
      .select(col("centroid_id"),
        transform(col("mv"), x => x / col("__nrm")).as("centroid_vec"))
  }

  /** Assign each vector to its `nprobe` nearest centroids by cosine
    * (nprobe=1 for corpus rows builds the inverted lists; nprobe>1
    * for query rows probes neighboring cells). Centroids broadcast;
    * assignment is a map-side cross-score + per-vector top-nprobe.
    * Both inputs must be [[normalized]] — one dot per (vector,
    * centroid), no per-pair norms.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = vectors.join(broadcast(centroids))
      .withColumn("cscore", round(dot(col(vecCol), col("centroid_vec")), 5))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cscore").desc, col("centroid_id").asc)
    scored
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nprobe)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** IVF top-k: corpus vectors live in their nearest centroid's cell;
    * each query scores only the cells of its `nprobe` nearest
    * centroids. At scale the join is an equi-join on centroid_id —
    * each task scans nprobe/nlist of the corpus per query instead of
    * all of it. Recall < 1 by construction (a true neighbor may live
    * in an unprobed cell); raise nprobe toward nlist for recall 1.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nlist: Int,
      nprobe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", refine: Int = 0): DataFrame = {
    val nc = normalized(corpus, idCol, vecCol)
    val nq = normalized(queries, idCol, vecCol)
    var cents = ivfCentroids(nc, nlist, idCol, vecCol)
    // optional deterministic k-means refinement of the sampled seeds
    // (refine=0 keeps the zero-iteration sampled-centroid IVF)
    for (_ <- 0 until refine)
      cents = ivfRefineOnce(nc, cents, idCol, vecCol)
    val cells = ivfAssign(nc, cents, 1, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("ncv"), col("centroid_id"))
    val probes = ivfAssign(nq, cents, nprobe, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("nqv"), col("centroid_id"))
    val scored = cells.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(dot(col("nqv"), col("ncv")), 5))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** LSH-bucketed approximate top-k: queries meet only corpus rows in
    * their own bucket (equi-join on bucket key → hash-partitioned
    * shuffle, each task scores one bucket's slice). Recall < 1 by
    * construction; raise `planes` to shrink buckets, lower it to
    * raise recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int,
      dims: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = withBucket(normalized(corpus, idCol, vecCol), planes, dims, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("ncv"), col("bucket"))
    val q = withBucket(normalized(queries, idCol, vecCol), planes, dims, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("nqv"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(dot(col("nqv"), col("ncv")), 5))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }
}
