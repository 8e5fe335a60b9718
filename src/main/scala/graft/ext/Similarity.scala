package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) —
  * training-data-pipeline extension (SURVEY.md §7.5; absent from the
  * reference, whose only vector-adjacent surface is SQL passthrough).
  *
  * Two tiers:
  *
  *  - [[topK]] — brute-force cosine top-k: broadcast the (small) query
  *    set against the corpus, score with codegen'd higher-order
  *    functions (`zip_with` + `aggregate`, pure double arithmetic, no
  *    UDF), rank with a per-query window. The corpus is scanned once;
  *    there is no shuffle of corpus rows (broadcast join + map-side
  *    scoring), and the only wide exchange carries (query × corpus)
  *    score rows already filtered to candidates — suitable whenever
  *    |queries| is broadcastable, at any corpus size.
  *  - [[lshTopK]] — random-hyperplane LSH: each vector maps to a
  *    small bucket key (sign bits of dots with P deterministic
  *    hyperplanes); query and corpus rows join on bucket key, so at
  *    100 TB each query meets only its bucket's corpus slice
  *    (expected corpus/2^P of the data), at the cost of recall.
  *    Hyperplanes are derived from md5 — no RNG state, identical on
  *    any engine, reproducible across runs (a hard requirement for
  *    incremental pipelines).
  *
  * All float math: cast float→double (exact), multiply/add doubles
  * left-to-right (`aggregate` folds sequentially) — deterministic and
  * reproducible bit-for-bit in the DuckDB oracle.
  */
object Similarity {

  /** Elementwise float→double cast (exact by IEEE widening). */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays — a codegen'd
    * native expression (graft.functions.DotProductDouble). Identical
    * fold order (and therefore bit-identical results) to the
    * composable HOF form `aggregate(zip_with(a,b,_*_), 0d, _+_)`,
    * which Catalyst can only interpret — ~10× slower in the n²-pair
    * inner loop.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotd(a, b)

  /** Cosine similarity of two float-array columns, in doubles. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Brute-force cosine top-k.
    *
    * @param corpus  (idCol, vecCol) rows — any size.
    * @param queries (idCol, vecCol) rows — must be broadcastable.
    * @return (query_id, neighbor_id, score, rank), rank 1..k per
    *   query, deterministic tie-break on neighbor_id.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 5))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** All corpus pairs with cosine ≥ threshold — the embedding-cosine
    * near-dup operator. Brute force (O(n²) scores, no materialized
    * cross join — rows stream through the range-free join); the LSH
    * bucket variant below is the 100 TB path.
    */
  def thresholdPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Pre-normalize once per row so each pair costs ONE dot product
    // instead of three — at n² pairs the per-pair constant is the
    // whole cost.
    val v = df
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("vd"))
      .withColumn("nrm", sqrt(dot(col("vd"), col("vd"))))
      .select(col("id"), transform(col("vd"), x => x / col("nrm")).as("nv"))
    v.as("l").join(v.as("r"), col("l.id") < col("r.id"))
      .withColumn("score", round(dot(col("l.nv"), col("r.nv")), 5))
      .filter(col("score") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("score"))
  }

  /** Deterministic hyperplane weights: plane p, dimension d →
    * uniform in [-1, 1) from the first 8 hex digits of md5("p,d").
    * Integer→double division is exact, so every engine computes the
    * identical plane.
    */
  def planeWeights(p: Column, dims: Int): Column =
    transform(sequence(lit(0), lit(dims - 1)), d =>
      conv(substring(md5(concat_ws(",", p.cast("string"), d.cast("string"))), 1, 8), 16, 10)
        .cast("double") / lit(2147483648.0) - lit(1.0))

  /** Random-hyperplane bucket key: the P sign bits of dot(vec, plane_p)
    * packed into a long. Vectors within a bucket are cosine-close in
    * expectation (SimHash for angles).
    */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      when(dot(asDouble(vec), planeWeights(lit(p), dims)) >= 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Adds the LSH `bucket` column. Map-only — no shuffle. */
  def withBucket(df: DataFrame, planes: Int, dims: Int,
      vecCol: String = "embedding"): DataFrame =
    df.withColumn("bucket", lshBucket(col(vecCol), planes, dims))

  /** IVF (inverted-file) centroids: `nlist` corpus vectors selected
    * deterministically — the vectors whose md5(id) sorts smallest.
    * This is zero-iteration IVF (sampled centroids instead of k-means
    * training): the index structure, assignment, and nprobe search
    * are the real thing; only centroid QUALITY differs, and sampling
    * is the standard bootstrap before a training job refines them.
    * md5 selection means any engine rebuilds the identical index.
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nlist)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** Assign each vector to its `nprobe` nearest centroids by cosine
    * (nprobe=1 for corpus rows builds the inverted lists; nprobe>1
    * for query rows probes neighboring cells). Centroids broadcast;
    * assignment is a map-side cross-score + per-vector top-nprobe.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = vectors.join(broadcast(centroids))
      .withColumn("cscore", round(cosine(col(vecCol), col("centroid_vec")), 5))
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
      vecCol: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, idCol, vecCol)
    val cells = ivfAssign(corpus, cents, 1, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("centroid_id"))
    val probes = ivfAssign(queries, cents, nprobe, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("centroid_id"))
    val scored = cells.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 5))
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
    val c = withBucket(corpus, planes, dims, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("bucket"))
    val q = withBucket(queries, planes, dims, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("qv"), col("cv")), 5))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }
}
