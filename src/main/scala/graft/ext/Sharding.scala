package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic corpus shuffling + sharding — pipeline extension
  * (SURVEY.md §7.5). Training jobs consume a corpus as N shard files
  * in a pseudo-random document order; both properties must be
  * REPRODUCIBLE (same corpus + salt ⇒ byte-identical shards) and
  * independent of how the input happened to be partitioned.
  *
  * Both are derived from one md5 per row: the shard is the digest's
  * first 32 bits mod `numShards` (uniform balance), the within-shard
  * position is the rank of the full digest (a deterministic
  * pseudo-random permutation, tie-broken by id — md5 collisions on
  * distinct ids are astronomically unlikely but the sort must still
  * be total for the oracle to agree bit-for-bit).
  *
  * Scale shape: assignment is a map-only projection; ordering is a
  * window partitioned BY SHARD — one hash exchange on shard_id and a
  * per-shard sort, each shard sized corpus/N.
  */
object Sharding {

  /** The one copy of the assignment math (used by [[shardCorpus]] and
    * [[writeShards]], mirrored by the DuckDB shard oracle): adds the
    * full digest as `__h` plus the derived `shard_id`.
    */
  private def withShardAssignment(df: DataFrame, numShards: Int,
      idCol: String, salt: String): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("__h",
        md5(concat_ws("|", lit(salt), col(idCol).cast("string"))))
      .withColumn("shard_id",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(numShards.toLong)).cast("int"))
  }

  /** Adds `shard_id` (int, [0, numShards)) and `shard_pos` (long,
    * 0-based position in the shard's deterministic shuffle order).
    */
  def shardCorpus(df: DataFrame, numShards: Int, idCol: String = "doc_id",
      salt: String = "shard"): DataFrame = {
    val w = Window.partitionBy("shard_id").orderBy(col("__h"), col(idCol))
    withShardAssignment(df, numShards, idCol, salt)
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }

  /** Materialize the sharded corpus as `shard_id=<k>/` parquet
    * directories in the deterministic shuffle order — the form a
    * training job actually reads. Same assignment and order as
    * [[shardCorpus]], but the per-shard rank window is FOLDED INTO
    * THE WRITE: `repartition(shard_id)` is the one exchange and
    * `sortWithinPartitions` orders each shard as it streams to disk —
    * no row_number materialized, no second pass.
    *
    * The sort MUST lead with the partition column: Spark's planned
    * write (V1Writes) requires an ordering prefixed by the partition
    * columns and inserts its own `Sort(shard_id)` otherwise — and
    * EliminateSorts then deletes the user's sort beneath it, leaving
    * within-shard rows in nondeterministic shuffle-arrival order.
    * Leading with `shard_id` makes the user sort satisfy the write
    * requirement, so it is kept verbatim (SourceSinkSpec asserts the
    * on-disk order).
    */
  def writeShards(df: DataFrame, dir: String, numShards: Int,
      idCol: String = "doc_id", salt: String = "shard"): Unit =
    withShardAssignment(df, numShards, idCol, salt)
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("__h"), col(idCol))
      .drop("__h")
      .write.partitionBy("shard_id").mode("overwrite").parquet(dir)

  /** Compact a parquet directory's small files into ~`targetBytes`
    * outputs — the OPTIMIZE step every streaming-append table needs
    * (per-micro-batch appends leave a file per batch per task; scans
    * then pay per-file open/footer costs and lose split planning).
    * Rows are preserved exactly; file COUNT is the only thing that
    * changes. Staged to a sibling temp dir and swapped by rename, so
    * a crash mid-compact leaves the original intact.
    *
    * Returns (files before, files after). Non-partitioned dirs only
    * (a partitioned table compacts per partition dir — call this per
    * partition).
    */
  def compactDir(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"$dir is not a directory")
    val parts = Option(d.listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
    val before = parts.length
    val totalBytes = parts.map(_.length()).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new java.io.File(d.getParentFile, d.getName + "_compact_tmp")
    val old = new java.io.File(d.getParentFile, d.getName + "_compact_old")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    require(d.renameTo(old), s"could not stage $dir aside")
    require(tmp.renameTo(d), s"could not swap compacted files into $dir")
    Option(old.listFiles()).foreach(_.foreach(_.delete()))
    old.delete()
    val after = Option(d.listFiles()).toSeq.flatten
      .count(f => f.getName.endsWith(".parquet") && f.isFile)
    (before, after)
  }

  /** Wald–Wolfowitz runs audit of the shard shuffle: per shard, the
    * number of RUNS of consecutive same-`groupCol` docs in the
    * [[shardCorpus]] shard_pos order versus the multi-category
    * expectation E[R] = n + 1 − Σ n_c²/n. A ratio near 1 certifies
    * the md5 shuffle actually interleaves sources; ≪ 1 means
    * same-source runs survived and a training job would see source
    * batches back-to-back — the data-order pathology a mean/count
    * check cannot detect. Returns (shard_id, n_docs, n_runs,
    * expected_runs, runs_ratio), shard order.
    *
    * Determinism: runs and the n_c are exact integers; expected and
    * ratio are each ONE division of exact integer operands
    * (ratio = runs·n / ((n+1)·n − Σn_c²)), rounded at 5.
    *
    * Scale shape: the lag walk runs in the SAME shard-partitioned,
    * shard_pos order the shuffle itself defines (a per-shard
    * sequential window — the object under audit is that order), and
    * the roll-ups are map-side-combined counts bounded by
    * shards·groups.
    */
  def shuffleRunsAudit(df: DataFrame, numShards: Int,
      groupCol: String = "source", idCol: String = "doc_id",
      salt: String = "shard"): DataFrame = {
    val dec = DecimalType(38, 0)
    val sc = shardCorpus(df, numShards, idCol, salt)
      .select(col("shard_id"), col("shard_pos"), col(groupCol).as("__g"))
    val w = Window.partitionBy("shard_id").orderBy("shard_pos")
    val runs = sc
      .withColumn("__new",
        when(lag(col("__g"), 1).over(w).isNull ||
          lag(col("__g"), 1).over(w) =!= col("__g"), 1L).otherwise(0L))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("__new")).as("n_runs"))
    val sq = sc.groupBy(col("shard_id"), col("__g"))
      .agg(count(lit(1)).as("__nc"))
      .groupBy("shard_id")
      .agg(sum(col("__nc").cast(dec) * col("__nc")).as("__sq"))
    val den = (col("n_docs").cast(dec) * (col("n_docs") + 1)) - col("__sq")
    runs.join(sq, "shard_id")
      .select(col("shard_id"), col("n_docs"), col("n_runs"),
        round(den.cast("double") / col("n_docs").cast("double"), 5)
          .as("expected_runs"),
        round((col("n_runs").cast(dec) * col("n_docs")).cast("double") /
          den.cast("double"), 5).as("runs_ratio"))
      .orderBy("shard_id")
  }

  /** Consistent-hash ring vnodes for `numShards` shards: (hash, shard)
    * sorted by hash, each vnode hash the first 15 md5 hex digits of
    * "vn|shard|replica" (60-bit positive long — driver-computable,
    * the [[graft.ext.Search]] bucketOf posture, and bit-identical to
    * the engine-side conv(md5) convention).
    */
  private[graft] def ringVnodes(numShards: Int,
      vnodesPerShard: Int): Seq[(Long, Int)] =
    (for {
      s <- 0 until numShards
      r <- 0 until vnodesPerShard
    } yield {
      val h = java.lang.Long.parseLong(
        Dedup.md5Hex(s"vn|$s|$r").substring(0, 15), 16)
      (h, s)
    }).sortBy(x => (x._1, x._2))

  /** Reshard movement plan under CONSISTENT HASHING: assign every doc
    * to its shard on the old ring (`oldShards`) and the new ring
    * (`newShards`), and report the movement matrix
    * (old_shard, new_shard, n_docs, moved), (old, new) order. On a
    * ring, growing 8→10 shards moves only the arc the new vnodes
    * claim (~1 − 8/10 of keys) — vs mod-N reassignment
    * ([[shardCorpus]]'s static layout) which moves ~90%: THE number a
    * 100 TB re-layout decision needs before anyone touches data.
    *
    * Determinism: doc position = first 15 md5 hex digits of the
    * salted id (exact 60-bit integer); both rings are driver-computed
    * literal arrays shared bit-for-bit with the oracle; assignment is
    * the first vnode clockwise (hash ≥ position, wrapping to the
    * ring's first vnode), ties impossible (distinct md5 prefixes).
    *
    * Scale shape: MAP-ONLY — the rings are in-plan literal arrays
    * (shards·vnodes entries), each row does two sorted-array probes
    * inside codegen, and the only shuffle is the final
    * (old, new)-keyed count roll-up, bounded by oldShards·newShards.
    */
  def reshardPlan(df: DataFrame, oldShards: Int, newShards: Int,
      vnodesPerShard: Int = 32, idCol: String = "doc_id",
      salt: String = "shard"): DataFrame = {
    require(oldShards > 0 && newShards > 0 && vnodesPerShard > 0,
      "shard and vnode counts must be positive")
    def ringCol(n: Int) = array(ringVnodes(n, vnodesPerShard).map {
      case (h, s) => struct(lit(h).as("vh"), lit(s).as("shard"))
    }: _*)
    def assign(ring: org.apache.spark.sql.Column) = {
      val nxt = filter(ring, v => v.getField("vh") >= col("__h"))
      // try_element_at: the filter is legitimately empty for keys past
      // the last vnode — they wrap to the ring's first entry
      coalesce(try_element_at(nxt, lit(1)), element_at(ring, 1))
        .getField("shard")
    }
    df.select(
        conv(substring(md5(concat_ws("|", lit(salt),
          col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
          .as("__h"))
      .select(assign(ringCol(oldShards)).as("old_shard"),
        assign(ringCol(newShards)).as("new_shard"))
      .groupBy("old_shard", "new_shard")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("moved", col("old_shard") =!= col("new_shard"))
      .orderBy("old_shard", "new_shard")
  }

  // ---- Bloom file-skipping index (point-lookup pruning) ----

  /** Build a per-shard Bloom skipping index over `keyCol` of a
    * [[writeShards]]-layout table (parquet partitioned by shard_id):
    * one SPARSE (shard_id, word_idx, bits) relation, mBits per shard,
    * the [[graft.ext.Sketches.bloomPositions]] md5 family — so a
    * point lookup can prune, from the index alone, every shard whose
    * filter proves the key absent. This is the skipping story for a
    * key the layout is NOT sorted or partitioned by (z-order serves
    * range probes on layout dimensions; content keys, fingerprints
    * and foreign ids hash uniformly across shards, and only a filter
    * per file can rule files out). No false negatives ever: a pruned
    * shard provably lacks the key; a false-positive shard is scanned
    * and eliminated by the residual `keyCol = key` filter — pruning
    * is a pure I/O optimization, never a correctness dial.
    *
    * Index size: ≤ numShards · mBits/63 rows of two longs — for a
    * 100 TB corpus at 10⁵ shards × 2²⁰ bits ≈ 1.7 G sparse words
    * WORST case but in practice ~n·k set bits per shard; the probe
    * reads only the k word rows per shard (word_idx-filtered scan).
    */
  def writeBloomSkipIndex(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, indexDir: String, keyCol: String,
      mBits: Long = 1L << 17, k: Int = 5): Unit = {
    spark.read.parquet(dataDir)
      .select(col("shard_id"),
        explode(Sketches.bloomPositions(col(keyCol), mBits, k)).as("pos"))
      .select(col("shard_id"), expr("pos div 63").as("word_idx"),
        expr("shiftleft(1L, int(pos % 63))").as("__b"))
      .groupBy("shard_id", "word_idx")
      .agg(expr("bit_or(__b)").as("bits"))
      .write.mode("overwrite").parquet(indexDir)
  }

  /** The probe key's (word_idx → required bits) map, computed on the
    * DRIVER — the identical md5 family as the build side (15 hex
    * digits = 60 bits, always positive), so no cluster job is needed
    * to plan the pruning.
    */
  private[graft] def bloomKeyWords(key: String, mBits: Long,
      k: Int): Map[Long, Long] =
    (0 until k).map { i =>
      val p = java.lang.Long.parseLong(
        Dedup.md5Hex(s"bloom$i|$key").take(15), 16) % mBits
      (p / 63, 1L << (p % 63).toInt)
    }.groupBy(_._1).map { case (w, bs) => w -> bs.map(_._2).reduce(_ | _) }

  /** Content-key point lookup through the skipping index: read the k
    * index word rows, keep only shards whose filter has EVERY
    * required bit set, and scan the data dir with a `shard_id IN
    * (survivors)` partition filter + the exact residual predicate.
    * Unpruned the lookup scans every shard; pruned it reads the
    * survivor shards' files only (usually one) — the
    * [[graft.ext.Similarity.ivfTopKIndexed]] driver-literal pruning
    * shape applied to point lookups.
    */
  def lookupByKey(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, indexDir: String, keyCol: String, key: String,
      mBits: Long = 1L << 17, k: Int = 5): DataFrame = {
    val words = bloomKeyWords(key, mBits, k)
    // shard_id in the index inherits its type from the dataDir read's
    // partition-column inference; cast all three probe columns so the
    // driver-side getInt/getLong stay layout-config independent.
    val idx = spark.read.parquet(indexDir)
      .filter(col("word_idx").cast("long").isin(words.keys.toSeq: _*))
      .select(col("shard_id").cast("int"), col("word_idx").cast("long"),
        col("bits").cast("long")).collect()
      .groupBy(_.getInt(0))
    val pass = idx.collect { case (shard, rows) =>
      val have = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      val ok = words.forall { case (w, need) =>
        (have.getOrElse(w, 0L) & need) == need }
      shard -> ok
    }.collect { case (shard, true) => shard }.toSeq.sorted
    spark.read.parquet(dataDir)
      .filter(if (pass.isEmpty) lit(false)
        else col("shard_id").isin(pass: _*))
      .filter(col(keyCol) === key)
  }
}
