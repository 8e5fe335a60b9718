package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
