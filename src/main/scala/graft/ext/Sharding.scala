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
  * per-shard sort, each shard sized corpus/N. That per-shard sort is
  * the honest cost of producing named positions; writing shard FILES
  * would skip it (`df.repartition(col("shard_id")).sortWithinPartitions
  * ("__h").write.partitionBy("shard_id")` — same exchange, sort
  * folded into the write).
  */
object Sharding {

  /** Adds `shard_id` (int, [0, numShards)) and `shard_pos` (long,
    * 0-based position in the shard's deterministic shuffle order).
    */
  def shardCorpus(df: DataFrame, numShards: Int, idCol: String = "doc_id",
      salt: String = "shard"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val h = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy("shard_id").orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard_id",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(numShards.toLong)).cast("int"))
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
    */
  def writeShards(df: DataFrame, dir: String, numShards: Int,
      idCol: String = "doc_id", salt: String = "shard"): Unit = {
    require(numShards > 0, "numShards must be positive")
    val h = md5(concat_ws("|", lit(salt), col(idCol).cast("string")))
    df.withColumn("__h", h)
      .withColumn("shard_id",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(numShards.toLong)).cast("int"))
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("__h"), col(idCol))
      .drop("__h")
      .write.partitionBy("shard_id").mode("overwrite").parquet(dir)
  }
}
