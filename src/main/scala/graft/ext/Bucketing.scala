package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (hash-clustered, pre-sorted) table storage — the storage-
  * side half of shuffle elimination, complementing [[Sharding]]'s
  * file-layout operators and the persisted indexes ([[Search]] BM25,
  * [[Similarity]] IVF). The reference outsources physical layout to
  * Athena/S3 entirely (`aws-athena.sh` never sees storage); on Spark
  * the layout IS the optimization: a table written with `bucketBy(n,
  * key)` + `sortBy(key)` records its hash-clustering in the catalog,
  * and every later equi-join or aggregation on that key reads the
  * buckets as pre-shuffled, pre-sorted input — zero Exchange, zero
  * Sort in the join plan.
  *
  * Why this is THE 100 TB join shape: a fact-to-fact join (documents
  * × embeddings, orders × lineitem) at corpus scale shuffles BOTH
  * sides every time it runs — O(data) network each query. Bucketing
  * moves that shuffle to write time, ONCE; the recurring join cost
  * drops to a streaming zip of co-numbered buckets. The trade is
  * write-side cost and a fixed bucket count, which is why it fits
  * slowly-changing, repeatedly-joined curated corpora (exactly what a
  * training-data pipeline republishes per snapshot).
  *
  * Bucket-pruning bonus: an equality predicate on the bucket key
  * reads ONE bucket (`SelectedBucketsCount: 1 out of n` in the scan),
  * the same effect partition pruning gives on date columns but for
  * high-cardinality keys where directory-per-value would melt the
  * metastore.
  */
object Bucketing {

  /** Persist `df` as an external bucketed+sorted catalog table at
    * `dir`. Buckets are Spark's `hash(key) pmod n` — Murmur3, the
    * same function the shuffle planner uses, which is what makes the
    * stored clustering substitutable for a runtime Exchange.
    */
  def writeBucketed(df: DataFrame, tableName: String, dir: String,
      numBuckets: Int, keyCol: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    // Spark ≥3.1 only trusts a bucket's sort order when every bucket
    // is a single file, and gates even that behind this conf (the
    // planner would otherwise have to list files to prove it). The
    // repartition below guarantees the single-file condition, which
    // is exactly when the conf is sound — so the bucketing layer owns
    // turning it on.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    // Pre-cluster the write so each task owns exactly one bucket:
    // repartition(n, key) uses the SAME HashPartitioning the bucket
    // assignment does, giving ONE file per bucket. That is the
    // condition under which the scan exposes the per-bucket sort as
    // outputOrdering — with multiple files per bucket Spark must
    // re-Sort above the scan and sortBy() bought nothing.
    df.repartition(numBuckets, col(keyCol)).write
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .option("path", dir)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(tableName)
  }

  /** Join two bucketed tables on their bucket keys with a sort-merge
    * join. The `merge` hint pins SMJ (a broadcast would also skip the
    * shuffle but proves nothing about the layout); with equal bucket
    * counts on both sides the planner reads bucket i of each table
    * into the same task — the plan has NO ShuffleExchange and NO Sort
    * (PlanHygieneSpec asserts both).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, col(leftKey) === col(rightKey))
  }
}
