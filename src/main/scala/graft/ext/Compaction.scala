package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass that keeps
  * streaming/incremental sinks scannable: thousands of KB-sized files
  * make a 100 TB table's scan planning (footer reads, task setup)
  * dominate the query. Rewrite a directory to ~`targetFileBytes`
  * outputs sized from the ACTUAL on-disk bytes (listed via the Hadoop
  * FileSystem, so it works on any supported storage), not a guess.
  *
  * The rewrite uses round-robin repartition — compaction's contract
  * is layout, not order; pair with [[ZOrder.clusterBy]] when the
  * rewrite should also re-cluster.
  */
object Compaction {

  /** Total bytes of data files under `dir` (dotfiles/_SUCCESS skipped). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Relational compaction PLAN over a file manifest — which files
    * coalesce into which ~`targetBytes` output bin, decided before
    * any byte is rewritten (on a 100 TB table the plan is the cheap
    * step you review/schedule; [[compact]] is the rewrite). Files are
    * binned in (groupCol, subCol) key order by prefix-sum assignment
    * `bin = cum_bytes_before div targetBytes` — contiguous key runs
    * land in the same bin, so source-level locality (and the
    * partition pruning that relies on it) survives the compaction;
    * a file larger than the target gets its own bin(s) naturally.
    * Returns one row per bin: (bin_id, n_files, bin_bytes,
    * fill_ratio) in bin order. fill_ratio is integer HALF_UP at
    * scale 5 — bin_bytes/target is a ratio of round integers, so it
    * LANDS on .5×10⁻⁵ ties (9139/8000 = 1.142375 exactly, caught by
    * the sf0.01 gate) where Spark's decimal-string round and a raw
    * double round disagree; §8.3 rule 4 applies even to this single
    * division because the true value terminates.
    *
    * Scale shape: the manifest is metadata (one row per FILE, never
    * per data row), and the global prefix sum is still two-phase —
    * a PARTITIONED within-group cumsum plus a bounded global offsets
    * window over one row per group (the [[Quantiles.shardedCumsum]]
    * design with the group key as the shard) — so no window task
    * ever sees more than one group's manifest rows. Exact long
    * arithmetic throughout; the only division rendering fill_ratio
    * is single and rounded (§8.3 rule 4).
    */
  def plan(manifest: DataFrame, groupCol: String, subCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = Window.partitionBy(groupCol).orderBy(subCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // bounded global window: one row per group
    val offW = Window.orderBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = manifest.groupBy(groupCol)
      .agg(sum(col(bytesCol)).as("__gtot"))
      .withColumn("__off", coalesce(sum(col("__gtot")).over(offW), lit(0L)))
      .select(col(groupCol), col("__off"))
    manifest
      .withColumn("__lb", coalesce(sum(col(bytesCol)).over(before), lit(0L)))
      .join(broadcast(offsets), Seq(groupCol))
      .withColumn("__cumb", col("__off") + col("__lb"))
      .withColumn("bin_id", expr(s"__cumb div ${targetBytes}L"))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_files"), sum(col(bytesCol)).as("bin_bytes"))
      .withColumn("fill_ratio",
        expr(s"(bin_bytes * 200000L + ${targetBytes}L) div ${2 * targetBytes}L")
          .cast("double") / 100000.0)
      .orderBy("bin_id")
  }

  /** Read `inDir` (parquet), rewrite to `outDir` in
    * `ceil(bytes / targetFileBytes)` files. Returns the file count
    * written.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val bytes = dataBytes(spark, inDir)
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
