package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

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
