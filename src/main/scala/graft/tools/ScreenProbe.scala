package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: SQ8 screen kill-rate at a given SF (box must be quiet). */
object ScreenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graftdata/sf1")
    graft.catalog.Tables.register(spark, sf)
    val emb = spark.table("embeddings")
    val n = emb.count()
    val nlist = math.max(16.0, math.ceil(math.sqrt(n / 2.0))).toInt
    val dir = java.nio.file.Files.createTempDirectory("graft-screenprobe").toString
    graft.ext.Similarity.writeCellIndex(emb, dir, nlist = nlist, nprobe = 2)
    val keyed = spark.read.parquet(s"$dir/probed")
    val c = graft.ext.Similarity.screenedCandidates(keyed, 0.4, 2)
      .agg(count(lit(1)).as("candidates"),
        count(when(col("__keep"), 1)).as("kept"),
        count(when(col("score") >= 0.4, 1)).as("true_pairs")).collect().head
    println(s"[screen] sf=$sf n=$n nlist=$nlist candidates=${c.getLong(0)} " +
      s"kept=${c.getLong(1)} true=${c.getLong(2)} " +
      f"killRate=${1.0 - c.getLong(1).toDouble / c.getLong(0)}%.4f")
    spark.stop()
  }
}
