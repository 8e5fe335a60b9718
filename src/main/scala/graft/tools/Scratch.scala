package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing/debugging harness (not part of the library surface;
  * rewrite freely — see the memory notes for the listener pattern,
  * and PLANS.md for how plan dumps were generated).
  */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    graft.catalog.Tables.register(spark, sf)
    val emb = spark.table("embeddings")
    val pairs = time("thresholdPairs materialize") {
      graft.ext.Similarity.thresholdPairs(emb, threshold = 0.4,
        bands = 8, planesPerBand = 2, dims = 64)
        .select("id_a", "id_b").localCheckpoint()
    }
    val cc = time("connectedComponents") {
      graft.ext.Dedup.connectedComponents(
        emb.select(col("vec_id").as("id")), pairs, maxIter = 50)
    }
    println(s"labels = ${cc.count()}, components = ${cc.select("component").distinct().count()}")
  }
}
