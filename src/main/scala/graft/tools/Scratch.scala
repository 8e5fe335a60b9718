package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness (not part of the library surface). */
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
    graft.catalog.Tables.register(spark, "/root/testdata/sf0.1")
    val docs = spark.table("documents")
    time("warm")(docs.count())
    time("ngram pairs")(graft.ext.Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    time("minhash")(graft.ext.Dedup.minHashNearDupPairs(docs).count())
    time("simhash")(graft.ext.Dedup.simHashNearDupPairs(docs).count())
    time("corpusStats")(graft.ext.TextStats.corpusStats(docs).count())
    time("langid")(graft.ext.TextStats.langId(spark, docs).count())
  }
}
