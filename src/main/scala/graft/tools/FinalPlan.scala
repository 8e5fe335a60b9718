package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints a query's FINAL adaptive plan (after collect() execution) —
  * the only place exchange/stage REUSE is visible: the initial plan
  * duplicates every shared subtree per consumer, while the executed
  * section shows one FileScan + shared ShuffleQueryStage ids. (The
  * explain string appends the initial plan below the adaptive one;
  * read the top section.)
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    }
  }
}
