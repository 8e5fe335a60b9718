package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query phase breakdown (build / plan / execute + Catalyst
  * tracker phases) — the companion to [[Scratch]] for telling
  * driver-side eager planning and codegen cost apart from cluster
  * execution. `runMain graft.tools.PhaseProbe q_name...`; repeat a
  * name to see the warm (codegen-cached) cost.
  */
object PhaseProbe {
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
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      val ph = df.queryExecution.tracker.phases
        .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
        .mkString(" ")
      println(f"[probe] $q%-28s build=${(t1 - t0) / 1e9}%5.2f " +
        f"plan=${(t2 - t1) / 1e9}%5.2f exec=${(t3 - t2) / 1e9}%6.2f  $ph")
    }
  }
}
