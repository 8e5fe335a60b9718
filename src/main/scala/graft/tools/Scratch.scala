package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
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
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d wall=${dur}%5d ms run=${m.executorRunTime}%6d ms gc=${m.jvmGCTime}%5d ms deser=${m.executorDeserializeTime}%5d ms")
      }
    })
    graft.catalog.Tables.register(spark, "/root/testdata/sf0.1")
    val li = spark.table("lineitem")
    time("warm")(li.count())
    time("profileLong")(graft.profile.TableProfiler.profileLong(li).count())
  }
}
