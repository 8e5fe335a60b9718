package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (a second SparkContext in
  * the same JVM is a classic flake source).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  // Overridable for machines whose corpus lives elsewhere; every
  // suite that needs a second scale derives it from this root.
  val dataRoot: String =
    sys.env.getOrElse("GRAFT_TESTDATA_ROOT", "/root/testdata")
  val sfDir = s"$dataRoot/sf0.001"
  val sf001Dir = s"$dataRoot/sf0.01"
}
