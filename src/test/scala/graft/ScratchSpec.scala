package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine-scratch filesystem seam (VERDICT r12 task 2): with
  * `spark.graft.scratchDir` unset the engine behaves exactly as
  * before (JVM temp dir); with it set, every engine-internal scratch,
  * index and checkpoint dir is allocated under
  * `<root>/<applicationId>/` through the Hadoop FileSystem API — the
  * shape a multi-node cluster needs (a driver-local temp dir parquet
  * write scatters partitions across executor disks).
  */
class ScratchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withScratchRoot[A](f: String => A): A = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-scratch-root").toString
    spark.conf.set(EngineScratch.ConfKey, root)
    try f(root)
    finally spark.conf.unset(EngineScratch.ConfKey)
  }

  test("default (conf unset): temp-dir behavior, dirs exist and are unique") {
    val a = EngineScratch.dir(spark, "graft-spec")
    val b = EngineScratch.dir(spark, "graft-spec")
    assert(a != b)
    assert(new java.io.File(a).isDirectory)
    EngineScratch.delete(spark, a)
    EngineScratch.delete(spark, b)
    assert(!new java.io.File(a).exists)
  }

  test("configured root: dirs land under <root>/<appId>, usable for parquet") {
    withScratchRoot { root =>
      val appId = spark.sparkContext.applicationId
      val d = EngineScratch.dir(spark, "graft-spec")
      assert(d.startsWith(s"$root/$appId/graft-spec-"), d)
      assert(new java.io.File(d).isDirectory)
      // full write-read round trip through the allocated dir
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$d/t")
      assert(spark.read.parquet(s"$d/t").count() == 2)
      EngineScratch.delete(spark, d)
      assert(!new java.io.File(d).exists)
    }
  }

  test("kCore disk regime allocates its A/B generations under the seam") {
    withScratchRoot { root =>
      val appId = spark.sparkContext.applicationId
      val before = Option(new java.io.File(s"$root/$appId").list())
        .toSeq.flatten.toSet
      val edges = ((0L until 10L).flatMap(i =>
        ((i + 1) until 10L).map(j => (i, j))) ++ Seq((10L, 11L)))
        .toDF("a", "b")
      val disk = graft.ext.Graph.kCoreDiskGen(edges, k = 3, rounds = 5)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
      val mem = graft.ext.Graph.kCoreInMemory(edges, k = 3, rounds = 5)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(disk.toSeq == mem.toSeq)
      // the run allocated (then deleted) a graft-kcore dir under the
      // root — the appId dir exists and gained no SURVIVING scratch
      val after = Option(new java.io.File(s"$root/$appId").list())
        .toSeq.flatten.toSet
      assert(new java.io.File(s"$root/$appId").isDirectory)
      assert((after -- before).forall(!_.startsWith("graft-kcore")),
        s"undeleted kcore scratch: ${after -- before}")
    }
  }

  test("streaming checkpoint dir honors the seam (runAvailableNow)") {
    withScratchRoot { root =>
      val appId = spark.sparkContext.applicationId
      val src = java.nio.file.Files
        .createTempDirectory("graft-scratch-stream-src").toString
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("overwrite").parquet(src)
      val streamed = spark.readStream
        .schema(spark.read.parquet(src).schema).parquet(src)
        .select(col("id"), upper(col("v")).as("v"))
      val out = graft.streaming.EventStream
        .runAvailableNow(spark, streamed, "scratch_seam_demo")
      assert(out.count() == 2)
      val entries = Option(new java.io.File(s"$root/$appId").list())
        .toSeq.flatten
      assert(entries.exists(_.startsWith("graft-ckpt-scratch_seam_demo")),
        s"checkpoint not under seam: $entries")
    }
  }
}
