package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Tables

/** Source/sink formats beyond the driver's parquet: CSV and JSON
  * round-trips (schema-explicit, no inference on the read path — the
  * engine's catalog-declared-schema posture, SURVEY.md §1.3), and
  * partition-pruned reads of partitioned parquet — the layout that
  * makes selective queries cheap at 100 TB.
  */
class SourceSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString

  test("tables register from a non-file URI scheme (cloud-connector seam)") {
    // register() hands sfDir to spark.read.parquet verbatim, so ANY
    // Hadoop-FS scheme works once its fs.<scheme>.impl is configured —
    // the s3a://bucket/prefix deployment is config, not code. Proven
    // here with a local-delegating mock scheme (no cloud egress in the
    // sandbox): the scan must actually route through mockdfs://.
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockdfs.impl", classOf[MockDfs].getName)
    Tables.register(spark, s"mockdfs://${TestSpark.sfDir}")
    val nation = spark.table("nation")
    assert(nation.count() == 25)
    assert(nation.inputFiles.nonEmpty &&
      nation.inputFiles.forall(_.startsWith("mockdfs:")),
      s"scan must route through the registered scheme, got ${nation.inputFiles.take(1).mkString}")
    // restore the standard file-scheme views for later suites
    Tables.register(spark, TestSpark.sfDir)
    assert(spark.table("nation").inputFiles.forall(_.startsWith("file:")))
  }

  test("documents round-trip through JSON and CSV with explicit schemas") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents").orderBy("doc_id")
    val schema = docs.schema

    val jsonDir = tmp("json")
    docs.write.mode("overwrite").json(jsonDir)
    val fromJson = spark.read.schema(schema).json(jsonDir).orderBy("doc_id")
    assert(fromJson.collect().toSeq == docs.collect().toSeq)

    val csvDir = tmp("csv")
    docs.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").csv(csvDir)
    val fromCsv = spark.read.schema(schema)
      .option("header", "true").csv(csvDir).orderBy("doc_id")
    assert(fromCsv.collect().toSeq == docs.collect().toSeq)
  }

  test("FileSinks: pinned-option CSV and JSON sinks round-trip adversarial content") {
    import spark.implicits._
    import graft.sources.FileSinks
    // the fields CSV gets wrong when options drift between write and
    // read: delimiters/quotes/newlines inside values, empty string vs
    // NULL, negative and tie-prone doubles
    val df = Seq(
      (1L, Option("plain"), Option(1.5)),
      (2L, Option("comma, \"quote\" and\nnewline"), Option(-0.1)),
      (3L, Option(""), Option(0.1 + 0.2)),
      (4L, Option.empty[String], Option.empty[Double]),
      (5L, Option("trailing space "), Option(-0.0))
    ).toDF("id", "s", "x")
    val want = df.orderBy("id").collect().toSeq

    val csvDir = tmp("sinkcsv")
    FileSinks.writeCsv(df, csvDir)
    val fromCsv = FileSinks
      .readCsv(spark, csvDir, "id LONG, s STRING, x DOUBLE")
      .orderBy("id")
    assert(fromCsv.collect().toSeq == want,
      "CSV write+read through the pinned option pair must be lossless")

    val jsonDir = tmp("sinkjson")
    FileSinks.writeJson(df, jsonDir)
    val fromJson = FileSinks
      .readJson(spark, jsonDir, "id LONG, s STRING, x DOUBLE")
      .orderBy("id")
    assert(fromJson.collect().toSeq == want,
      "JSON write+read must be lossless (doubles bit-exact)")
  }

  test("FileSinks: the \\N null sentinel is REFUSED by the CSV sink, round-trips in JSON") {
    import spark.implicits._
    import graft.sources.FileSinks
    // ADVICE r12 → VERDICT r13 task 5: Spark applies nullValue AFTER
    // unquoting on read, so a literal "\N" string payload would
    // collide with the null sentinel and silently read back as NULL.
    // The sink now fails the WRITE loudly instead — the lossless claim
    // holds with no caveat for everything writeCsv accepts. JSON (no
    // in-band sentinel) carries the value.
    val adversarial = Seq(
      (1L, Option("""\N""")),
      (2L, Option.empty[String]),
      (3L, Option("N"))).toDF("id", "s")

    val csvDir = tmp("sentcsv")
    val e = intercept[Exception] { FileSinks.writeCsv(adversarial, csvDir) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("reserved NULL sentinel")),
      s"write must fail on the sentinel, got: ${e.getMessage.take(300)}")

    // values merely CONTAINING the sentinel (and NULLs, and "N") are
    // fine and round-trip losslessly
    val ok = Seq(
      (1L, Option("""x\Ny""")),
      (2L, Option.empty[String]),
      (3L, Option("N"))).toDF("id", "s")
    FileSinks.writeCsv(ok, csvDir)
    val fromCsv = FileSinks.readCsv(spark, csvDir, "id LONG, s STRING")
      .orderBy("id").collect()
    assert(fromCsv(0).getString(1) == """x\Ny""")
    assert(fromCsv(1).isNullAt(1))
    assert(fromCsv(2).getString(1) == "N")

    val jsonDir = tmp("sentjson")
    FileSinks.writeJson(adversarial, jsonDir)
    val fromJson = FileSinks.readJson(spark, jsonDir, "id LONG, s STRING")
      .orderBy("id").collect()
    assert(fromJson(0).getString(1) == """\N""",
      "JSON has no in-band sentinel; \\N round-trips")
    assert(fromJson(1).isNullAt(1))
  }

  test("raw text lines ingest as one-document-per-line with stable ids") {
    // the rawest corpus shape: a directory of .txt, one doc per line.
    // spark.read.text is the entry; ids come from the deterministic
    // (file, line-offset) pair — monotonically_increasing_id would be
    // partitioning-dependent and is banned for ids.
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents").select("doc_id", "text")
      .filter(!col("text").contains("\n"))
    val txtDir = tmp("txt")
    docs.select("text").write.mode("overwrite").text(txtDir)
    val lines = spark.read.text(txtDir)
    assert(lines.count() == docs.count())
    // ingested lines carry the same multiset of contents
    val a = lines.groupBy("value").count().orderBy("value").collect().toSeq
    val b = docs.groupBy("text").count().orderBy("text").collect().toSeq
    assert(a.map(r => (r.getString(0), r.getLong(1))) ==
      b.map(r => (r.getString(0), r.getLong(1))))
    // and the text pipeline runs on them unchanged
    val stats = graft.ext.TextStats.withDocStats(
      lines.select(md5(col("value")).as("doc_id"), col("value").as("text")))
    assert(stats.count() == docs.count())
  }

  test("documents round-trip through ORC with predicate pushdown") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents").orderBy("doc_id")
    val orcDir = tmp("orc")
    docs.write.mode("overwrite").orc(orcDir)
    val fromOrc = spark.read.orc(orcDir)
    assert(fromOrc.orderBy("doc_id").collect().toSeq == docs.collect().toSeq)
    // the columnar source behaves like parquet: filters reach the scan
    val filtered = fromOrc.filter(col("doc_id") > 100L).select("doc_id")
    val scan = filtered.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(doc_id,100)"))
    assert(scan.requiredSchema.fieldNames.sameElements(Array("doc_id")))
  }

  test("partitioned parquet reads prune partitions at plan time") {
    Tables.register(spark, TestSpark.sfDir)
    val dir = tmp("part")
    spark.table("events").write.mode("overwrite")
      .partitionBy("event_type").parquet(dir)
    val all = spark.read.parquet(dir)
    val types = all.select("event_type").distinct().collect().map(_.getString(0))
    assert(types.length > 1)

    val one = all.filter(col("event_type") === types.head)
    val scan = one.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // the predicate must land in PartitionFilters (directory pruning),
    // not DataFilters (row filtering after reading everything)
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters: ${scan.metadata}")
    assert(scan.relation.partitionSchema.fieldNames.contains("event_type"))
    // and only the matching partition's rows flow
    assert(one.count() ==
      spark.table("events").filter(col("event_type") === types.head).count())
  }

  test("schema evolution: mergeSchema unions old and new batch columns") {
    // a data lake accretes columns batch over batch; readers must see
    // the union schema with nulls for pre-evolution rows — without
    // rewriting the old files
    val dir = tmp("evolve")
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents")
    docs.select("doc_id", "text")
      .filter(col("doc_id") < 100L)
      .write.mode("append").parquet(dir)
    docs.select("doc_id", "text", "lang")  // the batch that added lang
      .filter(col("doc_id") >= 100L)
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.sameElements(
      Array("doc_id", "lang", "text")))
    // pre-evolution rows read as null; post-evolution rows keep values
    assert(merged.filter(col("doc_id") < 100L && col("lang").isNotNull)
      .count() == 0L)
    assert(merged.filter(col("doc_id") >= 100L && col("lang").isNull)
      .count() == 0L)
    assert(merged.count() == docs.count())
  }

  test("writeShards materializes the shardCorpus assignment as partitioned parquet") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents")
    val dir = tmp("shards")
    graft.ext.Sharding.writeShards(docs, dir, numShards = 8)
    val back = spark.read.parquet(dir)
    // nothing lost, nothing duplicated
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    // the directory layout IS the assignment of shardCorpus
    val expected = graft.ext.Sharding.shardCorpus(docs, 8)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = back.select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
    // shard partition dirs on disk, pruned reads work
    val one = spark.read.parquet(dir).filter(col("shard_id") === 3)
    val scan = one.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty)
    // the ON-DISK row order within each shard is the deterministic
    // md5 order — i.e. shard_pos order (V1Writes would silently drop
    // a user sort not prefixed by the partition column; this pins the
    // contract against that regression)
    val posOf = graft.ext.Sharding.shardCorpus(docs, 8)
      .select("doc_id", "shard_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fileOrder = spark.read.parquet(dir)
      .filter(col("shard_id") === 3).select("doc_id")
      .collect().map(r => posOf(r.getLong(0)))
    assert(fileOrder.toSeq == fileOrder.sorted.toSeq,
      "within-shard file order must equal the deterministic shuffle order")
  }
}
