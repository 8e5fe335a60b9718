package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the driver's parquet tables as temp views and resolves
  * the reference's 3-part `catalog.database.table` names
  * (/root/reference/aws-athena.sh:165-173) onto them.
  *
  * At 100 TB these would be external catalog tables (partitioned
  * parquet under a metastore); the registration layer is the only
  * thing that changes — every operator downstream addresses tables
  * by name through the session catalog.
  *
  * `sfDir` is handed to `spark.read.parquet` verbatim, so it accepts
  * ANY Hadoop-FS URI scheme, not just local paths: pointing the
  * engine at an object store (`s3a://bucket/prefix`, `abfs://`,
  * `gs://`) is connector-jar + `fs.&lt;scheme&gt;.impl` configuration
  * in stock Spark/Hadoop — zero code changes here. SourceSinkSpec
  * proves the seam with a mock scheme (the sandbox has no cloud
  * egress).
  */
object Tables {

  /** All driver-generated tables (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Default 3-part namespace the engine exposes, mirroring the
    * reference's `catalog_name.database_name.table_name` contract.
    */
  val DefaultCatalog = "spark_catalog"
  val DefaultSchema  = "default"

  // Idempotence guard: re-registering identical views is cheap but
  // re-reads 10 parquet footers per query; skip when unchanged.
  @volatile private var registered: Option[(SparkSession, String)] = None

  def register(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (!registered.contains((spark, sfDir))) {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) (reads as a
      // raw long under nanosAsLong) and as TIMESTAMP(MICROS,
      // isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ). Normalize both
      // to a session-zoned TimestampType so every downstream
      // unix_micros/window call analyzes regardless of which fixture
      // generation is on disk. The NTZ→TZ cast is exact: the session
      // timezone is pinned to UTC by every entrypoint.
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () }
      all.foreach { name =>
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        val shaped =
          if (name == "events") normalizeEventTime(df) else df
        shaped.createOrReplaceTempView(name)
      }
      InfoSchema.register(spark, all)
      registered = Some((spark, sfDir))
    }
  }

  /** Surface `ts` as a session-zoned `TimestampType` whatever the
    * fixture wrote: nanos-as-long (legacy NANOS parquet), TIMESTAMP_NTZ
    * (current MICROS isAdjustedToUTC=false parquet), or already-zoned.
    * A schema-drift regression here once silently broke 8 event
    * queries (round 4), so the match is exhaustive on purpose.
    */
  def normalizeEventTime(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        // integer div: nanos ~1e18 exceed double's 53-bit mantissa
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts surfaced as unsupported type $other — extend Tables.normalizeEventTime")
    }
  }

  /** Split a `catalog.database.table` name, validating the 3-part shape
    * exactly as /root/reference/aws-athena.sh:165-167 does.
    */
  def splitThreePart(qualified: String): (String, String, String) = {
    val parts = qualified.split('.')
    require(parts.length == 3 && parts.forall(_.nonEmpty),
      "table name must be in the format 'catalog_name.database_name.table_name'")
    (parts(0), parts(1), parts(2))
  }

  /** Resolve a 1- or 3-part table name to a DataFrame. 3-part names are
    * accepted in the default namespace (the reference forwards them
    * verbatim to Athena; we resolve the table part against the session
    * catalog).
    */
  def table(spark: SparkSession, name: String): DataFrame = {
    if (name.contains('.')) {
      val (cat, db, tbl) = splitThreePart(name)
      // The reference forwards the full 3-part name to the engine,
      // which fails for an unknown catalog/schema — silently dropping
      // the qualifier would resolve wrong_cat.wrong_db.t to t.
      require(cat == DefaultCatalog && db == DefaultSchema,
        s"unknown catalog or schema: $cat.$db (expected $DefaultCatalog.$DefaultSchema)")
      spark.table(tbl)
    } else spark.table(name)
  }
}
