package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV / JSON-lines file sinks with PINNED options, paired with
  * schema-explicit readers — the write half of the engine's mundane
  * text-ingestion surface (the reference's tables are frequently
  * CSV-backed and its own output is a TSV file,
  * /root/reference/aws-athena.sh:44-58; pipelines round-trip).
  *
  * Why pinned options instead of raw `df.write.csv`: a CSV written
  * with one escaping convention and read with another corrupts data
  * SILENTLY (the default `escape` is backslash on write but quotes
  * double on read in other engines). This sink writes with
  * `quoteAll` + RFC-4180 double-quote escaping and an explicit
  * `nullValue` sentinel, and [[readCsv]] reads with the SAME pinned
  * options — a pair that q_csv_roundtrip proves lossless hash-green
  * against the parquet original, and that any RFC-4180 consumer
  * (DuckDB, BigQuery load, pandas) parses identically.
  *
  * Scale shape: both sinks are plain distributed writes — one output
  * file per partition, no coalesce imposed here (a 100 TB export
  * WANTS thousands of files; callers staging a small dim can
  * `.coalesce(1)` themselves). JSON-lines doubles survive bit-exactly
  * (Jackson emits shortest-round-trip); CSV doubles are written via
  * Double.toString — also shortest-round-trip — so both formats are
  * numerically lossless for DOUBLE/INT/LONG/STRING payloads.
  * Timestamps are pinned to ISO-8601 with explicit UTC so a reader in
  * any session timezone decodes the same instant.
  */
object FileSinks {
  // RFC-4180: quotes escape by DOUBLING, every field quoted, an
  // out-of-alphabet null sentinel (empty string is a legal VALUE for
  // quoted strings — "" and absent must stay distinguishable).
  // RESERVED SENTINEL (ADVICE r12, hardened r14): the two-character
  // string \N is the one value the CSV hop cannot round-trip — Spark
  // applies nullValue after unquoting on read, so a literal "\N"
  // payload would come back as NULL. [[writeCsv]] therefore REFUSES
  // to write it (a raise_error guard fused into the write scan — no
  // extra pass), turning the silent corruption into a loud failure at
  // the write site. Payloads that may legitimately contain \N belong
  // in the JSON sink, which has no in-band sentinel.
  private val CsvOptions = Map(
    "header" -> "true",
    "quoteAll" -> "true",
    "escape" -> "\"",
    "nullValue" -> "\\N",
    // quoted fields may hold newlines (RFC-4180 §2.6); without this
    // the reader splits records mid-field. Multi-line CSV is
    // non-splittable PER FILE — parallelism comes from the one-file-
    // per-partition layout the distributed write already produces.
    "multiLine" -> "true",
    // Spark trims field whitespace by default on BOTH sides of the
    // hop (write-side ignoreLeading/TrailingWhiteSpace default true)
    // — "value " and "value" must stay distinct values
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false",
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "timeZone" -> "UTC")

  private val JsonOptions = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "timeZone" -> "UTC",
    // preserve null fields as explicit nulls so a schema-explicit
    // reader distinguishes "column absent from this file" (schema
    // drift) from "value null"
    "ignoreNullFields" -> "false")

  // Sentinel write guard: each string column passes through a
  // when(=="\N", raise_error).otherwise(identity) projection, so the
  // check rides the write's own scan — zero additional passes at any
  // scale — and the job fails BEFORE the reader could ever decode a
  // corrupted NULL. (The sentinel check is exact equality: "\N" is
  // reserved, values merely CONTAINING it are fine — they round-trip.)
  private def guardSentinel(df: DataFrame): DataFrame = {
    val guarded: Seq[Column] = df.schema.fields.toSeq.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        when(col(f.name) === lit("\\N"), raise_error(lit(
          s"writeCsv: column '${f.name}' holds the literal string \\N, " +
            "the sink's reserved NULL sentinel — it cannot round-trip " +
            "through CSV. Use writeJson for payloads that may contain " +
            "\\N.")).cast(f.dataType))
          .otherwise(col(f.name)).as(f.name)
      else col(f.name).as(f.name)
    }
    df.select(guarded: _*)
  }

  /** Write `df` as RFC-4180 CSV under `path` (one file per
    * partition, overwrite). Fails loudly if any string cell equals
    * the reserved `\N` sentinel (which cannot round-trip) — the
    * lossless claim holds with no caveat for everything this sink
    * accepts.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    guardSentinel(df).write.mode("overwrite").options(CsvOptions).csv(path)

  /** Read a [[writeCsv]]-produced directory with an EXPLICIT schema
    * (DDL string) — never inference, which is a whole extra pass over
    * the data at 100 TB and type-unstable besides.
    */
  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).options(CsvOptions).csv(path)

  /** Write `df` as JSON-lines under `path` (one file per partition,
    * overwrite) — doubles bit-exact via shortest-round-trip encoding.
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").options(JsonOptions).json(path)

  /** Read a [[writeJson]]-produced directory with an explicit schema. */
  def readJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).options(JsonOptions).json(path)
}
