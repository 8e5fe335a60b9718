package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-construction drift gate over the REAL fixtures.
  *
  * Round 4 shipped 8 queries that failed analysis against the actual
  * events parquet (its `ts` column changed from TIMESTAMP(NANOS) to
  * TIMESTAMP_NTZ) while `sbt test` stayed mostly green, because the
  * event specs build in-memory frames with `TimestampType`. This suite
  * closes that hole: every declared query must build and ANALYZE
  * against the on-disk sf0.001 tables, so any future
  * fixture/reader/type change fails `sbt test` immediately instead of
  * silently vanishing from the round's correctness artifact.
  *
  * Cost note: most queries only resolve (milliseconds), but building
  * a query is not uniformly execution-free — the persisted-index
  * queries build their index on first touch and the graph/BPE queries
  * materialize driver-side state — so the suite runs in tens of
  * seconds at sf0.001, and a failure here can also mean the BUILD
  * step broke, not only the fixtures. Both are exactly the breakages
  * this gate exists to surface before the driver's verify run.
  */
class FixtureDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every SparkEntry query analyzes against the on-disk fixtures") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, TestSpark.sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis against ${TestSpark.sfDir}:\n  " +
        failures.mkString("\n  "))
  }

  test("events.ts VALUE round-trips through the normalized reader") {
    // The analyze-only gate above catches TYPE drift; this pins the
    // SEMANTICS: the first fixture row's instant, read through
    // Tables.register → normalizeEventTime, must be the exact
    // epoch-microsecond value the raw parquet carries (independently
    // read via DuckDB when pinned: event_id 0 → 2024-01-01
    // 00:09:58.778549 = 1704067798778549 µs). A reader/session-
    // timezone/normalization change that shifts values — not just
    // types — fails here before the oracle run. If the driver ever
    // regenerates the fixtures, re-pin from
    // `SELECT epoch_us(ts) FROM 'events.parquet' WHERE event_id = 0`.
    graft.catalog.Tables.register(spark, TestSpark.sfDir)
    val got = spark.table("events")
      .where(org.apache.spark.sql.functions.col("event_id") === 0L)
      .select(graft.ext.Events.epochUs(
        org.apache.spark.sql.functions.col("ts")).as("us"))
      .collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 1704067798778549L,
      s"events.ts semantic drift: event_id=0 reads as ${got.head.getLong(0)} µs, " +
        "expected 1704067798778549 (2024-01-01 00:09:58.778549 UTC)")
  }

  test("every query has an oracle or is a documented no-oracle exception") {
    // A queries entry without an oracleSql twin gets only a weak
    // rows>0 check from the driver; keep the exception list explicit
    // so new queries can't silently skip the DuckDB compare.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set("q_profile_approx", "q_sketch_rollup", "q_compression")
    assert(noOracle == documented,
      s"undocumented oracle-less queries: ${(noOracle -- documented).toSeq.sorted.mkString(", ")}; " +
        s"stale exceptions: ${(documented -- noOracle).toSeq.sorted.mkString(", ")}")
  }
}
