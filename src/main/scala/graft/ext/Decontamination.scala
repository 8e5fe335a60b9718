package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Held-out-set decontamination — pipeline extension (SURVEY.md §7.5;
  * the reference has no training-data surface). Before training, any
  * document that shares an n-gram with the evaluation/held-out set
  * must be dropped from the training corpus, otherwise benchmark
  * numbers measure memorization (the n-gram-overlap rule used by the
  * GPT-3 and PaLM data pipelines).
  *
  * Scale shape: the held-out side is reduced to its DISTINCT shingle
  * set once (eval sets are tiny next to the corpus — the join side
  * Spark will broadcast; at worst it is a uniform shingle-keyed
  * shuffle), the train side streams through an explode, and
  * contamination is one equi-join on the shingle — no similarity
  * scoring, no candidate pairs, nothing quadratic. The report
  * aggregates hit counts per train doc (map-side combined); the
  * decontaminate step is a left-anti join on doc id.
  */
object Decontamination {

  /** Per-document contamination report over the train corpus:
    * one row per CONTAMINATED train doc — (idCol, `n_hits`) where
    * n_hits = how many of the doc's distinct n-gram shingles occur
    * anywhere in the held-out set. Clean docs are absent.
    */
  def contaminationReport(train: DataFrame, heldOut: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // explode_outer + isNotNull, not explode: InferFiltersFromGenerate
    // would otherwise push `size(shingles(...)) > 0` into the scan and
    // re-run the whole tokenize/shingle pipeline as a filter
    // (SURVEY.md §8.4 rule 2)
    val trainShingles = Dedup.withShingleSet(train, n, textCol, "__sh")
      .select(col(idCol), explode_outer(col("__sh")).as("shingle"))
      .filter(col("shingle").isNotNull)
    val heldOutShingles = Dedup.withShingleSet(heldOut, n, textCol, "__sh")
      .select(explode_outer(col("__sh")).as("shingle"))
      .filter(col("shingle").isNotNull)
      .distinct()
    // per-doc shingle arrays are distinct (array_distinct) and the
    // held-out side is deduped, so the join emits each (doc, shingle)
    // hit at most once — count(*) IS the distinct-hit count
    trainShingles.join(heldOutShingles, "shingle")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
  }

  /** The training corpus minus every contaminated document — the rows
    * of `train` whose id does not appear in [[contaminationReport]].
    */
  def decontaminate(train: DataFrame, heldOut: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    train.join(
      contaminationReport(train, heldOut, n, idCol, textCol).select(idCol),
      Seq(idCol), "left_anti")

  /** GRADED contamination — one row per train doc (clean docs
    * included) with the FRACTION of its distinct shingles that occur
    * in the held-out set: `(idCol, n_shingles, n_hits, contamination,
    * flagged)`. The binary any-hit rule ([[contaminationReport]])
    * over-drops at web scale — a long document sharing one 3-gram
    * with an eval question is noise, not leakage — so production
    * pipelines (PaLM's 70%-of-8-grams rule is the published example)
    * threshold on the OVERLAP FRACTION instead.
    *
    * Same scale shape as the report: the shingle set per doc is
    * computed once and reused for both the denominator (`size`) and
    * the equi-join numerator; nothing quadratic, hit counting is
    * map-side combinable. The fraction is a single a/b double
    * division (tie-safe, SURVEY §8.3 rule 4).
    */
  def contaminationFraction(train: DataFrame, heldOut: DataFrame,
      n: Int = 3, threshold: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val trainSh = Dedup.withShingleSet(train, n, textCol, "__sh")
      .select(col(idCol), col("__sh"))
    val hits = trainSh
      .select(col(idCol), explode_outer(col("__sh")).as("shingle"))
      .filter(col("shingle").isNotNull)
      .join(
        Dedup.withShingleSet(heldOut, n, textCol, "__sh")
          .select(explode_outer(col("__sh")).as("shingle"))
          .filter(col("shingle").isNotNull)
          .distinct(),
        "shingle")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    trainSh
      .select(col(idCol), size(col("__sh")).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contamination",
        when(col("n_shingles") > 0,
          round(col("n_hits").cast("double") / col("n_shingles").cast("double"), 5))
          .otherwise(lit(0.0)))
      .withColumn("flagged", col("contamination") >= threshold)
  }

  /** Exact canary-string scan: find every occurrence of each literal
    * `canaries` string inside the corpus — the benchmark-canary /
    * secret-leak audit that the shingle-based [[contaminationReport]]
    * cannot do (shingles tokenize; a canary must match EXACTLY,
    * crossing token boundaries, punctuation and all). Returns one row
    * per (doc, canary) HIT: (idCol, canary, first_pos 1-based,
    * n_occurrences), (doc, canary) order; clean docs are absent.
    *
    * Determinism: positions and the occurrence count are exact
    * integers (count via the replace-length identity
    * (len(t) − len(replace(t, c, ''))) / len(c) — no regex, so canary
    * text never needs escaping).
    *
    * Scale shape: MAP-ONLY — the canary list is an in-plan literal
    * array (one row per doc×canary inside codegen, no join, no
    * shuffle); at 100 TB the cost is the scan itself, and the output
    * is bounded by the hit count.
    */
  def canaryScan(train: DataFrame, canaries: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(canaries.nonEmpty, "need at least one canary string")
    require(canaries.forall(_.nonEmpty), "canaries must be non-empty")
    train
      .select(col(idCol), col(textCol).as("__t"),
        explode(array(canaries.map(lit): _*)).as("canary"))
      .withColumn("first_pos", expr("instr(__t, canary)").cast("long"))
      .filter(col("first_pos") > 0)
      .select(col(idCol), col("canary"), col("first_pos"),
        expr("(length(__t) - length(replace(__t, canary, ''))) div " +
          "length(canary)").cast("long").as("n_occurrences"))
      .orderBy(idCol, "canary")
  }
}
