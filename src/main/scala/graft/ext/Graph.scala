package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over candidate-pair graphs — the ranking
  * companion of [[Dedup.connectedComponents]]' clustering.
  *
  * The pipeline motivation: near-dup CLUSTERS say which documents are
  * interchangeable; within a big cluster the keep/drop decision wants
  * a centrality signal (the most-connected member is the "canonical"
  * version all the others approximate — mirrors / re-posts / partial
  * copies point at it). PageRank over the pair graph is that signal,
  * and the same operator ranks any link-shaped relation (domain
  * graphs for crawl prioritization, citation graphs).
  *
  * Cross-engine determinism (SURVEY.md §8.3): ranks live in EXACT
  * scale-9 integer units (`rank_u` = rank × 10⁹ as BIGINT). Every
  * per-edge contribution is an integer floor division (`ru div deg`),
  * the damping step is integer `(85 · Σ) div 100`, and sums of longs
  * are exact under any partitioning — no double accumulates anywhere
  * in the loop, so the result is bit-identical in any engine that
  * floors positive integer division (Spark `div` ≙ DuckDB `//`).
  * The deliberately-dropped division remainders are the price of
  * determinism and are identical in both engines.
  *
  * Scale shape: the edge set is materialized once (the candidate
  * generation upstream — MinHash/LSH — is never re-derived per
  * round, Dedup.scala §8.4 rule 8); each iteration is ONE equi-join
  * (edges ⋈ ranks on src) + one map-side-combined sum by dst + one
  * broadcast-class join back to the node list. Loop state is
  * [[Dedup.materialize]]d every round (fresh leaf — rule 15). Work per
  * round scales with |edges|, not |corpus|: a pair graph scales with
  * duplicates, and a domain graph with domains.
  */
object Graph {

  /** Damped PageRank (d = 0.85, the classic constant, expressed as
    * the exact rational 85/100) over an UNDIRECTED pair graph given
    * as unique (srcCol < dstCol) pairs — each pair becomes two
    * directed edges. Every node of the symmetrized graph has
    * in-degree ≥ 1 and out-degree ≥ 1, so no dangling-mass handling
    * is needed (for general directed graphs a dangling node's mass
    * is dropped, the classic map-reduce formulation).
    *
    * Returns one row per edge-connected node:
    * (node, rank_u, rank) — `rank_u` the exact scale-9 integer rank,
    * `rank` its double rendering (single exact division, tie-safe).
    * Ranks start uniform at (10⁹ div N) and iterate
    * `jump + d · Σ_in (rank div deg)` for `iters` rounds.
    */
  def pageRank(pairs: DataFrame, iters: Int = 5,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val sym = Dedup.materialize(
      pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .union(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst"))))
    val deg = Dedup.materialize(
      sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    // N is one driver scalar (same posture as connectedComponents'
    // regime probe) — the init and jump terms become literals shared
    // bit-for-bit with the oracle's scalar subqueries
    val n = deg.count()
    val initU = 1000000000L / math.max(n, 1L)
    val jumpU = 150000000L / math.max(n, 1L)
    var ranks = Dedup.materialize(
      deg.select(col("node"), col("deg"), lit(initU).as("ru")))
    for (_ <- 0 until iters) {
      val sums = sym.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("ru div deg").as("cu"))
        .groupBy("dst").agg(sum(col("cu")).as("su"))
      ranks = Dedup.materialize(
        deg.join(sums, col("node") === col("dst"), "left")
          .select(col("node"), col("deg"),
            (lit(jumpU) + expr("(85 * coalesce(su, 0L)) div 100")).as("ru")))
    }
    ranks.select(col("node"), col("ru").as("rank_u"),
      round(col("ru") / lit(1000000000.0), 9).as("rank"))
  }
}
