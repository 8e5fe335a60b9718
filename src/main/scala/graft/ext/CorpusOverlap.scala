package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feed-redundancy audit: pairwise n-gram Jaccard between SOURCES
  * (or any corpus dimension) — which feeds are mirrors, scrapes, or
  * substantially overlapping, BEFORE document-level dedup spends its
  * budget on them. A high-overlap source pair is the earliest
  * deduplicate-at-the-feed-level signal a pipeline gets, and the
  * matrix also drives mixture decisions (two near-identical feeds
  * should not both keep full weight).
  *
  * Semantics: per dimension value, the DISTINCT set of word n-grams
  * across all its documents; for every pair (a < b),
  * J = |A ∩ B| / (|A| + |B| − |A ∩ B|) over exact integer set sizes,
  * rounded at 5 for display. Pairs with NO common shingle are absent
  * from the output (the intersection meet is an inner join) — at
  * scale the interesting rows are the overlapping few, not the
  * all-pairs-zero matrix.
  *
  * Scale shape: one (dim, shingle)-distinct aggregate; set sizes are
  * a dim-sized roll-up; the intersection comes from a SHINGLE-KEYED
  * self-meet whose per-shingle output is bounded by C(|dims|, 2) —
  * the dimension domain (sources, languages) is configuration-class,
  * so the meet never explodes even when a boilerplate shingle appears
  * in every feed. Nothing is quadratic in the corpus.
  */
object CorpusOverlap {

  def sourceOverlap(df: DataFrame, n: Int = 3, dimCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val sh = Dedup.spread(df, textCol)
      .select(col(dimCol).as("dim"),
        explode_outer(Dedup.shingles(TextStats.tokens(col(textCol)), n))
          .as("gram"))
      .filter(col("gram").isNotNull)
      .distinct()
    val sizes = sh.groupBy("dim").agg(count(lit(1)).as("n_grams"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.gram") === col("b.gram") && col("a.dim") < col("b.dim"))
      .groupBy(col("a.dim").as("dim_a"), col("b.dim").as("dim_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("dim").as("dim_a"),
        col("n_grams").as("n_a"))), "dim_a")
      .join(broadcast(sizes.select(col("dim").as("dim_b"),
        col("n_grams").as("n_b"))), "dim_b")
      .select(col("dim_a"), col("dim_b"), col("n_a"), col("n_b"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 5)
          .as("jaccard"))
      .orderBy("dim_a", "dim_b")
  }
}
