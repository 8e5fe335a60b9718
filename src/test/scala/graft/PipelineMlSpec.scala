package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Tables
import graft.ext.{Bpe, Classify, Curation, Graph, Importance, Sampling, Similarity}

/** Specs for the round-4 ML-adjacent pipeline operators: PageRank
  * graph centrality, Naive Bayes classification, product
  * quantization, and BPE merge learning.
  */
class PipelineMlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = {
    Tables.register(spark, TestSpark.sfDir)
    spark.table("embeddings")
  }

  // ---- Graph.pageRank ----

  test("pageRank: single edge → both nodes hold exactly half the mass") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Graph.pageRank(pairs, iters = 5).orderBy("node").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // N=2: init 5e8 each; each round 75e6 + 85%·5e8 = 5e8 — stationary
    assert(out.forall(_.getLong(1) == 500000000L))
    assert(out.forall(_.getDouble(2) == 0.5))
  }

  test("pageRank: path graph centers mass; matches integer brute force") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Graph.pageRank(pairs, iters = 5).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // reference: same integer recurrence on the driver
    val sym = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L)
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    var ru = deg.keys.map(k => k -> 1000000000L / n).toMap
    for (_ <- 0 until 5) {
      val sums = sym.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ru(s) / deg(s) }.sum).toMap
      ru = deg.keys.map(k =>
        k -> (150000000L / n + 85L * sums.getOrElse(k, 0L) / 100L)).toMap
    }
    assert(got == ru.toSeq.sortBy(_._1))
    val center = got.find(_._1 == 2L).get._2
    assert(got.filter(_._1 != 2L).forall(_._2 < center))
  }

  test("personalizedPageRank: all-seed run IS plain pageRank; seed proximity ranks") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    // seeding EVERY node reduces the recurrence to plain pageRank
    val allSeeds = Seq(1L, 2L, 3L, 4L).toDF("node")
    val ppr = Graph.personalizedPageRank(pairs, allSeeds, iters = 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val pr = Graph.pageRank(pairs, iters = 4).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ppr == pr)

    // path 1-2-3-4 seeded at 1: a path is BIPARTITE, so synchronous
    // rounds oscillate between the parity classes ({1,3} vs {2,4})
    // and cross-parity rank order is iteration-parity-dependent —
    // proximity ordering only holds WITHIN a parity class. Assert
    // that, plus the seed flag marking exactly node 1.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Graph.personalizedPageRank(path, Seq(1L).toDF("node"),
        iters = 6).orderBy("node").collect()
    val rank = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.filter(_.getBoolean(1)).map(_.getLong(0)).toSeq == Seq(1L))
    assert(rank(1L) > rank(3L) && rank(2L) > rank(4L),
      s"within-parity proximity order violated: $rank")
    // a seed disconnected from the graph contributes nothing
    val withGhost = Graph.personalizedPageRank(path,
      Seq(1L, 99L).toDF("node"), iters = 6).orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(withGhost == rank, "disconnected seed must be a no-op")
  }

  test("pageRank is partitioning-independent") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    val a = Graph.pageRank(pairs.repartition(1), iters = 4)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(pairs.repartition(7), iters = 4)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  // ---- Events.decayedSum ----

  test("decayedSum: half-life halves a contribution; future events excluded") {
    import org.apache.spark.sql.functions.{expr, lit}
    val ref = 1706745600000000L // 2024-02-01T00:00:00Z
    val day = 86400000000L
    val df = Seq(
      (1L, ref, 10.0),            // age 0 → factor 1
      (1L, ref - 7 * day, 10.0),  // age = half-life → factor 0.5
      (1L, ref + day, 99.0),      // future → excluded
      (2L, ref - 14 * day, 8.0))  // two half-lives → 0.25
      .toDF("user_id", "us", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val out = graft.ext.Events.decayedSum(df, ref, halfLifeDays = 7.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((2L, 15.0)))
    assert(out(2L) == ((1L, 2.0)))
    // partitioning-independence (decimal accumulation)
    val alt = graft.ext.Events.decayedSum(df.repartition(7), ref, 7.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(alt == out)
  }

  // ---- Curation.verdictBreakdown ----

  test("verdictBreakdown partitions every document into kept-or-reason per dimension") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents")
    val verdicts = Curation.curateFull(docs)
    val out = Curation.verdictBreakdown(verdicts, docs, "source").collect()
    assert(out.map(_.getLong(2)).sum == docs.count(), "counts must partition the corpus")
    val verdictsSeen = out.map(_.getString(1)).toSet
    assert(verdictsSeen.contains("kept"))
    assert(verdictsSeen.subsetOf(Set("kept", "near_duplicate", "too_short",
      "low_quality", "repetitive", "high_oov")))
  }

  // ---- Quantiles.madOutliers ----

  test("madOutliers: spike flagged; constant-mode group survives where IQR collapses") {
    import graft.ext.Quantiles
    // group a: >50% identical values → MAD degenerates to 0 and every
    // off-mode point is flagged (the documented breakdown boundary).
    // group b: under half identical → MAD > 0 and only the genuine
    // spike crosses k·1.4826·MAD.
    val df = (Seq.fill(20)(("a", 10.0)) ++ Seq(("a", 10.5), ("a", 1000.0)) ++
      Seq.fill(7)(("b", 5.0)) ++ Seq.fill(3)(("b", 5.1)) ++
      Seq.fill(3)(("b", 5.2)) ++ Seq(("b", 400.0)))
      .toDF("g", "v")
    val out = Quantiles.madOutliers(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3), r.getLong(4))).toMap
    assert(out("a") == ((22L, 0.0, 2L)), s"MAD-0 group flags all off-mode points: $out")
    assert(out("b")._2 > 0.0, s"diverse group keeps MAD > 0: $out")
    assert(out("b")._3 == 1L, s"only the spike flagged in the diverse group: $out")
    // determinism across partitionings
    val alt = Quantiles.madOutliers(df.repartition(7), "g", "v")
      .orderBy("g").collect().toSeq
    assert(alt == Quantiles.madOutliers(df.repartition(1), "g", "v")
      .orderBy("g").collect().toSeq)
  }

  // ---- Sampling.splitByCluster ----

  test("splitByCluster: near-duplicates can never straddle the split") {
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, near),
      (2L, near + " today"),            // near-dup of 1 → same cluster
      (3L, "completely unrelated text about database engines and joins"),
      (4L, "another distinct document mentioning graphs and triangles"))
      .toDF("doc_id", "text")
    val out = Sampling.splitByCluster(df, testFraction = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L)._1 == out(2L)._1, "near-dups must share a cluster")
    assert(out(1L)._2 == out(2L)._2, "near-dups must land on the same side")
    // determinism: a pure function of (corpus, salt)
    val again = Sampling.splitByCluster(df, testFraction = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again == out)
  }

  // ---- Curation.perplexityBuckets ----

  test("perplexityBuckets: per-language terciles, typical docs head, rare-token docs tail") {
    // lang x: 3 docs of increasingly rare vocabulary; lang y: one doc
    // (its own tercile — buckets stay per-language); one empty doc
    val df = Seq(
      (1L, "the the the the", "x"),     // most typical → lowest ce
      (2L, "the the cat sat", "x"),
      (3L, "zyx qwv jkl pqr", "x"),     // all-hapax → highest ce
      (4L, "solo doc here", "y"),
      (5L, "", "x")).toDF("doc_id", "text", "lang")
    val out = Curation.perplexityBuckets(df).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getString(4))).toMap
    assert(out(1L)._2 == "head")
    assert(out(3L)._2 == "tail")
    assert(out(5L)._2 == "empty")
    assert(out(1L)._1 < out(2L)._1 && out(2L)._1 < out(3L)._1)
    // a single-doc language sits at its own tercile boundary → head
    assert(out(4L)._2 == "head")
  }

  // ---- Bpe.fertility ----

  test("fertility: merged-pair language encodes at 1 piece/word, unmerged at char level") {
    // 1 round merges the most frequent pair (a,b); 'ab' words collapse
    // to one piece while 'cd' stays two characters
    val df = Seq((1L, "ab ab", "aa"), (2L, "cd", "bb"))
      .toDF("doc_id", "text", "lang")
    val out = Bpe.fertility(df, rounds = 1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(out("aa") == ((2L, 2L, 4L, 1.0, 2.0)))
    assert(out("bb") == ((1L, 2L, 2L, 2.0, 1.0)))
  }

  // ---- Importance (DSIR) ----

  test("importanceWeights: target-like docs score above pool-like docs; empty doc is 0") {
    val raw = Seq(
      (1L, "alpha beta alpha gamma"),   // target vocabulary
      (2L, "zeta eta theta iota"),      // pool-only vocabulary
      (3L, "")).toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val w = Importance.importanceWeights(raw, target).orderBy("doc_id").collect()
    assert(w.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = w.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byId(1L)._2 > byId(2L)._2,
      s"target-vocabulary doc must outscore pool-only doc: $byId")
    assert(byId(1L)._2 > 0 && byId(2L)._2 < 0)
    assert(byId(3L) == (0L, 0.0))
  }

  test("dsirResample: deterministic, ranked 1..k, favors heavy weights") {
    val raw = (1L to 40L).map { i =>
      // docs 1..20 speak the target vocabulary, 21..40 a disjoint one
      if (i <= 20) (i, "alpha beta gamma delta alpha")
      else (i, "zeta eta theta iota kappa")
    }.toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val a = Importance.dsirResample(raw, target, k = 10).orderBy("rank").collect()
    val b = Importance.dsirResample(raw, target, k = 10).orderBy("rank").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // pure function of (corpus, salt)
    assert(a.map(_.getInt(4)).toSeq == (1 to 10))
    // Gumbel noise spans a few units; the two weight classes differ by
    // ~2·ln-range, so the selection must lean heavily target-like
    val nTargetLike = a.count(_.getLong(0) <= 20L)
    assert(nTargetLike >= 7, s"expected mostly target-like picks, got $nTargetLike/10")
    // different salt ⇒ (almost surely) different key order
    val c = Importance.dsirResample(raw, target, k = 10, salt = "other")
      .orderBy("rank").collect()
    assert(c.map(_.getDouble(3)).toSeq != a.map(_.getDouble(3)).toSeq)
  }

  // ---- Sampling.shuffleOrder ----

  test("shuffleOrder: two-phase global_pos equals the naive md5 total order") {
    val df = (0L until 300L).toDF("doc_id")
    val got = Sampling.shuffleOrder(df, shards = 16, salt = "s1")
      .orderBy("global_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // driver brute force: rank by (md5("s1|id"), id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s1|$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expect = (0L until 300L).map(id => (h(id), id)).sorted.map(_._2)
    assert(got.map(_._1).toSeq == expect)
    assert(got.map(_._4).toSeq == (0L until 300L)) // dense 0-based positions
    // shards are contiguous ranges of the global order
    val shardSeq = got.map(_._2).toSeq
    assert(shardSeq == shardSeq.sorted, "shards must be contiguous in hash order")
    // within-shard positions are dense from 0
    got.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length))
    }
  }

  test("shuffleOrder is partitioning-independent and salt-sensitive") {
    val df = (0L until 200L).toDF("doc_id")
    val a = Sampling.shuffleOrder(df.repartition(1), shards = 8, salt = "x")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Sampling.shuffleOrder(df.repartition(7), shards = 8, salt = "x")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    val c = Sampling.shuffleOrder(df, shards = 8, salt = "y")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(c != a)
  }

  // ---- Similarity.annRecall ----

  test("annRecall: monotone nondecreasing in nprobe, exactly 1.0 at nprobe = nlist") {
    val e = emb
    val out = Similarity.annRecall(e, e.filter(col("vec_id") < 5), k = 10,
      nlist = 16, nprobes = Seq(1, 2, 4, 16)).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 16))
    val recalls = out.map(_.getDouble(3)).toSeq
    assert(recalls.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true },
      s"recall not monotone: $recalls")
    // nprobe = nlist probes every cell → the candidate set IS the
    // brute-force set (identical rounded-score/neighbor-id ranking)
    assert(recalls.last == 1.0)
    // denominator is the same truth relation in every row
    assert(out.map(_.getLong(2)).distinct.length == 1)
    assert(out.forall(r => r.getLong(1) <= r.getLong(2)))
  }

  test("rankingQuality: perfect metrics at nprobe = nlist") {
    val e = emb
    val out = graft.ext.Eval.rankingQuality(e, e.filter(col("vec_id") < 5),
      k = 10, nlist = 16, nprobe = 16).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "all truth items retrieved")
      assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 &&
        r.getDouble(5) == 1.0, s"perfect run must score 1.0: $r")
    }
  }

  test("rankingQuality: metrics equal a driver recomputation from run + truth") {
    val e = emb
    val q = e.filter(col("vec_id") < 5)
    val run = Similarity.ivfTopK(e, q, k = 10, nlist = 16, nprobe = 2)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val truth = Similarity.topK(e, q, k = 10)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toMap).toMap
    def q9(x: Double) = BigDecimal.valueOf(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r5(x: Double) = BigDecimal.valueOf(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.ext.Eval.rankingQuality(e, q, k = 10, nlist = 16,
      nprobe = 2).collect()
    assert(got.length == 5)
    got.foreach { r =>
      val qid = r.getLong(0)
      val t = truth(qid)
      val rr = run.filter(_._1 == qid).sortBy(_._3)
      val hits = rr.filter(x => t.contains(x._2))
      val nTruth = t.size
      // mrr / AP / nDCG exactly as the operator defines them
      val mrr = hits.headOption.map(h => r5(1.0 / h._3)).getOrElse(0.0)
      var cum = 0
      var aps = BigDecimal(0)
      var dcg = BigDecimal(0)
      rr.foreach { case (_, nid, pos) =>
        if (t.contains(nid)) {
          cum += 1
          aps += q9(cum.toDouble / pos)
          dcg += q9((11 - t(nid)).toDouble / math.log(pos + 1.0))
        }
      }
      val idcg = t.values.map(tr =>
        q9((11 - tr).toDouble / math.log(tr + 1.0))).sum
      assert(r.getLong(1) == hits.length.toLong && r.getLong(2) == nTruth)
      assert(r.getDouble(3) == mrr, s"mrr mismatch for query $qid")
      assert(r.getDouble(4) == r5(aps.toDouble / nTruth),
        s"avg_precision mismatch for query $qid")
      assert(r.getDouble(5) == r5(dcg.toDouble / idcg.toDouble),
        s"ndcg mismatch for query $qid")
    }
  }

  test("sourceOverlap: mirrors score 1.0, partial overlap in between, disjoint absent") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon", "mirror1"),
      (2L, "alpha beta gamma delta epsilon", "mirror2"),   // exact mirror
      (3L, "alpha beta gamma zeta eta",      "partial"),   // shares a prefix
      (4L, "one two three four five",        "disjoint"))  // no common shingle
      .toDF("doc_id", "text", "source")
    val out = graft.ext.CorpusOverlap.sourceOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(out(("mirror1", "mirror2")) == 1.0)
    val p = out(("mirror1", "partial"))
    assert(p > 0.0 && p < 1.0, s"partial overlap must be strictly between: $p")
    // disjoint pairs have no common shingle and are absent by design
    assert(!out.keySet.exists(k => k._1 == "disjoint" || k._2 == "disjoint"))
  }

  test("crossLingualPairs keeps only cross-language near-dups") {
    // two near-identical directions: (1,2) cross-lang, (3,4) same-lang
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.1f, 0.99f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val docs = Seq((1L, "en"), (2L, "fr"), (3L, "de"), (4L, "de"), (5L, "es"))
      .toDF("doc_id", "lang")
    val got = Similarity.crossLingualPairs(emb, docs, threshold = 0.9,
        nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 2L, "en", "fr")),
      s"expected only the cross-lang pair, got ${got.toSeq}")
  }

  test("residual PQ shrinks reconstruction error on CLUSTERED data") {
    // the operator's reason to exist: when the coarse quantizer
    // explains cell-level structure, residuals have far less variance
    // than raw vectors, so the same codebook quantizes them more
    // accurately. (On data with NO cluster structure — like the
    // synthetic near-random fixture embeddings — residual v − c can
    // carry MORE energy than v and residual encoding loses; that
    // boundary is why FAISS exposes both by_residual modes.)
    // 32 dense random cluster centers — MORE clusters than the ksub=16
    // codebook can memorize, so flat PQ must leave most sub-vector
    // directions uncovered; residuals are tiny shared-distribution
    // noise the same codebook captures almost fully. (With FEW tight
    // clusters flat PQ memorizes them outright and residual loses —
    // the first version of this fixture demonstrated exactly that.)
    val rng = new scala.util.Random(7)
    val dims = 64
    val centers = Array.fill(32)(Array.fill(dims)(rng.nextFloat() - 0.5f))
    val rows = (0 until 32).flatMap { c =>
      (0 until 8).map { i =>
        val v = centers(c).map(_ + (rng.nextFloat() - 0.5f) * 0.04f)
        ((c * 8 + i).toLong, v)
      }
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val nc = Similarity.normalized(clustered)
    val cents = Similarity.ivfCentroids(nc, 32)
    val resid = Similarity.ivfAssign(nc, cents, 1)
      .join(broadcast(cents), "centroid_id")
      .select(col("vec_id"),
        zip_with(col("embedding"), col("centroid_vec"), (a, b) => a - b)
          .as("embedding"))
    def totalErr(df: org.apache.spark.sql.DataFrame): Double =
      Similarity.pqEncode(df, m = 4, ksub = 16, dims = dims)
        .agg(sum(col("sq_dist")).cast("double")).head().getDouble(0)
    val flatErr = totalErr(nc)
    val residErr = totalErr(resid)
    assert(residErr < flatErr,
      s"residual encoding must shrink error on clustered data: $residErr >= $flatErr")
    // the search over the fixture: k ranked rows per query, rank dense
    val out = Similarity.ivfPqResidualTopK(emb, emb.filter(col("vec_id") < 5),
      k = 10, nlist = 16, nprobe = 4).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("annRecallPq: ADC recall never exceeds exact-scored IVF recall at any nprobe") {
    // identical candidate sets per nprobe; IVF's exact scoring
    // recovers every truth member among them, ADC can misrank some out
    val e = emb
    val q = e.filter(col("vec_id") < 5)
    val ivf = Similarity.annRecall(e, q, k = 10, nlist = 16,
      nprobes = Seq(1, 4, 16)).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val pq = Similarity.annRecallPq(e, q, k = 10, nlist = 16,
      nprobes = Seq(1, 4, 16)).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(pq.keySet == ivf.keySet)
    for ((np, r) <- pq) {
      assert(r >= 0.0 && r <= 1.0)
      assert(r <= ivf(np) + 1e-9,
        s"PQ recall $r exceeds IVF recall ${ivf(np)} at nprobe=$np")
    }
  }

  // ---- Graph.triangleCounts (hub-degree cap) ----

  /** Driver brute force: triangle corner counts over a (a < b) edge
    * list with each node's forward adjacency capped to its `cap`
    * smallest neighbors — the exact semantics the operator promises.
    */
  private def bruteTriangles(edges: Seq[(Long, Long)], cap: Int): Map[Long, Long] = {
    val capped = edges.groupBy(_._1).toSeq.flatMap { case (a, es) =>
      es.map(_._2).sorted.take(cap).map(a -> _)
    }
    val adj = capped.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, b) <- capped; c <- adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty)) {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    counts.toMap
  }

  test("triangleCounts: K4 — every node sits on 3 of the 4 triangles") {
    val k4 = (for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(k4).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangleCounts hub cap: counts the capped subgraph exactly, matches brute force") {
    // power-law shape: hub 0 → 1..50, plus ring edges (i, i+1) closing
    // a triangle (0, i, i+1) at every step — 49 triangles uncapped
    val edges = (1L to 50L).map(0L -> _) ++ (1L until 50L).map(i => i -> (i + 1))
    val df = edges.toDF("id_a", "id_b")
    val uncapped = Graph.triangleCounts(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uncapped(0L) == 49L)
    // cap 10: hub keeps neighbors 1..10 → ring triangles survive for
    // i = 1..9 only; every other node's degree is under the cap
    val capped = Graph.triangleCounts(df, maxDegree = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped(0L) == 9L)
    assert(capped == bruteTriangles(edges, 10))
  }

  test("triangleCounts hub cap: unchanged counts when all degrees are within the cap") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val df = edges.toDF("id_a", "id_b")
    val uncapped = Graph.triangleCounts(df).orderBy("node").collect().toSeq
    val capped = Graph.triangleCounts(df, maxDegree = 16).orderBy("node").collect().toSeq
    assert(capped == uncapped)
  }

  test("triangleCounts hub cap plans as WindowGroupLimit — hub state bounded pre-shuffle") {
    val df = (1L to 50L).map(0L -> _).toDF("id_a", "id_b")
    val plan = Graph.triangleCounts(df, maxDegree = 5,
      broadcastAdjacency = Some(true)).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"degree-cap rank filter not pushed into WindowGroupLimit:\n$plan")
  }

  test("triangleCounts: pinned broadcast regime skips the count probe and agrees") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L))
    val df = edges.toDF("id_a", "id_b")
    val probed = Graph.triangleCounts(df).orderBy("node").collect().toSeq
    val pinnedB = Graph.triangleCounts(df, broadcastAdjacency = Some(true))
      .orderBy("node").collect().toSeq
    val pinnedS = Graph.triangleCounts(df, broadcastAdjacency = Some(false))
      .orderBy("node").collect().toSeq
    assert(pinnedB == probed && pinnedS == probed)
  }

  // ---- Classify (Naive Bayes) ----

  test("naive Bayes self-train separates distinctive vocabularies") {
    val df = Seq(
      (1L, "hund katze maus hund", "de"),
      (2L, "katze hund vogel", "de"),
      (3L, "dog cat mouse dog", "en"),
      (4L, "cat dog bird", "en")).toDF("doc_id", "text", "lang")
    val pred = Classify.nbPredict(df).orderBy("doc_id").collect()
    assert(pred.forall(r => r.getString(2) == r.getString(1)))
  }

  test("naive Bayes: zero-token doc predicts NULL; class tie breaks low") {
    val df = Seq(
      (1L, "w w", "xx"),
      (2L, "w w", "yy"),
      (3L, "", "xx")).toDF("doc_id", "text", "lang")
    val pred = Classify.nbPredict(df).orderBy("doc_id").collect()
    // docs 1/2: both classes perfectly symmetric → exact decimal tie →
    // lexicographically first label wins in both engines
    assert(pred(0).getString(2) == "xx" && pred(1).getString(2) == "xx")
    assert(pred(2).isNullAt(2))
  }

  test("naive Bayes confusion matrix counts every document once") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents")
    val cm = Classify.nbConfusion(docs)
    assert(cm.agg(sum("n_docs")).head.getLong(0) == docs.count())
  }

  // ---- Similarity PQ ----

  test("pqEncode: m codes per vector, codes in range, codebook rows self-encode") {
    val codes = Similarity.pqEncode(emb, m = 4, ksub = 16, dims = 64)
    val n = emb.count()
    assert(codes.count() == 4 * n)
    assert(codes.filter(col("code") < 0 || col("code") >= 16).isEmpty)
    // the ksub sampled rows ARE the codebook: their sub-vectors sit at
    // zero distance from their own centroid in every subspace
    val sampled = emb
      .select(col("vec_id"), md5(col("vec_id").cast("string")).as("h"))
      .orderBy("h", "vec_id").limit(16).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val own = codes.filter(col("vec_id").isin(sampled.toSeq: _*))
    assert(own.filter(col("sq_dist") =!= 0.0).isEmpty)
  }

  test("pqAdcTopK: dense ranks ordered by ADC, partitioning-independent") {
    val q = emb.filter(col("vec_id") < 3)
    val a = Similarity.pqAdcTopK(emb.repartition(1), q, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val b = Similarity.pqAdcTopK(emb.repartition(7), q, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).toSeq == (1 to 5))
      val dists = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(dists == dists.sorted)
    }
  }

  test("ivfPqTopK: ADC values agree with the full-PQ scorer on shared pairs") {
    val q = emb.filter(col("vec_id") < 3)
    val nc = Similarity.normalized(emb)
    val nq = Similarity.normalized(q)
    // reference: ADC against the WHOLE corpus in the same normalized
    // space (huge k → every pair scored)
    val full = Similarity.pqAdcTopK(nc, nq, k = 100000)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val pruned = Similarity.ivfPqTopK(emb, q, k = 5).collect()
    assert(pruned.nonEmpty)
    pruned.foreach { r =>
      assert(full((r.getLong(0), r.getLong(1))) == r.getDouble(2))
    }
    val alt = Similarity.ivfPqTopK(emb.repartition(7), q, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(alt == pruned.sortBy(r => (r.getLong(0), r.getInt(3))).toSeq)
  }

  // ---- Curation.blocklistReport ----

  test("blocklist: occurrence counts, sorted audit array, keep verdicts") {
    val df = Seq(
      (1L, "buy now buy now please"),
      (2L, "all clean text here"),
      (3L, "")).toDF("doc_id", "text")
    val out = Curation.blocklistReport(df, Seq("buy now", "please"))
      .orderBy("doc_id").collect()
    // doc 1: bigram occurrences "buy now" ×2 + unigram "please" ×1
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 2L)
    assert(out(0).getSeq[String](3) == Seq("buy now", "please"))
    assert(!out(0).getBoolean(4))
    assert(out(1).getBoolean(4) && out(1).getLong(1) == 0L
      && out(1).getSeq[String](3).isEmpty)
    assert(out(2).getBoolean(4)) // empty doc matches nothing
  }

  // ---- Bpe ----

  test("pairCounts: overlapping pairs count per position, freq-weighted") {
    val words = Seq((1L, "aaa"), (2L, "aaa"), (3L, "ab"))
      .toDF("doc_id", "text")
    val pc = Bpe.pairCounts(Bpe.wordSymbols(words))
      .orderBy("sym_a", "sym_b").collect()
    // "aaa" ×2 → (a,a) twice per occurrence = 4; "ab" → (a,b) = 1
    assert(pc.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == Seq(("a", "a", 4L), ("a", "b", 1L)))
  }

  test("applyMerge replays greedy left-to-right byte-pair merging") {
    def mergeRef(sym: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < sym.length) {
        if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += sym(i); i += 1 }
      }
      out.toSeq
    }
    val raw = Seq("aaa", "abab", "aab", "baa", "xay", "", "a")
    val df = raw.zipWithIndex.map { case (w, i) => (i.toLong, w, 1L) }
      .toDF("id", "word", "freq")
      .withColumn("s", Bpe.charSymbols(col("word")))
    for ((a, b) <- Seq(("a", "a"), ("a", "b"), ("b", "a"))) {
      val got = Bpe.applyMerge(df, a, b).orderBy("id")
        .select("s").collect().map(_.getSeq[String](0))
      val want = raw.map(w => mergeRef(w.map(_.toString), a, b))
      assert(got.toSeq == want, s"merge ($a,$b)")
    }
  }

  test("learnMerges: ranked rounds on a crafted corpus, early exhaustion") {
    val df = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(df, rounds = 5).orderBy("round").collect()
    // round 1: (a,b) ×3; round 2: (c,d) ×1; then no pairs remain
    assert(m.length == 2)
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(3)) == ("a", "b", 3L))
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(3)) == ("c", "d", 1L))
  }

  test("learnMerges is partitioning-independent on real docs") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents")
    val a = Bpe.learnMerges(docs.repartition(1), 2).collect().toSeq.sortBy(_.getInt(0))
    val b = Bpe.learnMerges(docs.repartition(5), 2).collect().toSeq.sortBy(_.getInt(0))
    assert(a == b)
  }

  test("encode streams each doc through the learned vocab segmentation") {
    // "ab ab ab cd" learns (a,b) then (c,d); encoding replays each
    // word's final segmentation in document token order.
    val df = Seq((1L, "ab ab ab cd"), (2L, "cd ab abc")).toDF("doc_id", "text")
    val got = Bpe.encode(df, rounds = 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    assert(got == List(
      1L -> List("ab", "ab", "ab", "cd"),
      // "abc" → learned pieces: greedy (a,b) first, c untouched
      2L -> List("cd", "ab", "ab", "c")))
    // segmentVocab is the word-level view of the same final state
    val seg = Bpe.segmentVocab(df, rounds = 2).orderBy("word", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    assert(seg == List(("ab", 1L, "ab"), ("abc", 1L, "ab"), ("abc", 2L, "c"),
      ("cd", 1L, "cd")))
  }

  test("property: aucByGroup equals brute-force pair counting") {
    import org.scalacheck.{Gen, rng}
    val gen: Gen[List[(Boolean, Double)]] = for {
      n <- Gen.chooseNum(2, 60)
      xs <- Gen.listOfN(n, for {
        y <- Gen.oneOf(true, false)
        // a coarse grid forces ties (the half-credit branch)
        s <- Gen.chooseNum(0, 10).map(_ / 10.0)
      } yield (y, s))
    } yield xs
    (1 to 8).foreach { i =>
      val xs = gen.pureApply(Gen.Parameters.default, rng.Seed(11L + i))
      val df = xs.toDF("y", "s").withColumn("g", lit("g"))
      val row = graft.ext.Eval.aucByGroup(df, "g", col("y"), col("s"))
        .collect()(0)
      val pos = xs.filter(_._1).map(_._2)
      val neg = xs.filterNot(_._1).map(_._2)
      if (pos.nonEmpty && neg.nonEmpty) {
        val wins2 = (for { p <- pos; q <- neg } yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        // the operator's exact arithmetic shape: ×2 numerator, one
        // double division, HALF_UP at 5
        val want = BigDecimal(wins2.toDouble /
          (pos.size.toDouble * neg.size.toDouble * 2.0))
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(row.getDouble(3) == want, s"seed $i")
      } else assert(row.isNullAt(3), s"seed $i")
    }
  }

  test("property: intervalOverlapBucketed equals the theta join at any width") {
    import org.scalacheck.{Gen, rng}
    val gen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(1, 25)
      xs <- Gen.listOfN(n, for {
        lo <- Gen.chooseNum(0, 200)
        len <- Gen.chooseNum(1, 80)
      } yield (lo.toLong, (lo + len).toLong))
    } yield xs
    (1 to 4).foreach { i =>
      val ls = gen.pureApply(Gen.Parameters.default, rng.Seed(3L + i))
        .zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
      val rs = gen.pureApply(Gen.Parameters.default, rng.Seed(103L + i))
        .zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
      val left = ls.toDF("lid", "l_lo", "l_hi")
      val right = rs.toDF("rid", "r_lo", "r_hi")
      val want = (for {
        (li, llo, lhi) <- ls; (ri, rlo, rhi) <- rs
        if llo < rhi && rlo < lhi
      } yield (li, ri)).sorted
      Seq(1L, 7L, 64L, 1000L).foreach { w =>
        val got = graft.ext.RangeJoin.intervalOverlapBucketed(left, right,
          "l_lo", "l_hi", "r_lo", "r_hi", w)
          .select("lid", "rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
        assert(got == want, s"seed $i width $w")
      }
    }
  }

  // ---- Eval.aucByGroup ----

  test("aucByGroup: separation → 1, inversion → 0, all-ties → 0.5, one-class → NULL") {
    val rows = Seq(
      // g1: positives strictly above negatives
      ("g1", true, 0.9), ("g1", true, 0.8), ("g1", false, 0.2), ("g1", false, 0.1),
      // g2: the score ranks the positive LAST
      ("g2", true, 0.1), ("g2", false, 0.9),
      // g3: everyone tied — half credit exactly
      ("g3", true, 0.5), ("g3", false, 0.5),
      // g4: no negatives — AUC undefined
      ("g4", true, 0.7), ("g4", true, 0.3)
    ).toDF("src", "lbl", "s")
    val got = graft.ext.Eval.aucByGroup(rows, "src", col("lbl"), col("s"))
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == Seq(("g1", 2L, 2L, Some(1.0)), ("g2", 1L, 1L, Some(0.0)),
      ("g3", 1L, 1L, Some(0.5)), ("g4", 2L, 0L, None)))
  }

  test("aucByGroup: mixed ties match the rank-sum formula; partitioning-independent") {
    // pos at {0.8, 0.5}, neg at {0.5, 0.2}: pairs = 4, wins = 2 (0.8
    // beats both) + 1 (0.5 vs 0.2) + 0.5 (0.5 tie) = 3.5 → 0.875
    val rows = Seq(("g", true, 0.8), ("g", true, 0.5), ("g", false, 0.5),
      ("g", false, 0.2)).toDF("src", "lbl", "s")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Eval.aucByGroup(df, "src", col("lbl"), col("s")).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(run(rows) == Seq((2L, 2L, 0.875)))
    assert(run(rows.repartition(7)) == run(rows.repartition(1)))
  }

  test("ksDrift: disjoint distributions hit 1.0, matching shape scores its hand value") {
    val rows = Seq(
      ("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0),
      ("C", 1.0), ("C", 3.0)
    ).toDF("src", "s")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ext.Eval.ksDriftByGroup(df, "src", col("s")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val got = run(rows)
    // hand CDFs over grid {1,2,3,4}: A=(.5,1,1,1) vs rest
    // (.25,.25,.75,1) → .75; B=(0,0,.5,1) vs (.5,.75,1,1) → .75;
    // C=(.5,.5,1,1) vs the uniform (.25,.5,.75,1) → .25
    assert(got == Seq(("A", 2L, 0.75), ("B", 2L, 0.75), ("C", 2L, 0.25)))
    assert(run(rows.repartition(7)) == run(rows.repartition(1)))
  }

  test("gateThresholds: most permissive threshold under each FPR bar, rates exact") {
    val rows = Seq(
      (true, 0.9), (true, 0.8), (false, 0.7), (true, 0.3),
      (false, 0.2), (false, 0.1), (false, 0.05)
    ).toDF("lbl", "s")
    val got = graft.ext.Eval.gateThresholds(rows, col("lbl"), col("s"),
      alphas = Seq(0.1, 0.3)).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // α=0.1: only thresholds ≥ 0.8 keep zero of the 4 negatives →
    // pick 0.8 (fpr 0, tpr 2/3); α=0.3: 0.3 admits 1 negative (0.25)
    // and recalls every positive
    assert(got.toSeq == Seq((0.1, 0.8, 0.0, 0.66667), (0.3, 0.3, 0.25, 1.0)))
  }

  test("dailyAutocorrelation: alternating series hits its hand value, constant → NULL") {
    import graft.ext.Events
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2026-03-$day%02d 12:00:00")
    // type a: daily counts 1,3,1,3,1,3 (period 2); type b: constant 2
    val rows = (1 to 6).flatMap { d =>
      val ka = if (d % 2 == 0) 3 else 1
      (1 to ka).map(i => (d * 100L + i, t(d), 1L, "a", 0.0)) ++
        (1 to 2).map(i => (d * 100L + 50 + i, t(d), 1L, "b", 0.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.dailyAutocorrelation(rows, lags = Seq(1, 2)).collect()
    val a = out.find(_.getString(0) == "a").get
    // dev = ±1, den 6; lag1 Σ = −5 → −0.83333; lag2 Σ = 4 → 0.66667
    assert(a.getLong(1) == 6L)
    assert(a.getDouble(2) == -0.83333 && a.getDouble(3) == 0.66667)
    val b = out.find(_.getString(0) == "b").get
    assert(b.isNullAt(2) && b.isNullAt(3)) // zero-variance series
  }

  // ---- LogReg ----

  test("logreg: from-zero first loss is ln 2; loss decreases; stopword weight separates") {
    // en docs are stopword-dense, others stopword-free — linearly
    // separable on x2, so GD must push w_stop up and the loss down
    val docs = (0L until 8L).map { i =>
      if (i % 2 == 0) (i, "the a the a the data", "en")
      else (i, "data spark merge join sort scan", "de")
    }.toDF("doc_id", "text", "lang")
    val trace = graft.ext.LogReg.train(docs, col("lang") === "en", iters = 3)
      .orderBy("iter").collect()
    assert(trace.length == 3)
    assert(trace(0).getDouble(6) == 0.693147) // round(ln 2, 6)
    val losses = trace.map(_.getDouble(6)).toSeq
    assert(losses == losses.sorted.reverse && losses.distinct == losses)
    assert(trace(2).getAs[Double]("w_stop") > 0)
  }

  test("logreg prCurve: separable corpus → perfect top operating point, recall reaches 1") {
    val docs = (0L until 8L).map { i =>
      if (i % 2 == 0) (i, "the a the a the data", "en")
      else (i, "data spark merge join sort scan", "de")
    }.toDF("doc_id", "text", "lang")
    val out = graft.ext.LogReg.prCurve(docs, col("lang") === "en", iters = 3)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // two feature profiles → two grid rows; en scores higher (w_stop > 0)
    assert(out.length == 2)
    assert(out(0)._1 > out(1)._1)
    assert(out(0) == ((out(0)._1, 4L, 4L, 1.0, 1.0, 1.0)))
    assert(out(1)._2 == 8L && out(1)._3 == 4L && out(1)._4 == 0.5)
    assert(out(1)._5 == 1.0) // keeping everything recalls everything
    // cumulative counts never decrease as the threshold loosens
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
  }

  test("logreg calibrationBins: bins partition the corpus, gap is |avg_p − frac_pos|") {
    val docs = (0L until 8L).map { i =>
      if (i % 2 == 0) (i, "the a the a the data", "en")
      else (i, "data spark merge join sort scan", "de")
    }.toDF("doc_id", "text", "lang")
    val out = graft.ext.LogReg.calibrationBins(docs, col("lang") === "en",
      iters = 3).collect()
    assert(out.map(_.getLong(1)).sum == 8L)
    out.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 9)
      val gap = math.abs(r.getDouble(2) - r.getDouble(3))
      assert(math.abs(r.getDouble(4) - gap) < 2e-5, s"gap mismatch: $r")
    }
  }

  test("logreg is partitioning-independent on real docs") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents")
    val a = graft.ext.LogReg.train(docs.repartition(1), col("lang") === "en")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Int])
    val b = graft.ext.LogReg.train(docs.repartition(13), col("lang") === "en")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Int])
    assert(a == b)
  }

  test("logreg predictByGroup: every doc counted once, probabilities in (0,1)") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents")
    val got = graft.ext.LogReg.predictByGroup(docs, col("lang") === "en", "lang")
      .collect()
    assert(got.map(_.getLong(1)).sum == docs.count())
    got.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
    }
  }

  // ---- Sampling.abSrmReport ----

  test("abSrm: every unit assigned once, weights respected, duplicates collapse") {
    import graft.ext.Sampling
    // duplicate unit rows must not double-count (assignment is per
    // distinct unit)
    val rows = ((0L until 2000L) ++ (0L until 500L)).toDF("user_id")
    val out = Sampling.abSrmReport(rows, "user_id",
      Seq(("control", 0.5), ("treat_a", 0.25), ("treat_b", 0.25)), "exp1")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._2).sum == 2000L)
    // md5 buckets are uniform: observed within ±5 points of expected
    out.foreach { r => assert(math.abs(r._4 - r._3) < 0.05, s"skewed: $r") }
    // reassignment is bit-stable (pure function of salt and unit)
    val again = Sampling.abSrmReport(rows.repartition(7), "user_id",
      Seq(("control", 0.5), ("treat_a", 0.25), ("treat_b", 0.25)), "exp1")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(again.toSeq == out.map(r => (r._1, r._2)).toSeq)
    // a different salt shifts the split
    val salted = Sampling.abSrmReport(rows, "user_id",
      Seq(("control", 0.5), ("treat_a", 0.25), ("treat_b", 0.25)), "exp2")
      .collect().map(_.getLong(1))
    assert(salted.toSeq != out.map(_._2).toSeq)
  }

  // ---- Sampling.neymanAllocation ----

  test("neymanAllocation: budget follows N_h·σ_h, constant strata get zero") {
    val rows = (
      Seq.fill(4)(("A", 10.0)) ++ Seq(("B", 0.0), ("B", 20.0)) ++
        Seq(("C", 0.0), ("C", 0.0), ("C", 20.0), ("C", 20.0))
    ).zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "event_type", "value")
    val out = graft.ext.Sampling.neymanAllocation(rows, "event_type",
      "value", budget = 60L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // weights: A 4·0 = 0, B 2·10 = 20, C 4·10 = 40 → 0 / 20 / 40 of 60
    assert(out.toSeq == Seq(("A", 4L, 0.0, 0L), ("B", 2L, 10.0, 20L),
      ("C", 4L, 10.0, 40L)))
    assert(out.map(_._4).sum <= 60L)
  }

  // ---- Similarity.kmeansSilhouette ----

  test("kmeansSilhouette: two tight far-apart clusters score near 1, sizes partition n") {
    // axis-aligned bumps: cosine within a bump ≈ 1, across ≈ 0.
    // Membership by PARITY so the two md5-smallest ids (6 and 9 — the
    // deterministic seed picks) start one in each bump.
    val vecs = (0L until 12L).map { i =>
      val a = i % 2 == 0
      val v = Array(0f, 0f, 0f, 0f)
      v(if (a) 0 else 2) = 1f
      v(if (a) 1 else 3) = 0.05f * (1 + (i % 3)) // within-bump jitter
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val out = Similarity.kmeansSilhouette(vecs, nlist = 2, refine = 2).collect()
    assert(out.map(_.getLong(1)).sum == 12L)
    out.foreach { r =>
      assert(r.getDouble(2) > 0.5, s"mean_silhouette low: $r")
      assert(r.getDouble(3) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("kmeansSilhouette on fixture embeddings: bounded, every vector counted") {
    val out = Similarity.kmeansSilhouette(emb, nlist = 16, refine = 2).collect()
    assert(out.map(_.getLong(1)).sum == emb.count())
    out.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(3) <= r.getDouble(2))
    }
  }

  // ---- TextStats.boilerplateReport ----

  test("boilerplate: source-frequent bigram flagged, rare-elsewhere not; frac exact") {
    import graft.ext.TextStats
    val docs = Seq(
      // srcA: "terms of" in 3/4 docs (75%); every other bigram unique
      (0L, "terms of alpha beta", "srcA"), (1L, "terms of gamma delta", "srcA"),
      (2L, "terms of", "srcA"), (3L, "epsilon zeta eta", "srcA"),
      // srcB: "terms of" appears once in 4 docs (25% < 50%)
      (4L, "terms of theta iota", "srcB"), (5L, "kappa lambda", "srcB"),
      (6L, "mu nu xi", "srcB"), (7L, "omicron pi", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = TextStats.boilerplateReport(docs, n = 2, minDocPct = 50)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // doc 2 is ONLY the template bigram → fully boilerplate
    assert(out(2) == ((2L, 1L, 1L, 1.0)))
    // docs 0, 1 carry the template + 2 unique bigrams
    assert(out(0) == ((0L, 3L, 1L, 0.33333)))
    assert(out(1) == ((1L, 3L, 1L, 0.33333)))
    // clean doc in srcA, and ALL of srcB (template below threshold there)
    assert(out(3)._3 == 0L)
    assert((4 to 7).forall(i => out(i)._3 == 0L))
  }

  test("boilerplate: integer percent threshold is a ≥ bar, per-source doc counts") {
    import graft.ext.TextStats
    // bigram in exactly 2 of 4 docs = 50%
    val docs = Seq(
      (0L, "shared pair one", "s"), (1L, "shared pair two", "s"),
      (2L, "three four", "s"), (3L, "five six", "s")
    ).toDF("doc_id", "text", "source")
    def flagged(pct: Int): Long =
      TextStats.boilerplateReport(docs, n = 2, minDocPct = pct)
        .agg(sum("n_boilerplate")).collect()(0).getLong(0)
    assert(flagged(50) == 2L) // the two "shared pair" postings
    assert(flagged(51) == 0L) // strict bar just above: nothing clears
  }

  test("property: boilerplateReport equals brute-force doc-frequency thresholding") {
    import org.scalacheck.{Gen, rng}
    import graft.ext.TextStats
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val gen: Gen[List[(String, String)]] = for {
      n <- Gen.chooseNum(2, 30)
      xs <- Gen.listOfN(n, for {
        src <- Gen.oneOf("s1", "s2")
        k <- Gen.chooseNum(1, 6)
        ws <- Gen.listOfN(k, word)
      } yield (src, ws.mkString(" ")))
    } yield xs
    (1 to 5).foreach { i =>
      val docs = gen.pureApply(Gen.Parameters.default, rng.Seed(5L + i))
        .zipWithIndex.map { case ((src, txt), j) => (j.toLong, txt, src) }
      val pct = 40
      val got = TextStats.boilerplateReport(
        docs.toDF("doc_id", "text", "source"), n = 2, minDocPct = pct)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      // brute force: distinct bigrams per doc (degenerate-window rule),
      // df per source, integer percent bar
      def shingles(t: String): Set[String] = {
        val ts = t.split(" ").filter(_.nonEmpty)
        if (ts.length < 2) Set(ts.mkString(" "))
        else ts.sliding(2).map(_.mkString(" ")).toSet
      }
      val bySrc = docs.groupBy(_._3)
      val bp: Map[String, Set[String]] = bySrc.map { case (src, ds) =>
        val df = ds.flatMap(d => shingles(d._2).toSeq).groupBy(identity)
          .map { case (s, o) => s -> o.size }
        src -> df.filter { case (_, c) => c * 100 >= ds.size * pct }.keySet
      }
      docs.foreach { case (id, txt, src) =>
        val sh = shingles(txt)
        val want = (sh.size.toLong, sh.count(bp(src)).toLong)
        assert(got(id) == want, s"seed $i doc $id")
      }
    }
  }

  test("property: uShaped credit conserves each journey's full value") {
    import org.scalacheck.{Gen, rng}
    import graft.ext.Events
    val gen: Gen[List[(Long, Int, String, Double)]] = for {
      n <- Gen.chooseNum(3, 40)
      xs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1, 4)
        m <- Gen.chooseNum(0, 59)
        tp <- Gen.frequency(3 -> Gen.const("click"), 1 -> Gen.const("purchase"))
        v <- Gen.chooseNum(1, 50).map(_.toDouble)
      } yield (u.toLong, m, tp, v))
    } yield xs
    (1 to 5).foreach { i =>
      val raw = gen.pureApply(Gen.Parameters.default, rng.Seed(21L + i))
        .zipWithIndex.map { case ((u, m, tp, v), j) =>
          (j.toLong, java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00"),
            u, tp, v)
        }
      val df = raw.toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = Events.uShapedAttribution(df).collect()
        .map(r => (r.getLong(0), r.getDouble(5)))
      val byConv = out.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
      val values = raw.filter(_._4 == "purchase").map(r => r._1 -> r._5).toMap
      byConv.foreach { case (conv, credited) =>
        assert(math.abs(credited - values(conv)) < 1e-4,
          s"seed $i conv $conv: $credited vs ${values(conv)}")
      }
    }
  }

  test("property: activeUsers equals brute-force rolling distinct") {
    import org.scalacheck.{Gen, rng}
    import graft.ext.Events
    val gen: Gen[List[(Long, Int)]] = for {
      n <- Gen.chooseNum(1, 60)
      xs <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1, 5)
        d <- Gen.chooseNum(1, 20)
      } yield (u.toLong, d))
    } yield xs
    (1 to 5).foreach { i =>
      val raw = gen.pureApply(Gen.Parameters.default, rng.Seed(31L + i))
      val df = raw.zipWithIndex.map { case ((u, d), j) =>
        (j.toLong, java.sql.Timestamp.valueOf(f"2026-01-$d%02d 09:00:00"), u,
          "view", 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Events.activeUsers(df, windowDays = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      val base = java.time.LocalDate.of(2026, 1, 1).toEpochDay - 1
      val ud = raw.map { case (u, d) => (u, base + d) }.distinct
      val want = ud.map(_._2).distinct.sorted.map { day =>
        (day,
          ud.count(_._2 == day).toLong,
          ud.filter(x => x._2 <= day && x._2 > day - 3).map(_._1)
            .distinct.size.toLong)
      }
      assert(got == want, s"seed $i")
    }
  }

  // ---- Attribution (Markov removal effects) ----

  test("markov attribution: converting channel takes all, dead-end channel none") {
    import graft.ext.Attribution
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, t(1), 1L, "click"), (2L, t(2), 1L, "purchase"),
      (3L, t(1), 2L, "view"),
      (4L, t(1), 3L, "click"), (5L, t(2), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Attribution.markovRemovalEffects(events).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    // every conversion flows through click; view only dead-ends
    assert(out == Seq(("click", 1.0, 1.0), ("view", 0.0, 0.0)))
  }

  test("markov journeys: conversions segment a user's stream, tails absorb to NULL") {
    import graft.ext.Attribution
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val events = Seq(
      (1L, t(1), 1L, "click"), (2L, t(2), 1L, "purchase"),
      (3L, t(3), 1L, "view") // second journey, unconverted
    ).toDF("event_id", "ts", "user_id", "event_type")
    val tm = Attribution.journeyTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(tm == Set(("START", "click", 1L), ("click", "CONV", 1L),
      ("START", "view", 1L), ("view", "NULL", 1L)))
  }

  test("markov attribution is partitioning-independent on real events") {
    Tables.register(spark, TestSpark.sfDir)
    val ev = spark.table("events")
    val a = graft.ext.Attribution.markovRemovalEffects(ev.repartition(1))
      .collect().map(_.toSeq).toSeq
    val b = graft.ext.Attribution.markovRemovalEffects(ev.repartition(13))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  // ---- Events.uShapedAttribution / activeUsers ----

  test("uShapedAttribution: 40/20/40 over journeys, singles and pairs special-cased") {
    import graft.ext.Events
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1, journey 1: three clicks then a 10.0 purchase
      (1L, t(1), 1L, "click", 0.0), (2L, t(2), 1L, "click", 0.0),
      (3L, t(3), 1L, "click", 0.0), (4L, t(4), 1L, "purchase", 10.0),
      // user 1, journey 2: one click, one 5.0 purchase
      (5L, t(5), 1L, "click", 0.0), (6L, t(6), 1L, "purchase", 5.0),
      // user 1: a dangling click after the last purchase — unattributed
      (7L, t(7), 1L, "click", 0.0),
      // user 2: two clicks, one 8.0 purchase → 50/50
      (8L, t(1), 2L, "click", 0.0), (9L, t(2), 2L, "click", 0.0),
      (10L, t(3), 2L, "purchase", 8.0),
      // user 3: purchase with no touches → no credited rows
      (11L, t(1), 3L, "purchase", 9.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.uShapedAttribution(events)
      .orderBy("conv_id", "position").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4),
        r.getDouble(5))).toSeq
    assert(out == Seq(
      (4L, 1L, 3L, 1, 4.0), (4L, 2L, 3L, 2, 2.0), (4L, 3L, 3L, 3, 4.0),
      (6L, 5L, 1L, 1, 5.0),
      (10L, 8L, 2L, 1, 4.0), (10L, 9L, 2L, 2, 4.0)))
    // full value conserved per credited journey
    assert(out.filter(_._1 == 4L).map(_._5).sum == 10.0)
  }

  test("uShapedAttribution: same-microsecond conversions tie-break on event_id") {
    import graft.ext.Events
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // two purchases by one user at the SAME instant: the journey
    // assignment must be a total order — the lower conv event_id wins
    // the preceding touches (window tie-break), deterministically
    // across partitions/engines
    val events = Seq(
      (1L, t(1), 1L, "click", 0.0),
      (3L, t(2), 1L, "purchase", 10.0), (2L, t(2), 1L, "purchase", 6.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.uShapedAttribution(events).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getInt(4),
        r.getDouble(5))).toSeq
    assert(out == Seq((2L, 1L, 1L, 1, 6.0)),
      "the lower-event_id conversion owns the journey; the other gets none")
  }

  test("activeUsers: trailing window carries users forward; only active days reported") {
    import graft.ext.Events
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, java.sql.Timestamp.valueOf("2026-01-02 10:00:00"), 2L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.activeUsers(events, windowDays = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // day 1: dau 1, wau 1; day 2: dau 1, wau 2 (user 1 still in window)
    assert(out == Seq((1L, 1L, 1.0), (1L, 2L, 0.5)))
  }

  // ---- TextStats.discriminativeTokens ----

  test("discriminativeTokens: class-exclusive tokens outrank shared ones") {
    import graft.ext.TextStats
    val docs = (0L until 12L).map { i =>
      // "shared" is in every doc (degenerate margin → filtered out);
      // "alpha"/"beta" are en-exclusive, "uno" es-exclusive;
      // "mixed" appears in both classes (weak signal)
      if (i % 2 == 0) (i, "shared alpha beta mixed", "en")
      else (i, "shared uno " + (if (i % 4 == 1) "mixed" else "dos"), "es")
    }.toDF("doc_id", "text", "lang")
    val out = TextStats.discriminativeTokens(docs, k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    val en = out.filter(_._1 == "en")
    // perfectly separating tokens take the top ranks
    assert(Set("alpha", "beta").contains(en(0)._3))
    assert(en.map(_._3).toSet.intersect(Set("alpha", "beta")) == Set("alpha", "beta"))
    // the everywhere-token never appears (undefined χ², filtered)
    assert(!out.exists(_._3 == "shared"))
    // χ² within a label is non-increasing down the ranks
    out.groupBy(_._1).foreach { case (_, rows) =>
      val chis = rows.sortBy(_._2).map(_._5).toSeq
      assert(chis == chis.sorted.reverse)
    }
  }

  // ---- Packing.packEfficiency ----

  test("packEfficiency: rollup conserves docs and tokens, flags exactly the straddlers") {
    import graft.ext.Packing
    // budget 10; docs 7+7 tokens: doc 0 fills [0,7), doc 1 [7,14) —
    // doc 1 straddles the pack-0 boundary; pack 1 starts nobody... so
    // add doc 2 (5 tokens, [14,19)) starting inside pack 1.
    val toks = Seq((0L, 7L), (1L, 7L), (2L, 5L)).toDF("doc_id", "n_tokens")
    val out = Packing.packEfficiency(
      Packing.packSequences(toks, budget = 10L, shards = 4), budget = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1 (offset 7 + len 7 > 10) straddles; doc 2 (offset 4 + 5) fits
    assert(out.toSeq == Seq((0L, 2L, 14L, 1L), (1L, 1L, 5L, 0L)))
    assert(out.map(_._2).sum == 3L && out.map(_._3).sum == 19L)
  }

  // ---- Classify.nbCrossVal ----

  test("nbCrossVal: disjoint vocabularies → perfect accuracy in every fold") {
    // 9 docs per label, k=3: each fold's training still holds both
    // vocabularies, so every held-out doc classifies correctly
    val docs = (0L until 18L).map { i =>
      if (i % 2 == 0) (i, "alpha beta alpha gamma", "en")
      else (i, "uno dos tres uno", "es")
    }.toDF("doc_id", "text", "lang")
    val out = Classify.nbCrossVal(docs, k = 3).collect()
    assert(out.map(_.getInt(0)).toSet == Set(0, 1, 2))
    assert(out.map(_.getLong(1)).sum == 18L)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), s"imperfect fold: $r")
      assert(r.getDouble(3) == 1.0)
    }
  }

  test("nbCrossVal: zero-token doc counted, never correct; corpus partitioned") {
    val docs = Seq(
      (0L, "alpha beta", "en"), (1L, "alpha gamma", "en"), (2L, "", "en"),
      (3L, "uno dos", "es"), (4L, "uno tres", "es"), (5L, "dos tres", "es")
    ).toDF("doc_id", "text", "lang")
    val out = Classify.nbCrossVal(docs, k = 2).collect()
    assert(out.map(_.getLong(1)).sum == 6L)
    // the empty doc's fold has at least one never-correct member
    assert(out.map(r => r.getLong(1) - r.getLong(2)).sum >= 1L)
  }

  test("nbCrossVal is partitioning-independent on real docs") {
    Tables.register(spark, TestSpark.sfDir)
    val docs = spark.table("documents")
    val a = Classify.nbCrossVal(docs.repartition(1), k = 5)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Int])
    val b = Classify.nbCrossVal(docs.repartition(11), k = 5)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Int])
    assert(a == b)
  }

  // ---- Similarity.clusterOutliersFrom ----

  test("clusterOutliers: far member flagged, tight cluster silent, σ=0 cluster skipped") {
    val assigned = (
      // cluster 1: nine members at 0.9, one stray at 0.1 → z ≈ −3
      (0L until 9L).map(i => (i, 1L, 0.9)) ++ Seq((9L, 1L, 0.1)) ++
      // cluster 2: all at 0.8 — zero variance, no outliers possible
      (10L until 14L).map(i => (i, 2L, 0.8))
    ).toDF("vec_id", "centroid_id", "cscore")
    val out = Similarity.clusterOutliersFrom(assigned, zThresh = 2.0).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 9L && out(0).getLong(1) == 1L)
    assert(out(0).getDouble(3) == -3.0) // (0.1−0.82)/0.24 exactly
  }

  test("clusterOutliers: threshold is on the ROUNDED z; partitioning-independent") {
    val assigned = ((0L until 9L).map(i => (i, 1L, 0.9)) ++ Seq((9L, 1L, 0.1)))
      .toDF("vec_id", "centroid_id", "cscore")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.clusterOutliersFrom(df, zThresh = 3.0).collect()
        .map(_.toSeq).toSeq
    // z = −3.0 exactly: the ≤ −3.0 bar keeps it
    assert(run(assigned).length == 1)
    assert(run(assigned.repartition(7)) == run(assigned.repartition(1)))
  }

  // ---- Events.eventPaths ----

  test("eventPaths: per-user trigrams counted, ranked, tie-broken, capped") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, t("2026-01-01 10:00:00"), 1L, "view"),
      (2L, t("2026-01-01 10:01:00"), 1L, "cart"),
      (3L, t("2026-01-01 10:02:00"), 1L, "buy"),
      (4L, t("2026-01-01 10:03:00"), 1L, "view"),
      (5L, t("2026-01-01 11:00:00"), 2L, "view"),
      (6L, t("2026-01-01 11:01:00"), 2L, "cart"),
      (7L, t("2026-01-01 11:02:00"), 2L, "buy")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ext.Events.eventPaths(events, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // view→cart→buy twice (both users); cart→buy→view once (user 1);
    // never a cross-user path
    assert(out == Seq(("view", "cart", "buy", 2L), ("cart", "buy", "view", 1L)))
    // k caps the list
    assert(graft.ext.Events.eventPaths(events, k = 1).count() == 1L)
  }

  test("waterFill: saturation prefix, exact conservation, remainder spread") {
    import spark.implicits._
    // a(5) and b(10) fit under the level; c(100) caps at the leftover
    val d1 = Seq(("a", 5L), ("b", 10L), ("c", 100L))
      .flatMap { case (s, n) => Seq((s, n)) }.toDF("source", "n_tokens")
    val r1 = graft.ext.Sampling.waterFillAllocation(d1, "source", 30L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    assert(r1.toSeq == Seq(("a", 5L, true), ("b", 10L, true), ("c", 15L, false)))
    // equal strata, indivisible budget: the first R mod m strata in
    // (size, name) order take the extra token; total is exactly B
    val d2 = Seq(("x", 10L), ("y", 10L), ("z", 10L)).toDF("source", "n_tokens")
    val r2 = graft.ext.Sampling.waterFillAllocation(d2, "source", 8L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(r2 == Seq(("x", 3L), ("y", 3L), ("z", 2L)))
    // budget above the corpus: everything saturated, alloc = available
    val r3 = graft.ext.Sampling.waterFillAllocation(d2, "source", 1000L)
      .collect().map(r => (r.getLong(2), r.getBoolean(3))).toSeq
    assert(r3 == Seq((10L, true), (10L, true), (10L, true)))
  }

  // ---- Eval.brierDecomposition ----

  test("brierDecomposition: hand-computed Murphy identity") {
    // bucket 80: n=5 o=4 (perfectly calibrated at 0.8)
    // bucket 20: n=5 o=1 (perfectly calibrated at 0.2)
    val df = (Seq.fill(4)((true, 0.8)) ++ Seq((false, 0.8)) ++
      Seq((true, 0.2)) ++ Seq.fill(4)((false, 0.2)))
      .toDF("y", "p")
    val r = graft.ext.Eval.brierDecomposition(df, col("y"), col("p"))
      .collect()(0)
    assert(r.getLong(0) == 10L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.16)  // brier
    assert(r.getDouble(3) == 0.0)   // reliability: perfectly calibrated
    assert(r.getDouble(4) == 0.09)  // resolution
    assert(r.getDouble(5) == 0.25)  // uncertainty: base rate 0.5
    // identity: brier = rel - res + unc
    assert(r.getDouble(2) == r.getDouble(3) - r.getDouble(4) + r.getDouble(5))
  }

  // ---- Stats.categoricalJsDrift ----

  test("categoricalJsDrift: pool-identical day scores 0, shifted day flags") {
    val rows =
      Seq.fill(10)(("d1", "a")) ++ Seq.fill(10)(("d1", "b")) ++
      Seq.fill(10)(("d2", "a")) ++ Seq.fill(10)(("d2", "b")) ++
      Seq.fill(20)(("d3", "a")) // day 3 is all-a: drifted
    val df = rows.toDF("g", "i")
    val out = graft.ext.Stats.categoricalJsDrift(df, col("g"), col("i"), 0.05)
      .collect().map(r => (r.getString(0), r.getDouble(2),
        r.getBoolean(3))).toSeq
    val d12 = out.filter(r => r._1 == "d1" || r._1 == "d2")
    assert(d12.forall(r => r._2 > 0 && !r._3),
      s"balanced days drift mildly vs the a-heavy pool, under threshold: $out")
    val d3 = out.find(_._1 == "d3").get
    assert(d3._2 > d12.head._2 && d3._3, s"all-a day must flag: $out")
  }

  // ---- Graph.hits ----

  test("hits: hand-computed bipartite recurrence and max-normalization") {
    // c1→{p1,p2}, c2→{p2}; h0 = 1 each
    // a1: p1=1, p2=2 ; h1: c1=3, c2=2
    // a2: p1=3, p2=5 ; h2: c1=8, c2=5
    val edges = Seq((1L, 101L), (1L, 102L), (2L, 102L)).toDF("src", "dst")
    val out = Graph.hits(edges, iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("authority", 101L, 3L, 0.6),
      ("authority", 102L, 5L, 1.0),
      ("hub", 1L, 8L, 1.0),
      ("hub", 2L, 5L, 0.625)))
  }

  test("hits deduplicates edges and is partitioning-independent") {
    val dup = Seq((1L, 101L), (1L, 101L), (1L, 102L), (2L, 102L))
      .toDF("src", "dst")
    val a = Graph.hits(dup.repartition(1), iters = 2).collect().toSeq
    val b = Graph.hits(dup.repartition(7), iters = 2).collect().toSeq
    assert(a == b)
    // the duplicate edge must not double-count: same as the clean graph
    val clean = Graph.hits(Seq((1L, 101L), (1L, 102L), (2L, 102L))
      .toDF("src", "dst"), iters = 2).collect().toSeq
    assert(a == clean)
  }
}
