package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 curation operators: grouped exact ntile, prefix-priority
  * dedup, dedup saturation, Dirichlet query likelihood, hard-negative
  * mining, SemDeDup pruning. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // Sampling.groupNtile
  // ---------------------------------------------------------------

  test("groupNtile matches window ntile per group, incl. ties and n<k") {
    val df = Seq(
      ("a", 1.0, 1L), ("a", 1.0, 2L), ("a", 2.0, 3L), ("a", 2.0, 4L),
      ("a", 3.0, 5L), ("a", 5.0, 6L), ("a", 0.5, 7L),
      ("b", 9.0, 8L), ("b", 1.0, 9L) // 2 rows < k=3 buckets
    ).toDF("g", "v", "id")
    val got = Sampling.groupNtile(df, "g", "v", 3, Seq("id"))
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    val exp = df.withColumn("bucket",
        ntile(3).over(Window.partitionBy("g").orderBy(col("v"), col("id"))))
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(got == exp)
  }

  test("groupNtile drops null/NaN values and rejects reserved names") {
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L),
      ("a", Some(Double.NaN), 3L), ("a", Some(2.0), 4L))
      .toDF("g", "v", "id")
    val out = Sampling.groupNtile(df, "g", "v", 2, Seq("id"))
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 4L -> 2)) // rows 2 and 3 dropped
    val bad = df.withColumnRenamed("id", "__id")
    val e = intercept[IllegalArgumentException] {
      Sampling.groupNtile(bad, "g", "v", 2, Seq("__id"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  // ---------------------------------------------------------------
  // Dedup.prefixPriorityDedup
  // ---------------------------------------------------------------

  test("prefixPriorityDedup: ladder beats id, unlisted ties on id, empty docs out") {
    val docs = Seq(
      (1L, "Alpha beta gamma", "crawl"),
      (2L, "alpha  BETA delta", "curated"), // same 2-word prefix, wins by ladder
      (3L, "alpha beta epsilon", "crawl"),
      (4L, "other text", "crawl"),          // unique -> no loss row
      (5L, "   ", "crawl"),                 // wordless -> excluded
      (6L, "x y", "b"),                     // both unlisted: doc 6 wins on id
      (7L, "x y z", "a")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.prefixPriorityDedup(docs, "doc_id", "text", "source",
        prefixWords = 2, priority = Seq("curated"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("crawl", "curated", 2L, 6L), // docs 1 (3 words) + 3 (3 words)
      ("a", "b", 1L, 3L)))          // doc 7 loses to doc 6
  }

  // ---------------------------------------------------------------
  // Dedup.dedupSaturation
  // ---------------------------------------------------------------

  test("dedupSaturation: later deciles show the duplicates") {
    val docs = Seq(
      (1L, "aa bb"), (2L, "cc dd"), (3L, "ee ff"), // all novel
      (4L, "aa bb"), (5L, "cc dd"), (6L, "gg hh")  // 2 dups, 1 novel
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSaturation(docs, "doc_id", "text",
        prefixWords = 2, buckets = 2)
      .orderBy("decile")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1, 3L, 3L, 0.0), (2, 3L, 1L, 0.666667)))
  }

  // ---------------------------------------------------------------
  // Relevance.queryLikelihoodTopK
  // ---------------------------------------------------------------

  test("queryLikelihoodTopK: hand-computed Dirichlet scores, absent term rejected") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "d d d d"))
      .toDF("doc_id", "text")
    // ctok = 9, cf(a) = 3, p = 1/3; score(d) = ln((tf + mu*p)/(dl + mu))
    val out = Relevance.queryLikelihoodTopK(docs, "doc_id", "text",
        Seq("a"), k = 3, mu = 1.0)
      .as[(Long, Double)].collect().toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == r6(math.log((2 + 1.0 / 3) / 4)))
    assert(out(2L) == r6(math.log((1 + 1.0 / 3) / 3)))
    assert(out(3L) == r6(math.log((1.0 / 3) / 5))) // miss term only
    assert(out(1L) > out(2L) && out(2L) > out(3L))
    val e = intercept[IllegalArgumentException] {
      Relevance.queryLikelihoodTopK(docs, "doc_id", "text",
        Seq("zzz"), k = 3).collect()
    }
    assert(e.getMessage.contains("absent"))
  }

  // ---------------------------------------------------------------
  // Similarity.hardNegativeTopK
  // ---------------------------------------------------------------

  test("hardNegativeTopK: same-label rows never rank, k caps output") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),   // identical but SAME label: excluded
      (3L, Array(1.0f, 0.0f), 1),   // cos 1.0 -> rank 1
      (4L, Array(0.0f, 1.0f), 1),   // cos 0.0 -> rank 3 (cut by k=2)
      (5L, Array(0.9f, 0.1f), 2)    // cos ~0.994 -> rank 2
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegativeTopK(
        emb.where(col("vec_id") === 1), emb,
        "vec_id", "embedding", "label", k = 2)
      .orderBy("rnk")
      .select("neg_id", "neg_label").as[(Long, Int)].collect().toSeq
    assert(out == Seq((3L, 1), (5L, 2)))
  }

  // ---------------------------------------------------------------
  // Dedup.semDedupPrune
  // ---------------------------------------------------------------

  test("semDedupPrune keeps the LEAST centroid-similar member of a relation") {
    // Two well-separated clusters; in cluster A, ids 1/3/5 where pairs
    // {1,3} and {3,5} exceed the threshold but {1,5} does not: id 3 is
    // the most centroid-typical member of both relations, so the
    // paper's rule drops exactly it. Cluster B's pair sits below the
    // threshold -> no drops there.
    val emb = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)),
      (3L, Array(0.99, 0.14)), (4L, Array(0.2, 0.98)),
      (5L, Array(0.97, 0.24))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semDedupPrune(emb, "vec_id", "embedding",
        k = 2, rounds = 1, threshold = 0.98)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out.filter(!_._2._3).keySet == Set(3L)) // only id 3 dropped
    // ids 1/3/5 share a cluster; 3 is MORE centroid-similar than 1
    assert(out(1L)._1 == out(3L)._1 && out(3L)._1 == out(5L)._1)
    assert(out(2L)._1 == out(4L)._1 && out(2L)._1 != out(1L)._1)
    assert(out(3L)._2 > out(1L)._2)
  }

  // ---------------------------------------------------------------
  // Sampling.mixInterleave / Sampling.balancedShards
  // ---------------------------------------------------------------

  test("mixInterleave: keys are rank/weight, ties break on source name") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (20L, "b"),
      (99L, "ignored")).toDF("doc_id", "source")
    // a: keys 2, 4, 6; b: keys 4, 8 -> key-4 tie serves a before b
    val out = Sampling.mixInterleave(docs, "doc_id", "source",
        Seq("a" -> 0.5, "b" -> 0.25), steps = 4)
      .select("step", "source", "doc_id", "key")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 1L, 2.0), (2L, "a", 2L, 4.0),
      (3L, "b", 10L, 4.0), (4L, "a", 3L, 6.0)))
    intercept[IllegalArgumentException] {
      Sampling.mixInterleave(docs, "doc_id", "source",
        Seq("a" -> 0.0), steps = 1)
    }
  }

  test("balancedShards: snake dealing balances token mass") {
    val docs = (1L to 6L).map(i => (i, i)).toDF("doc_id", "tk")
    // ranks 1..6 = weights 1..6; snake over 2 shards: 0,1,1,0,0,1
    val out = Sampling.balancedShards(docs, "doc_id", col("tk"), shards = 2)
      .orderBy("shard").as[(Int, Long, Long)].collect().toSeq
    assert(out == Seq((0, 3L, 10L), (1, 3L, 11L))) // 1+4+5 vs 2+3+6
  }

  // ---------------------------------------------------------------
  // TextAnalysis.vocabCoverageCurve / TextAnalysis.wordBurstiness
  // ---------------------------------------------------------------

  test("vocabCoverageCurve: exact coverage at each cutoff, cap at |V|") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverageCurve(docs, "text", Seq(1, 2, 5))
      .orderBy("vocab_size")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1, 1L, 3L, 0.5), (2, 2L, 5L, 0.833333),
      (5, 3L, 6L, 1.0)))
  }

  test("wordBurstiness: tf/df ranks repeats-within-docs first") {
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextAnalysis.wordBurstiness(docs, "doc_id", "text", topN = 2)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("x", 2L, 1L, 2.0), ("y", 2L, 2L, 1.0)))
  }

  // ---------------------------------------------------------------
  // Sampling.curationFunnel
  // ---------------------------------------------------------------

  test("curationFunnel: each stage cuts, dedup keeps first QUALITY doc") {
    // long-enough text passes quality (threshold 0.5); "##" noise fails
    val good = "alpha beta gamma delta epsilon zeta " * 5
    val docs = Seq(
      (1L, "## ## ## ## ## ## ## ## ## ##", "s1"), // fails quality
      (2L, good, "s1"),                   // passes; fp group winner
      (3L, good + "tail", "s1"),          // same 6-word prefix -> dedup'd
      (4L, good + "more", "s2"),          // same prefix, other source -> dedup'd
      (5L, "unique " + good, "s2"),       // survives all stages
      (6L, "second unique " + good, "s2") // cut by cap = 1
    ).toDF("doc_id", "text", "source")
    val out = Sampling.curationFunnel(docs, "doc_id", "text", "source",
        qualityThreshold = 0.5, prefixWords = 6, capPerSource = 1)
      .orderBy("source")
      .select("source", "n_raw", "n_quality", "n_dedup", "n_cap")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("s1", 3L, 2L, 1L, 1L), ("s2", 3L, 3L, 2L, 1L)))
  }

  test("semDedupPrune: exact planted copy drops, original kept on the id tie") {
    val base = (0 until 8).map { i =>
      val a = i * 0.7853
      (i.toLong, Array(math.cos(a), math.sin(a)))
    }
    val planted = base.take(2).map { case (id, v) => (id + 100L, v) }
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val out = Dedup.semDedupPrune(emb, "vec_id", "embedding",
        k = 2, rounds = 1, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.filter(!_._2).keySet == Set(100L, 101L)) // copies drop
    assert(out(0L) && out(1L))                          // originals keep
  }

  // TextAnalysis.hostTemplateStrip

  test("hostTemplateStrip: chrome at threshold strips, body and " +
    "sub-threshold lines keep order, tiny hosts are never judged") {
    val pages = Seq(
      // host a: 4 pages; NAV on all 4 (df 1.0), PROMO on 2 (df 0.5)
      ("a", 1L, "NAV\nbody-1\nPROMO"),
      ("a", 2L, "NAV\nbody-2"),
      ("a", 3L, "NAV\nPROMO\nbody-3"),
      ("a", 4L, "  NAV  \nbody-4"),       // trims before matching
      // host b: only 2 pages -> below minPages, nothing strips
      ("b", 5L, "SAME\nx"), ("b", 6L, "SAME\ny")
    ).toDF("host", "id", "text")
    val got = graft.ops.TextAnalysis.hostTemplateStrip(pages, "host",
        "id", "text", minPages = 3L, minFraction = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) === ((3L, 1L, "body-1\nPROMO")),
      "PROMO at df 0.5 survives an 0.8 bar")
    assert(got(2L) === ((2L, 1L, "body-2")))
    assert(got(3L) === ((3L, 1L, "PROMO\nbody-3")), "order preserved")
    assert(got(4L) === ((2L, 1L, "body-4")), "trimmed NAV matched")
    assert(got(5L) === ((2L, 0L, "SAME\nx")),
      "a 2-page host is never judged")
  }
}
