package graft.ops

import graft.SparkSpec

/** Spherical k-means: deterministic init, Lloyd convergence on planted
  * clusters, exact quantized centroid means, empty-cluster carry-forward. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("kmeansCentroids: planted clusters converge, exact quantized means") {
    // ids 1/3 point along x, ids 2/4 along y; init = two lowest ids,
    // one from each planted cluster
    val pts = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeansCentroids(pts, "vec_id", "embedding",
      k = 2, rounds = 2)
      .collect().map(r =>
        (r.getInt(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    // cluster 0 <- {1, 3}: component means (0.95, 0.05); cluster 1 <- {2, 4}
    assert(out((0, 0)) == (2L, 0.95) && out((0, 1)) == (2L, 0.05))
    assert(out((1, 0)) == (2L, 0.05) && out((1, 1)) == (2L, 0.95))
  }

  test("kmeansCentroids: identical vectors tie to cid 0, empty carries") {
    val pts = (1L to 4L).map(i => (i, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeansCentroids(pts, "vec_id", "embedding",
      k = 2, rounds = 2)
      .collect().map(r =>
        (r.getInt(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3))).toMap
    // every vector ties on cosine to both centroids -> lowest cid wins;
    // cluster 1 empties and keeps its init vector verbatim
    assert(out((0, 0))._1 == 4L && out((1, 0)) == (0L, 1.0))
    assert(out((1, 1)) == (0L, 0.0))
  }

  test("nearestCentroidEval: separable classes give a diagonal matrix") {
    val pts = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.1f, 0.9f), 1),
      (5L, Array(0.95f, 0.05f), 1)) // mislabeled point -> off-diagonal
      .toDF("vec_id", "embedding", "label")
    val got = Clustering.nearestCentroidEval(
        pts, "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // centroid 1 is dragged toward x by the bad point, but stays
    // y-dominant; the bad point itself lands in class 0's cell
    assert(got((0, 0)) == 2L && got((1, 1)) == 2L && got((1, 0)) == 1L)
    assert(got.values.sum == 5L)
  }

  test("groupCentroidSimilarity: hand-computed centroid cosines, i < j") {
    val pts = Seq(
      ("a", Array(1.0f, 0.0f)), ("a", Array(0.0f, 1.0f)), // centroid (.5,.5)
      ("b", Array(1.0f, 0.0f)),                           // centroid (1,0)
      ("c", Array(0.0f, 1.0f)))                           // centroid (0,1)
      .toDF("src", "embedding")
    val got = Clustering.groupCentroidSimilarity(pts, "src", "embedding")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // cos((.5,.5),(1,0)) = .5/(sqrt(.5)*1) = 0.707107; b vs c orthogonal
    assert(got((("a", "b"))) == 0.707107 && got((("a", "c"))) == 0.707107)
    assert(got((("b", "c"))) == 0.0)
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("silhouetteByLabel: tight separated clusters near 1, singleton 0") {
    val pts = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.7f, 0.7f), 2)) // singleton label
      .toDF("vec_id", "embedding", "label")
    val got = Clustering.silhouetteByLabel(
        pts, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // labels 0/1: a = 0 (identical twins), b = min mean dist > 0 -> s = 1
    assert(got(0) == ((2L, 1.0)) && got(1) == ((2L, 1.0)))
    assert(got(2) == ((1L, 0.0))) // singleton: s = 0 by convention
  }

  test("silhouetteByLabel: all-identical corpus degenerates to 0, not NaN") {
    val pts = Seq((1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val got = Clustering.silhouetteByLabel(
        pts, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got == Map(0 -> 0.0, 1 -> 0.0))
  }

  test("kmeansCentroids: rejects non-positive k or rounds") {
    val pts = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Clustering.kmeansCentroids(pts, "vec_id", "embedding", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Clustering.kmeansCentroids(pts, "vec_id", "embedding", 2, 0)
    }
  }

  test("labelPropagation: chain reach, majority vote, tie to smaller label, seeds immutable") {
    import spark.implicits._
    // path 0-1-2-3 with seed 0 labeled 7: labels walk down the chain
    val chain = Seq((0L, Option(7)), (1L, None: Option[Int]),
      (2L, None: Option[Int]), (3L, None: Option[Int]))
      .toDF("id", "seed")
    val chainE = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val out1 = Clustering.labelPropagation(
        chain, "id", "seed", chainE, "a", "b", iterations = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out1 == Map(0L -> 7, 1L -> 7, 2L -> 7, 3L -> 7))
    // node 4 hears labels {5, 5, 9} -> majority 5; node 5 hears {3, 9}
    // (tie) -> smaller label 3; seed never changes even when outvoted
    val votes = Seq((0L, Option(5)), (1L, Option(5)), (2L, Option(9)),
      (3L, Option(3)), (4L, None: Option[Int]), (5L, None: Option[Int]),
      (6L, Option(1)))
      .toDF("id", "seed")
    val votesE = Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 5L), (2L, 5L),
      (0L, 6L), (1L, 6L)).toDF("a", "b")
    val out2 = Clustering.labelPropagation(
        votes, "id", "seed", votesE, "a", "b", iterations = 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(out2(4L) == 5 && out2(5L) == 3)
    assert(out2(6L) == 1) // seed outvoted by two 5s, stays 1
    // isolated unlabeled node stays null
    val iso = Clustering.labelPropagation(
        Seq((0L, Option(2)), (9L, None: Option[Int])).toDF("id", "seed"),
        "id", "seed", Seq((0L, 0L)).toDF("a", "b"), "a", "b", 2)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!iso(0L) && iso(9L))
  }

  test("kCenterGreedy: hand-traced farthest-first sequence") {
    import spark.implicits._
    // seed = min id (0,0); then (10,0) at d=100; then (5,5) at
    // min(50, 50) = 50; then (0,1) at min(1, 101, 41) = 1.
    val d = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 0.0)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(5.0, 5.0))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kCenterGreedy(d, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    assert(out == Seq((1, 0L, -1.0), (2, 1L, 100.0),
      (3, 3L, 50.0), (4, 2L, 1.0)))
  }

  test("kCenterGreedy: equidistant tie picks min id; duplicates stop early") {
    import spark.implicits._
    val tie = Seq(
      (0L, Seq(0.0, 0.0)), (2L, Seq(0.0, 2.0)), (1L, Seq(2.0, 0.0))
    ).toDF("vec_id", "embedding")
    val t = Clustering.kCenterGreedy(tie, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(t == Seq((1, 0L), (2, 1L))) // d=4.0 both; id 1 wins
    // all-duplicate corpus: no point is ever at distance > 0 -> just
    // the seed, even though k asked for 3
    val dup = Seq(
      (7L, Seq(1.0, 1.0)), (8L, Seq(1.0, 1.0)), (9L, Seq(1.0, 1.0))
    ).toDF("vec_id", "embedding")
    val s = Clustering.kCenterGreedy(dup, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(s == Seq((1, 7L)))
    intercept[IllegalArgumentException] {
      Clustering.kCenterGreedy(dup, "vec_id", "embedding", k = 65)
    }
  }

  test("mmrSelect: lambda trades relevance against diversity") {
    import spark.implicits._
    // query = id 0 = (1,0). 1:(1,0) rel=1; 2:(.8,.6) rel=.8;
    // 3:(0,1) rel=0. Seed always 1 (max rel).
    val d = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.8, 0.6)), (3L, Seq(0.0, 1.0))
    ).toDF("vec_id", "embedding")
    // lambda=.7: round 2 scores 2 -> .7*.8-.3*.8=.32, 3 -> 0 => pick 2
    val hi = Clustering.mmrSelect(d, "vec_id", "embedding",
        queryId = 0L, k = 3, lambda = 0.7)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(hi == Seq((1, 1L), (2, 2L), (3, 3L)))
    // lambda=0 (pure diversity after the seed): 2 -> -.8, 3 -> 0 => 3
    val lo = Clustering.mmrSelect(d, "vec_id", "embedding",
        queryId = 0L, k = 2, lambda = 0.0)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(lo == Seq((1, 1L), (2, 3L)))
    // rel / max_sim readouts ride the rows (6 dp)
    val rows = Clustering.mmrSelect(d, "vec_id", "embedding",
        queryId = 0L, k = 2, lambda = 0.7).collect()
    assert(rows(0).getDouble(2) == 1.0 && rows(0).isNullAt(3))
    assert(rows(1).getLong(1) == 2L &&
      rows(1).getDouble(2) == 0.8 && rows(1).getDouble(3) == 0.8)
  }

  test("mmrSelect: exhaustion, self-exclusion, and guards") {
    import spark.implicits._
    val d = Seq((0L, Seq(1.0, 0.0)), (4L, Seq(0.5, 0.5)))
      .toDF("vec_id", "embedding")
    // only one candidate besides the query: k=5 stops at 1 row, and
    // the query row itself is never selected
    val out = Clustering.mmrSelect(d, "vec_id", "embedding",
        queryId = 0L, k = 5, lambda = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out == Seq((1, 4L)))
    intercept[IllegalArgumentException] {
      Clustering.mmrSelect(d, "vec_id", "embedding", 0L, 65, 0.5)
    }
    intercept[IllegalArgumentException] {
      Clustering.mmrSelect(d, "vec_id", "embedding", 0L, 2, 1.5)
    }
    intercept[IllegalArgumentException] { // missing query id
      Clustering.mmrSelect(d, "vec_id", "embedding", 99L, 2, 0.5)
    }
  }
}
