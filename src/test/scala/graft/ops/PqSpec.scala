package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant tests for the Product-Quantization family (q254/q255 gate
  * the fixture pipelines; these pin the LIMIT behaviors that make the
  * approximation trustworthy). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 8 distinct 4-dim vectors, ids 0..7
  private lazy val tiny = (0 until 8).map { i =>
    (i.toLong, Array(i * 1.0, (i % 3) * 2.0, 8.0 - i, (i % 2) * 5.0)
      .map(_.toFloat).toSeq)
  }.toDF("vec_id", "embedding")

  test("exact regime: k = n codebooks make ADC == exact (recall 1.0)") {
    // with one code per vector, every vector quantizes to itself after
    // one round (it IS its init centroid), so ADC distances equal exact
    // distances and recall@3 must be 1.0 for every query
    val cents = Pq.trainCodebooks(tiny, "vec_id", "embedding",
      dim = 4, m = 2, k = 8, rounds = 1)
    val r = Pq.adcRecall(tiny, tiny, "vec_id", "embedding",
        dim = 4, m = 2, cents, k = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r.size == 8 && r.values.forall(_ == 1.0), r)
  }

  test("IVF-PQ at nprobe = nlist degenerates to plain PQ-ADC") {
    val pq = Pq.trainCodebooks(tiny, "vec_id", "embedding",
      dim = 4, m = 2, k = 8, rounds = 1)
    val ivf = Clustering.kmeansCentroids(tiny, "vec_id", "embedding",
      k = 2, rounds = 1)
    val full = Pq.ivfAdcRecall(tiny, tiny, "vec_id", "embedding",
        dim = 4, m = 2, pq, ivf, nprobe = 2, k = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val flat = Pq.adcRecall(tiny, tiny, "vec_id", "embedding",
        dim = 4, m = 2, pq, k = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(full == flat, s"full=$full flat=$flat")
  }

  test("encode is deterministic and emits m codes per vector") {
    val cents = Pq.trainCodebooks(tiny, "vec_id", "embedding",
      dim = 4, m = 2, k = 4, rounds = 1)
    def run() = Pq.encode(tiny, "vec_id", "embedding", dim = 4, m = 2, cents)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val a = run(); val b = run()
    assert(a == b)
    assert(a.size == 8 * 2)
    assert(a.forall { case (_, s, code) =>
      s >= 0 && s < 2 && code >= 0 && code < 4 })
  }

  test("broadcast-join encode == literal-tree reference (r17 plan change)") {
    // r17 replaced encode's typedLit centroid projection with a
    // broadcast-relation join; this pins the two shapes to identical
    // codes on vectors with negatives and float-cast values, including
    // the (d, cid) tie-break (duplicate vectors quantize identically,
    // and k > distinct-subvector count forces distance ties onto the
    // carry-forward centroids).
    import org.apache.spark.sql.functions.{array, broadcast => _, _}
    val mixed = ((0 until 12).map { i =>
      (i.toLong, Array(-3.0 + i, (i % 2) * -5.0, 2.5 - i, i * 0.25)
        .map(_.toFloat).toSeq)
    } ++ Seq((12L, Seq(-3.0f, 0.0f, 2.5f, 0.0f)))) // duplicate of id 0
      .toDF("vec_id", "embedding")
    val cents = Pq.trainCodebooks(mixed, "vec_id", "embedding",
      dim = 4, m = 2, k = 8, rounds = 2)
    val joined = Pq.encode(mixed, "vec_id", "embedding", dim = 4, m = 2, cents)
    // literal-tree reference: the pre-r17 shape, inlined
    val cmap = cents.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
      .groupBy(_._1)
      .map { case (k2, rs) =>
        val arr = new Array[Double](rs.length)
        rs.foreach { case (_, (pos, v)) => arr(pos) = v }
        k2 -> arr
      }
    val xd = col("embedding").cast("array<double>")
    val perSub = (0 until 2).map { s =>
      val sv = slice(xd, s * 2 + 1, 2)
      val xx = graft.functions.StatFunctions.dotProduct(sv, sv)
      val scored = cmap.collect { case ((`s`, cid), c) =>
        val cc = c.map(v => v * v).sum
        struct(
          round(xx - lit(2.0) * graft.functions.StatFunctions
            .dotProduct(sv, typedLit(c.toSeq)) + lit(cc), 6).as("d"),
          lit(cid).as("cid"))
      }.toSeq
      struct(lit(s).as("s"),
        sort_array(array(scored: _*)).getItem(0).getField("cid").as("code"))
    }
    val literal = mixed
      .select(col("vec_id").as("id"), explode(array(perSub: _*)).as("sc"))
      .select(col("id"), col("sc.s").as("s"), col("sc.code").as("code"))
    val a = joined.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val b = literal.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(a == b, s"join=$a literal=$b")
    assert(a.size == 13 * 2)
  }

  test("partial nprobe can only shrink the candidate set (recall <= flat PQ + pruning visible)") {
    // clustered data: two well-separated groups; nprobe=1 restricts each
    // query to its own group, so neighbors from the other group cannot
    // appear even if ADC would rank them
    val grouped = ((0 until 6).map(i => (i.toLong,
        Seq(10f + i * 0.1f, 10f, 0f, 0f))) ++
      (6 until 12).map(i => (i.toLong,
        Seq(-10f - i * 0.1f, -10f, 0f, 0f)))).toDF("vec_id", "embedding")
    val pq = Pq.trainCodebooks(grouped, "vec_id", "embedding",
      dim = 4, m = 2, k = 8, rounds = 1)
    val ivf = Clustering.kmeansCentroids(grouped, "vec_id", "embedding",
      k = 2, rounds = 2)
    val r = Pq.ivfAdcRecall(grouped, grouped.where(col("vec_id") < 2),
        "vec_id", "embedding", dim = 4, m = 2, pq, ivf, nprobe = 1, k = 3)
      .collect()
    // the 3 exact neighbors of a group-A query are all group-A members,
    // which share its probed list: pruning loses nothing here
    assert(r.forall(_.getDouble(2) == 1.0), r.toSeq)
  }
}
