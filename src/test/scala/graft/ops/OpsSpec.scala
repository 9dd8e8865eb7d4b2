package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content here with words"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "zz")                                           // shorter than shingle k
  ).toDF("doc_id", "text")

  test("exactDedup keeps one row per key, smallest keepBy") {
    val out = Dedup.exactDedup(docs, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 1L, 2L, 4L))
  }

  test("ngramJaccardPairs finds the exact and near duplicate") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = pairs.find(p => p._1 == 0 && p._2 == 3).get
    assert(exact._3 == 1.0)
    assert(pairs.exists(p => p._1 == 0 && p._2 == 1 && p._3 > 0.5))
    assert(!pairs.exists(p => p._2 == 2 || p._1 == 2))
  }

  test("minhash signatures: identical docs identical, near-dups mostly equal") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    assert(sig(0L) == sig(3L))
    val agree = sig(0L).zip(sig(1L)).count { case (a, b) => a == b }
    assert(agree >= 8, s"only $agree/16 minhashes agree for near-dups")
    assert(!sig.contains(4L)) // too short for shingles
  }

  test("minhash LSH end-to-end finds dup pairs and verifies jaccard") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((0L, 3L)))
  }

  test("simhash: exact dups equal, near-dups close in hamming distance") {
    val sh = Dedup.simhash(docs, "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(2L)))
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine") {
    val out = Similarity.bruteForceTopK(
      vecs.where($"vec_id" === 0), vecs, "vec_id", "embedding", 2)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rnk")))
    assert(out.toSeq.sortBy(_._2).map(_._1) == Seq(1L, 2L))
  }

  test("hyperplane LSH: same vector same bucket, deterministic") {
    val b1 = Similarity.hyperplaneLshBuckets(vecs, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.hyperplaneLshBuckets(vecs, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2) // no RNG state — reproducible
  }

  test("lshNearDupPairs: bit-identical to all-pairs on real embeddings, no cartesian") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lsh = Dedup.lshNearDupPairs(emb, "vec_id", "embedding", 0.4)
    // scale shape: candidates come from equi-joins only
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "LSH near-dup plan must not contain a cross join")
    val got = lsh.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"recall/precision mismatch: missed=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty)
  }

  test("srpBandBuckets matches the SQL-expression hyperplane hash family") {
    // band 0 of srpBandBuckets uses planes 0..7 — same family as
    // hyperplaneLshBuckets(planes=8), so bucket ids must be identical
    val sql = Similarity.hyperplaneLshBuckets(vecs, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = Similarity.srpBandBuckets(vecs, "vec_id", "embedding", 8, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fused == sql)
  }

  test("text analysis: langId picks stopword language, counts deterministic") {
    val df = Seq(
      (0L, "the cat and the dog in the house"),
      (1L, "der Hund und die Katze ist nicht da"),
      (2L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.analyze(df, "text")
      .select("doc_id", "lang_pred", "n_tokens_ws", "quality_score")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(0L) == "en")
    assert(out(1L) == "de")
    assert(out(2L) == "und")
  }

  test("multimodal: decodeMeta via mapPartitions with stub codec") {
    val blobs = docs.select($"doc_id", $"text".cast("binary").as("blob"))
    val metas = Multimodal.decodeMeta(blobs, "doc_id", "blob").collect()
    assert(metas.length == 5)
    val m0 = metas.find(_.id == 0L).get
    assert(m0.byteLength == 43)
    assert(m0.format.startsWith("fake/"))
    // deterministic: same input, same meta
    val again = Multimodal.decodeMeta(blobs, "doc_id", "blob").collect()
      .find(_.id == 0L).get
    assert(again == m0)
  }

  test("multimodal: frame sampling preserves chunk indices") {
    val big = Seq((1L, Array.fill[Byte](1000)(7))).toDF("id", "blob")
    val frames = Multimodal.sampleFrames(big, "id", "blob", stride = 2)
      .collect().map(r => r.getAs[Int]("frame_idx")).sorted
    assert(frames.toSeq == Seq(0, 2)) // chunks 0..3, stride 2
  }
}
