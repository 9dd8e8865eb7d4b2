package graft.ops

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {

  test("IVF search recall vs brute force on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.where(org.apache.spark.sql.functions.col("vec_id") < 5)

    val exact = Similarity
      .bruteForceTopK(probes, emb, "vec_id", "embedding", 5)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

    val index = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    val approx = IvfIndex
      .search(index, probes, "vec_id", "embedding", k = 5, nprobe = 4)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

    assert(approx.keySet == exact.keySet)
    // nprobe=4 of nlist=8 scans half the corpus: expect decent recall
    val recall = exact.map { case (q, ids) =>
      approx(q).intersect(ids).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    // determinism: same seed, same results
    val index2 = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    val approx2 = IvfIndex
      .search(index2, probes, "vec_id", "embedding", k = 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val approx1 = IvfIndex
      .search(index, probes, "vec_id", "embedding", k = 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(approx1 == approx2)
  }
}
