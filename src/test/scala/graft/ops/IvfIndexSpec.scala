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

  test("persisted index: write/load round-trip with partition-pruned search") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = emb.where(col("vec_id") < 3)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString

    val built = IvfIndex.build(emb, "vec_id", "embedding", nlist = 8)
    IvfIndex.write(built, dir)
    val loaded = IvfIndex.load(spark, dir)

    // layout: one directory per posting list
    val listDirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName).sorted
    assert(listDirs.length == 8, s"expected 8 list dirs, got ${listDirs.toSeq}")

    val q = IvfIndex.search(loaded, probes, "vec_id", "embedding",
      k = 5, nprobe = 2)
    // the postings scan must carry a STATIC partition filter on list_id
    // pruning to the probed lists — the layout's whole point
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains(s"$dir/postings".replace("/", java.io.File.separator)))
    assert(scans.nonEmpty, "no postings scan found in plan")
    assert(scans.exists(s => s.contains("PartitionFilters") &&
      s.contains("list_id") && s.contains("IN (")),
      s"postings scan not partition-pruned:\n${scans.mkString("\n")}")

    // and the loaded index answers exactly like the in-memory one
    val fromMem = IvfIndex.search(built, probes, "vec_id", "embedding",
      k = 5, nprobe = 2).collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet == fromMem)
  }
}
