package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CheckpointRingSpec extends SparkSpec {
  import spark.implicits._

  test("rotate frees the generation before last, keeps the live ones") {
    val sc = spark.sparkContext
    val ring = new CheckpointRing(spark)
    val base = sc.getPersistentRDDs.keySet
    val a = ring.checkpoint(spark.range(100).toDF("x"))
    val aIds = sc.getPersistentRDDs.keySet.diff(base)
    assert(aIds.nonEmpty, "eager checkpoint registered no persistent RDD")
    ring.rotate() // prev = {a}
    val b = ring.checkpoint(a.withColumn("y", col("x") * 2))
    ring.rotate() // frees {a}, prev = {b}
    // a's RDDs must be OUT of the persistent registry; b's must remain
    val now = sc.getPersistentRDDs.keySet
    assert(aIds.forall(!now.contains(_)),
      s"superseded generation still registered: ${aIds.intersect(now)}")
    assert(b.count() === 100L) // live generation still readable
  }

  test("lazy checkpoints ride the ring; unmaterialized frees are no-ops") {
    val ring = new CheckpointRing(spark)
    ring.checkpoint(spark.range(10).toDF("x"), eager = false)
    ring.rotate()
    // a never materialized; rotating it away must not throw
    val b = ring.checkpoint(spark.range(10).toDF("x"), eager = false)
    ring.rotate()
    assert(b.count() === 10L)
  }

  test("connected components leaves only its final generation behind") {
    // a 64-node path graph forces multiple contraction rounds; without
    // the ring every round left 2 eager edge-set checkpoints registered
    // (observed: the round-11 driver stress trips on this family)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = ConnectedComponents.run(edges, "a", "b").collect()
    assert(labels.length === 64 && labels.forall(_.getLong(1) == 0L))
    val after = sc.getPersistentRDDs.size
    assert(after - before <= 2,
      s"CC leaked ${after - before} persistent RDDs (want final gen <= 2)")
  }
}
