package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SequencePack]] invariants on randomized data (q382/q383 gate the
  * exact values; this pins the packing LAWS on shapes the fixtures
  * don't enumerate). */
class SequencePackSpec extends SparkSpec {

  private val budget = 64L

  private def randomDocs(n: Int, seed: Long) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val g = s"g${rng.nextInt(7)}"
      // mix: small, boundary-ish, oversize, zero
      val tok = rng.nextInt(4) match {
        case 0 => rng.nextInt(20).toLong
        case 1 => 50L + rng.nextInt(20)
        case 2 => budget + 1 + rng.nextInt(40)
        case _ => 0L
      }
      (g, i.toLong, tok)
    }.toDF("g", "id", "tok")
  }

  test("packNextFit laws: fills bounded unless oversize-singleton, " +
    "pack ids contiguous from 0 per group, all docs kept") {
    val docs = randomDocs(400, seed = 11L)
    val packed = SequencePack
      .packNextFit(docs, "id", "g", "tok", budget).cache()
    assert(packed.count() === 400) // nothing dropped
    val fills = packed.groupBy("g", "pack_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"),
        max(col("oversize").cast("int")).as("has_over"),
        sum(when(!col("oversize"), col("n_tokens")).otherwise(lit(0L)))
          .as("companion_tokens"),
        sum(col("oversize").cast("long")).as("n_over"))
      .collect()
    fills.foreach { r =>
      val (fill, over) = (r.getLong(2), r.getInt(4))
      if (over == 1) {
        // an oversize doc shares its pack only with ZERO-token docs
        // (a zero-token doc leaves fill at 0, so the oversize doc
        // still lands on an empty-by-tokens pack) and never with
        // another oversize doc
        assert(r.getLong(5) === 0L, s"oversize pack has tokens: $r")
        assert(r.getLong(6) === 1L, s"two oversize docs share: $r")
      } else assert(fill <= budget, s"pack overfilled: $r")
    }
    // pack ids contiguous from 0 within each group
    packed.groupBy("g")
      .agg(min("pack_id").as("mn"), max("pack_id").as("mx"),
        countDistinct("pack_id").as("nd"))
      .collect().foreach { r =>
        assert(r.getLong(1) === 0L, s"first pack not 0: $r")
        assert(r.getLong(3) === r.getLong(2) + 1, s"pack gap: $r")
      }
    packed.unpersist()
    ()
  }

  test("packConcat laws: offsets are the prefix sum (+sep), chunks " +
    "cover exactly the doc's token span, empty docs sit at their " +
    "offset") {
    val docs = randomDocs(300, seed = 23L)
    val sep = 1L
    val out = SequencePack
      .packConcat(docs, "id", "g", "tok", budget, sep)
      .orderBy("g", "id").collect()
    var curG: String = null
    var expect = 0L
    out.foreach { r =>
      val (g, n, start, fc, lc) = (r.getString(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      if (g != curG) { curG = g; expect = 0L }
      assert(start === expect, s"offset drift at $r")
      assert(fc === start / budget)
      assert(lc === (if (n > 0) (start + n - 1) / budget
        else start / budget))
      assert(lc >= fc)
      expect = start + n + sep
    }
  }
}
