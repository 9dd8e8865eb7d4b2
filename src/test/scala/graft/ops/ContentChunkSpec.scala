package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ContentChunk]] algorithmic properties (q384 gates exact chunk
  * values against the python twin; this pins the LAWS that make CDC
  * worth having over fixed-width blocks). */
class ContentChunkSpec extends SparkSpec {

  private def text(seed: Long, n: Int): String = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
  }

  test("insertion re-anchors locally: a byte inserted early leaves " +
    "the tail chunk identities unchanged (fixed-width would shift " +
    "every block)") {
    val base = text(7L, 4000)
    val edited = base.substring(0, 100) + "X" + base.substring(100)
    def hashes(t: String): Seq[(Long, Long)] = {
      val bytes = t.getBytes("UTF-8")
      ContentChunk.chunks(bytes, 32, 6, 256).map(c => (c._3, c._2))
    }
    val a = hashes(base)
    val b = hashes(edited)
    // the suffix far past the edit must chunk identically
    val tailA = a.takeRight(10)
    val tailB = b.takeRight(10)
    assert(tailA === tailB, "tail chunks changed after an early edit")
    // but the chunk containing the edit did change
    assert(a !== b)
  }

  test("size bounds: every chunk in [1, maxSize]; gear cuts only at " +
    ">= minSize; lengths tile the byte length") {
    val bytes = text(11L, 10000).getBytes("UTF-8")
    val cs = ContentChunk.chunks(bytes, 32, 6, 256)
    assert(cs.map(_._2).sum === bytes.length)
    cs.foreach { case (_, len, _) => assert(len >= 1 && len <= 256) }
    // all but the tail respect minSize (the tail may be short)
    cs.dropRight(1).foreach { case (_, len, _) => assert(len >= 32) }
    // offsets are contiguous
    cs.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o2 === o1 + l1)
      case _ => ()
    }
  }

  test("sharedChunks finds the pasted span across documents") {
    import spark.implicits._
    val span = text(13L, 2000)
    val docs = Seq(
      (1L, "aaa prefix " + span + " suffix one"),
      (2L, "a completely different and longer start here " + span),
      (3L, "unrelated " + text(17L, 500))
    ).toDF("doc_id", "text")
    val ch = ContentChunk.chunkText(docs, "doc_id", "text", 32, 6, 256)
    val shared = ContentChunk.sharedChunks(ch)
      .agg(sum(col("n_occurrences")).as("occ"),
        max(col("n_docs")).as("mxd")).head()
    assert(shared.getLong(1) === 2L, "pasted span not found across docs")
    assert(shared.getLong(0) >= 4L)
  }

  test("reclaim keeps the globally-first occurrence and rebuilds " +
    "byte-exact kept content (conservation: kept+dropped = total)") {
    import spark.implicits._
    val span = text(13L, 2000)
    val docs = Seq(
      (1L, "aaa prefix " + span + " suffix one"),
      (2L, "a completely different and longer start here " + span),
      (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = ContentChunk.reclaim(docs, "doc_id", "text", 32, 6, 256)
      .collect().map(x => x.id -> x).toMap
    // doc 1 (lower id) owns the span's first occurrence: keeps all
    assert(r(1L).n_kept === r(1L).n_chunks)
    assert(r(1L).kept_bytes === r(1L).total_bytes)
    assert(new String(r(1L).kept_bin,
      java.nio.charset.StandardCharsets.UTF_8) ===
      "aaa prefix " + span + " suffix one")
    // doc 2 drops the shared interior chunks — strictly fewer kept
    assert(r(2L).n_kept < r(2L).n_chunks)
    assert(r(2L).kept_bytes < r(2L).total_bytes)
    // the rebuilt doc-2 content is its bytes minus the dropped chunks
    // — still a prefix+suffix of the original in document order
    val rebuilt = new String(r(2L).kept_bin,
      java.nio.charset.StandardCharsets.UTF_8)
    assert(rebuilt.startsWith("a completely different"))
    assert(r(2L).kept_bytes ===
      rebuilt.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    // empty/null docs: zero counters, empty bytes, present in output
    Seq(3L, 4L).foreach { id =>
      assert(r(id).n_chunks === 0 && r(id).kept_bytes === 0L &&
        r(id).kept_bin.isEmpty)
    }
  }
}
