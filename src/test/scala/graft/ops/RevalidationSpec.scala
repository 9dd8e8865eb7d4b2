package graft.ops

import graft.SparkSpec

/** [[Revalidation]] mechanics at unit scale (q412 gates the
  * corpus-scale construction): the five reconciliation classes, byte
  * attribution, and the functional guard on both sides. */
class RevalidationSpec extends SparkSpec {
  import spark.implicits._

  test("ledger: all five classes and their byte attribution") {
    val prev = Seq(
      ("http://a.example/1", "h1", Some("e1")),  // unchanged + etag
      ("http://a.example/2", "h2", None),        // unchanged, no etag
      ("http://a.example/3", "h3old", Some("e3")), // modified
      ("http://a.example/4", "h4", None)         // gone
    ).toDF("url", "hash", "validator")
    val cur = Seq(
      ("http://a.example/1", "h1", 100L),
      ("http://a.example/2", "h2", 200L),
      ("http://a.example/3", "h3", 300L),
      ("http://a.example/5", "h5", 400L)         // new
    ).toDF("url", "hash", "bytes")
    val r = Revalidation.ledger(prev, "url", "hash", "validator",
      cur, "url", "hash", "bytes").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "a.example")
    assert((row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5)) === ((1L, 1L, 1L, 1L, 1L)))
    assert(row.getLong(6) === 100L, "saved = 304-eligible body bytes")
    assert(row.getLong(7) === 200L, "wasted = blind-refetch body bytes")
    assert(row.getLong(8) === 700L, "paid = modified + new transfers")
  }

  test("ledger: a modified page with no validator is still modified") {
    val prev = Seq(("http://b.example/1", "old", None: Option[String]))
      .toDF("url", "hash", "validator")
    val cur = Seq(("http://b.example/1", "new", 10L))
      .toDF("url", "hash", "bytes")
    val row = Revalidation.ledger(prev, "url", "hash", "validator",
      cur, "url", "hash", "bytes").collect().head
    assert(row.getLong(3) === 1L)
    assert(row.getLong(8) === 10L)
  }

  test("ledger: duplicate URL within one side is rejected loudly") {
    val prev = Seq(
      ("http://a.example/1", "h1", Some("e")),
      ("http://a.example/1", "h2", Some("e"))
    ).toDF("url", "hash", "validator")
    val cur = Seq(("http://a.example/1", "h1", 1L))
      .toDF("url", "hash", "bytes")
    val e = intercept[IllegalArgumentException] {
      Revalidation.ledger(prev, "url", "hash", "validator",
        cur, "url", "hash", "bytes")
    }
    assert(e.getMessage.contains("functional"))
  }
}
