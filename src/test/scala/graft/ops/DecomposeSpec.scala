package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecomposeSpec extends SparkSpec {
  import spark.implicits._

  test("urlParts decomposes a full URL") {
    val df = Seq("https://example.com/a/b?x=1#frag").toDF("u")
    val parts = Decompose.urlParts(col("u"))
    val r = df.select(parts("scheme"), parts("host"), parts("path"),
      parts("query"), parts("fragment")).head()
    assert(r.toSeq == Seq("https", "example.com", "/a/b", "x=1", "frag"))
  }

  test("pathParts decomposes a POSIX path") {
    val df = Seq("/data/en/src1/doc_42.txt").toDF("p")
    val parts = Decompose.pathParts(col("p"))
    val r = df.select(parts("parent"), parts("name"), parts("stem"),
      parts("suffix")).head()
    assert(r.toSeq == Seq("/data/en/src1", "doc_42.txt", "doc_42", ".txt"))
  }

  test("expandNested flattens structs and maps (expand_mixed)") {
    val df = Seq((1L, ("a", 2.0), Map("k1" -> 10, "k2" -> 20)))
      .toDF("id", "s", "m")
    val out = Decompose.expandNested(df, Map("m" -> Seq("k1", "k2")))
    assert(out.columns.toSeq == Seq("id", "s__1", "s__2", "m_k1", "m_k2") ||
      out.columns.toSeq == Seq("id", "s_1", "s_2", "m_k1", "m_k2"))
    val r = out.head()
    assert(r.getAs[Int]("m_k1") == 10 && r.getAs[Int]("m_k2") == 20)
  }

  test("canonicalizeMaps: int keys sort numerically, null map stays null") {
    import org.apache.spark.sql.functions._
    val df = Seq(1, 2).toDF("i").select(
      when(col("i") === 1,
          map(lit(10), lit("a"), lit(2), lit("b")))
        .otherwise(org.apache.spark.sql.functions.lit(null)
          .cast("map<int,string>")).as("m"),
      col("i"))
    val out = Decompose.canonicalizeMaps(df)
      .orderBy("i").select("m").collect()
    // sorted by INT key (2 < 10), not lexicographically ("10" < "2")
    assert(out(0).getString(0) == "[{2, b}, {10, a}]")
    assert(out(1).isNullAt(0))
    // empty map canonicalizes to "[]", grouping-stable
    val e = Seq(1).toDF("i")
      .select(map_filter(map(lit(1), lit("x")), (_, _) => lit(false)).as("m"))
    assert(Decompose.canonicalizeMaps(e).head().getString(0) == "[]")
  }

  test("urlCanonical: scheme/host case, www, ports, slashes, tracking, fragment") {
    val cases = Seq(
      // host+scheme lowercased, www and default port stripped
      ("HTTPS://WWW.Example.COM:443/a", "https://example.com/a"),
      ("http://example.com:80/", "http://example.com/"),
      // non-default port kept
      ("http://example.com:8080/a", "http://example.com:8080/a"),
      // trailing slashes stripped, root kept as /
      ("https://example.com", "https://example.com/"),
      ("https://example.com/a/b//", "https://example.com/a/b"),
      // tracking params go (all of them), real params stay in order
      ("https://example.com/a?utm_source=x&lang=en&fbclid=1&b=2",
        "https://example.com/a?lang=en&b=2"),
      ("https://example.com/a?utm_source=x&utm_campaign=y",
        "https://example.com/a"),
      // fragment dropped; path case preserved
      ("https://example.com/A/B#sec", "https://example.com/A/B"),
      // a '?' inside the fragment is NOT a query string
      ("https://site.com/app#/route?tab=1", "https://site.com/app"),
      // default ports are scheme-relative: these are real origins, keep them
      ("http://example.com:443/a", "http://example.com:443/a"),
      ("https://example.com:80/a", "https://example.com:80/a"),
      // non-absolute / malformed URLs pass through unchanged (no shared
      // '://' collapse key)
      ("example.com/a", "example.com/a"),
      ("mailto:someone@example.com", "mailto:someone@example.com"),
      ("not a url at all", "not a url at all"))
    val got = cases.map(_._1).toDF("url")
      .select(Decompose.urlCanonical(col("url")))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("fileStats over a temp directory via binaryFile source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-files")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "hello")
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "worldworld")
    val r = Multimodal.fileStats(spark, dir.toString + "/*.txt").head()
    assert(r.getAs[Long]("n_files") == 2)
    assert(r.getAs[Long]("total_bytes") == 15)
    assert(r.getAs[Long]("max_bytes") == 10)
  }
}
