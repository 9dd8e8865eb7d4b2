package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column API") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      """SELECT graft_dot(cast(array(1.0, 2.0) as array<double>),
                          cast(array(3.0, 4.0) as array<double>)) AS d""")
      .head().getDouble(0)
    assert(d == 11.0)
    val g = spark.sql(
      "SELECT graft_word_ngrams('The quick the QUICK', 2, true) AS g")
      .head().getSeq[String](0)
    assert(g == Seq("the quick", "quick the"))
    // defaults: n = 1, multiplicity kept
    val w = spark.sql("SELECT graft_word_ngrams('A b a') AS w")
      .head().getSeq[String](0)
    assert(w == Seq("a", "b", "a"))
    // null-safe
    assert(spark.sql("SELECT graft_word_ngrams(cast(null as string)) AS w")
      .head().isNullAt(0))
  }

  test("graft_normalize: NFC composition, form arg, null safety, codegen parity") {
    GraftFunctions.register(spark)
    // decomposed e + U+0301 composes to U+00E9 under NFC
    val nfc = spark.sql("SELECT graft_normalize('cafe\\u0301') AS s")
      .head().getString(0)
    assert(nfc == "caf\u00e9")
    // NFD decomposes the precomposed form back
    val nfd = spark.sql("SELECT graft_normalize('caf\\u00e9', 'NFD') AS s")
      .head().getString(0)
    assert(nfd == "cafe\u0301")
    // NFKC folds compatibility chars (U+FB01 LATIN SMALL LIGATURE FI)
    val nfkc = spark.sql("SELECT graft_normalize('\\ufb01n', 'NFKC') AS s")
      .head().getString(0)
    assert(nfkc == "fin")
    assert(spark.sql("SELECT graft_normalize(cast(null as string)) AS s")
      .head().isNullAt(0))
    // column API over a distributed plan (codegen path) agrees
    import spark.implicits._
    val viaCol = Seq("cafe\u0301", "plain ascii").toDF("t")
      .select(UnicodeNormalizeExpr.normalize(org.apache.spark.sql.functions.col("t")))
      .as[String].collect().toSeq
    assert(viaCol == Seq("caf\u00e9", "plain ascii"))
  }

  test("cleanText strips controls, keeps tab/newline/format chars, composes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("a\u0007bc\td\ne\u200Bf cafe\u0301")
      .toDF("t").select(graft.ops.TextAnalysis.cleanText(col("t")))
      .as[String].head()
    assert(out == "abc\td\ne\u200Bf caf\u00e9")
  }

  test("non-literal n is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_ngrams('a b', 1 + 1) AS g").collect()
    }
    assert(e.getMessage.contains("graft_word_ngrams") ||
      e.getMessage.contains("literal"))
  }

  test("graft_top_k: heap matches window top-k, survives merge and compaction") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, posexplode}
    // 5000 rows, 7 groups, many partitions: forces partial-buffer
    // serialization + merge and in-buffer compaction
    val df = (0L until 5000L).map { i =>
      (s"g${i % 7}", (i * 2654435761L) % 1000L, i)
    }.toDF("g", "ord", "id").repartition(16)
    val got = df.groupBy("g")
      .agg(graft.functions.BoundedTopK.topK(col("ord"), col("id"), 5)
        .as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.ord"), col("t.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    // expected: per group, sort by (ord desc, id asc) and take 5
    val expected = (0L until 5000L)
      .map(i => (s"g${i % 7}", (i * 2654435761L) % 1000L, i))
      .groupBy(_._1)
      .flatMap { case (g, rows) =>
        rows.sortBy { case (_, o, i) => (-o, i) }.take(5).zipWithIndex
          .map { case ((_, o, i), p) => (g, p, o, i) }
      }.toSet
    assert(got == expected)
    // SQL surface agrees with the Column API
    df.createOrReplaceTempView("graft_topk_rows")
    val viaSql = spark.sql(
      """SELECT g, graft_top_k(ord, id, 5) AS top
         FROM graft_topk_rows GROUP BY g""")
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.ord"), col("t.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(viaSql == expected)
    // ties break by id asc; groups smaller than k return what exists
    val ties = Seq(("a", 9L, 2L), ("a", 9L, 1L), ("b", 1L, 5L))
      .toDF("g", "ord", "id")
    val t = ties.groupBy("g")
      .agg(graft.functions.BoundedTopK.topK(col("ord"), col("id"), 2)
        .as("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getLong(0), x.getLong(1)))).toMap
    assert(t("a") == Seq((9L, 1L), (9L, 2L)))
    assert(t("b") == Seq((1L, 5L)))
  }
}
