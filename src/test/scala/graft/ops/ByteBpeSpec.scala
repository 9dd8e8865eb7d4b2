package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** GPT-2 byte-level BPE edges (q372 gates the fixture corpus against
  * the independent twin; this pins the scanner/merge corners). */
class ByteBpeSpec extends AnyFunSuite {

  test("bytes-to-unicode is the published table") {
    assert(ByteBpe.byteToUnicode(' '.toInt) === 'Ġ') // Ġ
    assert(ByteBpe.byteToUnicode('A'.toInt) === 'A')      // printable
    assert(ByteBpe.byteToUnicode(0) === 'Ā')         // first gap
    assert(ByteBpe.byteToUnicode(0xAD) !== 0xAD.toChar)   // soft hyphen
    assert(ByteBpe.byteToUnicode.distinct.length === 256) // bijective
  }

  test("pretokenizer: contractions, leading space, ws lookahead") {
    assert(ByteBpe.pretokenize("it's") === Seq("it", "'s"))
    assert(ByteBpe.pretokenize("a b") === Seq("a", " b"))
    assert(ByteBpe.pretokenize("a  b") === Seq("a", " ", " b"))
    assert(ByteBpe.pretokenize("a\n b") === Seq("a", "\n", " b"))
    assert(ByteBpe.pretokenize("x12y") === Seq("x", "12", "y"))
    assert(ByteBpe.pretokenize("hi!!") === Seq("hi", "!!"))
    assert(ByteBpe.pretokenize(" 's") === Seq(" '", "s"))
    assert(ByteBpe.pretokenize("end ") === Seq("end", " "))
    assert(ByteBpe.pretokenize("") === Seq.empty)
  }

  test("merge application follows rank, fuses all occurrences") {
    val ranks = Map(("a", "b") -> 0, ("ab", "ab") -> 1)
    assert(ByteBpe.applyMerges("abab", ranks) === Seq("abab"))
    val r2 = Map(("b", "c") -> 0, ("a", "b") -> 1)
    // rank 0 fires first even though (a,b) appears earlier in the token
    assert(ByteBpe.applyMerges("abc", r2) === Seq("a", "bc"))
  }

  test("supplementary plane: astral chars classify as 'other' per " +
    "UTF-16 unit, pairs never split, UTF-8 stays 4-byte proper") {
    // letter runs break around the astral run; the pair stays whole
    assert(ByteBpe.pretokenize("a𝕏b") ===
      Seq("a", "𝕏", "b"))
    // adjacent astral chars form ONE other-run (with its lead space)
    assert(ByteBpe.pretokenize("x 𝕏𝕐 y") ===
      Seq("x", " 𝕏𝕐", " y"))
    // 4 proper UTF-8 bytes -> 4 symbols, never CESU-8's 6
    assert(ByteBpe.applyMerges("𝕏", Map.empty).length === 4)
    val utf8 = "𝕏".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(ByteBpe.applyMerges("𝕏", Map.empty) ===
      utf8.toSeq.map(b => ByteBpe.byteToUnicode(b & 0xff).toString))
  }

  test("decode inverts encode: round trip exact for BMP, astral, " +
    "raw high bytes; hostile tokens never throw") {
    val ranks = Map(("h", "e") -> 0, ("t", "he") -> 1)
    for (t <- Seq("the cat", "café 𝕏𝕐💡", "a\nb\tc", "", "ÐÑÒ",
      " leading  and trailing ")) {
      val toks = ByteBpe.encodeText(t, ranks).mkString(" ")
      assert(ByteBpe.decodeTokens(toks) === t, t)
    }
    assert(ByteBpe.decodeTokens(null) === "")
    // chars outside the 256-symbol alphabet are skipped, not thrown
    assert(ByteBpe.decodeTokens("ab 中 cd") === "abcd")
    // a torn multibyte sequence decodes to replacement, never throws
    val torn = ByteBpe.byteToUnicode(0xE4).toString // lone UTF-8 lead
    assert(ByteBpe.decodeTokens(torn) === "�")
  }

  test("realistic-scale merge table (>=1k merges, long pretokens): " +
    "optimized apply matches a naive reference implementation") {
    // Build a deterministic >=1k merge table the way a learned BPE
    // looks: chain merges over a small alphabet so deep cascades fire
    // (ab, abc, abcd, ...), plus cross products of short fragments.
    val alpha = "abcdefgh"
    val chains = (2 to 130).flatMap { len =>
      alpha.map { c0 =>
        val base = (0 until len).map(i =>
          alpha((c0 - 'a' + i) % alpha.length)).mkString
        (base.dropRight(1), base.takeRight(1))
      }
    }
    val cross = for {
      a <- Seq("ab", "cd", "ef", "gh", "bc", "de", "fg")
      b <- Seq("ab", "cd", "ef", "gh", "bc", "de", "fg")
    } yield (a, b)
    val merges = (chains ++ cross).distinct
    assert(merges.length >= 1000, s"only ${merges.length} merges")
    val ranks = merges.zipWithIndex.toMap

    // naive reference: recover the winning pair by scanning the FULL
    // rank map (the shape the optimized loop replaced) — independent
    // of the production path, so a fusion bug cannot self-certify
    def naive(pretoken: String): Seq[String] = {
      var parts: Vector[String] = pretoken
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .toVector.map(b => ByteBpe.byteToUnicode(b & 0xff).toString)
      var done = parts.length < 2
      while (!done) {
        val present = parts.indices.dropRight(1)
          .flatMap(k => ranks.get((parts(k), parts(k + 1)))
            .map(r => (r, (parts(k), parts(k + 1)))))
        if (present.isEmpty) done = true
        else {
          val (_, (a, b)) = present.minBy(_._1)
          val nb = scala.collection.mutable.ArrayBuffer[String]()
          var k = 0
          while (k < parts.length) {
            if (k + 1 < parts.length && parts(k) == a && parts(k + 1) == b) {
              nb += a + b; k += 2
            } else { nb += parts(k); k += 1 }
          }
          parts = nb.toVector
          done = parts.length < 2
        }
      }
      parts
    }

    val rng = new scala.util.Random(42)
    val pretokens = (0 until 50).map { _ =>
      (0 until (200 + rng.nextInt(600)))
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString
    } ++ Seq(alpha * 100, "abcdefgh" * 50) // worst-case deep cascades
    pretokens.foreach { p =>
      assert(ByteBpe.applyMerges(p, ranks) === naive(p), p.take(40))
    }
  }
}
