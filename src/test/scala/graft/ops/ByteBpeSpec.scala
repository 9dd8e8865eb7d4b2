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
}
