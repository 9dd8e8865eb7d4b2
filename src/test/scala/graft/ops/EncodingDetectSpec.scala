package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** q352 gates the detector against CPython's strict decoder on the
  * planted fixture; this spec fuzzes the RFC 3629 state machine
  * against a THIRD independent validator — the JDK's own strict UTF-8
  * CharsetDecoder — across thousands of random and adversarially-
  * biased byte strings. */
class EncodingDetectSpec extends AnyFunSuite {

  private def jdkValid(b: Array[Byte]): Boolean =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(b))
      true
    } catch { case _: java.nio.charset.CharacterCodingException => false }

  test("validUtf8 agrees with the JDK strict decoder on 4000 fuzz blobs") {
    val rnd = new scala.util.Random(20260815L)
    // biased alphabet: leads, continuations, boundary bytes all common
    val biased = Array(0x00, 0x41, 0x7f, 0x80, 0x9f, 0xa0, 0xbf, 0xc0,
      0xc1, 0xc2, 0xdf, 0xe0, 0xec, 0xed, 0xef, 0xf0, 0xf3, 0xf4, 0xf5,
      0xff).map(_.toByte)
    for (trial <- 1 to 4000) {
      val len = rnd.nextInt(12)
      val b = Array.fill(len)(
        if (rnd.nextBoolean()) biased(rnd.nextInt(biased.length))
        else (rnd.nextInt(256) - 128).toByte)
      val want = jdkValid(b)
      val got = EncodingDetect.validUtf8(b)
      assert(got === want,
        s"trial $trial: ${b.map(x => f"${x & 0xff}%02x").mkString(" ")} " +
          s"jdk=$want ours=$got")
    }
  }

  test("detect: BOM order and edge blobs") {
    assert(EncodingDetect.detect(Array.empty[Byte]) === "ascii")
    // UTF-32LE BOM starts with the UTF-16LE BOM bytes: longest wins
    assert(EncodingDetect.detect(
      Array(0xff, 0xfe, 0x00, 0x00).map(_.toByte)) === "utf-32le")
    assert(EncodingDetect.detect(
      Array(0xff, 0xfe, 0x41, 0x00).map(_.toByte)) === "utf-16le")
    assert(EncodingDetect.detect("plain".getBytes) === "ascii")
    assert(EncodingDetect.detect(
      Array(0xe9).map(_.toByte)) === "latin-1") // lone é in latin-1
  }
}
