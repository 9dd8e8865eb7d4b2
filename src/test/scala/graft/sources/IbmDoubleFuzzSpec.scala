package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz of the XPORT IBM S/360 double decoder against an
  * independent ENCODER implemented here straight from TS-140 app. A
  * (sign bit, 7-bit base-16 exponent biased 64, 56-bit fraction).
  * For any IEEE double in IBM's range the round trip must be
  * bit-identical — the 56-bit fraction holds the 53-bit mantissa
  * losslessly. No Spark needed. */
class IbmDoubleFuzzSpec extends AnyFunSuite {

  private def ibmEncode(x0: Double): Array[Byte] = {
    if (x0 == 0.0) return new Array[Byte](8)
    var x = x0
    var sign = 0
    if (x < 0) { sign = 0x80; x = -x }
    var e = math.floor(math.log(x) / math.log(16.0)).toInt + 1
    var m = x / math.pow(16.0, e)
    while (m >= 1.0) { e += 1; m = x / math.pow(16.0, e) }
    while (m < 1.0 / 16.0) { e -= 1; m = x / math.pow(16.0, e) }
    var frac = math.rint(m * math.pow(2.0, 56)).toLong
    if (frac >= (1L << 56)) { frac >>= 4; e += 1 }
    val out = new Array[Byte](8)
    out(0) = (sign | (e + 64)).toByte
    var i = 7
    var f = frac
    while (i >= 1) { out(i) = (f & 0xff).toByte; f >>= 8; i -= 1 }
    out
  }

  private def decode(b: Array[Byte]): Any = XptFormat.ibmToIeee(b, 0)

  test("round-trips bit-identically across magnitudes and signs") {
    val rnd = new scala.util.Random(140)
    val fixed = Seq(0.0, 1.0, -1.0, 0.1, -0.1, 0.5, 16.0, 1.0 / 16,
      3.25, -17.5, 1e10, 1e-10, 123456.789, -9.87e20, 4.2e-30)
    val cases = fixed ++ (1 to 500).map { _ =>
      val mag = math.pow(10.0, rnd.nextInt(60) - 30)
      (rnd.nextDouble() * 2 - 1) * mag
    }
    cases.foreach { x =>
      val got = decode(ibmEncode(x))
      assert(got != null, s"$x decoded to missing")
      val g = got.asInstanceOf[java.lang.Double].doubleValue()
      assert(java.lang.Double.doubleToLongBits(g) ===
        java.lang.Double.doubleToLongBits(x),
        f"$x%.17g -> $g%.17g")
    }
  }

  test("missing codes decode to null; zero fraction to 0.0") {
    val dot = '.'.toByte +: new Array[Byte](7)
    assert(decode(dot) == null)
    val a = 'A'.toByte +: new Array[Byte](7)
    assert(decode(a) == null)
    val us = '_'.toByte +: new Array[Byte](7)
    assert(decode(us) == null)
    assert(decode(new Array[Byte](8))
      .asInstanceOf[java.lang.Double].doubleValue() === 0.0)
  }
}
