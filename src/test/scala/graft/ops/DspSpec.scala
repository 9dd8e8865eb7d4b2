package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Numerical sanity of the portable DSP kernels (q349 gates the
  * bit-parity contract vs the python replay; this pins that the
  * spec'd polynomials and the FFT are also CORRECT, not just
  * reproducible). */
class DspSpec extends AnyFunSuite {

  test("portable trig tracks libm within 1e-9 across (-2pi, 2pi)") {
    var worst = 0.0
    var x = -6.2
    while (x < 6.2) {
      worst = math.max(worst, math.abs(Dsp.sinP(x) - math.sin(x)))
      worst = math.max(worst, math.abs(Dsp.cosP(x) - math.cos(x)))
      x += 0.0137
    }
    assert(worst < 1e-9, s"portable trig drifted: $worst")
  }

  test("fft matches a direct DFT and preserves energy (Parseval)") {
    val n = 64
    val re = Array.tabulate(n)(i =>
      math.sin(2 * math.Pi * 5 * i / n) + 0.25 * ((i * 37 % 11) - 5))
    val im = new Array[Double](n)
    val (fr, fi) = (re.clone(), im.clone())
    Dsp.fft(fr, fi)
    // direct DFT
    for (k <- 0 until n) {
      var sr = 0.0; var si = 0.0
      for (t <- 0 until n) {
        val a = -2 * math.Pi * k * t / n
        sr += re(t) * math.cos(a); si += re(t) * math.sin(a)
      }
      assert(math.abs(fr(k) - sr) < 1e-8, s"re[$k]: ${fr(k)} vs $sr")
      assert(math.abs(fi(k) - si) < 1e-8, s"im[$k]: ${fi(k)} vs $si")
    }
    val time = re.map(x => x * x).sum
    val freq = (0 until n).map(k => fr(k) * fr(k) + fi(k) * fi(k)).sum / n
    assert(math.abs(time - freq) < 1e-8, s"Parseval: $time vs $freq")
  }

  test("fft rejects non-power-of-two lengths loudly") {
    intercept[IllegalArgumentException] {
      Dsp.fft(new Array[Double](48), new Array[Double](48))
    }
  }
}
