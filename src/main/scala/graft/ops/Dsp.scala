package graft.ops

/** PORTABLE signal-processing kernels — every operation here is a
  * fixed sequence of IEEE-754 double ops (+, −, ×, ÷, sqrt — all
  * correctly rounded by the standard) or a spec'd Taylor polynomial,
  * so an independent implementation that follows the same sequence
  * (scripts/gen_audio_spectral.py does, in Python) produces BIT
  * IDENTICAL doubles. That is what lets the q349 spectral gate demand
  * exact value equality instead of a tolerance: platform `sin`/`cos`
  * differ between JVMs and libms by ulps, so trig here is the
  * documented polynomial, not `Math.sin`.
  *
  * Taylor trig: argument reduced to [−π, π] by one conditional ±2π
  * (callers pass angles in (−2π, 2π)), then Horner evaluation of the
  * degree-21/20 Maclaurin series — truncation ≈ 1e-11 at |x| = π,
  * irrelevant next to the parity guarantee.
  */
object Dsp {

  final val TwoPi = 6.283185307179586

  private val SinC = Array(
    1.0, -0.16666666666666666, 0.008333333333333333,
    -0.0001984126984126984, 2.7557319223985893e-06,
    -2.505210838544172e-08, 1.6059043836821613e-10,
    -7.647163731819816e-13, 2.8114572543455206e-15,
    -8.22063524662433e-18, 1.9572941063391263e-20)

  private val CosC = Array(
    1.0, -0.5, 0.041666666666666664, -0.001388888888888889,
    2.48015873015873e-05, -2.755731922398589e-07, 2.08767569878681e-09,
    -1.1470745597729725e-11, 4.779477332387385e-14,
    -1.5619206968586225e-16, 4.110317623312165e-19)

  /** Spec'd portable sine for x in (−2π, 2π). */
  def sinP(x0: Double): Double = {
    var x = x0
    if (x > 3.141592653589793) x -= TwoPi
    if (x < -3.141592653589793) x += TwoPi
    val x2 = x * x
    var s = SinC(10)
    var k = 9
    while (k >= 0) { s = s * x2 + SinC(k); k -= 1 }
    x * s
  }

  /** Spec'd portable cosine for x in (−2π, 2π). */
  def cosP(x0: Double): Double = {
    var x = x0
    if (x > 3.141592653589793) x -= TwoPi
    if (x < -3.141592653589793) x += TwoPi
    val x2 = x * x
    var s = CosC(10)
    var k = 9
    while (k >= 0) { s = s * x2 + CosC(k); k -= 1 }
    s
  }

  /** In-place iterative radix-2 DIT FFT (n a power of two): bit-reversal
    * permutation, then for len = 2, 4, …, n butterflies with twiddle
    * exp(−2πi·j/len) from the portable trig — the EXACT op sequence the
    * python twin replays. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, "fft: n must be 2^k")
    // bit reversal
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val half = len >> 1
      var jj = 0
      while (jj < half) {
        val ang = -TwoPi * jj / len
        val wr = cosP(ang)
        val wi = sinP(ang)
        var base = jj
        while (base < n) {
          val p = base
          val q = base + half
          val xr = re(q) * wr - im(q) * wi
          val xi = re(q) * wi + im(q) * wr
          re(q) = re(p) - xr
          im(q) = im(p) - xi
          re(p) = re(p) + xr
          im(p) = im(p) + xi
          base += len
        }
        jj += 1
      }
      len <<= 1
    }
  }

  /** Spec'd Hann window value for position n of an N-point window:
    * 0.5 − 0.5·cosP(2π·n/(N−1)). */
  def hann(n: Int, size: Int): Double =
    0.5 - 0.5 * cosP(TwoPi * n / (size - 1))
}
