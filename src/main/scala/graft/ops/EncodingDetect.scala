package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Charset detection over a raw-bytes column — ingestion step zero
  * for a web/file corpus (before [[HtmlExtract]] or any text op can
  * run, the bytes must become a string, and guessing wrong silently
  * mojibakes the corpus).
  *
  * Deterministic spec, gated in q352 against CPython's OWN strict
  * UTF-8 decoder (a genuinely independent validator — the fixture
  * twin labels each blob by what `bytes.decode('utf-8')` accepts, so
  * the hand-rolled RFC 3629 state machine below is certified against
  * a real-world reference implementation, not a re-derivation):
  *
  *  1. BOM sniff, longest first: UTF-32 LE/BE, UTF-16 LE/BE,
  *     UTF-8 BOM → `utf-32le/be`, `utf-16le/be`, `utf-8-bom`.
  *  2. Otherwise, all bytes < 0x80 → `ascii`.
  *  3. Otherwise, strict UTF-8 validation — RFC 3629: continuation
  *     byte counts, no overlongs (C0/C1 banned; E0 requires A0–BF;
  *     F0 requires 90–BF), no surrogates (ED A0–BF banned), max
  *     U+10FFFF (F4 caps at 8F; F5–FF banned), no truncated tail
  *     → `utf-8`.
  *  4. Anything else → `latin-1` (the decode-anything fallback every
  *     real pipeline uses).
  *
  * Also returns byte length and the non-ASCII byte count (the mass
  * the guess actually affects). Map-only; null bytes → empty blob →
  * `ascii` with 0 bytes.
  */
object EncodingDetect {

  /** Spec'd detector; exposed for direct reuse and tests. */
  def detect(b: Array[Byte]): String = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    if (n >= 4 && u(0) == 0xff && u(1) == 0xfe && u(2) == 0 && u(3) == 0)
      return "utf-32le"
    if (n >= 4 && u(0) == 0 && u(1) == 0 && u(2) == 0xfe && u(3) == 0xff)
      return "utf-32be"
    if (n >= 3 && u(0) == 0xef && u(1) == 0xbb && u(2) == 0xbf)
      return "utf-8-bom"
    if (n >= 2 && u(0) == 0xff && u(1) == 0xfe) return "utf-16le"
    if (n >= 2 && u(0) == 0xfe && u(1) == 0xff) return "utf-16be"
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (u(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return "ascii"
    if (validUtf8(b)) "utf-8" else "latin-1"
  }

  /** Strict RFC 3629 validation (overlongs, surrogates, > U+10FFFF and
    * truncation all rejected) — the contract CPython's strict decoder
    * enforces, certified against it in q352. */
  def validUtf8(b: Array[Byte]): Boolean = {
    val n = b.length
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c >= 0xc2 && c <= 0xdf) {
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c == 0xe0) {
        if (i + 2 >= n || (b(i + 1) & 0xff) < 0xa0 ||
          (b(i + 1) & 0xff) > 0xbf || (b(i + 2) & 0xc0) != 0x80)
          return false
        i += 3
      } else if (c >= 0xe1 && c <= 0xec) {
        if (i + 2 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c == 0xed) {
        // surrogates U+D800–DFFF are ED A0 80 .. ED BF BF: banned
        if (i + 2 >= n || (b(i + 1) & 0xff) < 0x80 ||
          (b(i + 1) & 0xff) > 0x9f || (b(i + 2) & 0xc0) != 0x80)
          return false
        i += 3
      } else if (c >= 0xee && c <= 0xef) {
        if (i + 2 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c == 0xf0) {
        if (i + 3 >= n || (b(i + 1) & 0xff) < 0x90 ||
          (b(i + 1) & 0xff) > 0xbf || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else if (c >= 0xf1 && c <= 0xf3) {
        if (i + 3 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80)
          return false
        i += 4
      } else if (c == 0xf4) {
        if (i + 3 >= n || (b(i + 1) & 0xff) < 0x80 ||
          (b(i + 1) & 0xff) > 0x8f || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false // 0x80–0xC1 lead, 0xF5–0xFF: banned
    }
    true
  }

  /** One detected blob. */
  final case class Detected(
      id: Long, encoding: String, n_bytes: Long, n_non_ascii: Long)

  def detectEncoding(df: DataFrame, idCol: String,
      binCol: String): Dataset[Detected] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull) =>
          val b = Option(bytesOrNull).getOrElse(Array.empty[Byte])
          var nonAscii = 0L
          var i = 0
          while (i < b.length) {
            if ((b(i) & 0xff) >= 0x80) nonAscii += 1
            i += 1
          }
          Detected(id, detect(b), b.length.toLong, nonAscii)
        }
      }
  }
}
