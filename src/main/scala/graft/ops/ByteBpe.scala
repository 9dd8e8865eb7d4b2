package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-level BPE ENCODING, the GPT-2 tokenizer family (Radford et
  * al. 2019; the algorithm is public and is what tiktoken/HF
  * tokenizers implement) — the token-counting semantics that actually
  * govern LLM data budgeting at 100 TB, where q30's whitespace/regex
  * counts are approximations. q212/q286 LEARN word-internal merges;
  * this op APPLIES a byte-level merge table with the published
  * pipeline:
  *
  *  1. PRETOKENIZE with the GPT-2 pattern's semantics, hand-rolled as
  *     a scanner (both engines of the q372 gate implement the SAME
  *     documented rules, so no regex-engine divergence):
  *     contractions ('s 't 're 've 'm 'll 'd, case-sensitive);
  *     optional single leading SPACE + maximal letter run; same for
  *     digit runs; same for runs of other non-whitespace; a
  *     whitespace run followed by a non-space yields the run MINUS
  *     its last character (which then leads the next token — the
  *     `\s+(?!\S)` lookahead), a trailing run yields itself.
  *  2. Map each pretoken's UTF-8 BYTES through the published
  *     bytes-to-unicode table (printable bytes map to themselves,
  *     the rest to U+0100.. in order — space becomes U+0120 'Ġ').
  *  3. Apply merges by RANK: repeatedly find the lowest-rank adjacent
  *     pair present and fuse every left-to-right occurrence, until no
  *     adjacent pair is in the table (the reference BPE apply loop).
  *
  * The merge table is INPUT (a crawl ships its tokenizer), broadcast
  * once; encoding is map-only. Characters are treated per UTF-16
  * char. Supplementary-plane behavior is DOCUMENTED and gated (the
  * q372 fixture plants astral letters + an emoji): each surrogate
  * half is neither letter nor digit nor whitespace, so an astral
  * char always classifies as "other"; both halves classify the same
  * way, so a surrogate pair can never split across pretokens, and
  * `getBytes(UTF_8)` on the intact pair yields the proper 4-byte
  * encoding (never CESU-8's 6). The twin pins the identical rule by
  * classifying ord > 0xFFFF code points as "other". */
object ByteBpe {

  /** The published bytes-to-unicode map (GPT-2 `bytes_to_unicode`). */
  val byteToUnicode: Array[Char] = {
    val keep = (('!'.toInt to '~'.toInt) ++
      (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  private def isLetter(c: Char): Boolean = Character.isLetter(c)
  private def isDigit(c: Char): Boolean = Character.isDigit(c)
  private def isWs(c: Char): Boolean = Character.isWhitespace(c)

  private val Contractions =
    Seq("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")

  /** GPT-2 pretokenization per the documented scanner rules. */
  def pretokenize(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val contraction =
        if (c == '\'') Contractions.find(t => s.regionMatches(i, t, 0,
          t.length)) else None
      if (contraction.isDefined) {
        out += contraction.get
        i += contraction.get.length
      } else {
        // optional single leading space when a letter/digit/punct
        // run follows it
        val lead = c == ' ' && i + 1 < n && !isWs(s.charAt(i + 1))
        val j0 = if (lead) i + 1 else i
        val d = s.charAt(j0)
        if (!isWs(d)) {
          var j = j0
          if (isLetter(d)) while (j < n && isLetter(s.charAt(j))) j += 1
          else if (isDigit(d)) while (j < n && isDigit(s.charAt(j))) j += 1
          else while (j < n && !isWs(s.charAt(j)) &&
            !isLetter(s.charAt(j)) && !isDigit(s.charAt(j))) j += 1
          out += s.substring(i, j)
          i = j
        } else {
          var j = i
          while (j < n && isWs(s.charAt(j))) j += 1
          if (j < n && j - i > 1) { // lookahead: keep last ws for next
            out += s.substring(i, j - 1)
            i = j - 1
          } else {
            out += s.substring(i, j)
            i = j
          }
        }
      }
    }
    out.toSeq
  }

  /** One pretoken → byte-unicode symbols → merged tokens by rank. */
  def applyMerges(pretoken: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    val bytes = pretoken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var parts: Vector[String] =
      bytes.toVector.map(b => byteToUnicode(b & 0xff).toString)
    var done = parts.length < 2
    while (!done) {
      // track the winning pair IN the scan: a real GPT-2 table has
      // ~50k merges, so recovering the pair by re-scanning the rank
      // map each iteration would dominate corpus-scale encoding
      var bestRank = Int.MaxValue
      var ba: String = null
      var bb: String = null
      var k = 0
      while (k < parts.length - 1) {
        val r = ranks.getOrElse((parts(k), parts(k + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; ba = parts(k); bb = parts(k + 1) }
        k += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val nb = scala.collection.mutable.ArrayBuffer[String]()
        var k2 = 0
        while (k2 < parts.length) {
          if (k2 + 1 < parts.length && parts(k2) == ba &&
            parts(k2 + 1) == bb) {
            nb += ba + bb; k2 += 2
          } else { nb += parts(k2); k2 += 1 }
        }
        parts = nb.toVector
        done = parts.length < 2
      }
    }
    parts
  }

  def encodeText(text: String,
      ranks: Map[(String, String), Int]): Seq[String] =
    pretokenize(Option(text).getOrElse(""))
      .flatMap(applyMerges(_, ranks))

  /** Inverse byte map: each of the 256 alphabet chars → its byte. */
  val unicodeToByte: Map[Char, Int] =
    byteToUnicode.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** DECODE: space-joined tokens → original text. Well-defined
    * because the byte-unicode alphabet never contains a real space
    * (0x20 maps to 'Ġ'), so separators are unambiguous and merges
    * need no undoing — a token's chars map 1:1 back to bytes.
    * Hostile input never throws: chars outside the 256-symbol
    * alphabet are skipped; invalid UTF-8 byte runs decode to U+FFFD
    * (the JDK's standard replacement). decode(encodeText(x)) == x
    * for any valid-UTF-8 x — the q387 round-trip law. */
  def decodeTokens(tokens: String): String = {
    val t = Option(tokens).getOrElse("")
    val out = new java.io.ByteArrayOutputStream(t.length)
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c != ' ') unicodeToByte.get(c).foreach(out.write)
      i += 1
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Map-only decode: (id, text) from a tokens column. */
  def decode(df: DataFrame, idCol: String,
      tokensCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(tokensCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, toks) =>
        (id, decodeTokens(toks))
      })
      .toDF(idCol, "text")
  }

  /** Map-only encoding: (id, n_tokens, tokens space-joined — the
    * byte-unicode alphabet never contains a real space). Merges ship
    * as input data (rank = list order), closed over per executor. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = encodeText(text, ranks)
          (id, toks.length.toLong, toks.mkString(" "))
        }
      }
      .toDF(idCol, "n_tokens", "tokens")
  }
}
