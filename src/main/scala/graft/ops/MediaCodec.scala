package graft.ops

/** Real image-header codec — pure JDK byte parsing, no image library.
  *
  * Replaces the round-1/2 `Multimodal.decodeStub` for image blobs: format
  * comes from magic-number sniffing (the imghdr role in the reference,
  * `model/summary_helpers_image.py:1-114` via PIL) and width/height from
  * the actual header fields:
  *   - PNG: IHDR chunk — big-endian u32 at bytes 16/20 after the 8-byte
  *     signature + 8-byte chunk header (RFC 2083 §4.1.1).
  *   - JPEG: segment walk to the first SOF0..SOF15 frame header (skipping
  *     DHT/DAC/RST/APPn), big-endian u16 height then width (ITU T.81
  *     §B.2.2). An EXIF APP1 is skipped like any APPn, so files with EXIF
  *     parse identically.
  *   - GIF: logical-screen descriptor — little-endian u16 at bytes 6/8
  *     (GIF89a spec §18).
  *   - BMP: BITMAPINFOHEADER — little-endian i32 at bytes 18/22.
  * `truncated` mirrors the reference's is_image_truncated: the bytes end
  * before the header fields needed to decode (a full pixel-data integrity
  * check needs a real decoder; header truncation is what a metadata scan
  * can and should detect).
  *
  * The encode* helpers build MINIMAL VALID files (real signatures, real
  * header layout) so round-trip tests and the oracle-checked query parse
  * genuine bytes rather than fixtures of the parser's own making.
  */
object MediaCodec {

  final case class ImageMeta(
      format: String, width: Int, height: Int, truncated: Boolean)

  /** EXIF fields surfaced by [[parseExif]] — absent values are 0/"".
    * Mirrors the reference's per-image `_getexif` extraction
    * (model/summary_helpers.py:259-275), restricted to the fields a
    * metadata scan reads: orientation, camera model, capture time. */
  final case class ExifMeta(
      present: Boolean, orientation: Int, model: String,
      dateTimeOriginal: String)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    (u8(b, i + 3) << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)
  private def le24(b: Array[Byte], i: Int): Int =
    (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

  private def startsWith(b: Array[Byte], sig: Array[Byte]): Boolean =
    b.length >= sig.length && sig.indices.forall(i => b(i) == sig(i))

  /** Magic-number format sniff (imghdr equivalent). */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) "empty"
    else if (startsWith(bytes, PngSig)) "png"
    else if (bytes.length >= 3 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8 &&
      u8(bytes, 2) == 0xff) "jpeg"
    else if (startsWith(bytes, "GIF87a".getBytes("US-ASCII")) ||
      startsWith(bytes, "GIF89a".getBytes("US-ASCII"))) "gif"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 12 && startsWith(bytes, "RIFF".getBytes("US-ASCII")) &&
      new String(bytes, 8, 4, "US-ASCII") == "WEBP") "webp"
    else "unknown"

  /** Parse format + dimensions from real headers. Unknown formats and
    * headers cut short come back as (0, 0) with truncated semantics
    * applying only to KNOWN formats whose header ends early. */
  def parseImageMeta(bytes: Array[Byte]): ImageMeta = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    sniffFormat(b) match {
      case "png" =>
        // 8B signature, 4B IHDR length, 4B "IHDR", then width/height
        if (b.length >= 24 && new String(b, 12, 4, "US-ASCII") == "IHDR")
          ImageMeta("png", be32(b, 16), be32(b, 20), truncated = false)
        else ImageMeta("png", 0, 0, truncated = true)
      case "jpeg" => parseJpeg(b)
      case "gif" =>
        if (b.length >= 10)
          ImageMeta("gif", le16(b, 6), le16(b, 8), truncated = false)
        else ImageMeta("gif", 0, 0, truncated = true)
      case "bmp" =>
        if (b.length >= 26)
          ImageMeta("bmp", le32(b, 18), math.abs(le32(b, 22)), truncated = false)
        else ImageMeta("bmp", 0, 0, truncated = true)
      case "webp" => parseWebp(b)
      case f => ImageMeta(f, 0, 0, truncated = false)
    }
  }

  /** WebP dimensions from the first chunk after the RIFF/WEBP header
    * (fourcc at 12, payload at 20 — RIFF container spec):
    *   - VP8  (lossy): 3-byte frame tag, sync 9D 01 2A, then 14-bit
    *     LE width/height (VP8 bitstream spec §9.1).
    *   - VP8L (lossless): 0x2F signature byte, then width-1/height-1 as
    *     two 14-bit fields of a LE u32 (WebP lossless spec §3).
    *   - VP8X (extended): 4 flag/reserved bytes, then 24-bit LE
    *     canvas-width-1 and canvas-height-1. */
  private def parseWebp(b: Array[Byte]): ImageMeta = {
    if (b.length < 16) return ImageMeta("webp", 0, 0, truncated = true)
    new String(b, 12, 4, "US-ASCII") match {
      case "VP8 " =>
        if (b.length >= 30 && u8(b, 23) == 0x9d && u8(b, 24) == 0x01 &&
          u8(b, 25) == 0x2a)
          ImageMeta("webp", le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff,
            truncated = false)
        else ImageMeta("webp", 0, 0, truncated = true)
      case "VP8L" =>
        if (b.length >= 25 && u8(b, 20) == 0x2f) {
          val bits = le32(b, 21)
          ImageMeta("webp", (bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1,
            truncated = false)
        } else ImageMeta("webp", 0, 0, truncated = true)
      case "VP8X" =>
        if (b.length >= 30)
          ImageMeta("webp", le24(b, 24) + 1, le24(b, 27) + 1,
            truncated = false)
        else ImageMeta("webp", 0, 0, truncated = true)
      case _ => ImageMeta("webp", 0, 0, truncated = true)
    }
  }

  /** Extract EXIF orientation / camera model / DateTimeOriginal from a
    * JPEG's APP1 segment — a pure-JDK TIFF IFD walk (public TIFF 6.0 +
    * EXIF 2.3 specs): both byte orders, inline and offset values,
    * IFD0 tags 0x0112 (orientation) / 0x0110 (model) and the 0x8769
    * EXIF sub-IFD's 0x9003 (DateTimeOriginal). Non-JPEG bytes, files
    * without APP1/Exif, and malformed offsets all come back absent —
    * a scrubbing scan must never throw on hostile bytes. */
  def parseExif(bytes: Array[Byte]): ExifMeta = {
    val absent = ExifMeta(present = false, 0, "", "")
    // catch-all backstop for the never-throw-on-hostile-bytes contract:
    // bounds arithmetic below is Long-checked, but a scrubbing scan must
    // survive even a parser bug without failing the Spark task
    try parseExifWalk(bytes, absent)
    catch { case scala.util.control.NonFatal(_) => absent }
  }

  private def parseExifWalk(
      bytes: Array[Byte], absent: ExifMeta): ExifMeta = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    if (sniffFormat(b) != "jpeg") return absent
    // find the APP1/Exif segment with the standard marker walk
    var i = 2
    var tiff = -1
    while (tiff < 0 && i + 3 < b.length && u8(b, i) == 0xff) {
      val marker = u8(b, i + 1)
      if (marker == 0xff) i += 1
      else if (marker >= 0xd0 && marker <= 0xd7 || marker == 0x01) i += 2
      else if (marker == 0xd9 || marker == 0xda) i = b.length
      else {
        val len = be16(b, i + 2)
        if (len < 2) return absent
        if (marker == 0xe1 && i + 4 + 6 <= b.length &&
          new String(b, i + 4, 4, "US-ASCII") == "Exif" &&
          b(i + 8) == 0 && b(i + 9) == 0)
          tiff = i + 10
        else i += 2 + len
      }
    }
    if (tiff < 0 || tiff + 8 > b.length) return absent
    val le = b(tiff) == 'I' && b(tiff + 1) == 'I'
    val be = b(tiff) == 'M' && b(tiff + 1) == 'M'
    if (!le && !be) return absent
    def rd16(o: Int): Int = if (le) le16(b, o) else be16(b, o)
    def rd32(o: Int): Int = if (le) le32(b, o) else be32(b, o)
    if (rd16(tiff + 2) != 42) return absent
    // all bounds arithmetic in Long: count/offset are attacker-controlled
    // u32s whose Int sums (off + count, tiff + ifdOff) can wrap past guards
    def readAscii(off: Long, count: Int): String =
      if (count <= 0 || off < 0 || off + count > b.length) ""
      else new String(b, off.toInt, count, "US-ASCII").takeWhile(_ != '\u0000')
    // walk one IFD, returning the wanted tag values found in it
    def walkIfd(ifdOff: Int): Map[Int, (Int, Int, Int)] = {
      // tag -> (type, count, valueFieldOffset)
      if (ifdOff < 0 || tiff.toLong + ifdOff + 2 > b.length) return Map.empty
      val n = rd16(tiff + ifdOff)
      (0 until n).flatMap { e =>
        val eo = tiff + ifdOff + 2 + e * 12
        if (eo + 12 > b.length) None
        else Some(rd16(eo) -> ((rd16(eo + 2), rd32(eo + 4), eo + 8)))
      }.toMap
    }
    def asciiValue(t: (Int, Int, Int)): String = {
      val (tpe, count, vo) = t
      if (tpe != 2) ""
      else if (count <= 4) readAscii(vo, count)          // inline
      else readAscii(tiff.toLong + (rd32(vo) & 0xffffffffL), count) // offset
    }
    val ifd0 = walkIfd(rd32(tiff + 4))
    val orientation = ifd0.get(0x0112) match {
      case Some((3, _, vo)) if vo + 2 <= b.length => rd16(vo)
      case _ => 0
    }
    val model = ifd0.get(0x0110).map(asciiValue).getOrElse("")
    val dto = ifd0.get(0x8769) match {
      case Some((tpe, _, vo)) if (tpe == 4 || tpe == 3) && vo + 4 <= b.length =>
        walkIfd(rd32(vo)).get(0x9003).map(asciiValue).getOrElse("")
      case _ => ""
    }
    ExifMeta(present = true, orientation, model, dto)
  }

  /** Walk JPEG segments to the first start-of-frame. SOF markers are
    * 0xC0-0xCF minus 0xC4 (DHT), 0xC8 (JPG extension), 0xCC (DAC). */
  private def parseJpeg(b: Array[Byte]): ImageMeta = {
    var i = 2 // past FF D8
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return ImageMeta("jpeg", 0, 0, truncated = true)
      val marker = u8(b, i + 1)
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker >= 0xd0 && marker <= 0xd7 || marker == 0x01) {
        i += 2 // standalone marker, no length field
      } else if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        // SOF: len(2) precision(1) height(2) width(2)
        if (i + 8 < b.length)
          return ImageMeta("jpeg", be16(b, i + 7), be16(b, i + 5),
            truncated = false)
        else return ImageMeta("jpeg", 0, 0, truncated = true)
      } else if (marker == 0xd9 || marker == 0xda) {
        // EOI / SOS before any SOF: dimensions unrecoverable by header walk
        return ImageMeta("jpeg", 0, 0, truncated = true)
      } else {
        if (i + 3 >= b.length) return ImageMeta("jpeg", 0, 0, truncated = true)
        val len = be16(b, i + 2)
        if (len < 2) return ImageMeta("jpeg", 0, 0, truncated = true)
        i += 2 + len
      }
    }
    ImageMeta("jpeg", 0, 0, truncated = true)
  }

  // ---- minimal-valid-file encoders (test/query synthesis fixtures) ----

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  /** Minimal valid PNG: signature + IHDR(w, h, 8-bit grayscale) + empty
    * IDAT + IEND, with real CRCs. */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 25 + 12 + 12)
    out.put(PngSig)
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
      .putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte) // bit depth 8, grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, none, none
    val a = out.array()
    out.putInt(crc32(a, 12, 17))
    out.putInt(0).put("IDAT".getBytes("US-ASCII")).putInt(crc32(a, 37, 4))
    out.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(crc32(a, 49, 4))
    a
  }

  /** Minimal JPEG header stream: SOI + JFIF APP0 + SOF0 + EOI. The walk
    * must skip APP0 to reach the frame header, as with real camera files. */
  def encodeJpeg(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 13 + 2)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0 len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte) // version 1.1
      .put(0.toByte).putShort(1).putShort(1) // aspect units + density
      .put(0.toByte).put(0.toByte) // no thumbnail
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11) // SOF0 len 11
      .put(8.toByte) // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(1.toByte) // 1 component
      .put(1.toByte).put(0x11.toByte).put(0.toByte) // id, 1x1 sampling, qtable
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }

  /** Minimal BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (no pixel data —
    * a 0-byte image array is tolerated by header-walking readers). */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(14 + 40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54).putInt(0).putInt(54) // file size, reserved, data offset
    out.putInt(40) // BITMAPINFOHEADER size
    out.putInt(width).putInt(height)
    out.putShort(1).putShort(24) // planes, bpp
    // compression, image size, ppm x/y, colors used/important: zeros
    out.array()
  }

  /** Minimal GIF89a: header + logical screen descriptor + trailer. */
  def encodeGif(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(6 + 7 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(width.toShort).putShort(height.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte) // flags, bg, aspect
    out.put(0x3b.toByte) // trailer
    out.array()
  }

  /** Minimal lossless WebP: RIFF/WEBP container + VP8L chunk with the
    * 0x2F signature and the two 14-bit dimension-minus-one fields (odd
    * payload padded to even per RIFF). */
  def encodeWebp(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(12 + 8 + 5 + 1 - 8)
      .put("WEBP".getBytes("US-ASCII"))
    out.put("VP8L".getBytes("US-ASCII")).putInt(5)
    out.put(0x2f.toByte)
    out.putInt((width - 1) & 0x3fff | (((height - 1) & 0x3fff) << 14))
    out.put(0.toByte) // RIFF pad to even
    out.array()
  }

  /** [[encodeJpeg]] with a real EXIF APP1 ahead of the frame header:
    * little-endian TIFF with IFD0 {Model (ASCII, inline when <= 4 bytes else offset form),
    * Orientation (SHORT, inline), ExifIFD pointer} and an EXIF sub-IFD
    * {DateTimeOriginal (ASCII)}. Exercises both the EXIF walk and the
    * dimension parse THROUGH an APP1 segment. */
  def encodeJpegExif(width: Int, height: Int, orientation: Int,
      model: String, dateTimeOriginal: String): Array[Byte] = {
    val modelBytes = (model + "\u0000").getBytes("US-ASCII")
    val dtBytes = (dateTimeOriginal + "\u0000").getBytes("US-ASCII")
    // TIFF 6.0 §2: values of byte count <= 4 are stored INLINE in the
    // value field (zero-padded), not via offset — parseExif honors that,
    // so short strings must encode inline or they round-trip as garbage
    val modelInline = modelBytes.length <= 4
    val dtInline = dtBytes.length <= 4
    val ifd0Off = 8
    val ifd0Size = 2 + 3 * 12 + 4
    val exifIfdOff = ifd0Off + ifd0Size
    val exifIfdSize = 2 + 1 * 12 + 4
    val modelOff = exifIfdOff + exifIfdSize
    val dtOff = modelOff + (if (modelInline) 0 else modelBytes.length)
    val tiffLen = dtOff + (if (dtInline) 0 else dtBytes.length)
    val t = java.nio.ByteBuffer.allocate(tiffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def putAsciiValue(v: Array[Byte], inline: Boolean, off: Int): Unit =
      if (inline) { t.put(v); (v.length until 4).foreach(_ => t.put(0.toByte)) }
      else { t.putInt(off); () }
    t.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifd0Off)
    t.putShort(3) // IFD0: 3 entries, tag-sorted
    t.putShort(0x0110).putShort(2).putInt(modelBytes.length)
    putAsciiValue(modelBytes, modelInline, modelOff)
    t.putShort(0x0112).putShort(3).putInt(1)
      .putShort(orientation.toShort).putShort(0)
    t.putShort(0x8769.toShort).putShort(4).putInt(1).putInt(exifIfdOff)
    t.putInt(0) // next IFD
    t.putShort(1) // EXIF sub-IFD: 1 entry
    t.putShort(0x9003.toShort).putShort(2).putInt(dtBytes.length)
    putAsciiValue(dtBytes, dtInline, dtOff)
    t.putInt(0)
    if (!modelInline) t.put(modelBytes)
    if (!dtInline) t.put(dtBytes)
    val tiff = t.array()
    val app1Len = 2 + 6 + tiff.length
    val out = java.nio.ByteBuffer.allocate(2 + 2 + app1Len + 13 + 2)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xe1.toByte).putShort(app1Len.toShort)
      .put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
      .put(tiff)
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11) // SOF0 len 11
      .put(8.toByte)
      .putShort(height.toShort).putShort(width.toShort)
      .put(1.toByte)
      .put(1.toByte).put(0x11.toByte).put(0.toByte)
    out.put(0xff.toByte).put(0xd9.toByte) // EOI
    out.array()
  }

  // ------------------------------------------------------------------
  // Audio headers (WAV RIFF fmt/data walk; FLAC STREAMINFO, RFC 9639)
  // ------------------------------------------------------------------

  /** Audio header metadata — the audio analogue of [[ImageMeta]].
    * Absent/unparseable fields are 0; `truncated` means the magic
    * matched a known format but the header ended before the fields. */
  final case class AudioMeta(
      format: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long, truncated: Boolean)

  /** Magic sniff for audio containers: RIFF/WAVE or fLaC. */
  def sniffAudioFormat(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) "empty"
    else if (bytes.length >= 12 &&
      startsWith(bytes, "RIFF".getBytes("US-ASCII")) &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE") "wav"
    else if (startsWith(bytes, "fLaC".getBytes("US-ASCII"))) "flac"
    else "unknown"

  /** Parse sample rate / channels / bit depth / frame count from real
    * audio headers — hostile-bytes-safe (all offset arithmetic in
    * Long, never throws). WAV walks RIFF chunks to `fmt ` and `data`
    * (frame count = data size / block align); FLAC unpacks the
    * STREAMINFO bit fields (sample rate 20 bits, channels 3+1, bits
    * 5+1, total samples 36). */
  def parseAudioMeta(bytes: Array[Byte]): AudioMeta = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    sniffAudioFormat(b) match {
      case "wav"  => parseWav(b)
      case "flac" => parseFlac(b)
      case f      => AudioMeta(f, 0, 0, 0, 0L, truncated = false)
    }
  }

  private def parseWav(b: Array[Byte]): AudioMeta = {
    var off = 12L
    var sr = 0; var ch = 0; var bits = 0; var blockAlign = 0
    var dataSize = -1L; var gotFmt = false
    while (off + 8 <= b.length) {
      val id = new String(b, off.toInt, 4, "US-ASCII")
      val size = le32(b, off.toInt + 4) & 0xffffffffL
      val body = off + 8
      if (id == "fmt " && size >= 16 && body + 16 <= b.length) {
        ch = le16(b, body.toInt + 2)
        sr = le32(b, body.toInt + 4)
        blockAlign = le16(b, body.toInt + 12)
        bits = le16(b, body.toInt + 14)
        gotFmt = true
      } else if (id == "data") {
        // size field is authoritative even if the payload is cut
        dataSize = size
      }
      off = body + size + (size & 1L) // chunks are word-aligned
    }
    val frames =
      if (dataSize >= 0 && blockAlign > 0) dataSize / blockAlign else 0L
    AudioMeta("wav", sr, ch, bits, frames,
      truncated = !gotFmt || dataSize < 0 || sr <= 0)
  }

  private def parseFlac(b: Array[Byte]): AudioMeta = {
    // first metadata block header at 4: (last|type) byte + 24-bit length
    if (b.length < 8) return AudioMeta("flac", 0, 0, 0, 0L, truncated = true)
    val btype = u8(b, 4) & 0x7f
    val blen = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    // STREAMINFO must be first (type 0, 34 bytes) and fully present
    if (btype != 0 || blen < 34 || 8L + 34 > b.length)
      return AudioMeta("flac", 0, 0, 0, 0L, truncated = true)
    val s = 8 // STREAMINFO body start
    val sr = (u8(b, s + 10) << 12) | (u8(b, s + 11) << 4) |
      (u8(b, s + 12) >> 4)
    val ch = ((u8(b, s + 12) >> 1) & 0x7) + 1
    val bits = (((u8(b, s + 12) & 0x1) << 4) | (u8(b, s + 13) >> 4)) + 1
    val total = ((u8(b, s + 13) & 0xf).toLong << 32) |
      (u8(b, s + 14).toLong << 24) | (u8(b, s + 15).toLong << 16) |
      (u8(b, s + 16).toLong << 8) | u8(b, s + 17).toLong
    AudioMeta("flac", sr, ch, bits, total, truncated = sr <= 0)
  }

  /** Minimal canonical WAV: RIFF/WAVE + PCM `fmt ` + `data` with a
    * real zero payload of `nFrames` frames. */
  def encodeWav(sampleRate: Int, channels: Int, bits: Int,
      nFrames: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nFrames * blockAlign
    val out = java.nio.ByteBuffer.allocate(12 + 24 + 8 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    out.array() // zero payload already in place
  }

  /** Metadata-only FLAC: fLaC magic + a last-block STREAMINFO with the
    * packed rate/channels/bits/total fields (no audio frames — the
    * header parse contract, like the image encoders). */
  def encodeFlac(sampleRate: Int, channels: Int, bits: Int,
      totalSamples: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 4 + 34)
    out.put("fLaC".getBytes("US-ASCII"))
    out.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    out.putShort(4096).putShort(4096) // min/max block size
    out.put(0.toByte).put(0.toByte).put(0.toByte) // min frame size
    out.put(0.toByte).put(0.toByte).put(0.toByte) // max frame size
    out.put(((sampleRate >> 12) & 0xff).toByte)
    out.put(((sampleRate >> 4) & 0xff).toByte)
    out.put((((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bits - 1) >> 4) & 0x1)).toByte)
    out.put(((((bits - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf).toInt).toByte)
    out.put(((totalSamples >> 24) & 0xff).toByte)
    out.put(((totalSamples >> 16) & 0xff).toByte)
    out.put(((totalSamples >> 8) & 0xff).toByte)
    out.put((totalSamples & 0xff).toByte)
    (0 until 16).foreach(_ => out.put(0.toByte)) // MD5 of zero frames
    out.array()
  }

  // ----------------------------------------------------------------- mp3

  final case class Mp3Meta(
      version: String, layer: Int, bitrateKbps: Int, sampleRate: Int,
      channels: Int, nFrames: Long, truncated: Boolean)

  // Layer III bitrate (kbps) and sample-rate tables, ISO/IEC 11172-3
  // table B.2 (MPEG1) and ISO/IEC 13818-3 (MPEG2; 2.5 shares its
  // bitrate rows at half the 2.5 sample rates). Index 0 = "free", 15 =
  // reserved — both rejected as unparseable.
  private val Mp3BitrateV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 0)
  private val Mp3BitrateV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64,
    80, 96, 112, 128, 144, 160, 0)
  private val Mp3SrV1 = Array(44100, 48000, 32000, 0)
  private val Mp3SrV2 = Array(22050, 24000, 16000, 0)
  private val Mp3SrV25 = Array(11025, 12000, 8000, 0)

  /** Magic sniff for MPEG audio: an ID3v2 tag or a raw frame sync in
    * the first bytes. */
  def sniffMp3(bytes: Array[Byte]): Boolean =
    bytes != null && ((bytes.length >= 3 && bytes(0) == 'I' &&
      bytes(1) == 'D' && bytes(2) == '3') ||
      (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xe0) == 0xe0))

  /** Parse the first MPEG-audio (Layer III) frame header: version /
    * bitrate / sample rate / channel mode, skipping a leading ID3v2
    * tag (10-byte header + syncsafe 28-bit size). The frame count is
    * the CBR estimate `(container bytes after the tag) / frame
    * length` with frame length = 144000·kbps/sr (MPEG1) or
    * 72000·kbps/sr (MPEG2/2.5) plus padding — the standard
    * Layer III arithmetic; VBR streams would need a Xing walk, out
    * of header-only scope. Hostile-bytes-safe: all offsets in Long,
    * reserved/free table indices and non-Layer-III frames report
    * truncated instead of guessing. */
  def parseMp3(bytes: Array[Byte]): Mp3Meta = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    val bad = Mp3Meta("", 0, 0, 0, 0, 0L, truncated = true)
    var off = 0L
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((u8(b, 6) & 0x7f) << 21) | ((u8(b, 7) & 0x7f) << 14) |
        ((u8(b, 8) & 0x7f) << 7) | (u8(b, 9) & 0x7f)
      off = 10L + size
    }
    if (off + 4 > b.length) return bad
    val h1 = u8(b, off.toInt + 1); val h2 = u8(b, off.toInt + 2)
    val h3 = u8(b, off.toInt + 3)
    if (u8(b, off.toInt) != 0xff || (h1 & 0xe0) != 0xe0) return bad
    val verBits = (h1 >> 3) & 0x3 // 0 = 2.5, 2 = 2, 3 = 1 (1 reserved)
    val layerBits = (h1 >> 1) & 0x3 // 1 = III
    if (verBits == 1 || layerBits != 1) return bad
    val version = verBits match {
      case 3 => "1"; case 2 => "2"; case _ => "2.5"
    }
    val brIdx = (h2 >> 4) & 0xf
    val srIdx = (h2 >> 2) & 0x3
    val padding = (h2 >> 1) & 0x1
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return bad
    val kbps =
      if (verBits == 3) Mp3BitrateV1(brIdx) else Mp3BitrateV2(brIdx)
    val sr = verBits match {
      case 3 => Mp3SrV1(srIdx); case 2 => Mp3SrV2(srIdx)
      case _ => Mp3SrV25(srIdx)
    }
    val ch = if (((h3 >> 6) & 0x3) == 3) 1 else 2
    val frameLen =
      (if (verBits == 3) 144000L else 72000L) * kbps / sr + padding
    val nFrames = if (frameLen > 0) (b.length - off) / frameLen else 0L
    Mp3Meta(version, 3, kbps, sr, ch, nFrames, truncated = false)
  }

  /** Minimal CBR Layer III stream: optional ID3v2 tag (zero body of
    * `id3Body` bytes) + `nFrames` full frames (header + zero payload,
    * no padding, no CRC). `verBits` 3 = MPEG1, 2 = MPEG2, 0 = 2.5. */
  def encodeMp3(verBits: Int, brIdx: Int, srIdx: Int, mono: Boolean,
      nFrames: Int, id3Body: Int = -1): Array[Byte] = {
    val kbps =
      if (verBits == 3) Mp3BitrateV1(brIdx) else Mp3BitrateV2(brIdx)
    val sr = verBits match {
      case 3 => Mp3SrV1(srIdx); case 2 => Mp3SrV2(srIdx)
      case _ => Mp3SrV25(srIdx)
    }
    val frameLen =
      ((if (verBits == 3) 144000L else 72000L) * kbps / sr).toInt
    val tagLen = if (id3Body < 0) 0 else 10 + id3Body
    val out = new Array[Byte](tagLen + nFrames * frameLen)
    if (id3Body >= 0) {
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4
      out(6) = ((id3Body >> 21) & 0x7f).toByte
      out(7) = ((id3Body >> 14) & 0x7f).toByte
      out(8) = ((id3Body >> 7) & 0x7f).toByte
      out(9) = (id3Body & 0x7f).toByte
    }
    (0 until nFrames).foreach { i =>
      val o = tagLen + i * frameLen
      out(o) = 0xff.toByte
      out(o + 1) = (0xe0 | (verBits << 3) | (1 << 1) | 1).toByte
      out(o + 2) = ((brIdx << 4) | (srIdx << 2)).toByte
      out(o + 3) = (if (mono) 0xc0 else 0x00).toByte
    }
    out
  }

  // ---------------------------------------------------------------- video

  final case class VideoMeta(
      format: String, timescale: Int, duration: Long, nTracks: Int,
      width: Int, height: Int, truncated: Boolean)

  /** Magic sniff for ISO BMFF (MP4/MOV family): a top-level `ftyp`
    * box in the first 12 bytes. */
  def sniffVideoFormat(bytes: Array[Byte]): String =
    if (bytes == null || bytes.isEmpty) "empty"
    else if (bytes.length >= 12 &&
      new String(bytes, 4, 4, "US-ASCII") == "ftyp") "mp4"
    else "unknown"

  /** Parse movie timescale/duration, track count, and the first video
    * track's pixel dimensions from an ISO BMFF (ISO/IEC 14496-12)
    * container: top-level box walk to `moov`, then its `mvhd`
    * (version 0 u32 times / version 1 u64), `trak` count, and each
    * trak's `tkhd` width/height (16.16 fixed point). Header-only —
    * never decodes media data — and hostile-bytes-safe: every offset
    * is Long arithmetic, malformed sizes end the walk instead of
    * looping or throwing. */
  def parseVideoMeta(bytes: Array[Byte]): VideoMeta = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    sniffVideoFormat(b) match {
      case "mp4" => parseMp4(b)
      case f     => VideoMeta(f, 0, 0L, 0, 0, 0, truncated = false)
    }
  }

  private def be32L(b: Array[Byte], off: Long): Long =
    (u8(b, off.toInt).toLong << 24) | (u8(b, off.toInt + 1) << 16) |
      (u8(b, off.toInt + 2) << 8) | u8(b, off.toInt + 3)

  private def be64L(b: Array[Byte], off: Long): Long =
    (be32L(b, off) << 32) | be32L(b, off + 4)

  /** Walk boxes in [start, end); returns (type, bodyStart, bodyEnd)
    * triples via callback until exhausted or a malformed size stops
    * the walk. Size 1 = 64-bit largesize; size 0 = to end. */
  private def walkBoxes(b: Array[Byte], start: Long, end: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    var off = start
    var steps = 0
    while (off + 8 <= end && steps < 10000) {
      steps += 1
      val size32 = be32L(b, off)
      val tpe = new String(b, off.toInt + 4, 4, "US-ASCII")
      val (body, boxEnd) =
        if (size32 == 1L) {
          if (off + 16 > end) return
          val sz = be64L(b, off + 8)
          if (sz < 16) return
          (off + 16, off + sz)
        } else if (size32 == 0L) (off + 8, end)
        else {
          if (size32 < 8) return
          (off + 8, off + size32)
        }
      if (boxEnd > end || boxEnd <= off) { f(tpe, body, end); return }
      f(tpe, body, boxEnd)
      off = boxEnd
    }
  }

  private def parseMp4(b: Array[Byte]): VideoMeta = {
    val end = b.length.toLong
    var timescale = 0; var duration = 0L; var gotMvhd = false
    var nTracks = 0; var width = 0; var height = 0
    walkBoxes(b, 0L, end) { (tpe, body, boxEnd) =>
      if (tpe == "moov") {
        walkBoxes(b, body, boxEnd) { (ct, cb, ce) =>
          if (ct == "mvhd" && cb + 4 <= ce) {
            val version = u8(b, cb.toInt)
            if (version == 1 && cb + 32 <= ce) {
              timescale = be32L(b, cb + 20).toInt
              duration = be64L(b, cb + 24)
              gotMvhd = true
            } else if (version == 0 && cb + 20 <= ce) {
              timescale = be32L(b, cb + 12).toInt
              duration = be32L(b, cb + 16)
              gotMvhd = true
            }
          } else if (ct == "trak") {
            nTracks += 1
            walkBoxes(b, cb, ce) { (tt, tb, te) =>
              if (tt == "tkhd" && tb + 4 <= te && width == 0) {
                val tv = u8(b, tb.toInt)
                // width sits after ver/flags + times/ids + layer block
                // + matrix: v0 4+20+16+36, v1 4+32+16+36 (16.16 fixed)
                val wOff = tb + (if (tv == 1) 88L else 76L)
                if (wOff + 8 <= te) {
                  width = (be32L(b, wOff) >>> 16).toInt
                  height = (be32L(b, wOff + 4) >>> 16).toInt
                }
              }
            }
          }
        }
      }
    }
    VideoMeta("mp4", timescale, duration, nTracks, width, height,
      truncated = !gotMvhd || timescale <= 0)
  }

  /** Metadata-only ISO BMFF fixture: `ftyp` + `moov` holding an mvhd
    * (version 0 or 1) and `tracks` trak/tkhd boxes with 16.16 fixed
    * dimensions — the header-parse contract, like the image and audio
    * encoders. */
  def encodeMp4(timescale: Int, duration: Long,
      tracks: Seq[(Int, Int)], mvhdVersion: Int = 0): Array[Byte] = {
    require(mvhdVersion == 0 || mvhdVersion == 1, "mvhd version 0 or 1")
    val mvhdSize = if (mvhdVersion == 0) 108 else 120
    val tkhdSize = 92 // version 0
    val trakSize = 8 + tkhdSize
    val moovSize = 8 + mvhdSize + tracks.size * trakSize
    val out = java.nio.ByteBuffer.allocate(16 + moovSize) // big-endian
    out.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    out.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    out.putInt(mvhdSize).put("mvhd".getBytes("US-ASCII"))
    if (mvhdVersion == 0) {
      out.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // creation, modification
        .putInt(timescale).putInt(duration.toInt)
    } else {
      out.putInt(0x01000000) // version 1 + flags
        .putLong(0L).putLong(0L)
        .putInt(timescale).putLong(duration)
    }
    out.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, vol
      .putLong(0L) // reserved
    // identity matrix
    out.putInt(0x00010000).putInt(0).putInt(0)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(tracks.size + 1) // next_track_ID
    tracks.zipWithIndex.foreach { case ((w, h), i) =>
      out.putInt(trakSize).put("trak".getBytes("US-ASCII"))
      out.putInt(tkhdSize).put("tkhd".getBytes("US-ASCII"))
      out.putInt(0) // version 0 + flags
        .putInt(0).putInt(0).putInt(i + 1).putInt(0) // times, id, res
        .putInt(duration.toInt).putLong(0L) // duration, reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer..res
      out.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      out.putInt(w << 16).putInt(h << 16)
    }
    out.array()
  }

  /** Decoded grayscale raster: width, height, and one 0-255 luma per
    * pixel in top-down row-major order. */
  final case class GrayImage(width: Int, height: Int, gray: Array[Int])

  /** PIXEL-level decode of an uncompressed 24-bpp BI_RGB BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER; bottom-up rows — or
    * top-down when the height field is negative — padded to 4 bytes,
    * BGR byte order), straight to the integer luma raster
    * (299·R + 587·G + 114·B) / 1000 the perceptual-hash pipeline
    * consumes. Returns None for anything that is not such a BMP or
    * whose pixel array is truncated — hostile-bytes-safe like the
    * header parsers above, never an exception. */
  def decodeBmpGray(b: Array[Byte]): Option[GrayImage] = {
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte)
      return None
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return None
    if (w > (1 << 14) || h > (1 << 14)) return None // 16k cap: hostile
    val rowSize = (w * 3 + 3) / 4 * 4
    if (dataOff < 0 || dataOff.toLong + rowSize.toLong * h > b.length)
      return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      val base = dataOff + srcRow * rowSize
      while (x < w) {
        val blu = b(base + x * 3) & 0xff
        val grn = b(base + x * 3 + 1) & 0xff
        val red = b(base + x * 3 + 2) & 0xff
        gray(y * w + x) = (299 * red + 587 * grn + 114 * blu) / 1000
        x += 1
      }
      y += 1
    }
    Some(GrayImage(w, h, gray))
  }

  /** PIXEL-level decode of an 8-bit non-interlaced PNG (ISO 15948 /
    * RFC 2083) straight to the luma raster: IHDR constraints checked,
    * all IDAT chunks concatenated and inflated with the JDK's zlib
    * (`java.util.zip.Inflater`), the five scanline filters (None, Sub,
    * Up, Average, Paeth) undone row-by-row, then gray/RGB/gray+alpha/
    * RGBA collapse to the same integer luma the BMP path computes
    * (alpha ignored). Palette (colour type 3), 16-bit depth and Adam7
    * interlace return None — as does anything malformed: hostile-bytes
    * safe, never an exception. Chunk CRCs are not verified (lenient,
    * like most decoders; a corrupt stream fails structurally). */
  def decodePngGray(b: Array[Byte]): Option[GrayImage] =
    try decodePngGrayImpl(b)
    catch { case _: Exception => None }

  private def decodePngGrayImpl(b: Array[Byte]): Option[GrayImage] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    if (b.length < 45 || !startsWith(b, sig)) return None
    // IHDR must be first
    if (be32(b, 8) != 13 ||
      new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
        != "IHDR") return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    val interlace = u8(b, 28)
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    if (bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return None // palette / invalid
    }
    // concatenate IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var off = 33
    var sawEnd = false
    while (!sawEnd && off + 8 <= b.length) {
      val len = be32(b, off)
      if (len < 0 || off + 12 + len > b.length) return None
      val typ = new String(b, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (typ == "IDAT") idat.write(b, off + 8, len)
      if (typ == "IEND") sawEnd = true
      off += 12 + len
    }
    val comp = idat.toByteArray
    if (comp.isEmpty) return None
    val stride = 1 + w * channels
    // DEFLATE expands at most ~1032:1 (stored 1-bit-per-symbol bound);
    // a raster the payload cannot plausibly fill is hostile — reject
    // BEFORE allocating, so a ~100-byte crafted header can't force a
    // gigabyte transient allocation per blob.
    if (stride.toLong * h > comp.length.toLong * 1032L + 64L) return None
    val raw = new Array[Byte](stride * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(comp)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // n == 0 covers every stall: needsInput (truncated stream),
      // needsDictionary (FDICT set — we have no preset dictionary, and
      // inflate would return 0 forever), or any other no-progress state.
      if (n == 0) { inf.end(); return None }
      got += n
    }
    inf.end()
    if (got < raw.length) return None
    // undo the per-row filter in place (filter bytes stay in raw;
    // pixel x of row y lives at raw(y*stride + 1 + x))
    val bpp = channels
    var y = 0
    while (y < h) {
      val rowOff = y * stride + 1
      val filter = raw(rowOff - 1) & 0xff
      if (filter > 4) return None
      var i = 0
      while (i < w * bpp) {
        val x = raw(rowOff + i) & 0xff
        val a = if (i >= bpp) raw(rowOff + i - bpp) & 0xff else 0
        val up = if (y > 0) raw(rowOff - stride + i) & 0xff else 0
        val c =
          if (y > 0 && i >= bpp) raw(rowOff - stride + i - bpp) & 0xff
          else 0
        val recon = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + (a + up) / 2
          case 4 => // Paeth
            val p = a + up - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(rowOff + i) = (recon & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val gray = new Array[Int](w * h)
    y = 0
    while (y < h) {
      val rowOff = y * stride + 1
      var x = 0
      while (x < w) {
        val base = rowOff + x * channels
        gray(y * w + x) = colorType match {
          case 0 | 4 => raw(base) & 0xff // luma of (v,v,v) IS v
          case _ =>
            (299 * (raw(base) & 0xff) + 587 * (raw(base + 1) & 0xff) +
              114 * (raw(base + 2) & 0xff)) / 1000
        }
        x += 1
      }
      y += 1
    }
    Some(GrayImage(w, h, gray))
  }

  /** Decoded PCM clip: RAW integer samples, interleaved in file order
    * (16-bit: signed −32768..32767; 8-bit: unsigned 0..255 as stored —
    * the WAV convention). */
  final case class PcmAudio(
      sampleRate: Int, channels: Int, bits: Int, frames: Long,
      samples: Array[Int])

  /** SAMPLE-level decode of a PCM RIFF/WAVE file (format tag 1, 8 or
    * 16 bits): the fmt/data chunk walk [[parseWav]] does, plus the
    * payload itself. A data chunk cut short decodes the frames that
    * are actually present; non-PCM (float, ADPCM, extensible), other
    * bit depths, and malformed containers return None — hostile-bytes
    * safe, never an exception. */
  def decodeWavPcm(b: Array[Byte]): Option[PcmAudio] = {
    if (b.length < 44 ||
      !startsWith(b, "RIFF".getBytes("US-ASCII")) ||
      new String(b, 8, 4, "US-ASCII") != "WAVE") return None
    var off = 12L
    var sr = 0; var ch = 0; var bits = 0; var blockAlign = 0
    var fmtTag = 0
    var dataOff = -1L; var dataSize = -1L
    while (off + 8 <= b.length) {
      val id = new String(b, off.toInt, 4, "US-ASCII")
      val size = le32(b, off.toInt + 4) & 0xffffffffL
      val body = off + 8
      if (id == "fmt " && size >= 16 && body + 16 <= b.length) {
        fmtTag = le16(b, body.toInt)
        ch = le16(b, body.toInt + 2)
        sr = le32(b, body.toInt + 4)
        blockAlign = le16(b, body.toInt + 12)
        bits = le16(b, body.toInt + 14)
      } else if (id == "data" && dataOff < 0) {
        dataOff = body; dataSize = size
      }
      off = body + size + (size & 1L) // chunks are word-aligned
    }
    if (fmtTag != 1 || (bits != 8 && bits != 16) || ch < 1 || sr <= 0 ||
      dataOff < 0 || blockAlign != ch * (bits / 8)) return None
    val usable = math.min(dataSize, b.length - dataOff)
    val frames = usable / blockAlign
    if (frames <= 0 || frames > (1L << 28)) return None // 268M cap
    val n = (frames * ch).toInt
    val samples = new Array[Int](n)
    var i = 0
    val base = dataOff.toInt
    while (i < n) {
      samples(i) =
        if (bits == 16) (le16(b, base + 2 * i) << 16) >> 16 // sign-ext
        else u8(b, base + i)
      i += 1
    }
    Some(PcmAudio(sr, ch, bits, frames, samples))
  }

  /** PIXEL-level decode of a JPEG straight to the luma raster, through
    * the JDK's own baseline-DCT decoder (`javax.imageio`, in the JDK —
    * not a dependency). JPEG is the format that actually dominates a
    * real 100 TB web-image corpus (reference reads image files via PIL:
    * `summary_helpers_image.py`); hand-rolling a DCT decoder would add
    * thousands of lines for pixels the platform already produces, so
    * ImageIO is the DECODE SEAM here and the q344 gate certifies it
    * end-to-end: a JPEG re-encode of fixture pixels must dHash within
    * hamming ≤ 3 of its independently-hashed BMP/PNG twin. Hostile
    * bytes: magic sniffed first, dimensions read from the HEADER and
    * capped at 16k per side BEFORE any raster allocation, every
    * decoder exception swallowed to None. The in-memory stream cache
    * is forced (no ImageIO temp files on executors). */
  def decodeJpegGray(b: Array[Byte]): Option[GrayImage] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8 ||
      (b(2) & 0xff) != 0xff) return None
    decodeImageIoGray(b)
  }

  /** PIXEL-level decode of a TIFF through the SAME JDK ImageIO seam
    * (the TIFF plugin ships with the JDK since 9). An uncompressed
    * grayscale TIFF round-trips losslessly, so — like GIF (q348) and
    * unlike JPEG — the q359 gate is EXACT hash equality against the
    * independent twin. Same hostile-bytes contract: magic sniffed,
    * header dims capped before raster allocation, None on anything
    * malformed. */
  def decodeTiffGray(b: Array[Byte]): Option[GrayImage] = {
    val ii = b.length >= 4 && b(0) == 'I' && b(1) == 'I' &&
      (b(2) & 0xff) == 42 && b(3) == 0
    val mm = b.length >= 4 && b(0) == 'M' && b(1) == 'M' &&
      b(2) == 0 && (b(3) & 0xff) == 42
    if (!ii && !mm) return None
    decodeImageIoGray(b)
  }

  /** Shared ImageIO decode seam (JPEG/TIFF): header-first dimension
    * cap, in-memory stream cache, luma collapse, never an exception. */
  private def decodeImageIoGray(b: Array[Byte]): Option[GrayImage] =
    try decodeImageIoGrayImpl(b)
    catch { case _: Exception => None }

  private def decodeImageIoGrayImpl(b: Array[Byte]): Option[GrayImage] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14))
          return None
        val img = reader.read(0)
        val gray = new Array[Int](w * h)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            val red = (p >> 16) & 0xff
            val grn = (p >> 8) & 0xff
            val blu = p & 0xff
            gray(y * w + x) = (299 * red + 587 * grn + 114 * blu) / 1000
            x += 1
          }
          y += 1
        }
        Some(GrayImage(w, h, gray))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** PIXEL-level decode of a GIF87a/GIF89a first frame straight to the
    * luma raster: logical screen descriptor, global/local color table,
    * extension-block skip, and a hand-rolled GIF-variant LZW
    * decompressor (variable 3–12-bit codes LSB-first across
    * concatenated sub-blocks, clear/EOI codes, 4096-entry dictionary —
    * the public GIF89a spec, appendix F). The palette maps indices to
    * RGB and the same integer luma collapses them, so a GIF holding
    * the same pixels as a BMP/PNG fingerprints identically — and
    * because a ≤256-distinct-value raster (any grayscale image)
    * re-encodes LOSSLESSLY, the q348 gate is exact-hash, not a
    * tolerance. Interlaced frames are de-interlaced (4-pass row map —
    * the JDK's own GIF writer emits interlaced streams, so the
    * committed fixtures certify this path); anything malformed,
    * truncated, oversized (16k cap) or LZW-corrupt returns None —
    * hostile-bytes safe, never an exception. */
  def decodeGifGray(b: Array[Byte]): Option[GrayImage] =
    try decodeGifGrayImpl(b)
    catch { case _: Exception => None }

  private def decodeGifGrayImpl(b: Array[Byte]): Option[GrayImage] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val sw = le16(b, 6)
    val sh = le16(b, 8)
    if (sw <= 0 || sh <= 0 || sw > (1 << 14) || sh > (1 << 14)) return None
    val gFlags = u8(b, 10)
    var pos = 13
    var globalPal: Array[Int] = null // packed 0xRRGGBB
    if ((gFlags & 0x80) != 0) {
      val n = 2 << (gFlags & 7)
      if (pos + 3 * n > b.length) return None
      globalPal = readPalette(b, pos, n)
      pos += 3 * n
    }
    // walk blocks to the first image descriptor
    while (pos < b.length) {
      u8(b, pos) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while (pos < b.length && u8(b, pos) != 0) pos += 1 + u8(b, pos)
          pos += 1 // terminator
        case 0x2c =>
          if (pos + 10 > b.length) return None
          val w = le16(b, pos + 5)
          val h = le16(b, pos + 7)
          val iFlags = u8(b, pos + 9)
          pos += 10
          if (w <= 0 || h <= 0 || w > sw || h > sh) return None
          val interlaced = (iFlags & 0x40) != 0
          var pal = globalPal
          if ((iFlags & 0x80) != 0) {
            val n = 2 << (iFlags & 7)
            if (pos + 3 * n > b.length) return None
            pal = readPalette(b, pos, n)
            pos += 3 * n
          }
          if (pal == null || pos >= b.length) return None
          val minCode = u8(b, pos)
          pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the image sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (pos < b.length && u8(b, pos) != 0) {
            val n = u8(b, pos)
            if (pos + 1 + n > b.length) return None
            data.write(b, pos + 1, n)
            pos += 1 + n
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h)
          if (idx == null) return None
          // interlace: the stream carries rows in the 4-pass order
          // (0,8,16..; 4,12..; 2,6,10..; 1,3,5..) — map stream row k
          // to its raster row (GIF89a spec, appendix E)
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val order = new Array[Int](h)
              var k = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until h by step) { order(k) = y; k += 1 }
              order
            }
          val gray = new Array[Int](w * h)
          var sy = 0
          while (sy < h) {
            val dy = rowOf(sy)
            var x = 0
            while (x < w) {
              val p = pal(math.min(idx(sy * w + x) & 0xff, pal.length - 1))
              gray(dy * w + x) = (299 * ((p >> 16) & 0xff) +
                587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)) / 1000
              x += 1
            }
            sy += 1
          }
          return Some(GrayImage(w, h, gray))
        case 0x3b => return None // trailer before any image
        case _ => return None // unknown block: structure lost
      }
    }
    None
  }

  private def readPalette(b: Array[Byte], off: Int, n: Int): Array[Int] = {
    val pal = new Array[Int](n)
    var i = 0
    while (i < n) {
      pal(i) = ((b(off + 3 * i) & 0xff) << 16) |
        ((b(off + 3 * i + 1) & 0xff) << 8) | (b(off + 3 * i + 2) & 0xff)
      i += 1
    }
    pal
  }

  /** GIF-variant LZW: returns exactly `outLen` palette indices, or null
    * on any structural corruption (bad code, dictionary overflow,
    * stream exhaustion before the raster fills). */
  private def lzwDecode(d: Array[Byte], minCode: Int,
      outLen: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix link, appended byte); entries < clear are roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = eoi + 1
    var codeSize = minCode + 1
    val out = new Array[Byte](outLen)
    var outPos = 0
    var prev = -1
    var acc = 0L
    var accBits = 0
    var bytePos = 0
    val stack = new Array[Byte](4096)
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    def emit(code: Int): Boolean = {
      var sp = 0
      var c = code
      while (c >= clear) {
        if (sp >= 4096) return false
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      if (outPos + sp + 1 > outLen) return false
      out(outPos) = c.toByte; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      true
    }
    while (outPos < outLen) {
      while (accBits < codeSize) {
        if (bytePos >= d.length) return null // exhausted early
        acc |= (d(bytePos) & 0xffL) << accBits
        accBits += 8
        bytePos += 1
      }
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize
      accBits -= codeSize
      if (code == clear) {
        dictSize = eoi + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outPos == outLen) out else null
      } else if (prev == -1) {
        if (code >= clear) return null // first code must be a root
        out(outPos) = code.toByte; outPos += 1
        prev = code
      } else {
        if (code > dictSize) return null
        val known = code < dictSize
        // add (prev + first byte) FIRST: the KwKwK case (code ==
        // dictSize) refers to exactly this entry
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = firstByte(if (known) code else prev)
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        } else if (!known) return null // full dict can't mint KwKwK
        if (!emit(code)) return null
        prev = code
      }
    }
    out
  }

  /** FRAME extraction from an MJPEG AVI (RIFF 'AVI ' container, the
    * public OpenDML/VfW layout): walks the chunk tree to the 'movi'
    * LIST and returns each video-frame chunk ('##dc'/'##db') payload —
    * for Motion-JPEG streams each payload is a standalone baseline
    * JPEG, which [[decodeJpegGray]] then turns into pixels. Container
    * walk only (no codec assumptions beyond the caller's decode);
    * bounds-checked at every step, frame count capped at 100k,
    * anything malformed returns an empty result — hostile-bytes safe,
    * never an exception. */
  def aviFrames(b: Array[Byte]): Seq[Array[Byte]] =
    try aviFramesImpl(b)
    catch { case _: Exception => Seq.empty }

  private def aviFramesImpl(b: Array[Byte]): Seq[Array[Byte]] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F')) return Seq.empty
    if (!(b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '))
      return Seq.empty
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    val out = Seq.newBuilder[Array[Byte]]
    var n = 0
    // find every top-level-or-nested LIST 'movi' (strictly: top level,
    // but a lenient walk tolerates writers that nest)
    def walk(from: Int, to: Int, depth: Int): Unit = {
      if (depth > 4) return
      var pos = from
      while (pos + 8 <= to) {
        val size = le32(b, pos + 4)
        if (size < 0 || pos + 8 + size.toLong > to) return
        val isList = b(pos) == 'L' && b(pos + 1) == 'I' &&
          b(pos + 2) == 'S' && b(pos + 3) == 'T'
        if (isList && size >= 4) {
          val lt = new String(b, pos + 8, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          if (lt == "movi") collectFrames(pos + 12, pos + 8 + size)
          else walk(pos + 12, pos + 8 + size, depth + 1)
        }
        pos += 8 + size + (size & 1) // chunks pad to even
      }
    }
    def collectFrames(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to && n < 100000) {
        val size = le32(b, pos + 4)
        if (size < 0 || pos + 8 + size.toLong > to) return
        val c2 = b(pos + 2); val c3 = b(pos + 3)
        if ((c2 == 'd' && (c3 == 'c' || c3 == 'b'))) {
          out += java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + size)
          n += 1
        } else if (b(pos) == 'L' && b(pos + 1) == 'I' &&
          b(pos + 2) == 'S' && b(pos + 3) == 'T' && size >= 4) {
          // 'rec ' grouping LIST: frames nest one level down
          collectFrames(pos + 12, pos + 8 + size)
        }
        pos += 8 + size + (size & 1)
      }
    }
    walk(12, riffEnd, 0)
    out.result()
  }

  /** Format-dispatched pixel decode: BMP, PNG or JPEG by magic sniff;
    * None for everything else. The one entry point the perceptual-hash
    * pipeline uses — the same pixels decode to the same raster and
    * therefore the same dHash whatever the container (cross-FORMAT
    * duplicate detection, gated in q341/q342 for BMP↔PNG and q344 for
    * JPEG re-encodes). */
  def decodeImageGray(b: Array[Byte]): Option[GrayImage] =
    if (b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
      decodeBmpGray(b)
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff &&
      (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
      decodeJpegGray(b)
    else if (b.length >= 4 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == '8'.toByte)
      decodeGifGray(b)
    else if (b.length >= 4 &&
      ((b(0) == 'I'.toByte && b(1) == 'I'.toByte && (b(2) & 0xff) == 42 &&
        b(3) == 0) ||
        (b(0) == 'M'.toByte && b(1) == 'M'.toByte && b(2) == 0 &&
          (b(3) & 0xff) == 42)))
      decodeTiffGray(b)
    else decodePngGray(b)

  /** 64-bit difference hash over a decoded raster: nearest-neighbor
    * resize to a 9×8 grid (s(x2,y2) = gray[y2·h/8][x2·w/9], integer
    * floor), bit y·8+x set iff the left sample is darker than its
    * right neighbor. The standard image near-dup fingerprint: stable
    * under re-encoding, brightness shifts and small edits; hamming
    * distance between hashes ≈ structural difference. The rule is
    * replicated independently by scripts/gen_image_fixture.py, so the
    * q340 gate certifies decode + grayscale + resize + hash together. */
  def dHash64(img: GrayImage): Long = {
    var hash = 0L
    var y2 = 0
    while (y2 < 8) {
      val sy = y2 * img.height / 8
      var x2 = 0
      while (x2 < 8) {
        val a = img.gray(sy * img.width + x2 * img.width / 9)
        val c = img.gray(sy * img.width + (x2 + 1) * img.width / 9)
        if (a < c) hash |= 1L << (y2 * 8 + x2)
        x2 += 1
      }
      y2 += 1
    }
    hash
  }
}
