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

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    (u8(b, i + 3) << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

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
      case f => ImageMeta(f, 0, 0, truncated = false)
    }
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
}
