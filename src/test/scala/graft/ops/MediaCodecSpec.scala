package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM codec tests: encode a minimal valid file, parse it back,
  * and hit the parser edge cases (truncation, EXIF skip, fill bytes,
  * SOS-before-SOF, garbage). */
class MediaCodecSpec extends AnyFunSuite {

  test("png round-trip + signature sniff") {
    val b = MediaCodec.encodePng(12345, 67890)
    assert(MediaCodec.sniffFormat(b) == "png")
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("png", 12345, 67890, truncated = false))
  }

  test("jpeg round-trip: walk skips APP0 to reach SOF0") {
    val b = MediaCodec.encodeJpeg(640, 480)
    assert(MediaCodec.sniffFormat(b) == "jpeg")
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("jpeg", 640, 480, truncated = false))
  }

  test("jpeg walk skips an EXIF APP1 segment like any APPn") {
    val base = MediaCodec.encodeJpeg(99, 44)
    // splice an APP1 (FF E1) with 10-byte payload right after SOI
    val app1 = Array(0xff, 0xe1, 0x00, 0x0c).map(_.toByte) ++
      "Exif\u0000\u0000abcd".getBytes("US-ASCII")
    val b = base.take(2) ++ app1 ++ base.drop(2)
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("jpeg", 99, 44, truncated = false))
  }

  test("jpeg fill bytes (FF FF) before a marker are consumed") {
    val base = MediaCodec.encodeJpeg(7, 8)
    val b = base.take(2) ++ Array(0xff.toByte) ++ base.drop(2)
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("jpeg", 7, 8, truncated = false))
  }

  test("jpeg with SOS before any SOF reports truncated") {
    // SOI + SOS marker with minimal length then EOI: header walk cannot
    // recover dimensions
    val b = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02, 0xff, 0xd9)
      .map(_.toByte)
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("jpeg", 0, 0, truncated = true))
  }

  test("gif round-trip little-endian dims") {
    val b = MediaCodec.encodeGif(65535, 1)
    assert(MediaCodec.sniffFormat(b) == "gif")
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("gif", 65535, 1, truncated = false))
  }

  test("bmp round-trip little-endian dims, top-down height abs()") {
    val b = MediaCodec.encodeBmp(1920, 1080)
    assert(MediaCodec.sniffFormat(b) == "bmp")
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("bmp", 1920, 1080, truncated = false))
    // top-down BMPs store negative height; reader reports magnitude
    val neg = MediaCodec.encodeBmp(10, -20)
    assert(MediaCodec.parseImageMeta(neg).height == 20)
  }

  test("webp VP8L round-trip dims") {
    val b = MediaCodec.encodeWebp(800, 600)
    assert(MediaCodec.sniffFormat(b) == "webp")
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("webp", 800, 600, truncated = false))
  }

  test("webp with chunk header but no payload is truncated") {
    // bare RIFF....WEBPVP8<sp>: fourcc present, frame tag + sync absent
    val b = ("RIFF" + "\u0000\u0000\u0000\u0000" + "WEBPVP8 ")
      .getBytes("US-ASCII")
    assert(MediaCodec.sniffFormat(b) == "webp")
    assert(MediaCodec.parseImageMeta(b) ==
      MediaCodec.ImageMeta("webp", 0, 0, truncated = true))
  }

  test("8-byte truncation: format survives, dims gone, truncated set") {
    for (full <- Seq(MediaCodec.encodePng(5, 6), MediaCodec.encodeJpeg(5, 6),
        MediaCodec.encodeGif(5, 6), MediaCodec.encodeBmp(5, 6))) {
      val m = MediaCodec.parseImageMeta(full.take(8))
      assert(m.truncated, s"${m.format} should be truncated at 8 bytes")
      assert(m.width == 0 && m.height == 0)
      assert(m.format == MediaCodec.sniffFormat(full))
    }
  }

  test("exif round-trip incl. short (<=4-byte) inline ASCII values") {
    // 5+ byte strings take the offset form, <=4-byte strings MUST be
    // inline per TIFF 6.0 §2 — both forms round-trip
    val long = MediaCodec.encodeJpegExif(10, 20, 6, "PixelCam 9",
      "2024:05:01 10:11:12")
    assert(MediaCodec.parseExif(long) ==
      MediaCodec.ExifMeta(present = true, 6, "PixelCam 9",
        "2024:05:01 10:11:12"))
    val short = MediaCodec.encodeJpegExif(10, 20, 1, "abc", "xy")
    assert(MediaCodec.parseExif(short) ==
      MediaCodec.ExifMeta(present = true, 1, "abc", "xy"))
  }

  test("exif walk never throws on hostile offsets/counts (Int overflow)") {
    // craft an APP1 whose IFD entry carries a huge count and offset so
    // naive Int bounds checks (off + count, tiff + ifdOff) wrap negative
    def tiffWith(ifd0Off: Int, entries: Array[Byte]): Array[Byte] = {
      val t = java.nio.ByteBuffer.allocate(8 + entries.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      t.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifd0Off)
      t.put(entries)
      t.array()
    }
    def jpegWithTiff(tiff: Array[Byte]): Array[Byte] = {
      val app1Len = 2 + 6 + tiff.length
      val out = java.nio.ByteBuffer.allocate(2 + 2 + app1Len + 2)
      out.put(0xff.toByte).put(0xd8.toByte)
      out.put(0xff.toByte).put(0xe1.toByte).putShort(app1Len.toShort)
        .put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
        .put(tiff)
      out.put(0xff.toByte).put(0xd9.toByte)
      out.array()
    }
    // IFD0 at a near-Int.MaxValue offset: tiff + ifdOff + 2 wraps
    val wrapIfd = jpegWithTiff(tiffWith(Int.MaxValue - 4, Array[Byte]()))
    assert(!MediaCodec.parseExif(wrapIfd).present ||
      MediaCodec.parseExif(wrapIfd).model == "")
    // Model entry with count ~2^30 and offset ~2^30: off + count wraps
    val e = java.nio.ByteBuffer.allocate(2 + 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    e.putShort(1)
    e.putShort(0x0110).putShort(2).putInt(0x40000000).putInt(0x40000000)
    e.putInt(0)
    val wrapVal = jpegWithTiff(tiffWith(8, e.array()))
    val m = MediaCodec.parseExif(wrapVal) // must not throw
    assert(m.model == "")
    // random garbage APP1 payloads must never throw either
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val junk = Array.fill(40)(rnd.nextInt(256).toByte)
      MediaCodec.parseExif(jpegWithTiff(junk)) // no exception = pass
    }
  }

  test("garbage, empty and null bytes are unknown/empty, not truncated") {
    assert(MediaCodec.parseImageMeta("hello world".getBytes) ==
      MediaCodec.ImageMeta("unknown", 0, 0, truncated = false))
    assert(MediaCodec.parseImageMeta(Array.empty[Byte]) ==
      MediaCodec.ImageMeta("empty", 0, 0, truncated = false))
    assert(MediaCodec.parseImageMeta(null) ==
      MediaCodec.ImageMeta("empty", 0, 0, truncated = false))
  }

  test("wav round-trips rate/channels/bits/frames; truncation flagged") {
    val m = MediaCodec.parseAudioMeta(
      MediaCodec.encodeWav(44100, 2, 16, 777))
    assert(m == MediaCodec.AudioMeta("wav", 44100, 2, 16, 777L,
      truncated = false))
    // cut past the RIFF/WAVE magic but before fmt: sniffed, truncated
    val cut = MediaCodec.parseAudioMeta(
      MediaCodec.encodeWav(8000, 1, 8, 10).take(16))
    assert(cut.format == "wav" && cut.truncated && cut.sampleRate == 0)
    // mono 8-bit: blockAlign 1, frames = data size
    val mono = MediaCodec.parseAudioMeta(MediaCodec.encodeWav(8000, 1, 8, 3))
    assert(mono.nFrames == 3L && mono.channels == 1)
  }

  test("flac STREAMINFO bit fields round-trip, incl. 36-bit totals") {
    val m = MediaCodec.parseAudioMeta(
      MediaCodec.encodeFlac(48000, 2, 24, 0x123456789L))
    assert(m == MediaCodec.AudioMeta("flac", 48000, 2, 24, 0x123456789L,
      truncated = false))
    val cut = MediaCodec.parseAudioMeta(
      MediaCodec.encodeFlac(22050, 1, 16, 5L).take(6))
    assert(cut.format == "flac" && cut.truncated)
  }

  test("audio parse is hostile-bytes safe") {
    assert(MediaCodec.parseAudioMeta("not audio".getBytes).format
      == "unknown")
    assert(MediaCodec.parseAudioMeta(null).format == "empty")
    // RIFF/WAVE with a chunk whose size field overflows past the end
    val evil = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes).putInt(0x7fffffff).put("WAVE".getBytes)
    evil.put("fmt ".getBytes).putInt(0x7fffffff)
    val e = MediaCodec.parseAudioMeta(evil.array()) // must not throw
    assert(e.format == "wav" && e.truncated)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val junk = "RIFF".getBytes ++
        Array.fill(30)(rnd.nextInt(256).toByte)
      MediaCodec.parseAudioMeta(junk) // no exception = pass
    }
    for (_ <- 1 to 200) {
      val junk = "fLaC".getBytes ++
        Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte)
      MediaCodec.parseAudioMeta(junk) // no exception = pass
    }
  }

  test("mp4 round-trips timescale/duration/tracks/dims, mvhd v0 and v1") {
    val v0 = MediaCodec.encodeMp4(90000, 270000L, Seq((1920, 1080)))
    assert(MediaCodec.parseVideoMeta(v0) ==
      MediaCodec.VideoMeta("mp4", 90000, 270000L, 1, 1920, 1080,
        truncated = false))
    // version 1 carries 64-bit duration; dims come from the FIRST trak
    val v1 = MediaCodec.encodeMp4(600, 0x1_0000_0000L,
      Seq((640, 480), (320, 240)), mvhdVersion = 1)
    assert(MediaCodec.parseVideoMeta(v1) ==
      MediaCodec.VideoMeta("mp4", 600, 0x1_0000_0000L, 2, 640, 480,
        truncated = false))
  }

  test("mp4 truncation: cut before moov keeps format, sets truncated") {
    val cut = MediaCodec.encodeMp4(600, 1200L, Seq((320, 240))).take(20)
    val m = MediaCodec.parseVideoMeta(cut)
    assert(m.format == "mp4" && m.truncated)
    assert(m.timescale == 0 && m.duration == 0L && m.nTracks == 0)
  }

  test("mp4 parse is hostile-bytes safe, incl. malformed box sizes") {
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { _ =>
      val junk = Array.fill(8)(0.toByte).patch(4,
        "ftyp".getBytes("US-ASCII"), 4) ++
        Array.fill(rnd.nextInt(60))(rnd.nextInt(256).toByte)
      MediaCodec.parseVideoMeta(junk) // no exception = pass
    }
    // size-0 (to-EOF) and size-1 (64-bit largesize) box paths
    val base = MediaCodec.encodeMp4(600, 1200L, Seq((320, 240)))
    val zeroSize = base.clone()
    zeroSize(16) = 0; zeroSize(17) = 0; zeroSize(18) = 0; zeroSize(19) = 0
    assert(!MediaCodec.parseVideoMeta(zeroSize).truncated) // moov to EOF
    assert(MediaCodec.parseVideoMeta("1234ftyp".getBytes ++
      Array[Byte](0, 0, 0, 1)).format == "mp4") // largesize cut, no throw
  }

  test("mp3 round-trip: all versions, tag skip, CBR frame count") {
    // MPEG1 stereo, no tag: 128 kbps @ 44100, 7 frames
    val v1 = MediaCodec.encodeMp3(3, 9, 0, mono = false, 7)
    assert(MediaCodec.parseMp3(v1) ==
      MediaCodec.Mp3Meta("1", 3, 128, 44100, 2, 7L, truncated = false))
    // MPEG2 mono behind an ID3v2 tag with a 100-byte body
    val v2 = MediaCodec.encodeMp3(2, 10, 1, mono = true, 3, id3Body = 100)
    assert(MediaCodec.parseMp3(v2) ==
      MediaCodec.Mp3Meta("2", 3, 96, 24000, 1, 3L, truncated = false))
    // MPEG2.5 low-rate row
    val v25 = MediaCodec.encodeMp3(0, 12, 0, mono = false, 1)
    assert(MediaCodec.parseMp3(v25) ==
      MediaCodec.Mp3Meta("2.5", 3, 128, 11025, 2, 1L, truncated = false))
  }

  test("mp3 truncation and hostility: short cuts and junk never throw") {
    val full = MediaCodec.encodeMp3(3, 9, 0, mono = false, 2, id3Body = 4)
    assert(MediaCodec.parseMp3(full.take(3)).truncated) // "ID3" only
    assert(MediaCodec.parseMp3(full.take(12)).truncated) // cut inside tag
    assert(MediaCodec.parseMp3(Array[Byte](0xff.toByte, 0xfb.toByte))
      .truncated) // sync but no full header
    // reserved version bits / free bitrate / reserved sample rate
    assert(MediaCodec.parseMp3(
      Array(0xff, 0xeb, 0x92, 0x00).map(_.toByte)).truncated) // ver=01
    assert(MediaCodec.parseMp3(
      Array(0xff, 0xfb, 0x02, 0x00).map(_.toByte)).truncated) // br free
    assert(MediaCodec.parseMp3(
      Array(0xff, 0xfb, 0x9e, 0x00).map(_.toByte)).truncated) // sr=3
    val rnd = new scala.util.Random(29)
    (0 until 300).foreach { _ =>
      val junk = Array.fill(2 + rnd.nextInt(40))(rnd.nextInt(256).toByte)
      MediaCodec.parseMp3(junk) // no exception = pass
    }
  }
}
