package graft.ops

import graft.SparkSpec

/** Sample-level WAV decode + audio quality stats. The committed
  * fixture certifies the happy paths against python's independent
  * writer/math (q343); this pins decoder edge cases. */
class AudioStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-rolled PCM WAV (independent of python's `wave`). */
  private def wav(rate: Int, channels: Int, bits: Int,
      samples: Seq[Int], fmtTag: Int = 1,
      lieDataSize: Option[Int] = None): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = samples.length * bytesPer
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16)
      .putShort(fmtTag.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bytesPer)
      .putShort((channels * bytesPer).toShort).putShort(bits.toShort)
    out.put("data".getBytes).putInt(lieDataSize.getOrElse(dataLen))
    samples.foreach { s =>
      if (bits == 16) out.putShort(s.toShort) else out.put(s.toByte)
    }
    out.array()
  }

  test("decodeWavPcm: 16-bit signed and 8-bit unsigned, stereo interleave") {
    val st = MediaCodec.decodeWavPcm(
      wav(8000, 2, 16, Seq(100, -200, 32767, -32768))).get
    assert(st.channels === 2 && st.frames === 2)
    assert(st.samples.toSeq === Seq(100, -200, 32767, -32768))
    val e8 = MediaCodec.decodeWavPcm(
      wav(8000, 1, 8, Seq(0, 128, 255))).get
    assert(e8.samples.toSeq === Seq(0, 128, 255))
  }

  test("decodeWavPcm: rejects non-PCM, odd depths, garbage; trims short data") {
    assert(MediaCodec.decodeWavPcm(
      wav(8000, 1, 16, Seq(1, 2), fmtTag = 3)).isEmpty) // float PCM
    assert(MediaCodec.decodeWavPcm("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(MediaCodec.decodeWavPcm(Array.empty[Byte]).isEmpty)
    // a data-size field larger than the real payload: decode what IS
    // there instead of reading past the buffer
    val cut = MediaCodec.decodeWavPcm(
      wav(8000, 1, 16, Seq(5, 6, 7), lieDataSize = Some(100))).get
    assert(cut.samples.toSeq === Seq(5, 6, 7))
  }

  test("audioPcmStats: clipping, silence and rms behave as specified") {
    // rails clip; |x| < 0.01 is silence (327/32768 ≈ 0.00998 counts)
    val df = Seq(
      (1L, wav(8000, 1, 16, Seq(32767, -32768, 0, 16384))),
      (2L, wav(8000, 1, 8, Seq(128, 128, 255, 0))),
      (3L, "not audio".getBytes)).toDF("id", "blob")
    val out = Multimodal.audioPcmStats(df, "id", "blob")
      .collect().map(s => s.id -> s).toMap
    assert(out.keySet === Set(1L, 2L), "garbage blob dropped")
    val a = out(1L)
    assert(a.clip_frac === 0.5 && a.silence_frac === 0.25)
    assert(a.peak === 1.0 && a.n_samples === 4L)
    assert(a.duration_s === 0.0005)
    // rms of {32767/32768, -1, 0, 0.5}: sqrt(2.2499390/4) -> 0.74999
    assert(a.rms === 0.74999)
    val b = out(2L)
    assert(b.clip_frac === 0.5, "8-bit rails are 0 and 255")
    assert(b.silence_frac === 0.5, "128 is the 8-bit zero")
  }
}
