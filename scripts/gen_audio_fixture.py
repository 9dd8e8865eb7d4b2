#!/usr/bin/env python3
"""Generate committed PCM WAV fixtures + stats twin for the audio
quality operators (MediaCodec.decodeWavPcm, Multimodal.audioPcmStats).

The WAVs are written by Python's STDLIB `wave` module (an independent
RIFF writer — no code shared with the Scala decoder), and the expected
stats are computed here from the same integer sample lists per the
documented spec, so the q343 gate certifies decode + math end-to-end:

  x          = s/32768 (16-bit signed) | (s-128)/128 (8-bit unsigned)
  duration_s = frames / rate
  rms        = sqrt(sum(x^2)/n), sum SEQUENTIAL in file order
  peak       = max |x|
  clip_frac  = #(s at the representable rails: -32768/32767, 0/255)/n
  silence    = #(|x| < 0.01)/n
  zcr        = #(frames i>=1, channels c: neg(s[i,c]) != neg(s[i-1,c]))
               / (channels * (frames-1)); neg(s) = s<0 (16b) | s<128
               (8b); 0.0 when frames < 2
  rms_ch_c   = sqrt(sum over frames of x[.,c]^2 / frames), per-channel
               sums SEQUENTIAL in frame order
  rms_ch_min / rms_ch_max = min/max over channels (rounded after)
  ch_imbalance = 1 - min/max of the UNROUNDED channel rms (0 when the
               max is 0) — a dead mic on any channel reads 1.0
  every ratio rounded HALF_UP at 6 dp (java BigDecimal.valueOf parity
  via Decimal(repr(x)) — both shortest-round-trip decimal strings)

Population (18 clips): sines at several rates/amplitudes, an OVERDRIVEN
clamped sine (real clipping), half-silence takes, deterministic LCG
noise, stereo with distinct channels, 8-bit variants.

  python3 scripts/gen_audio_fixture.py

Outputs: src/test/resources/graft/sources/audio/clip_NNN.wav
         src/test/resources/graft/sources/audio_twin.parquet
"""
import math
import os
import struct
import wave
from decimal import Decimal, ROUND_HALF_UP

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
WAV_DIR = os.path.join(OUT, "audio")


def r6(x):
    return float(Decimal(repr(x)).quantize(
        Decimal("0.000001"), ROUND_HALF_UP))


def lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield s >> 33


def sine16(n, rate, freq, amp):
    out = []
    for t in range(n):
        v = amp * math.sin(2 * math.pi * freq * t / rate)
        s = int(round(v * 32767))
        out.append(max(-32768, min(32767, s)))   # clamp = real clipping
    return out


def make_clips():
    clips = []  # (id, rate, channels, bits, interleaved samples)
    clips.append((0, 8000, 1, 16, sine16(8000, 8000, 440, 0.5)))
    clips.append((1, 16000, 1, 16, sine16(12000, 16000, 1000, 0.9)))
    # overdriven: amp 1.4 clamps at the rails -> nonzero clip_frac
    clips.append((2, 16000, 1, 16, sine16(16000, 16000, 440, 1.4)))
    # half dead air
    clips.append((3, 8000, 1, 16,
                  [0] * 4000 + sine16(4000, 8000, 300, 0.3)))
    # deterministic noise
    g = lcg(7)
    clips.append((4, 44100, 1, 16,
                  [(next(g) % 20001) - 10000 for _ in range(22050)]))
    # stereo: distinct L/R interleaved
    left = sine16(6000, 8000, 200, 0.4)
    right = sine16(6000, 8000, 350, 0.7)
    inter = [v for pair in zip(left, right) for v in pair]
    clips.append((5, 8000, 2, 16, inter))
    # 8-bit: quiet sine + an overdriven one (rails are 0/255)
    def sine8(n, rate, freq, amp):
        out = []
        for t in range(n):
            v = amp * math.sin(2 * math.pi * freq * t / rate)
            s = int(round(128 + v * 127))
            out.append(max(0, min(255, s)))
        return out
    clips.append((6, 8000, 1, 8, sine8(8000, 8000, 500, 0.6)))
    clips.append((7, 8000, 1, 8, sine8(8000, 8000, 500, 1.5)))
    # pure silence except one pop
    pop = [0] * 5000
    pop[2500] = 30000
    clips.append((8, 16000, 1, 16, pop))
    # more variety across rates/amps
    for j in range(9, 18):
        rate = [8000, 16000, 22050, 44100][j % 4]
        clips.append((j, rate, 1, 16,
                      sine16(rate // 2, rate, 100 + 90 * j,
                             0.1 + 0.09 * (j % 9))))
    # DEAD LEFT CHANNEL (planted truth for q345's dead-mic detector):
    # left all-zero, right a healthy sine -> ch_imbalance must read 1.0
    dead = [0] * 6000
    live = sine16(6000, 8000, 450, 0.5)
    clips.append((18, 8000, 2, 16,
                  [v for pair in zip(dead, live) for v in pair]))
    # an 8-bit stereo with MILD imbalance: both channels live
    def sine8v(n, rate, freq, amp):
        out = []
        for t in range(n):
            v = amp * math.sin(2 * math.pi * freq * t / rate)
            s = int(round(128 + v * 127))
            out.append(max(0, min(255, s)))
        return out
    l8 = sine8v(4000, 8000, 220, 0.5)
    r8 = sine8v(4000, 8000, 330, 0.4)
    clips.append((19, 8000, 2, 8,
                  [v for pair in zip(l8, r8) for v in pair]))
    return clips


def write_wav(path, rate, channels, bits, samples):
    w = wave.open(path, "wb")
    w.setnchannels(channels)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    if bits == 16:
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    else:
        w.writeframes(bytes(samples))
    w.close()


def stats(rate, channels, bits, samples):
    lo, hi = (-32768, 32767) if bits == 16 else (0, 255)
    mid = 0 if bits == 16 else 128        # neg(s) = s < mid
    sum_sq = 0.0
    peak = 0.0
    n_clip = n_sil = 0
    ch_sq = [0.0] * channels
    prev_neg = [False] * channels
    crossings = 0
    for i, s in enumerate(samples):
        x = s / 32768.0 if bits == 16 else (s - 128) / 128.0
        sum_sq += x * x
        ax = abs(x)
        if ax > peak:
            peak = ax
        if s == lo or s == hi:
            n_clip += 1
        if ax < 0.01:
            n_sil += 1
        c = i % channels
        ch_sq[c] += x * x
        neg = s < mid
        if i >= channels and neg != prev_neg[c]:
            crossings += 1
        prev_neg[c] = neg
    n = len(samples)
    frames = n // channels
    ch_rms = [math.sqrt(q / frames) for q in ch_sq]
    mn, mx = min(ch_rms), max(ch_rms)
    return dict(
        n_samples=n,
        duration_s=r6(frames / rate),
        rms=r6(math.sqrt(sum_sq / n)),
        peak=r6(peak),
        clip_frac=r6(n_clip / n),
        silence_frac=r6(n_sil / n),
        zcr=r6(crossings / (channels * (frames - 1))
               if frames >= 2 else 0.0),
        rms_ch_min=r6(mn),
        rms_ch_max=r6(mx),
        ch_imbalance=r6(1.0 - mn / mx) if mx > 0 else 0.0)


def main():
    os.makedirs(WAV_DIR, exist_ok=True)
    for old in os.listdir(WAV_DIR):
        os.remove(os.path.join(WAV_DIR, old))
    clips = make_clips()
    rows = []
    for (cid, rate, ch, bits, samples) in clips:
        write_wav(os.path.join(WAV_DIR, f"clip_{cid:03d}.wav"),
                  rate, ch, bits, samples)
        st = stats(rate, ch, bits, samples)
        rows.append((cid, rate, ch, bits, st))
    # sanity: the overdriven clips really clip; the quiet ones do not
    byid = {r[0]: r[4] for r in rows}
    assert byid[2]["clip_frac"] > 0.1, byid[2]
    assert byid[7]["clip_frac"] > 0.1, byid[7]
    assert byid[0]["clip_frac"] == 0.0
    assert byid[3]["silence_frac"] >= 0.5
    assert byid[8]["silence_frac"] > 0.99
    # q345 planted truths: a dead channel reads imbalance 1.0; healthy
    # stereo reads well below; a 440 Hz sine at 8 kHz crosses ~11% of
    # frame steps; mono clips carry zero imbalance
    assert byid[18]["ch_imbalance"] == 1.0, byid[18]
    assert byid[18]["rms_ch_min"] == 0.0, byid[18]
    assert byid[19]["ch_imbalance"] < 0.5, byid[19]
    assert 0.05 < byid[0]["zcr"] < 0.2, byid[0]
    assert byid[5]["ch_imbalance"] > 0.0, byid[5]
    assert all(byid[k]["ch_imbalance"] == 0.0
               for k in (0, 1, 2, 4) ), "mono must read 0 imbalance"

    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "audio_id": pa.array([r[0] for r in rows], pa.int64()),
        "sample_rate": pa.array([r[1] for r in rows], pa.int32()),
        "channels": pa.array([r[2] for r in rows], pa.int32()),
        "bits": pa.array([r[3] for r in rows], pa.int32()),
        "n_samples": pa.array([r[4]["n_samples"] for r in rows],
                              pa.int64()),
        "duration_s": pa.array([r[4]["duration_s"] for r in rows],
                               pa.float64()),
        "rms": pa.array([r[4]["rms"] for r in rows], pa.float64()),
        "peak": pa.array([r[4]["peak"] for r in rows], pa.float64()),
        "clip_frac": pa.array([r[4]["clip_frac"] for r in rows],
                              pa.float64()),
        "silence_frac": pa.array([r[4]["silence_frac"] for r in rows],
                                 pa.float64()),
        "zcr": pa.array([r[4]["zcr"] for r in rows], pa.float64()),
        "rms_ch_min": pa.array([r[4]["rms_ch_min"] for r in rows],
                               pa.float64()),
        "rms_ch_max": pa.array([r[4]["rms_ch_max"] for r in rows],
                               pa.float64()),
        "ch_imbalance": pa.array([r[4]["ch_imbalance"] for r in rows],
                                 pa.float64()),
    })
    pq.write_table(tbl, os.path.join(OUT, "audio_twin.parquet"))
    print(f"wrote {len(rows)} WAVs + twin")


if __name__ == "__main__":
    main()
