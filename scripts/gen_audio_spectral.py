#!/usr/bin/env python3
"""Spectral twin for the q349 audio spectral-shape gate
(graft.ops.Multimodal.audioSpectralStats / graft.ops.Dsp).

Reads the COMMITTED WAV fixtures (stdlib `wave` — an independent RIFF
reader, no code shared with the Scala decoder) and replays the EXACT
spec'd op sequence: channel-0 of the first 1024 frames (zero-padded),
Hann window with the spec'd Taylor cosine, iterative radix-2 DIT FFT
with the same bit-reversal and butterfly order and the same Taylor
twiddles, then centroid / spread / rolloff / dominant / crest with
sums sequential ascending in k. Every operation is an IEEE-754 double
op (+,-,*,/,sqrt) or the shared polynomial, so each double here is BIT
IDENTICAL to the Scala value and the gate can demand exact equality
after HALF_UP 6-dp rounding.

  python3 scripts/gen_audio_spectral.py

Outputs: src/test/resources/graft/sources/audio_spectral_twin.parquet
"""
import math
import os
import struct
import wave
from decimal import Decimal, ROUND_HALF_UP

OUT = os.path.join(os.path.dirname(__file__),
                   "..", "src/test/resources/graft/sources")
WAV_DIR = os.path.join(OUT, "audio")

TWO_PI = 6.283185307179586
PI = 3.141592653589793

SIN_C = [1.0, -0.16666666666666666, 0.008333333333333333,
         -0.0001984126984126984, 2.7557319223985893e-06,
         -2.505210838544172e-08, 1.6059043836821613e-10,
         -7.647163731819816e-13, 2.8114572543455206e-15,
         -8.22063524662433e-18, 1.9572941063391263e-20]
COS_C = [1.0, -0.5, 0.041666666666666664, -0.001388888888888889,
         2.48015873015873e-05, -2.755731922398589e-07,
         2.08767569878681e-09, -1.1470745597729725e-11,
         4.779477332387385e-14, -1.5619206968586225e-16,
         4.110317623312165e-19]


def r6(x):
    return float(Decimal(repr(x)).quantize(
        Decimal("0.000001"), ROUND_HALF_UP))


def sin_p(x):
    if x > PI:
        x -= TWO_PI
    if x < -PI:
        x += TWO_PI
    x2 = x * x
    s = SIN_C[10]
    for k in range(9, -1, -1):
        s = s * x2 + SIN_C[k]
    return x * s


def cos_p(x):
    if x > PI:
        x -= TWO_PI
    if x < -PI:
        x += TWO_PI
    x2 = x * x
    s = COS_C[10]
    for k in range(9, -1, -1):
        s = s * x2 + COS_C[k]
    return s


def fft(re, im):
    n = len(re)
    i, j = 1, 0
    while i < n:
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            re[i], re[j] = re[j], re[i]
            im[i], im[j] = im[j], im[i]
        i += 1
    length = 2
    while length <= n:
        half = length >> 1
        for jj in range(half):
            ang = -TWO_PI * jj / length
            wr = cos_p(ang)
            wi = sin_p(ang)
            base = jj
            while base < n:
                p, q = base, base + half
                xr = re[q] * wr - im[q] * wi
                xi = re[q] * wi + im[q] * wr
                re[q] = re[p] - xr
                im[q] = im[p] - xi
                re[p] = re[p] + xr
                im[p] = im[p] + xi
                base += length
        length <<= 1


def spectral(rate, channels, bits, samples):
    N = 1024
    frames = len(samples) // channels
    used = min(frames, N)
    re = [0.0] * N
    im = [0.0] * N
    for i in range(used):
        s = samples[i * channels]
        x = s / 32768.0 if bits == 16 else (s - 128) / 128.0
        re[i] = x * (0.5 - 0.5 * cos_p(TWO_PI * i / (N - 1)))
    fft(re, im)
    half = N // 2
    p = [re[k] * re[k] + im[k] * im[k] for k in range(half + 1)]
    total = 0.0
    for k in range(1, half + 1):
        total += p[k]
    if total <= 0.0:
        return dict(frames_used=used, spectral_centroid=0.0,
                    spectral_spread=0.0, spectral_rolloff=0.0,
                    dominant_freq=0.0, spectral_crest=0.0)

    def f(k):
        return k * rate / N
    wsum = 0.0
    for k in range(1, half + 1):
        wsum += f(k) * p[k]
    centroid = wsum / total
    vsum = 0.0
    for k in range(1, half + 1):
        d = f(k) - centroid
        vsum += d * d * p[k]
    spread = math.sqrt(vsum / total)
    thr = 0.85 * total
    cum = 0.0
    roll = 0.0
    kmax = 1
    for k in range(1, half + 1):
        cum += p[k]
        if roll == 0.0 and cum >= thr:
            roll = f(k)
        if p[k] > p[kmax]:
            kmax = k
    return dict(frames_used=used,
                spectral_centroid=r6(centroid),
                spectral_spread=r6(spread),
                spectral_rolloff=r6(roll),
                dominant_freq=r6(f(kmax)),
                spectral_crest=r6(p[kmax] / (total / half)))


def read_wav(path):
    w = wave.open(path, "rb")
    rate = w.getframerate()
    channels = w.getnchannels()
    bits = w.getsampwidth() * 8
    raw = w.readframes(w.getnframes())
    w.close()
    if bits == 16:
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    else:
        samples = list(raw)
    return rate, channels, bits, samples


def main():
    rows = []
    for name in sorted(os.listdir(WAV_DIR)):
        if not name.endswith(".wav"):
            continue
        cid = int(name[5:8])
        rate, ch, bits, samples = read_wav(os.path.join(WAV_DIR, name))
        st = spectral(rate, ch, bits, samples)
        rows.append((cid, st))
    byid = {r[0]: r[1] for r in rows}
    # planted truths: clip 0 is a 440 Hz sine at 8 kHz -> dominant bin
    # 56 = 437.5 Hz, huge crest; clip 4 is LCG noise -> small crest,
    # wide spread; clip 8 is silent in the first 1024 frames -> zeros
    binw = 8000 / 1024
    assert abs(byid[0]["dominant_freq"] - 440) <= binw, byid[0]
    assert byid[0]["spectral_crest"] > 50, byid[0]
    assert byid[4]["spectral_crest"] < 10, byid[4]
    assert byid[4]["spectral_spread"] > byid[0]["spectral_spread"], byid[4]
    assert byid[8]["spectral_centroid"] == 0.0, byid[8]
    assert byid[18]["frames_used"] == 1024

    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "audio_id": pa.array([r[0] for r in rows], pa.int64()),
        "frames_used": pa.array([r[1]["frames_used"] for r in rows],
                                pa.int32()),
        "spectral_centroid": pa.array(
            [r[1]["spectral_centroid"] for r in rows], pa.float64()),
        "spectral_spread": pa.array(
            [r[1]["spectral_spread"] for r in rows], pa.float64()),
        "spectral_rolloff": pa.array(
            [r[1]["spectral_rolloff"] for r in rows], pa.float64()),
        "dominant_freq": pa.array(
            [r[1]["dominant_freq"] for r in rows], pa.float64()),
        "spectral_crest": pa.array(
            [r[1]["spectral_crest"] for r in rows], pa.float64()),
    })
    pq.write_table(tbl, os.path.join(OUT, "audio_spectral_twin.parquet"))
    print(f"wrote spectral twin for {len(rows)} clips")


if __name__ == "__main__":
    main()
