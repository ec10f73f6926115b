"""Ground-truth tests for the ADPCM WAV decoders
(prose_spark/operators/multimodal.py, format tags 17 = IMA/DVI and
2 = MS ADPCM).

Independence strategy, same discipline as test_wav_formats.py:

- The IMA nibble core is cross-validated BIT-EXACTLY against
  CPython's own `audioop` Intel/DVI codec (independent C
  implementation, present through 3.12): audioop.lin2adpcm encodes a
  real waveform, and `_ima_adpcm_core` must reproduce
  audioop.adpcm2lin's int16 output sample-for-sample from the same
  nibble stream and initial state.
- The WAV block containers (which audioop does not implement) are
  exercised by test-side encoders written directly from the public
  specs (IMA rev 3.00 block layout; Microsoft MSADPCM.txt), i.e. a
  SECOND independent implementation of the same math: encode a known
  waveform, decode with `decode_audio`, and require both the exact
  per-block header samples and a tight reconstruction error bound
  (ADPCM is lossy but near-transparent on smooth signals).
- Malformed-input contracts raise ValueError, never IndexError.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from prose_spark.operators.multimodal import (
    _IMA_INDEX_TABLE,
    _IMA_STEP_TABLE,
    _MS_ADPCM_ADAPT,
    _MS_ADPCM_COEFS,
    _ima_adpcm_core,
    decode_audio,
)

audioop = pytest.importorskip("audioop")


def _wav_adpcm(data: bytes, tag: int, ch: int, sr: int, bits: int,
               block_align: int, fact: int | None = None) -> bytes:
    fmt = struct.pack("<HHIIHHH", tag, ch, sr, sr, block_align, bits, 0)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact is not None:
        body += b"fact" + struct.pack("<II", 4, fact)
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _sine(n: int, sr: int = 8000, f: float = 440.0,
          amp: float = 0.6) -> np.ndarray:
    t = np.arange(n) / sr
    return np.round(amp * 32767 * np.sin(2 * np.pi * f * t)).astype(
        np.int16)


# -- IMA core vs audioop (bit-exact) ---------------------------------------


def test_ima_core_matches_audioop_bit_exact():
    sig = _sine(4096)
    frag = sig.astype("<i2").tobytes()
    enc, _state = audioop.lin2adpcm(frag, 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(enc, 2, None)[0], dtype="<i2")
    by = np.frombuffer(enc, dtype=np.uint8)
    # audioop packs the FIRST sample's nibble in the HIGH half
    nibbles = np.stack([by >> 4, by & 0x0F], axis=-1).reshape(1, -1)
    got = _ima_adpcm_core(nibbles.astype(np.int32),
                          np.array([0]), np.array([0]))[0]
    assert np.array_equal(got.astype(np.int16), ref)


def test_ima_core_noise_and_extremes_match_audioop():
    rng = np.random.default_rng(42)
    sig = rng.integers(-32768, 32768, size=2048).astype(np.int16)
    sig[:8] = [32767, -32768, 32767, -32768, 0, 1, -1, 0]
    enc, _ = audioop.lin2adpcm(sig.astype("<i2").tobytes(), 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(enc, 2, None)[0], dtype="<i2")
    by = np.frombuffer(enc, dtype=np.uint8)
    nibbles = np.stack([by >> 4, by & 0x0F], axis=-1).reshape(1, -1)
    got = _ima_adpcm_core(nibbles.astype(np.int32),
                          np.array([0]), np.array([0]))[0]
    assert np.array_equal(got.astype(np.int16), ref)


# -- test-side IMA encoder (from the IMA rev 3.00 spec) ---------------------


def _ima_encode_channel(samples: np.ndarray, index: int = 0):
    """-> (first_sample, initial_index, nibble list for samples[1:])."""
    pred = int(samples[0])
    idx = index
    nibs = []
    for s in samples[1:]:
        step = int(_IMA_STEP_TABLE[idx])
        diff = int(s) - pred
        n = 0
        if diff < 0:
            n = 8
            diff = -diff
        if diff >= step:
            n |= 4
            diff -= step
        if diff >= step >> 1:
            n |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            n |= 1
        # decoder-mirror reconstruction
        vpdiff = step >> 3
        if n & 4:
            vpdiff += step
        if n & 2:
            vpdiff += step >> 1
        if n & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if n & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_TABLE[n & 7])))
        nibs.append(n)
    return int(samples[0]), index, nibs


def _ima_encode_wav(sig: np.ndarray, ch: int, sr: int,
                    block_align: int, fact: bool = True) -> bytes:
    """sig: (frames, ch) int16."""
    spb = (block_align - 4 * ch) * 2 // ch + 1
    n_frames = (len(sig) // spb) * spb
    sig = sig[:n_frames]
    out = bytearray()
    for b0 in range(0, n_frames, spb):
        block = sig[b0:b0 + spb]
        chans = []
        for c in range(ch):
            # real encoders seed the block's step index near the
            # signal's per-sample slope so the quantizer can track
            # from sample 1 (index 0's step of 7 cannot follow a loud
            # 440 Hz sine and the comparison would measure encoder
            # seeding, not the decoder under test)
            slope = np.mean(np.abs(np.diff(block[:, c].astype(int))))
            idx = int(np.argmin(np.abs(_IMA_STEP_TABLE - slope)))
            chans.append(_ima_encode_channel(block[:, c], index=idx))
        for first, idx, _ in chans:
            out += struct.pack("<hBB", first, idx, 0)
        # channel-interleaved 4-byte groups, LOW nibble first
        nib_per_ch = spb - 1
        for g in range(0, nib_per_ch, 8):
            for _, _, nibs in chans:
                grp = nibs[g:g + 8] + [0] * (8 - len(nibs[g:g + 8]))
                for i in range(0, 8, 2):
                    out.append(grp[i] | (grp[i + 1] << 4))
    return _wav_adpcm(bytes(out), 17, ch, sr, 4, block_align,
                      fact=n_frames if fact else None)


def test_ima_wav_mono_roundtrip():
    sr = 8000
    sig = _sine(4096, sr).reshape(-1, 1)
    blob = _ima_encode_wav(sig, 1, sr, block_align=256)
    x, got_sr, dur = decode_audio(blob)
    spb = (256 - 4) * 2 + 1
    n = (4096 // spb) * spb
    assert got_sr == sr and len(x) == n
    assert abs(dur - n / sr) < 1e-9
    # per-block header samples decode exactly
    assert np.allclose(x[::spb], sig[: n: spb, 0] / 32768.0, atol=1e-9)
    # lossy-but-transparent on a smooth sine
    err = np.max(np.abs(x - sig[:n, 0] / 32768.0))
    assert err < 0.05, f"IMA reconstruction error {err}"


def test_ima_wav_stereo_roundtrip():
    sr = 8000
    left = _sine(2048, sr, f=440.0)
    right = _sine(2048, sr, f=523.25, amp=0.4)
    sig = np.stack([left, right], axis=1)
    blob = _ima_encode_wav(sig, 2, sr, block_align=256)
    x, got_sr, dur = decode_audio(blob)
    spb = (256 - 8) * 2 // 2 + 1
    n = (2048 // spb) * spb
    assert got_sr == sr and len(x) == n
    mono = sig[:n].mean(axis=1) / 32768.0
    err = np.max(np.abs(x - mono))
    assert err < 0.05, f"stereo IMA reconstruction error {err}"


def test_ima_fact_chunk_short_final_block_duration():
    sr = 8000
    sig = _sine(1024, sr).reshape(-1, 1)
    spb = (256 - 4) * 2 + 1
    n = (1024 // spb) * spb
    blob = _ima_encode_wav(sig, 1, sr, block_align=256, fact=True)
    _x, _sr, dur = decode_audio(blob)
    assert abs(dur - n / sr) < 1e-9


# -- test-side MS ADPCM encoder (from MSADPCM.txt) --------------------------


def _ms_encode_wav(sig: np.ndarray, ch: int, sr: int,
                   block_align: int, predictor: int = 0) -> bytes:
    spb = (block_align - 7 * ch) * 2 // ch + 2
    n_frames = (len(sig) // spb) * spb
    sig = sig[:n_frames]
    c1, c2 = (int(_MS_ADPCM_COEFS[predictor][0]),
              int(_MS_ADPCM_COEFS[predictor][1]))
    out = bytearray()
    for b0 in range(0, n_frames, spb):
        block = sig[b0:b0 + spb]
        seeds = [(int(block[1, c]), int(block[0, c])) for c in range(ch)]
        states = []
        deltas = []
        for c in range(ch):
            # seed delta near the block's per-sample slope / 4 (the
            # quantizer codes span -8..7), same rationale as the IMA
            # index seeding above
            slope = np.mean(np.abs(np.diff(block[:, c].astype(int))))
            d0 = max(16, int(slope) // 4)
            deltas.append(d0)
            states.append({
                "delta": d0,
                "s2": seeds[c][1],
                "s1": seeds[c][0],
                "codes": [],
            })
        for t in range(2, spb):
            for c in range(ch):
                st = states[c]
                pred = (st["s1"] * c1 + st["s2"] * c2) >> 8
                err = int(block[t, c]) - pred
                code = max(-8, min(7, int(round(err / st["delta"]))))
                recon = max(-32768, min(32767,
                                        pred + code * st["delta"]))
                st["codes"].append(code & 0x0F)
                st["s2"], st["s1"] = st["s1"], recon
                st["delta"] = max(
                    16, (int(_MS_ADPCM_ADAPT[code & 0x0F])
                         * st["delta"]) >> 8)
        # header order per spec: predictor[ch], delta[ch], sample1[ch],
        # sample2[ch] — sample1 is the NEWER seed, delta the INITIAL one
        out += bytes([predictor] * ch)
        for c in range(ch):
            out += struct.pack("<h", deltas[c])
        for c in range(ch):
            out += struct.pack("<h", seeds[c][0])
        for c in range(ch):
            out += struct.pack("<h", seeds[c][1])
        # interleave codes: one nibble per channel per sample, HIGH first
        flat = []
        for t in range(spb - 2):
            for c in range(ch):
                flat.append(states[c]["codes"][t])
        if len(flat) % 2:
            flat.append(0)
        for i in range(0, len(flat), 2):
            out.append((flat[i] << 4) | flat[i + 1])
    return _wav_adpcm(bytes(out), 2, ch, sr, 4, block_align,
                      fact=n_frames)


def test_ms_adpcm_mono_roundtrip():
    sr = 8000
    sig = _sine(4096, sr).reshape(-1, 1)
    blob = _ms_encode_wav(sig, 1, sr, block_align=256)
    x, got_sr, dur = decode_audio(blob)
    spb = (256 - 7) * 2 + 2
    n = (4096 // spb) * spb
    assert got_sr == sr and len(x) == n
    # the two seed samples per block decode exactly (s2 plays first)
    assert abs(x[0] - sig[0, 0] / 32768.0) < 1e-9
    assert abs(x[1] - sig[1, 0] / 32768.0) < 1e-9
    err = np.max(np.abs(x - sig[:n, 0] / 32768.0))
    assert err < 0.05, f"MS ADPCM reconstruction error {err}"


def test_ms_adpcm_stereo_roundtrip():
    sr = 8000
    left = _sine(2048, sr, f=440.0)
    right = _sine(2048, sr, f=330.0, amp=0.5)
    sig = np.stack([left, right], axis=1)
    blob = _ms_encode_wav(sig, 2, sr, block_align=256)
    x, got_sr, _dur = decode_audio(blob)
    spb = (256 - 14) * 2 // 2 + 2
    n = (2048 // spb) * spb
    assert got_sr == sr and len(x) == n
    mono = sig[:n].mean(axis=1) / 32768.0
    err = np.max(np.abs(x - mono))
    assert err < 0.05, f"stereo MS ADPCM reconstruction error {err}"


# -- contracts ---------------------------------------------------------------


def test_adpcm_malformed_contracts():
    # block align smaller than the per-channel header
    blob = _wav_adpcm(bytes(64), 17, 1, 8000, 4, block_align=6)
    with pytest.raises(ValueError, match="block align"):
        decode_audio(blob)
    blob = _wav_adpcm(bytes(64), 2, 1, 8000, 4, block_align=7)
    with pytest.raises(ValueError, match="block align"):
        decode_audio(blob)
    # MS predictor index out of range
    bad = bytes([9]) + bytes(255)
    blob = _wav_adpcm(bad, 2, 1, 8000, 4, block_align=256)
    with pytest.raises(ValueError, match="predictor"):
        decode_audio(blob)


def test_mp3_still_honest_stub():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3" + bytes(64))
