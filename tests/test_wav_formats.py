"""Ground-truth tests for the extended WAV decoder
(prose_spark/operators/multimodal.py `decode_audio`): IEEE-float
(format 3), A-law / mu-law (G.711, formats 6/7), and
WAVE_FORMAT_EXTENSIBLE wrappers.

Independence strategy: float WAVs are lossless, so struct-packed
fixtures must round-trip bit-exactly; the G.711 expansion tables are
compared value-for-value against CPython's own `audioop`
implementation (an independent reference, present through 3.12) and
pinned at the published anchor magnitudes (mu-law max 32124, A-law
max 32256, A-law min step 8, mu-law silence byte 0xFF -> 0)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from prose_spark.operators.multimodal import (
    _ALAW_TABLE,
    _ULAW_TABLE,
    decode_audio,
)


def _wav(data: bytes, tag: int, ch: int, sr: int, bits: int,
         extensible: bool = False) -> bytes:
    if extensible:
        # fmt(16) + cbSize(2) + validBits(2) + channelMask(4) + GUID(16)
        sub = struct.pack("<H", tag) + bytes(14)
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, ch, sr,
                          sr * ch * bits // 8, ch * bits // 8, bits,
                          22, bits, 0) + sub
    else:
        fmt = struct.pack("<HHIIHH", tag, ch, sr,
                          sr * ch * bits // 8, ch * bits // 8, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_float_wav_roundtrip_exact():
    sr = 8000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype("<f4")
    x, got_sr, dur = decode_audio(_wav(sig.tobytes(), 3, 1, sr, 32))
    assert got_sr == sr and abs(dur - 1.0) < 1e-9
    assert np.array_equal(x, sig.astype(np.float64))
    # float64 variant
    sig64 = sig.astype("<f8")
    x64, _, _ = decode_audio(_wav(sig64.tobytes(), 3, 1, sr, 64))
    assert np.array_equal(x64, sig64)
    # extensible wrapper resolves the inner tag
    xe, _, _ = decode_audio(
        _wav(sig.tobytes(), 3, 1, sr, 32, extensible=True))
    assert np.array_equal(xe, sig.astype(np.float64))
    # stereo downmix
    st = np.empty(2 * sr, dtype="<f4")
    st[0::2] = 0.25
    st[1::2] = 0.75
    xs, _, _ = decode_audio(_wav(st.tobytes(), 3, 2, sr, 32))
    assert np.allclose(xs, 0.5)


def test_g711_tables_match_audioop_reference():
    audioop = pytest.importorskip("audioop")
    allbytes = bytes(range(256))
    ref_a = np.frombuffer(audioop.alaw2lin(allbytes, 2), dtype="<i2")
    ref_u = np.frombuffer(audioop.ulaw2lin(allbytes, 2), dtype="<i2")
    assert np.array_equal(_ALAW_TABLE * 32768.0, ref_a.astype(np.float64))
    assert np.array_equal(_ULAW_TABLE * 32768.0, ref_u.astype(np.float64))
    # published anchors (independent of any implementation); in the
    # transmitted A-law byte the toggled sign bit SET means positive
    assert _ULAW_TABLE[0xFF] == 0.0                      # silence
    assert _ULAW_TABLE[0x00] * 32768.0 == -32124.0       # mu-law max
    assert _ALAW_TABLE[0xD5] * 32768.0 == 8.0            # A-law min step
    assert _ALAW_TABLE[0x55] * 32768.0 == -8.0
    assert _ALAW_TABLE[0xAA] * 32768.0 == 32256.0        # A-law max
    assert _ALAW_TABLE[0x2A] * 32768.0 == -32256.0
    # odd symmetry: flipping the sign bit negates the sample
    signs = np.arange(256) ^ 0x80
    assert np.array_equal(_ALAW_TABLE[signs], -_ALAW_TABLE)
    # (mu-law 0xFF and 0x7F both map to 0, so compare off the zeros)
    nz = (_ULAW_TABLE != 0.0)
    assert np.array_equal(_ULAW_TABLE[signs][nz], -_ULAW_TABLE[nz])


def test_g711_wav_end_to_end():
    payload = bytes(range(256)) * 4
    for tag, table in ((6, _ALAW_TABLE), (7, _ULAW_TABLE)):
        x, sr, dur = decode_audio(_wav(payload, tag, 1, 8000, 8))
        assert sr == 8000 and len(x) == 1024
        assert np.array_equal(
            x, table[np.frombuffer(payload, dtype=np.uint8)])


def test_wav_work_cap_and_errors():
    from prose_spark.operators.multimodal import _AUDIO_MAX_SECONDS

    sr = 8000
    n = sr * (_AUDIO_MAX_SECONDS + 10)
    sig = np.zeros(n, dtype="<f4")
    x, _, dur = decode_audio(_wav(sig.tobytes(), 3, 1, sr, 32))
    # decode-time cap: samples truncated, duration stays true
    assert len(x) == sr * _AUDIO_MAX_SECONDS
    assert abs(dur - (_AUDIO_MAX_SECONDS + 10)) < 1e-9
    # entropy-coded codecs stay honest stubs (tag 0x55 = MPEG layer 3
    # in WAV); ADPCM tags 2/17 decode natively as of r7
    # (tests/test_adpcm.py)
    with pytest.raises(NotImplementedError, match="format tag 85"):
        decode_audio(_wav(b"\x00" * 64, 0x55, 1, 8000, 0))
    # missing data chunk -> malformed
    broken = b"RIFF" + struct.pack("<I", 12) + b"WAVEjunk" + bytes(8)
    with pytest.raises(ValueError, match="malformed WAV"):
        decode_audio(broken)


def test_wav_12bit_in_16bit_container():
    """Review-pass regression: bits-per-sample that is not a byte
    multiple ships in a container sized by blockAlign (12-bit -> i16);
    flooring bits//8 would decode the byte stream as 8-bit garbage."""
    sr = 8000
    samples = (np.arange(64, dtype="<i2") * 16) << 4
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 12)
            + b"data" + struct.pack("<I", len(samples.tobytes()))
            + samples.tobytes())
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    x, got_sr, dur = decode_audio(blob)
    assert got_sr == sr and len(x) == 64
    assert np.array_equal(x, samples.astype(np.float64) / 32768.0)
