"""Compressed-audio codecs (operators/audio_codecs.py) — G.711
mu-law/A-law and IMA ADPCM, gated the same way as the PNG/JPEG/PCM
codecs: the vectorized implementation is compared against scalar
reference decoders transcribed directly from the published expansion
formulas, round-trip error is bounded over the FULL int16 domain, and
the WAV container round trip (wav_encode_g711 / wav_encode_adpcm ->
wav_decode_samples) is checked end-to-end including 'fact'-chunk
frame trimming."""

from __future__ import annotations

import numpy as np
import pytest

from laygo_python_spark.operators import audio_codecs as AC
from laygo_python_spark.operators import multimodal as M


def _ref_mulaw_decode(u: int) -> int:
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _ref_alaw_decode(a: int) -> int:
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 7
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_STEPS = AC._IMA_STEPS
_INDEX = AC._IMA_INDEX


def _ref_ima_decode(nibbles, pred, idx):
    """Scalar IMA expansion straight from the spec pseudocode."""
    out = []
    for n in nibbles:
        step = _STEPS[idx]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        idx = max(0, min(88, idx + _INDEX[n & 7]))
        out.append(pred)
    return out


def test_g711_decode_tables_match_scalar_reference():
    codes = np.arange(256, dtype=np.uint8)
    assert (
        AC.mulaw_decode(codes)
        == np.array([_ref_mulaw_decode(int(c)) for c in codes], dtype=np.int16)
    ).all()
    assert (
        AC.alaw_decode(codes)
        == np.array([_ref_alaw_decode(int(c)) for c in codes], dtype=np.int16)
    ).all()


def test_g711_roundtrip_bounded_over_full_int16_domain():
    x = np.arange(-32768, 32768, dtype=np.int16)
    for enc, dec in ((AC.mulaw_encode, AC.mulaw_decode), (AC.alaw_encode, AC.alaw_decode)):
        y = dec(enc(x)).astype(np.int64)
        err = np.abs(y - x.astype(np.int64))
        # companding quantization: step grows with the segment; |x|/16
        # upper-bounds the step for both laws, +64 covers the smallest
        # segments and the mu-law bias fold
        bound = np.maximum(np.abs(x.astype(np.int64)) // 16 + 64, 64)
        assert (err <= bound).all()


def test_g711_encode_monotone_in_magnitude():
    # positive magnitudes must map to non-increasing decode error steps:
    # decode(encode(x)) must be monotone nondecreasing for x >= 0
    x = np.arange(0, 32768, dtype=np.int16)
    for enc, dec in ((AC.mulaw_encode, AC.mulaw_decode), (AC.alaw_encode, AC.alaw_decode)):
        y = dec(enc(x)).astype(np.int64)
        assert (np.diff(y) >= 0).all()


def test_ima_vector_decode_matches_scalar_reference():
    rng = np.random.default_rng(11)
    nib = rng.integers(0, 16, size=(6, 200), dtype=np.int64)
    pred0 = rng.integers(-30000, 30000, size=6)
    idx0 = rng.integers(0, 89, size=6)
    got = AC._ima_decode_nibbles(nib, pred0, idx0)
    for s in range(6):
        ref = _ref_ima_decode(nib[s].tolist(), int(pred0[s]), int(idx0[s]))
        assert got[s].tolist() == ref


def _sig(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        8000 * np.sin(t / 20) + 2000 * np.sin(t / 3.1) + rng.normal(0, 300, n)
    ).astype(np.int16)


@pytest.mark.parametrize("channels", [1, 2])
def test_adpcm_container_roundtrip_snr(channels):
    sig = _sig()
    s = np.stack([sig, np.roll(sig, 13)], axis=1)[:, :channels]
    blob = M.wav_encode_adpcm(s, 8000, 256)
    assert M.wav_audio_meta(blob) == (8000, channels, 4)
    out = M.wav_decode_samples(blob)
    assert out is not None and out.shape == s.shape  # fact chunk trims padding
    err = out * 32768.0 - s
    snr = 10 * np.log10((s.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 25


def test_adpcm_fact_trim_nonmultiple_block():
    # 505 samples/block at block_align 256 mono; 600 frames spans 2 blocks
    sig = _sig(600)
    out = M.wav_decode_samples(M.wav_encode_adpcm(sig, 8000, 256))
    assert out is not None and out.shape == (600, 1)


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_container_roundtrip_snr(law):
    sig = _sig()
    blob = M.wav_encode_g711(sig, 8000, law)
    assert M.wav_audio_meta(blob) == (8000, 1, 8)
    out = M.wav_decode_samples(blob)
    assert out is not None and out.shape == (len(sig), 1)
    err = out[:, 0] * 32768.0 - sig
    snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / (err**2).mean())
    assert snr > 30


def test_g711_stereo_container():
    sig = _sig(800)
    s = np.stack([sig, -sig], axis=1)
    out = M.wav_decode_samples(M.wav_encode_g711(s, 16000, "alaw"))
    assert out is not None and out.shape == (800, 2)
    # channel structure survives: L = -R within companding error
    assert np.abs(out[:, 0] + out[:, 1]).max() < 0.05


def test_wav_sample_stats_covers_compressed_payloads():
    sig = _sig(2000)
    for blob in (
        M.wav_encode_g711(sig, 8000, "mulaw"),
        M.wav_encode_adpcm(sig, 8000, 256),
    ):
        st = M.wav_sample_stats(blob)
        assert st is not None and len(st) == 8
        assert st[0] == 1.0  # channels
        assert abs(st[1] - 2000 / 8000) < 1e-9  # duration from true frame count


def test_adpcm_malformed_guards():
    sig = _sig(100)
    blob = M.wav_encode_adpcm(sig, 8000, 256)
    # stereo encoder rejects a block_align that breaks word pairing
    with pytest.raises(ValueError):
        M.wav_encode_adpcm(np.stack([sig, sig], axis=1), 8000, 100)
    # truncated data chunk: whole-block decode only, never raises
    assert AC.ima_adpcm_decode_blocks(b"\x00" * 3, 1, 256) is None
    assert AC.ima_adpcm_decode_blocks(b"\x00" * 300, 3, 256) is None
    # corrupt step index (>88) rejected
    bad = bytearray(blob)
    # find the data chunk and poison the first block header's index byte
    pos = 12
    while pos + 8 <= len(bad):
        cid = bytes(bad[pos : pos + 4])
        size = int.from_bytes(bad[pos + 4 : pos + 8], "little")
        if cid == b"data":
            bad[pos + 8 + 2] = 200
            break
        pos += 8 + size + (size % 2)
    assert M.wav_decode_samples(bytes(bad)) is None


def _mk_mp3(ver_bits=3, br_idx=9, sr_idx=0, mode=0, n_frames=10, id3=True):
    """Hand-assemble a Layer III stream: optional ID3v2 tag + repeated
    frame headers with zeroed payload (header parse needs no audio).
    Frames carry their TRUE computed length so consecutive headers land
    exactly one frame apart — mp3_meta validates the continuation."""
    hdr = bytes(
        [
            0xFF,
            0xE0 | (ver_bits << 3) | (1 << 1),  # sync + version + layer III
            (br_idx << 4) | (sr_idx << 2),
            mode << 6,
        ]
    )
    kbps = (M._MP3_BITRATE_V1 if ver_bits == 3 else M._MP3_BITRATE_V2)[br_idx]
    rate = M._MP3_RATES.get(ver_bits, (44100,))[sr_idx] if sr_idx < 3 else 0
    factor = 144 if ver_bits == 3 else 72
    # free-format / reserved-rate fixtures can't size a frame (and the
    # parser rejects the header anyway) — any filler works
    flen = factor * kbps * 1000 // rate if kbps and rate else 417
    frame = hdr + b"\x00" * (flen - 4)
    body = frame * n_frames
    if id3:
        tag_body = b"\x00" * 200
        sz = len(tag_body)
        syncsafe = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
        return b"ID3\x03\x00\x00" + syncsafe + tag_body + body
    return body


def test_mp3_meta_parses_header_and_duration():
    blob = _mk_mp3()  # MPEG1 L3 128kbps 44100 stereo
    got = M.mp3_meta(blob)
    assert got is not None
    rate, ch, kbps, dur = got
    assert (rate, ch, kbps) == (44100, 2, 128)
    # CBR estimate over the audio bytes (ID3 tag excluded)
    audio_bytes = len(blob) - 210
    assert abs(dur - audio_bytes * 8 / 128000) < 1e-9


def test_mp3_meta_variants_and_guards():
    # MPEG2 Layer III bitrate table: index 9 -> 80 kbps (ISO 13818-3)
    got = M.mp3_meta(_mk_mp3(ver_bits=2, br_idx=9, sr_idx=1, mode=3, id3=False))
    assert got is not None and got[:3] == (24000, 1, 80)
    assert M.mp3_meta(None) is None
    assert M.mp3_meta(b"not audio at all") is None
    assert M.mp3_meta(_mk_mp3(br_idx=0)) is None  # free-format: unsupported
    assert M.mp3_meta(_mk_mp3(sr_idx=3)) is None  # reserved samplerate
    # a single frame at stream end is accepted (no room for a 2nd header)
    assert M.mp3_meta(_mk_mp3(n_frames=1, id3=False)) is not None
    # r7 advice: truncation handling must be consistent across the 0-3
    # trailing-byte boundary — a tail too short to hold the 3 comparable
    # bytes of a second header is end-of-stream, accepted, regardless of
    # whether the fragment looks header-like
    single = _mk_mp3(n_frames=1, id3=False)
    for tail in (b"", b"\xff", b"\xff\xfb", b"\x00\x00"):
        got = M.mp3_meta(single + tail)
        assert got is not None and got[:3] == (44100, 2, 128), tail
    # ...but a FULL 3-byte mismatching continuation still rejects
    assert M.mp3_meta(single + b"\x00\x00\x00") is None
    # a lone plausible sync followed by garbage is REJECTED — the
    # continuation check is what keeps audio_meta from reporting bogus
    # metadata on random binary (a real sniffer's discipline)
    one = bytearray(_mk_mp3(n_frames=2, id3=False))
    one[417] = 0x00  # clobber the 2nd frame's sync byte
    assert M.mp3_meta(bytes(one)) is None
    # deterministic pseudo-random binary: no false positive in 4 KiB
    import numpy as np

    rng = np.random.default_rng(7)
    assert M.mp3_meta(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()) is None


def test_audio_meta_dispatches_mp3(spark):
    import pandas as pd  # noqa: F401

    sig = _sig(1000)
    rows = [
        (1, bytearray(M.wav_encode(np.stack([sig, sig], 1), 16000))),
        (2, bytearray(_mk_mp3())),
        (3, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: (r.sample_rate, r.channels, r.bits) for r in M.audio_meta(df).collect()}
    assert got[1] == (16000, 2, 16)
    assert got[2] == (44100, 2, None)  # mp3: real rate/channels, bits NULL
    assert got[3] == (None, None, None)
