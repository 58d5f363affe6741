"""Compressed-audio codecs in pure numpy — G.711 mu-law/A-law and IMA
ADPCM, both directions, zero dependencies.

These close the "compressed audio stays stubbed" gap in
``operators/multimodal.py``: ``wav_decode_samples`` dispatches WAVE
format tags 6 (A-law), 7 (mu-law) and 0x11 (IMA ADPCM) here, so the
same 8-wide audio feature contract (``wav_sample_stats``) covers
telephony and ADPCM payloads with real sample decode, not header-only
metadata. All algorithms are the classic public ones (CCITT G.711
segment companding; the IMA/DVI 4-bit ADPCM step/index tables) —
re-derived from the published specs, expressed as vectorized numpy.

Conventions (documented because G.711 implementations differ in the
negative-side LSB): mu-law encode clamps to 32635, adds bias 0x84 and
truncates the mantissa (the widely used Sun ``g711.c`` shape); A-law
encode works on the 13-bit value (``x >> 3``) with ``-x-1`` for
negatives and the 0xD5/0x55 XOR masks. The DECODE side is the exact
published expansion, and the round trip satisfies
``|decode(encode(x)) - x| <= segment quantization step`` everywhere
(property-tested over the full int16 domain).

Scale posture: per-payload work, map-side only — these run inside the
same Arrow-batched ``mapInPandas`` stages as the PNG/JPEG/PCM decoders;
nothing here shuffles. The sequential dependency inside an ADPCM block
is vectorized ACROSS blocks (one numpy step per intra-block sample
position), so a 100 MB payload decodes in O(samples_per_block) numpy
ops, not O(total_samples) Python ops.

Reference parity: the reference engine has no audio path at all
(/root/reference/laygo/transformers/transformer.py is schemaless
iterator plumbing); this is uplift for the multimodal column family.
"""

from __future__ import annotations

# --- G.711 -----------------------------------------------------------

_SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def mulaw_decode(codes):
    """uint8 mu-law codes -> int16 linear PCM (vectorized expansion:
    ``t = (((~u & 0x0F) << 3) + 0x84) << exp`` then sign/bias fold)."""
    import numpy as np

    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int64) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def mulaw_encode(x):
    """int16 linear PCM -> uint8 mu-law codes (clamp 32635, bias 0x84,
    segment by magnitude bit position, truncated 4-bit mantissa)."""
    import numpy as np

    x = np.asarray(x, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    # mag in [132, 32767] -> exponent = MSB position - 7, in 0..7
    exp = (np.floor(np.log2(mag)).astype(np.int64) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def alaw_decode(codes):
    """uint8 A-law codes -> int16 linear PCM (XOR 0x55, segment shift;
    sign bit SET means positive, per the published tables)."""
    import numpy as np

    a = np.asarray(codes, dtype=np.uint8).astype(np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << (seg - 1).clip(0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(x):
    """int16 linear PCM -> uint8 A-law codes (13-bit domain, ``-x-1``
    fold for negatives, 0xD5/0xD5^0x80 masks)."""
    import numpy as np

    x = np.asarray(x, dtype=np.int64) >> 3
    mask = np.where(x >= 0, 0xD5, 0x55)
    x = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(np.asarray(_SEG_AEND), x, side="left")
    mant = np.where(seg < 2, (x >> 1) & 0x0F, (x >> seg.clip(1)) & 0x0F)
    return (((seg << 4) | mant) ^ mask).astype(np.uint8)


# --- IMA ADPCM -------------------------------------------------------

_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_step_arrays():
    import numpy as np

    return np.asarray(_IMA_STEPS, dtype=np.int64), np.asarray(
        _IMA_INDEX + _IMA_INDEX, dtype=np.int64
    )


def _ima_decode_nibbles(nibbles, pred0, idx0):
    """Vectorized IMA expansion: ``nibbles`` is (n_streams, n_samples)
    uint8 in 0..15; ``pred0``/``idx0`` are (n_streams,) initial
    predictor / step-index. Sequential in the sample axis (the codec's
    data dependency), vector across streams. Returns (n_streams,
    n_samples) int16."""
    import numpy as np

    steps, idx_adj = _ima_step_arrays()
    nib = np.asarray(nibbles, dtype=np.int64)
    n_streams, n_samples = nib.shape
    pred = np.asarray(pred0, dtype=np.int64).copy()
    idx = np.asarray(idx0, dtype=np.int64).clip(0, 88)
    out = np.empty((n_streams, n_samples), dtype=np.int16)
    for t in range(n_samples):
        n = nib[:, t]
        step = steps[idx]
        diff = step >> 3
        diff += np.where(n & 1, step >> 2, 0)
        diff += np.where(n & 2, step >> 1, 0)
        diff += np.where(n & 4, step, 0)
        diff = np.where(n & 8, -diff, diff)
        pred = np.clip(pred + diff, -32768, 32767)
        idx = np.clip(idx + idx_adj[n], 0, 88)
        out[:, t] = pred
    return out


def _ima_encode_samples(samples, pred0, idx0):
    """Vectorized IMA compression: inverse of ``_ima_decode_nibbles``
    with the standard greedy nibble choice (sign + three step
    comparisons), predictor updated through the DECODER's arithmetic so
    encoder and decoder states never drift."""
    import numpy as np

    steps, idx_adj = _ima_step_arrays()
    x = np.asarray(samples, dtype=np.int64)
    n_streams, n_samples = x.shape
    pred = np.asarray(pred0, dtype=np.int64).copy()
    idx = np.asarray(idx0, dtype=np.int64).clip(0, 88)
    out = np.empty((n_streams, n_samples), dtype=np.uint8)
    for t in range(n_samples):
        step = steps[idx]
        delta = x[:, t] - pred
        n = np.where(delta < 0, 8, 0)
        delta = np.abs(delta)
        take = delta >= step
        n = n | np.where(take, 4, 0)
        delta = delta - np.where(take, step, 0)
        half = step >> 1
        take = delta >= half
        n = n | np.where(take, 2, 0)
        delta = delta - np.where(take, half, 0)
        n = n | np.where(delta >= (step >> 2), 1, 0)
        # replay the decoder update
        diff = step >> 3
        diff += np.where(n & 1, step >> 2, 0)
        diff += np.where(n & 2, step >> 1, 0)
        diff += np.where(n & 4, step, 0)
        diff = np.where(n & 8, -diff, diff)
        pred = np.clip(pred + diff, -32768, 32767)
        idx = np.clip(idx + idx_adj[n], 0, 88)
        out[:, t] = n
    return out


def ima_adpcm_decode_blocks(data: bytes, channels: int, block_align: int):
    """Decode a WAVE tag-0x11 IMA ADPCM ``data`` chunk to an
    (n_frames, channels) int16 array. Block layout per the public
    multimedia-format registry: per channel a 4-byte header
    (predictor int16 LE, step index uint8, reserved), then the nibble
    stream — mono: bytes low-nibble-first; stereo: alternating 4-byte
    (8-nibble) words per channel. Truncated trailing blocks are
    dropped (a partial block has no defined sample count). Returns
    None on geometry that cannot be a legal block."""
    import numpy as np

    # need the per-channel headers plus data: >=1 byte (mono) or >=1
    # 4-byte word per channel (stereo)
    if channels not in (1, 2) or block_align < (5 if channels == 1 else 16):
        return None
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return None
    raw = np.frombuffer(data[: n_blocks * block_align], dtype=np.uint8).reshape(
        n_blocks, block_align
    )
    hdr = raw[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred0 = (
        hdr[:, :, 0].astype(np.int64) | (hdr[:, :, 1].astype(np.int64) << 8)
    )
    pred0 = np.where(pred0 >= 1 << 15, pred0 - (1 << 16), pred0)
    idx0 = hdr[:, :, 2].astype(np.int64)
    if (idx0 > 88).any():
        return None
    body = raw[:, 4 * channels :]
    data_bytes = body.shape[1]
    if channels == 1:
        nib = np.empty((n_blocks, data_bytes * 2), dtype=np.uint8)
        nib[:, 0::2] = body & 0x0F  # low nibble first
        nib[:, 1::2] = body >> 4
        decoded = _ima_decode_nibbles(nib, pred0[:, 0], idx0[:, 0])
        # header predictor is sample 0 of the block
        frames = np.concatenate(
            [pred0[:, :1].astype(np.int16), decoded], axis=1
        ).reshape(-1, 1)
        return frames
    # stereo: data is 4-byte words alternating L,R
    n_words = data_bytes // 8  # L word + R word pairs
    if n_words == 0:
        return None
    body = body[:, : n_words * 8].reshape(n_blocks, n_words, 2, 4)
    per_ch = np.empty((n_blocks, 2, n_words * 8), dtype=np.uint8)
    for c in (0, 1):
        w = body[:, :, c, :].reshape(n_blocks, n_words * 4)
        per_ch[:, c, 0::2] = w & 0x0F
        per_ch[:, c, 1::2] = w >> 4
    flat = per_ch.reshape(n_blocks * 2, n_words * 8)
    decoded = _ima_decode_nibbles(flat, pred0.reshape(-1), idx0.reshape(-1))
    decoded = decoded.reshape(n_blocks, 2, n_words * 8)
    first = pred0.astype(np.int16).reshape(n_blocks, 2, 1)
    allsamp = np.concatenate([first, decoded], axis=2)  # (blocks, ch, spb)
    return allsamp.transpose(0, 2, 1).reshape(-1, 2)


def ima_adpcm_encode_blocks(samples, block_align: int = 256):
    """Encode an (n_frames, channels) int16 array as WAVE IMA ADPCM
    block data (the inverse of ``ima_adpcm_decode_blocks``); pads the
    final partial block by repeating the last frame so every block is
    full (decode yields >= n_frames; callers trim). Returns
    (data_bytes, samples_per_block)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, channels = x.shape
    if channels not in (1, 2):
        raise ValueError("IMA ADPCM encoder supports 1 or 2 channels")
    data_bytes = block_align - 4 * channels
    if channels == 1:
        spb = data_bytes * 2 + 1
    else:
        if data_bytes % 8:  # stereo data must be whole L+R 4-byte word pairs
            raise ValueError("stereo block_align must satisfy (block_align-8) % 8 == 0")
        spb = data_bytes + 1  # (data_bytes/8 words)*8 nibbles per ch + header
    if spb < 2 or n_frames == 0:
        raise ValueError("block_align too small or empty input")
    n_blocks = -(-n_frames // spb)
    pad = n_blocks * spb - n_frames
    if pad:
        x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
    frames = x.reshape(n_blocks, spb, channels)
    pred0 = frames[:, 0, :].astype(np.int64)  # (blocks, ch) header sample
    rest = frames[:, 1:, :]  # (blocks, spb-1, ch)
    idx0 = np.zeros((n_blocks, channels), dtype=np.int64)
    streams = rest.transpose(0, 2, 1).reshape(n_blocks * channels, spb - 1)
    nib = _ima_encode_samples(
        streams, pred0.reshape(-1), idx0.reshape(-1)
    ).reshape(n_blocks, channels, spb - 1)
    out = bytearray()
    for b in range(n_blocks):
        for c in range(channels):
            p = int(pred0[b, c]) & 0xFFFF
            out += bytes((p & 0xFF, p >> 8, int(idx0[b, c]), 0))
        if channels == 1:
            row = nib[b, 0]
            packed = (row[0::2] | (row[1::2] << 4)).astype(np.uint8)
            out += packed.tobytes()
        else:
            n_words = (spb - 1) // 8
            for w in range(n_words):
                for c in (0, 1):
                    seg = nib[b, c, w * 8 : w * 8 + 8]
                    out += (seg[0::2] | (seg[1::2] << 4)).astype(np.uint8).tobytes()
    return bytes(out), spb
