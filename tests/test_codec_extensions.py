"""Round-11 continuation codecs: G.711 (mu-law/A-law), GIF/LZW, MJPEG/AVI.

Pins the codec internals; the registered queries
(`multimodal_{ulaw,alaw,gif}_stats`, `multimodal_mjpeg_frames`)
hash-verify the full encode→binary→decode→stats loop against DuckDB
oracles in the main parity suite.
"""

from __future__ import annotations

import numpy as np
import pytest

from stream_processor_spark.operators import multimodal as mm
from stream_processor_spark.operators.avi import demux_avi_mjpeg, encode_avi_mjpeg
from stream_processor_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_compress,
    lzw_decompress,
)
from stream_processor_spark.operators.jpeg import decode_jpeg, encode_jpeg


# ------------------------------------------------------------------ G.711 ----


def test_ulaw_reference_points():
    # the canonical G.711 mu-law table corners
    assert mm.ulaw_to_linear(0x00) == -32124
    assert mm.ulaw_to_linear(0x80) == 32124
    assert mm.ulaw_to_linear(0xFF) == 0
    assert mm.ulaw_to_linear(0x7F) == 0


def test_alaw_reference_points():
    assert mm.alaw_to_linear(0x2A) == -32256
    assert mm.alaw_to_linear(0xAA) == 32256
    assert mm.alaw_to_linear(0x55) == -8
    assert mm.alaw_to_linear(0xD5) == 8


def test_g711_luts_are_odd_symmetric():
    """Flipping the sign bit negates the decoded value — the segment
    arithmetic must be exactly symmetric for BOTH laws (mu-law sign bit
    means negative, A-law sign bit means positive; either way the two
    halves mirror)."""
    for law_fn in (mm.ulaw_to_linear, mm.alaw_to_linear):
        for c in range(128):
            assert law_fn(c) == -law_fn(c | 0x80)


def test_g711_wav_roundtrip_all_codewords():
    codes = np.arange(256, dtype=np.uint8)
    for law, lut in (("ulaw", mm._ulaw_lut()), ("alaw", mm._alaw_lut())):
        raw = mm.encode_wav_g711(codes, law=law)
        rate, ch, s = mm.decode_wav(raw)
        assert (rate, ch) == (8000, 1)
        assert np.array_equal(s, lut[codes])


def test_g711_wav_chunk_layout_and_gates():
    codes = mm.g711_fixture_codes(5)
    raw = mm.encode_wav_g711(codes, law="ulaw")
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    assert b"fact" in raw  # compressed-format WAVs carry a fact chunk
    # RIFF length field covers the whole remainder
    assert int.from_bytes(raw[4:8], "little") == len(raw) - 8
    # odd-length data chunk is word-aligned without corrupting samples
    odd = mm.encode_wav_g711(np.arange(41, dtype=np.uint8), law="alaw")
    _, _, s = mm.decode_wav(odd)
    assert s.size == 41
    # ADPCM (fmt 0x11) stays gated with a clear message
    adpcm = bytearray(mm.encode_wav_g711(codes, law="ulaw"))
    fmt_at = adpcm.index(b"fmt ") + 8
    adpcm[fmt_at : fmt_at + 2] = (0x11).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="ADPCM|G.711"):
        mm.decode_wav(bytes(adpcm))


def test_g711_fixture_covers_all_codewords():
    """The odd 4097 doc stride spreads all 256 codewords across a few
    hundred docs (a 4096 stride would collapse mod 256 to 57 values)."""
    seen = set()
    for d in range(300):
        seen.update(mm.g711_fixture_codes(d).tolist())
    assert len(seen) == 256


# -------------------------------------------------------------- IMA ADPCM ----


def test_adpcm_block_decode_known_trajectory():
    """A hand-computed trajectory: pred=0, index=0 (step 7), nibbles
    [0, 8, 4, 15]. Checks sign handling, clamps and index movement."""
    # nibble 0: diff=7>>3=0 -> pred 0,  index -1 -> 0
    # nibble 8: diff=0 sign=- -> pred 0, index 0
    # nibble 4: diff=0+7=7 -> pred 7, index +2 -> 2 (step 9)
    # nibble 15: diff=9>>3+9>>2+9>>1+9=1+2+4+9=16, sign=- -> pred -9, idx 2+8=10
    block = (0).to_bytes(2, "little", signed=True) + bytes([0, 0, 0x80, 0xF4])
    out = mm.decode_ima_adpcm_block(block, None)
    assert list(out) == [0, 0, 0, 7, -9]


def test_adpcm_predictor_clamps():
    # start at max predictor with the largest step: adds must clamp
    block = (32767).to_bytes(2, "little", signed=True) + bytes(
        [88, 0, 0x77]
    )
    out = mm.decode_ima_adpcm_block(block, None)
    assert out[1] == 32767 and out[2] == 32767  # clamped, not wrapped
    block = (-32768).to_bytes(2, "little", signed=True) + bytes(
        [88, 0, 0xFF]
    )
    out = mm.decode_ima_adpcm_block(block, None)
    assert out[1] == -32768 and out[2] == -32768


def test_adpcm_wav_roundtrip_and_gates():
    pred0, index0, data = mm.adpcm_fixture(9)
    raw = mm.encode_wav_ima_adpcm(pred0, index0, data)
    rate, ch, s = mm.decode_wav(raw)
    assert (rate, ch) == (8000, 1)
    assert s.size == 1 + 2 * data.size
    assert s[0] == pred0  # header predictor IS sample 0
    # stereo decodes for real since round 12 (word-interleaved layout,
    # test_stereo_ima_adpcm_decodes_per_channel_trajectories); what
    # stays guarded is a block too small for the per-channel headers
    with pytest.raises(ValueError, match="block align"):
        bad = bytearray(raw)
        at = bad.index(b"fmt ") + 8
        bad[at + 2 : at + 4] = (8).to_bytes(2, "little")  # 8 channels
        mm.decode_wav(bytes(bad))
    # corrupt step index
    bad_block = (0).to_bytes(2, "little") + bytes([99, 0, 0x00])
    with pytest.raises(ValueError, match="step index"):
        mm.decode_ima_adpcm_block(bad_block, None)


def test_adpcm_multi_block_stream():
    """decode_wav concatenates blocks and honors wSamplesPerBlock
    truncation per block."""
    p0, i0, data = mm.adpcm_fixture(2)
    one = mm.encode_wav_ima_adpcm(p0, i0, data)
    # hand-build a two-block data chunk from the single-block file
    _, _, single = mm.decode_wav(one)
    block = (
        int(p0).to_bytes(2, "little", signed=True)
        + bytes([i0, 0])
        + data.tobytes()
    )
    dat_at = one.index(b"data")
    two = (
        one[:dat_at]
        + b"data"
        + (2 * len(block)).to_bytes(4, "little")
        + block
        + block
    )
    _, _, s2 = mm.decode_wav(two)
    assert np.array_equal(s2, np.concatenate([single, single]))


# -------------------------------------------------------------- GIF / LZW ----


def test_lzw_roundtrip_random_and_table_reset():
    rng = np.random.RandomState(7)
    data = rng.randint(0, 256, 60000).astype(np.uint8).tobytes()
    comp = lzw_compress(data, 8)
    assert lzw_decompress(comp, 8) == data  # forces 12-bit codes + CLEAR


def test_lzw_kwkwk_case():
    data = b"\x07" * 500  # runs produce code == len(table) immediately
    assert lzw_decompress(lzw_compress(data, 8), 8) == data


@pytest.mark.parametrize("mcs", [2, 4, 7])
def test_lzw_small_code_sizes(mcs):
    rng = np.random.RandomState(mcs)
    data = rng.randint(0, 1 << mcs, 3000).astype(np.uint8).tobytes()
    assert lzw_decompress(lzw_compress(data, mcs), mcs) == data


def test_lzw_corrupt_code_raises():
    # first 9-bit code (LSB-first) = 0x2C | (1 << 8) = 300, which is
    # beyond the fresh table (258 entries) and not CLEAR/EOI
    with pytest.raises(ValueError, match="corrupt LZW"):
        lzw_decompress(bytes([0x2C, 0x01, 0x00]), 8)


def test_gif_roundtrip_and_dispatch():
    rng = np.random.RandomState(3)
    pal = mm.gif_fixture_palette()
    idx = rng.randint(0, 256, (6, 9)).astype(np.uint8)
    raw = encode_gif(idx, pal)
    assert np.array_equal(decode_gif(raw), pal[idx])
    # magic dispatch through the shared entry point
    assert np.array_equal(mm.decode_image_bytes(raw), pal[idx])


def test_gif_89a_extension_skip_and_gates():
    pal = mm.gif_fixture_palette()
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = bytearray(encode_gif(idx, pal))
    raw[:6] = b"GIF89a"
    ins = 6 + 7 + 768  # after header + LSD + GCT
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # graphic control ext
    with_ext = bytes(raw[:ins]) + gce + bytes(raw[ins:])
    assert np.array_equal(decode_gif(with_ext), pal[idx])

    # LCT flag set but no table present: corrupt, raises (local color
    # tables themselves decode for real — see the roundtrip test)
    local_ct = bytearray(encode_gif(idx, pal))
    local_ct[ins + 9] |= 0x80
    with pytest.raises(Exception):
        decode_gif(bytes(local_ct))

    with pytest.raises(ValueError, match="GIF"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)


@pytest.mark.parametrize("h", [1, 2, 4, 5, 8, 9, 17])
def test_gif_interlace_roundtrip(h):
    rng = np.random.RandomState(h)
    pal = mm.gif_fixture_palette()
    idx = rng.randint(0, 256, (h, 6)).astype(np.uint8)
    raw = encode_gif(idx, pal, interlace=True)
    assert np.array_equal(decode_gif(raw), pal[idx])
    # negative control: a decoder that ignored the schedule would
    # return rows in storage order — different image for h > 2
    if h > 2:
        from stream_processor_spark.operators.gif import gif_interlace_order

        stored = pal[idx[gif_interlace_order(h)]]
        assert not np.array_equal(stored, pal[idx])


@pytest.mark.parametrize("h,w", [(1, 1), (3, 2), (8, 8), (9, 5), (17, 9)])
def test_png_adam7_and_paletted_roundtrips(h, w):
    rng = np.random.RandomState(h * 31 + w)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png(img, interlace=True)), img)
    pal = mm.gif_fixture_palette()
    idx = rng.randint(0, 256, (h, w)).astype(np.uint8)
    for ilace in (False, True):
        got = mm.decode_png(mm.encode_png_paletted(idx, pal, interlace=ilace))
        assert np.array_equal(got, pal[idx])


def test_png_paletted_gates():
    pal = mm.gif_fixture_palette()
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = bytearray(mm.encode_png_paletted(idx, pal))
    # strip PLTE: paletted without a palette must fail loudly
    plte_at = bytes(raw).index(b"PLTE") - 4
    ln = int.from_bytes(raw[plte_at : plte_at + 4], "big")
    del raw[plte_at : plte_at + 12 + ln]
    with pytest.raises(ValueError, match="missing PLTE"):
        mm.decode_png(bytes(raw))


def test_decompression_bombs_are_bounded():
    """A hostile payload must not OOM the worker before the tolerant
    caller's try/except can route the row: LZW output is capped at the
    descriptor's pixel count, PNG inflate at the scanline geometry."""
    # LZW: 100k highly-compressible bytes, capped at 10
    comp = lzw_compress(b"\x01" * 100_000, 8)
    out = lzw_decompress(comp, 8, max_out=10)
    assert 10 <= len(out) < 100  # stops at the cap, not the stream end

    # GIF: descriptor says 2x2 but the stream encodes 100k pixels —
    # decode materializes only the declared image
    pal = mm.gif_fixture_palette()
    small = bytearray(encode_gif(np.zeros((2, 2), np.uint8), pal))
    big_stream = lzw_compress(b"\x05" * 100_000, 8)
    bomb = small[: 6 + 7 + 768 + 10 + 1]  # through min_code_size byte
    for i in range(0, len(big_stream), 255):
        blk = big_stream[i : i + 255]
        bomb += bytes([len(blk)]) + blk
    bomb += b"\x00\x3b"
    px = decode_gif(bytes(bomb))
    assert px.shape == (2, 2, 3)

    # PNG: 10 MB of zeros behind a 3x3 header — bounded inflate raises
    # the corruption error without materializing the bomb
    import zlib

    good = bytearray(mm.encode_png(np.zeros((3, 3, 3), np.uint8)))
    idat_at = bytes(good).index(b"IDAT") - 4
    ln = int.from_bytes(good[idat_at : idat_at + 4], "big")
    bomb_idat = zlib.compress(b"\x00" * 10_000_000)
    rebuilt = (
        bytes(good[:idat_at])
        + mm._png_chunk(b"IDAT", bomb_idat)
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        mm.decode_png(rebuilt)


def test_gif_fixture_varies_by_doc():
    a, b = mm.gif_fixture_indices(0), mm.gif_fixture_indices(20)
    n = min(a.size, b.size)
    assert not np.array_equal(a.reshape(-1)[:n], b.reshape(-1)[:n])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=150, deadline=None)
    @given(
        st.binary(min_size=0, max_size=4000),
        st.integers(min_value=2, max_value=8),
    )
    def test_lzw_roundtrip_property(data, mcs):
        """ANY byte stream (masked into the alphabet) survives the LZW
        round trip at ANY min code size — the width-growth schedule and
        table-reset timing must agree between encoder and decoder on
        adversarial inputs, not just seeded ones."""
        if mcs < 8:
            data = bytes(b % (1 << mcs) for b in data)
        assert lzw_decompress(lzw_compress(data, mcs), mcs) == data

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=1, max_value=20),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def test_gif_roundtrip_property(h, w, seed):
        rng = np.random.RandomState(seed)
        pal = mm.gif_fixture_palette()
        idx = rng.randint(0, 256, (h, w)).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])

    @settings(max_examples=80, deadline=None)
    @given(
        st.integers(min_value=-32768, max_value=32767),
        st.integers(min_value=0, max_value=88),
        st.binary(min_size=1, max_size=64),
    )
    def test_adpcm_block_decode_total(pred0, index0, data):
        """Decoding never leaves int16 range or a valid step index for
        ANY initial state and nibble stream (the clamps are the spec)."""
        block = (
            int(pred0).to_bytes(2, "little", signed=True)
            + bytes([index0, 0])
            + data
        )
        out = mm.decode_ima_adpcm_block(block, None)
        assert out.size == 1 + 2 * len(data)
        a = out.astype(np.int64)
        assert a.min() >= -32768 and a.max() <= 32767


if _HYP:

    @settings(max_examples=120, deadline=None)
    @given(
        st.integers(min_value=0, max_value=3),          # which format
        st.integers(min_value=0, max_value=2**31 - 1),  # mutation seed
    )
    def test_codec_mutation_totality(fmt_k, seed):
        """Corrupt-payload TOTALITY: random mutations (truncation, bit
        flips, byte splices) of a valid payload must either decode or
        raise a normal exception — never hang, recurse forever, or
        allocate unboundedly. This is the property the tolerant decode
        path (on_error='null') relies on at corpus scale."""
        rng = np.random.RandomState(seed)
        pal = mm.gif_fixture_palette()
        base = [
            mm.encode_bmp(mm.fixture_pixels(5)),
            mm.encode_png(mm.fixture_pixels(6), interlace=bool(seed & 1)),
            encode_gif(mm.gif_fixture_indices(7), pal, interlace=bool(seed & 2)),
            mm.encode_wav_g711(mm.g711_fixture_codes(8), law="alaw"),
        ][fmt_k]
        raw = bytearray(base)
        mode = seed % 3
        if mode == 0 and len(raw) > 4:  # truncate
            raw = raw[: rng.randint(1, len(raw))]
        elif mode == 1:  # flip up to 8 random bytes
            for _ in range(rng.randint(1, 9)):
                raw[rng.randint(0, len(raw))] = rng.randint(0, 256)
        else:  # splice random garbage into the middle
            at = rng.randint(0, len(raw))
            raw = raw[:at] + bytes(rng.randint(0, 256, 16, dtype=np.uint8).tolist()) + raw[at:]
        try:
            if fmt_k == 3:
                mm.decode_wav(bytes(raw))
            else:
                px = mm.decode_image_bytes(bytes(raw))
                assert px.ndim == 3  # decoded despite mutation — fine
        except Exception:
            pass  # a clean exception IS the contract


# ---------------------------------------------------------- mixed corpus ----


def test_decode_image_on_error_modes(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(14)], "doc_id long")
    pay = mm.attach_mixed_image_payload(df).withColumn(
        "payload",
        F.when(
            F.col("doc_id") % 7 == 3, F.expr("substring(payload, 1, 10)")
        ).otherwise(F.col("payload")),
    )
    rows = {r.doc_id: r for r in mm.decode_image(pay, on_error="null").collect()}
    assert len(rows) == 14
    for d, r in rows.items():
        if d % 7 == 3:
            assert r.decode_failed is True and r.n_pixels is None
        else:
            assert r.decode_failed is False and r.n_pixels > 0
    # default mode still fails loudly on the same corpus
    with pytest.raises(Exception):
        mm.decode_image(pay).collect()
    with pytest.raises(ValueError, match="on_error"):
        mm.decode_image(pay, on_error="dlq")


def test_decode_audio_on_error_modes(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pay = mm.attach_g711_payload(df, law="ulaw").withColumn(
        "payload",
        F.when(
            F.col("doc_id") % 3 == 1, F.expr("substring(payload, 1, 6)")
        ).otherwise(F.col("payload")),
    )
    rows = {r.doc_id: r for r in mm.decode_audio(pay, on_error="null").collect()}
    for d, r in rows.items():
        if d % 3 == 1:
            assert r.decode_failed is True and r.n_samples is None
        else:
            assert r.decode_failed is False and r.n_samples > 0
    with pytest.raises(Exception):
        mm.decode_audio(pay).collect()


def test_mixed_payload_formats_rotate_and_decode(spark):
    df = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    rows = mm.attach_mixed_image_payload(df).collect()
    magics = {0: b"BM", 1: b"\x89P", 2: b"GI", 3: b"\xff\xd8"}
    for r in rows:
        assert bytes(r.payload[:2]) == magics[r.doc_id % 4], r.doc_id
        px = mm.decode_image_bytes(bytes(r.payload))
        assert px.ndim == 3 and px.shape[2] == 3


# ------------------------------------------------------------- MJPEG / AVI ----


def test_avi_mux_demux_roundtrip():
    frames = [
        encode_jpeg(fr, subsampling="420") for fr in mm.mjpeg_fixture_frames(4)
    ]
    avi = encode_avi_mjpeg(frames, 16, 16, fps=30)
    w, h, fps, out = demux_avi_mjpeg(avi)
    assert (w, h, fps) == (16, 16, 30)
    assert out == frames  # demux returns the exact muxed JPEG bytes


def test_avi_demux_walks_grammar_not_offsets():
    """A JUNK chunk before hdrl and a rec -grouped movi frame must both
    be handled — readers that assume fixed offsets break on real AVIs."""
    frames = [
        encode_jpeg(fr, subsampling="420") for fr in mm.mjpeg_fixture_frames(1)
    ]
    avi = encode_avi_mjpeg(frames, 16, 16)
    # splice a JUNK chunk right after 'AVI '
    junk = b"JUNK" + (6).to_bytes(4, "little") + b"junk__"
    spliced = avi[:12] + junk + avi[12:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    w, h, fps, out = demux_avi_mjpeg(spliced)
    assert out == frames


def test_avi_audio_first_stream_demuxes_video_by_index():
    """Stream 0 = audio, stream 1 = MJPG video: frames live in '01dc'
    chunks and the validated handler must be stream 1's (round-12 ADVICE
    fix — previously the demuxer hardwired stream 00)."""
    from stream_processor_spark.operators.avi import _chunk, _list

    frames = [
        encode_jpeg(fr, subsampling="420") for fr in mm.mjpeg_fixture_frames(3)
    ]
    base = encode_avi_mjpeg(frames, 16, 16, fps=30)
    # harvest the real avih/strh/strf bodies from the single-stream mux
    avih_at = base.index(b"avih") + 8
    avih = base[avih_at : avih_at + 56]
    strh_at = base.index(b"strh") + 8
    strh_len = int.from_bytes(base[strh_at - 4 : strh_at], "little")
    vids_strh = base[strh_at : strh_at + strh_len]
    strf_at = base.index(b"strf") + 8
    strf_len = int.from_bytes(base[strf_at - 4 : strf_at], "little")
    vids_strf = base[strf_at : strf_at + strf_len]

    auds_strh = b"auds" + bytes(4) + vids_strh[8:]
    auds_strf = bytes(16)  # WAVEFORMATEX-ish stub; demuxer never reads it
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", auds_strh) + _chunk(b"strf", auds_strf))
        + _list(b"strl", _chunk(b"strh", vids_strh) + _chunk(b"strf", vids_strf)),
    )
    movi_body = _chunk(b"00wb", b"\x00\x01" * 8)  # stream-0 audio chunk
    for fr in frames:
        movi_body += _chunk(b"01dc", fr)
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + len(body).to_bytes(4, "little") + body

    w, h, fps, out = demux_avi_mjpeg(avi)
    assert (w, h, fps) == (16, 16, 30)
    assert out == frames

    # two video streams: handler validated is the FIRST vids stream's —
    # an H264 second video stream must not poison the MJPG stream-0 decode
    hdrl2 = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", vids_strh) + _chunk(b"strf", vids_strf))
        + _list(
            b"strl",
            _chunk(b"strh", b"vids" + b"H264" + vids_strh[8:])
            + _chunk(b"strf", vids_strf),
        ),
    )
    movi2 = _list(
        b"movi", b"".join(_chunk(b"00dc", fr) for fr in frames)
    )
    body2 = b"AVI " + hdrl2 + movi2
    w2, h2, fps2, out2 = demux_avi_mjpeg(
        b"RIFF" + len(body2).to_bytes(4, "little") + body2
    )
    assert out2 == frames


def test_avi_non_mjpg_handler_gated():
    frames = [
        encode_jpeg(fr, subsampling="420") for fr in mm.mjpeg_fixture_frames(2)
    ]
    avi = bytearray(encode_avi_mjpeg(frames, 16, 16))
    at = avi.index(b"vids") + 4
    avi[at : at + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        demux_avi_mjpeg(bytes(avi))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        demux_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")


def test_mjpeg_frames_decode_constant_blocks():
    """Every demuxed frame decodes to a constant image (DC-only blocks),
    and distinct frames get distinct colors — the closed-form contract
    the SQL oracle relies on."""
    for d in (0, 5, 11):
        fixture = mm.mjpeg_fixture_frames(d)
        avi = encode_avi_mjpeg(
            [encode_jpeg(fr, subsampling="420") for fr in fixture], 16, 16
        )
        _, _, _, jpgs = demux_avi_mjpeg(avi)
        colors = []
        for jpg in jpgs:
            px = decode_jpeg(jpg)
            assert (px == px[0, 0]).all()
            colors.append(tuple(px[0, 0]))
        assert len(set(colors)) == len(colors)


def test_mjpeg_dataframe_path_null_payload(spark):
    df = spark.createDataFrame(
        [(1, None)], "doc_id long, payload binary"
    )
    assert mm.decode_mjpeg_video(df).count() == 0
    rows = (
        mm.decode_mjpeg_video(
            mm.attach_mjpeg_payload(
                spark.createDataFrame([(3,)], "doc_id long")
            )
        )
        .orderBy("frame_idx")
        .collect()
    )
    fixture = mm.mjpeg_fixture_frames(3)
    assert [r.frame_idx for r in rows] == list(range(len(fixture)))
    for r in rows:
        assert (r.height, r.width) == (16, 16)
        assert r.sum_r == 256 * (r.sum_r // 256)  # constant frame


def test_gif_local_color_table_roundtrip_and_no_table_gate():
    rng = np.random.RandomState(17)
    pal = mm.gif_fixture_palette()
    for ilace in (False, True):
        idx = rng.randint(0, 256, (9, 7)).astype(np.uint8)
        raw = encode_gif(idx, pal, interlace=ilace, local_table=True)
        assert np.array_equal(decode_gif(raw), pal[idx])
    # a GIF with NEITHER global nor local table decodes through the
    # DEFINED grayscale fallback (round 12 — formerly gated; see
    # test_gif_no_color_table_grayscale_fallback). Layout check here:
    # the no_table encoder emits no GCT and no LCT, and both flags are
    # clear.
    idx = np.arange(4, dtype=np.uint8).reshape(2, 2) * 60
    raw = encode_gif(idx, None, no_table=True)
    assert not (raw[10] & 0x80)  # no GCT
    assert raw[13] == 0x2C  # image separator right after the LSD
    assert not (raw[13 + 9] & 0x80)  # no LCT
    rgb = decode_gif(raw)
    assert np.array_equal(rgb, np.repeat(idx[:, :, None], 3, axis=2))


def test_png_gray_and_alpha_color_types():
    rng = np.random.RandomState(19)
    for ilace in (False, True):
        g = rng.randint(0, 256, (7, 5)).astype(np.uint8)
        out = mm.decode_png(mm.encode_png_gray(g, interlace=ilace))
        assert np.array_equal(out, np.stack([g, g, g], -1))
        rgba = rng.randint(0, 256, (6, 9, 4)).astype(np.uint8)
        out = mm.decode_png(mm.encode_png_rgba(rgba, interlace=ilace))
        assert np.array_equal(out, rgba[:, :, :3])
    # 16-bit depth stays honestly gated
    raw = bytearray(mm.encode_png_gray(np.zeros((3, 3), np.uint8)))
    raw[16 + 8] = 16  # IHDR bit depth
    with pytest.raises(NotImplementedError, match="8-bit"):
        mm.decode_png(bytes(raw))


# ------------------------------------------------------ round-12 gates ----


def test_stereo_ima_adpcm_decodes_per_channel_trajectories():
    """Stereo IMA-ADPCM (round 12): per-channel 4-byte headers, 4-byte
    words round-robin across channels, one independent state machine
    per channel — each deinterleaved channel must equal the mono decode
    of that channel's own header + bytes."""
    import numpy as np

    preds, idxs, nb = mm.adpcm_stereo_fixture(11)
    wav = mm.encode_wav_ima_adpcm(preds, idxs, nb)
    rate, ch, s = mm.decode_wav(wav)
    assert (rate, ch) == (8000, 2)
    per_ch = nb.shape[1]
    assert len(s) == 2 * (1 + 2 * per_ch)
    for c in range(2):
        blk = (
            int(preds[c]).to_bytes(2, "little", signed=True)
            + bytes([idxs[c], 0])
            + nb[c].tobytes()
        )
        mono = mm.decode_ima_adpcm_block(blk, None, 1)
        assert np.array_equal(mono, s[c::2]), f"channel {c}"


def test_stereo_adpcm_encoder_validates_word_alignment():
    import numpy as np
    import pytest

    with pytest.raises(ValueError, match="4-byte words"):
        mm.encode_wav_ima_adpcm([0, 0], [0, 0], np.zeros((2, 6), np.uint8))
    with pytest.raises(ValueError, match="channels, n"):
        mm.encode_wav_ima_adpcm([0, 0], [0, 0], np.zeros(8, np.uint8))


def test_gif_no_color_table_grayscale_fallback():
    """A GIF with no color table anywhere decodes through the defined
    grayscale identity fallback: RGB == index plane on all channels."""
    import numpy as np

    from stream_processor_spark.operators.gif import decode_gif, encode_gif

    idx = mm.gif_fixture_indices(5)
    raw = encode_gif(idx, None, no_table=True)
    # really no table: GCT flag clear in the screen descriptor, LCT
    # flag clear in the image descriptor
    assert not (raw[10] & 0x80)
    rgb = decode_gif(raw)
    assert rgb.shape == idx.shape + (3,)
    for c in range(3):
        assert np.array_equal(rgb[:, :, c], idx)


# ------------------------------------------------------ round-13 rungs ----


def test_gif_animation_composition_transparency():
    """Composed frames honor GCE transparency: pixels equal to the
    transparent index leave the previous canvas pixels in place."""
    from stream_processor_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames,
    )

    pal = mm.gif_fixture_palette()
    rng = np.random.RandomState(31)
    f0 = rng.randint(0, 255, (4, 5)).astype(np.uint8)
    f1 = rng.randint(0, 255, (4, 5)).astype(np.uint8)
    f1[1, 2] = 255
    f1[3, 0] = 255
    out = decode_gif_frames(
        encode_gif_frames([f0, f1], pal, transparent_idx=255)
    )
    assert len(out) == 2
    assert np.array_equal(out[0], pal[f0])
    exp = pal[f1].copy()
    exp[1, 2] = pal[f0][1, 2]
    exp[3, 0] = pal[f0][3, 0]
    assert np.array_equal(out[1], exp)


def test_gif_animation_partial_rects_and_disposals():
    """Partial-rect frames compose at their (left, top) offsets;
    disposal 3 restores the pre-frame canvas, disposal 2 restores the
    frame's rect to the background color before the next frame."""
    from stream_processor_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames,
    )

    pal = mm.gif_fixture_palette()
    rng = np.random.RandomState(37)
    f0 = rng.randint(0, 255, (6, 6)).astype(np.uint8)
    patch = rng.randint(0, 255, (2, 3)).astype(np.uint8)
    f2 = rng.randint(0, 255, (6, 6)).astype(np.uint8)

    # disposal 3 on the patch: frame 2 starts from the PRE-patch canvas
    out = decode_gif_frames(
        encode_gif_frames(
            [f0, patch, f2],
            pal,
            offsets=[(0, 0), (2, 1), (0, 0)],
            disposals=[0, 3, 0],
            screen=(6, 6),
        )
    )
    exp1 = pal[f0].copy()
    exp1[1:3, 2:5] = pal[patch]
    assert np.array_equal(out[1], exp1)
    assert np.array_equal(out[2], pal[f2])

    # disposal 2 on frame 0: the full rect resets to background (index
    # 0) before the patch draws
    out = decode_gif_frames(
        encode_gif_frames(
            [f0, patch],
            pal,
            offsets=[(0, 0), (2, 1)],
            disposals=[2, 0],
            screen=(6, 6),
        )
    )
    exp1 = np.empty((6, 6, 3), np.uint8)
    exp1[:] = pal[0]
    exp1[1:3, 2:5] = pal[patch]
    assert np.array_equal(out[0], pal[f0])
    assert np.array_equal(out[1], exp1)


def test_gif_animation_fixture_matches_pure_replica():
    """The registered fixture's composed frames equal a pure-python
    last-drawn-wins replica — the same function the SQL oracle
    implements with a window MAX."""
    from stream_processor_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames,
    )

    pal = mm.gif_fixture_palette()
    for doc in (0, 5, 17, 101):
        frames = mm.gif_anim_fixture_frames(doc)
        out = decode_gif_frames(
            encode_gif_frames(frames, pal, transparent_idx=255)
        )
        assert len(out) == 2 + doc % 3
        canvas_idx = frames[0].astype(np.int64)  # frame 0 fully drawn
        for f, fr in enumerate(frames):
            drawn = fr != 255
            canvas_idx = np.where(drawn, fr.astype(np.int64), canvas_idx)
            assert np.array_equal(out[f], pal[canvas_idx]), f"doc {doc} f {f}"


def test_gif_first_frame_view_of_animation():
    """decode_gif (single-image view) on an animation returns frame 0's
    raw palette expansion — extensions skipped per the block grammar."""
    from stream_processor_spark.operators.gif import (
        decode_gif,
        encode_gif_frames,
    )

    pal = mm.gif_fixture_palette()
    frames = mm.gif_anim_fixture_frames(9)
    raw = encode_gif_frames(frames, pal, transparent_idx=255)
    assert np.array_equal(decode_gif(raw), pal[frames[0]])


def test_png16_roundtrip_gray_rgb_alpha():
    rng = np.random.RandomState(41)
    g = rng.randint(0, 65536, (7, 5)).astype(np.uint16)
    assert np.array_equal(
        mm.decode_png16(mm.encode_png16(g)), np.stack([g, g, g], -1)
    )
    c = rng.randint(0, 65536, (6, 9, 3)).astype(np.uint16)
    assert np.array_equal(mm.decode_png16(mm.encode_png16(c)), c)
    # extremes: all-zero and all-65535 images survive the filter cycle
    for v in (0, 65535):
        flat = np.full((5, 4), v, np.uint16)
        assert mm.decode_png16(mm.encode_png16(flat)).max() == v


def test_png16_gates_and_cross_dispatch():
    import pytest

    g = np.zeros((3, 3), np.uint16)
    raw = mm.encode_png16(g)
    with pytest.raises(NotImplementedError, match="decode_png16"):
        mm.decode_png(raw)  # 8-bit decoder points at the 16-bit one
    with pytest.raises(NotImplementedError, match="16-bit"):
        mm.decode_png16(mm.encode_png(np.zeros((3, 3, 3), np.uint8)))
