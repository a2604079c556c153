"""AVI (RIFF) container mux/demux for MJPEG video — pure Python.

Round-11 continuation: composes the baseline-JPEG codec
(operators/jpeg.py) with a real AVI container walk to give the engine
honest COMPRESSED-video decode. MJPEG is the one compressed video
format whose decode reduces to an already-proven primitive: every
'00dc' chunk in the movi list is a complete baseline JFIF image, so
demux (RIFF chunk grammar) + decode_jpeg = real frames from real
compressed bytes, with the same closed-form verifiability as
`multimodal_jpeg_stats` (macroblock-constant fixture → DC-only blocks →
exact SQL-replayable reconstruction).

Inter-frame codecs (H.264/VP9/AV1) stay honestly gated — motion
compensation + CABAC needs a real library; MJPEG is what codec-free
capture pipelines and many training-corpus scrapes actually contain.

The writer emits the canonical single-stream layout: RIFF('AVI ')
{ LIST hdrl { avih, LIST strl { strh 'vids/MJPG', strf
BITMAPINFOHEADER } }, LIST movi { '00dc'... }, idx1 }. The reader
walks the chunk grammar (it does not assume fixed offsets) and
validates the MJPG fourcc before handing frames to the JPEG decoder.
"""

from __future__ import annotations


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + len(body).to_bytes(4, "little") + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Mux complete JPEG images into a single-video-stream AVI."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    n = len(jpeg_frames)
    max_bytes = max(len(f) for f in jpeg_frames)

    avih = (
        (1_000_000 // fps).to_bytes(4, "little")    # dwMicroSecPerFrame
        + (max_bytes * fps).to_bytes(4, "little")   # dwMaxBytesPerSec
        + (0).to_bytes(4, "little")                 # dwPaddingGranularity
        + (0x10).to_bytes(4, "little")              # AVIF_HASINDEX
        + n.to_bytes(4, "little")                   # dwTotalFrames
        + (0).to_bytes(4, "little")                 # dwInitialFrames
        + (1).to_bytes(4, "little")                 # dwStreams
        + max_bytes.to_bytes(4, "little")           # dwSuggestedBufferSize
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + bytes(16)                                 # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + (0).to_bytes(4, "little")                 # dwFlags
        + (0).to_bytes(2, "little")                 # wPriority
        + (0).to_bytes(2, "little")                 # wLanguage
        + (0).to_bytes(4, "little")                 # dwInitialFrames
        + (1).to_bytes(4, "little")                 # dwScale
        + fps.to_bytes(4, "little")                 # dwRate
        + (0).to_bytes(4, "little")                 # dwStart
        + n.to_bytes(4, "little")                   # dwLength (frames)
        + max_bytes.to_bytes(4, "little")           # dwSuggestedBufferSize
        + (0xFFFFFFFF).to_bytes(4, "little")        # dwQuality (default)
        + (0).to_bytes(4, "little")                 # dwSampleSize (varies)
        + (0).to_bytes(2, "little") * 2             # rcFrame left/top
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
    )
    strf = (
        (40).to_bytes(4, "little")                  # biSize
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + (1).to_bytes(2, "little")                 # biPlanes
        + (24).to_bytes(2, "little")                # biBitCount
        + b"MJPG"                                   # biCompression
        + (width * height * 3).to_bytes(4, "little")
        + bytes(16)                                 # resolutions/clr fields
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = bytearray()
    idx = bytearray()
    for fr in jpeg_frames:
        # idx1 offsets are relative to the start of the movi list's
        # 'movi' fourcc (the convention every reader accepts)
        offset = 4 + len(movi_body)
        idx += b"00dc" + (0x10).to_bytes(4, "little")  # AVIIF_KEYFRAME
        idx += offset.to_bytes(4, "little") + len(fr).to_bytes(4, "little")
        movi_body += _chunk(b"00dc", fr)
    movi = _list(b"movi", bytes(movi_body))

    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def demux_avi_mjpeg(raw: bytes):
    """Walk an AVI's chunk grammar → (width, height, fps, [jpeg bytes]).

    Validates the video stream is MJPG (other fccHandlers raise
    NotImplementedError — those frames need a real codec library).
    Streams are numbered by strl order in hdrl; frames are collected for
    the FIRST 'vids' stream's index ('NNdc'/'NNdb'), so the validated
    handler always belongs to the stream actually decoded even when an
    audio stream precedes video or two video streams coexist (round-12
    ADVICE fix). Skips 'rec ' grouping lists, JUNK padding and audio
    streams."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    width = height = None
    fps = None
    handler = None
    stream_idx = 0  # strh chunks appear in strl order: Nth strh = stream N
    video_tag = None  # b'NN' two-digit chunk prefix of the first vids stream
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, fps, handler, stream_idx, video_tag
        while pos + 8 <= end:
            tag = raw[pos : pos + 4]
            ln = int.from_bytes(raw[pos + 4 : pos + 8], "little")
            body_start = pos + 8
            pos = body_start + ln + (ln & 1)
            if tag == b"LIST":
                kind = raw[body_start : body_start + 4]
                walk(
                    body_start + 4,
                    body_start + ln,
                    in_movi or kind in (b"movi", b"rec "),
                )
            elif tag == b"avih":
                usec = int.from_bytes(raw[body_start : body_start + 4], "little")
                fps = round(1_000_000 / usec) if usec else None
                width = int.from_bytes(
                    raw[body_start + 32 : body_start + 36], "little"
                )
                height = int.from_bytes(
                    raw[body_start + 36 : body_start + 40], "little"
                )
            elif tag == b"strh":
                if (
                    raw[body_start : body_start + 4] == b"vids"
                    and video_tag is None
                ):
                    handler = raw[body_start + 4 : body_start + 8]
                    video_tag = b"%02d" % stream_idx
                stream_idx += 1
            elif (
                in_movi
                and tag[2:4] in (b"dc", b"db")
                and video_tag is not None
                and tag[:2] == video_tag
            ):
                frames.append(raw[body_start : body_start + ln])

    walk(12, len(raw), False)

    if handler is not None and handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video handler {handler!r} needs a real codec library — "
            "only MJPG decodes here"
        )
    if not frames:
        raise ValueError("AVI contains no video frames")
    return width, height, fps, frames
