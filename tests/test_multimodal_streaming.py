"""Round 11 (VERDICT r10 ask #8): the multimodal decoders compose with
the reference-faithful streaming runtime — a pipeline whose record
payload is BINARY image/audio bytes routed through the REAL codecs in
foreachBatch, with gated formats (NotImplementedError) and corrupt
bytes (ValueError) landing on the step DLQ carrying the ORIGINAL
record, and the metrics counters matching the route counts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from stream_processor_spark.pipeline.catalog import PipelineCatalog
from stream_processor_spark.pipeline.metrics import PipelineMetrics
from stream_processor_spark.pipeline.processors import BUILTIN_PROCESSORS
from stream_processor_spark.pipeline.runner import PipelineRunner, Sink
from stream_processor_spark.streaming.file_stream import FileBroker

MM_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_pixels", LongType()),
        StructField("px_sum", LongType()),
    ]
)

MM_CATALOG = {
    "topics": [
        {"id": 1, "topic_name": "mm-in"},
        {"id": 2, "topic_name": "mm-out"},
        {"id": 9, "topic_name": "dlq-decode"},
        {"id": 3, "topic_name": "wav-in"},
        {"id": 4, "topic_name": "wav-out"},
        {"id": 10, "topic_name": "dlq-wav"},
    ],
    "schemas": [{"id": 1, "schema_name": "mm"}],
    "processors": [
        {"id": 20, "processor_name": "decodeImageStats", "is_filter": False},
        {"id": 21, "processor_name": "decodeWavStats", "is_filter": False},
    ],
    "pipelines": [
        {
            "id": 1,
            "name": "image-decode",
            "source_topic_id": 1,
            "target_topic_id": 2,
            "incoming_schema_id": 1,
            "outgoing_schema_id": 1,
            "steps": {"processors": [20], "dlq": [9]},
        },
        {
            "id": 2,
            "name": "wav-decode",
            "source_topic_id": 3,
            "target_topic_id": 4,
            "incoming_schema_id": 1,
            "outgoing_schema_id": 1,
            "steps": {"processors": [21], "dlq": [10]},
        },
    ],
}


def _image_payloads():
    from stream_processor_spark.operators.gif import encode_gif
    from stream_processor_spark.operators.multimodal import (
        decode_image_bytes,
        encode_bmp,
        encode_png,
        gif_fixture_palette,
    )
    from stream_processor_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(5)
    bmp = encode_bmp(rng.integers(0, 256, (6, 7, 3), dtype=np.uint8))
    png = encode_png(rng.integers(0, 256, (5, 5, 3), dtype=np.uint8))
    jpg = encode_jpeg(np.full((16, 16, 3), (10, 200, 30), np.uint8))
    gif = encode_gif(
        rng.integers(0, 256, (4, 6), dtype=np.uint8), gif_fixture_palette()
    )
    good = [("bmp", bmp), ("png", png), ("jpg", jpg), ("gif", gif)]
    expect = {}
    for k, raw in good:
        px = decode_image_bytes(raw)
        expect[k] = (int(px.shape[0] * px.shape[1]), int(px.sum()))
    # a 16-bit PNG hits the decoder's capability gate
    # (NotImplementedError; no-table GIFs decode via the grayscale
    # fallback since round 12, so the gate fixture moved to the
    # still-gated depth profile), distinct from corrupt bytes
    # (ValueError) — both must land on the step DLQ with the original
    # record
    deep = bytearray(png)
    deep[24] = 16  # IHDR bit depth: 8 -> 16 (gated profile)
    gated = ("deep", bytes(deep))
    corrupt = ("bad", b"BM" + b"\x01\x02\x03")  # header parse: ValueError
    return good, expect, gated, corrupt


def test_image_decode_pipeline_routes_gated_and_corrupt_to_dlq(
    spark, tmp_path
):
    good, expect, gated, corrupt = _image_payloads()
    catalog = PipelineCatalog.from_dict(MM_CATALOG)
    runner = PipelineRunner(catalog, BUILTIN_PROCESSORS)
    broker = FileBroker(str(tmp_path / "broker"))
    topic = broker.topic("mm-in", MM_SCHEMA)
    target = Sink("parquet", str(tmp_path / "target"))
    dlq = Sink("parquet", str(tmp_path / "dlq"))
    metrics = PipelineMetrics("1")

    rows = [
        {"key": k, "payload": bytearray(raw), "n_pixels": None, "px_sum": None}
        for k, raw in good + [gated, corrupt]
    ]
    topic.produce(spark.createDataFrame(rows, schema=MM_SCHEMA))
    q = runner.run_streaming(
        1,
        topic.read_stream(spark),
        target,
        {"dlq-decode": dlq},
        checkpoint_dir=broker.checkpoint_dir(),
        metrics=metrics,
    )
    q.awaitTermination(120)

    ok = {
        r.key: (r.out_n_pixels, r.out_px_sum)
        for r in spark.read.parquet(target.path_or_topic).collect()
    }
    assert ok == expect  # every good payload decoded through the chain

    dlq_rows = spark.read.parquet(dlq.path_or_topic).collect()
    assert {r.key for r in dlq_rows} == {"deep", "bad"}
    # ORIGINAL record payload lands on the DLQ (consumer.js:100)
    by_key = {r.key: bytes(r.payload) for r in dlq_rows}
    assert by_key["deep"].startswith(b"\x89PNG")
    assert by_key["bad"] == bytes(corrupt[1])

    snap = metrics.snapshot()
    assert snap["messages_received_total"] == 6
    assert snap["messages_completed_total"] == 4
    assert snap["messages_dlq_total"] == 2
    assert snap.get("messages_error_total", 0) == 0


def test_wav_decode_pipeline_gates_non_pcm16(spark, tmp_path):
    from stream_processor_spark.operators.multimodal import (
        adpcm_fixture,
        decode_wav,
        encode_wav,
        encode_wav_g711,
        encode_wav_ima_adpcm,
        g711_fixture_codes,
    )

    samples = np.arange(-50, 50, dtype=np.int16)
    wav = encode_wav(samples, sample_rate=8000)
    # the SAME processor decodes every supported WAV sub-format — the
    # format dispatch lives in decode_wav, not in the pipeline step
    ulaw = encode_wav_g711(g711_fixture_codes(3), law="ulaw")
    p0, i0, nb = adpcm_fixture(4)
    adpcm = encode_wav_ima_adpcm(p0, i0, nb)
    want = {}
    for k, raw in (("ok", wav), ("ulaw", ulaw), ("adpcm", adpcm)):
        _r, _c, dec = decode_wav(raw)
        want[k] = (len(dec), int(sum(int(s) for s in dec)))

    # gated: flip the bits-per-sample field to 8 (NotImplementedError)
    gated = bytearray(wav)
    idx = wav.index(b"fmt ")
    gated[idx + 22 : idx + 24] = (8).to_bytes(2, "little")
    corrupt = b"RIFX" + wav[4:]  # bad magic: ValueError

    catalog = PipelineCatalog.from_dict(MM_CATALOG)
    runner = PipelineRunner(catalog, BUILTIN_PROCESSORS)
    broker = FileBroker(str(tmp_path / "broker"))
    topic = broker.topic("wav-in", MM_SCHEMA)
    target = Sink("parquet", str(tmp_path / "target"))
    dlq = Sink("parquet", str(tmp_path / "dlq"))
    metrics = PipelineMetrics("2")

    rows = [
        {"key": "ok", "payload": bytearray(wav), "n_pixels": None, "px_sum": None},
        {"key": "ulaw", "payload": bytearray(ulaw), "n_pixels": None, "px_sum": None},
        {"key": "adpcm", "payload": bytearray(adpcm), "n_pixels": None, "px_sum": None},
        {"key": "gated", "payload": bytearray(bytes(gated)), "n_pixels": None, "px_sum": None},
        {"key": "bad", "payload": bytearray(corrupt), "n_pixels": None, "px_sum": None},
    ]
    topic.produce(spark.createDataFrame(rows, schema=MM_SCHEMA))
    q = runner.run_streaming(
        2,
        topic.read_stream(spark),
        target,
        {"dlq-wav": dlq},
        checkpoint_dir=broker.checkpoint_dir(),
        metrics=metrics,
    )
    q.awaitTermination(120)

    got = {
        r.key: (r.out_n_pixels, r.out_px_sum)
        for r in spark.read.parquet(target.path_or_topic).collect()
    }
    assert got == want  # PCM16 + mu-law + ADPCM all decoded in-chain
    dlq_keys = {r.key for r in spark.read.parquet(dlq.path_or_topic).collect()}
    assert dlq_keys == {"gated", "bad"}
    snap = metrics.snapshot()
    assert snap["messages_completed_total"] == 3
    assert snap["messages_dlq_total"] == 2
