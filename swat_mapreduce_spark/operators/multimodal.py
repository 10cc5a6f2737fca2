"""Multimodal column handling: opaque binary payloads + typed metadata.

The reference fetches whole image files per record
(java/PredictBatchMapperCluster.java:51-61) and lets PIL decode them
(python/predict_batch_threaded_local.py:100-105). Here the pattern is
Spark-native: binary payloads live in a BinaryType column (from
``binaryFile`` reads or inline encoding); metadata (byte length,
digests) is JVM-side; decode/feature-extraction runs as an
Arrow-batched ``mapInPandas`` stage.

The image/audio decode libraries are NOT available in this container,
so the real decode is STUBBED: ``decode_image_real`` raises
NotImplementedError unless PIL is importable, and the tested path uses
``fake_decode_features`` — a deterministic md5-derived stand-in with
the exact same Spark plumbing (schema, Arrow batching, partitioning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, width int, height int, channels int, mean_pixel double"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a BinaryType payload column (UTF-8 bytes of text — the
    deterministic stand-in for image bytes) plus typed metadata."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
        F.md5(payload).alias("payload_md5"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode: dimensions and mean pixel derived
    from the payload digest. Mirrors the shape of a real image decode
    so the pipeline plumbing is fully exercised without PIL."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    mean_pixel = h[2] / 255.0
    return width, height, channels, mean_pixel


def fake_decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched ``mapInPandas`` feature extraction over binary
    payloads — the production shape for image decode / resize /
    frame-sample stages. Batch-at-a-time, model/codec state would be
    initialized once per Python worker (lazy global), not per batch."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["width", "height", "channels", "mean_pixel"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


def decode_image_real(binary_df: DataFrame, resize_to: int = 224) -> DataFrame:
    """Real image decode via PIL (gated: PIL is not in this container).

    Same mapInPandas shape and FEATURE_SCHEMA as fake_decode_features:
    PIL.Image.open over BytesIO → convert('RGB') → native (width,
    height, channels=3) → resize(resize_to, resize_to) → mean pixel in
    [0,1] — mirroring python/predict_batch_threaded_local.py:78-83,
    100-105. Undecodable payloads yield the class-0-style fallback row
    (0, 0, 0, 0.0) so bad bytes never kill a 100 TB job.
    """
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "PIL not available in this environment; use "
            "fake_decode_features for the plumbing-equivalent path"
        ) from e

    import io

    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf["payload"]:
                try:
                    img = Image.open(io.BytesIO(bytes(payload))).convert("RGB")
                    w, h = img.size
                    arr = np.asarray(
                        img.resize((resize_to, resize_to)), dtype=np.float64
                    )
                    rows.append((w, h, 3, float(arr.mean() / 255.0)))
                except Exception:  # noqa: BLE001 - decode fallback by contract
                    rows.append((0, 0, 0, 0.0))
            out = pd.DataFrame(
                rows, columns=["width", "height", "channels", "mean_pixel"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, brightness double"
FRAME_SIZE = 64  # "pixels" (chars) per frame
FRAME_STRIDE = 3  # sample every 3rd frame


def sample_frames(docs: DataFrame) -> DataFrame:
    """Video-style strided frame sampling over an opaque payload.

    Treats the document text as a frame sequence (FRAME_SIZE chars per
    frame), keeps every FRAME_STRIDE-th frame, and emits per-frame
    features (md5, mean code point as "brightness") from an
    Arrow-batched ``mapInPandas`` — a 1→N UDTF-shaped stage, the same
    plumbing a real video decoder (pyav/ffmpeg, stubbed here per the
    container constraints) would run in. Narrow map: frames never
    shuffle; downstream aggs see (doc_id, frame_idx) keyed rows.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_frames = len(text) // FRAME_SIZE  # full frames only
                for fi in range(0, n_frames, FRAME_STRIDE):
                    frame = text[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE]
                    rows.append(
                        (
                            doc_id,
                            fi,
                            hashlib.md5(frame.encode()).hexdigest(),
                            sum(ord(c) for c in frame) / FRAME_SIZE,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5", "brightness"]
            )

    return docs.select("doc_id", "text").mapInPandas(extract, schema=FRAME_SCHEMA)


AUDIO_FRAME = 64  # samples per analysis window
AUDIO_STRIDE = 32  # hop size (overlapping windows, audio convention)
AUDIO_CENTER = 96.0  # DC offset: code points oscillate around ~96
AUDIO_SCHEMA = (
    "doc_id long, frame_idx int, rms double, zero_crossing_rate double"
)


def audio_frame_energy(docs: DataFrame) -> DataFrame:
    """Audio-style windowed DSP over an opaque payload: the document
    text stands in for a PCM stream (code point = sample), framed
    into AUDIO_FRAME-sample windows with AUDIO_STRIDE hop, emitting
    per-frame RMS energy and zero-crossing rate — the two features
    every VAD/segmentation pass starts from. Arrow-batched
    mapInPandas 1→N, narrow (frames never shuffle); a real decoder
    (soundfile/ffmpeg — not in this container) drops into the same
    stage shape.

    Cross-engine exactness: RMS = sqrt(avg((c-96)^2)) uses only exact
    integer sums, one exact division, and sqrt — which IEEE 754
    requires correctly rounded (unlike ln/exp) — so both engines
    produce bit-identical doubles before the 4dp round.
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                samples = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.float64)
                n = len(samples)
                fi = 0
                for start in range(0, n - AUDIO_FRAME + 1, AUDIO_STRIDE):
                    w = samples[start : start + AUDIO_FRAME] - AUDIO_CENTER
                    rms = float(np.sqrt((w * w).sum() / AUDIO_FRAME))
                    signs = w[:-1] * w[1:]
                    zcr = float((signs < 0).sum() / (AUDIO_FRAME - 1))
                    rows.append((doc_id, fi, rms, zcr))
                    fi += 1
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "rms", "zero_crossing_rate"],
            )

    return docs.select("doc_id", "text").mapInPandas(
        extract, schema=AUDIO_SCHEMA
    )
