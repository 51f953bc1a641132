"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a mime column; decode / feature-extract / resize / frame-sample are
Arrow-batched Pandas stages over ``mapInPandas``. The decode step is
STUBBED in this container (no image/audio libs): ``decode_image`` /
``decode_audio`` raise NotImplementedError, and
``extract_binary_features`` uses a clearly-marked deterministic fake
so the Spark-side plumbing — schema, batching, partitioning — is real
and testable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

FEATURE_SCHEMA = "doc_id long, n_bytes long, fake_width long, fake_height long"


def decode_image(payload: bytes, mime: str):  # pragma: no cover - stub
    """Real implementation needs PIL/libvips (absent here)."""
    raise NotImplementedError("image decode requires an imaging library; "
                              "wire PIL.Image.open(BytesIO(payload)) here")


def decode_audio(payload: bytes, mime: str):  # pragma: no cover - stub
    raise NotImplementedError("audio decode requires soundfile/ffmpeg")


def _fake_dims(n_bytes: int) -> tuple[int, int]:
    """DETERMINISTIC FAKE standing in for decode+measure. Replace with
    decode_image(...).size in a container that has codecs."""
    return n_bytes % 640, n_bytes % 480


def extract_binary_features(df: DataFrame) -> DataFrame:
    """df(doc_id, payload binary, mime) -> per-payload features.

    The batch loop is the exact shape a real decoder uses: payloads
    arrive as one Arrow record batch, features leave as one — no
    per-row Python round-trips through the JVM.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            dims = n_bytes.map(_fake_dims)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int64"),
                "fake_width": dims.map(lambda d: d[0]).astype("int64"),
                "fake_height": dims.map(lambda d: d[1]).astype("int64"),
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, *, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled offset
    (stand-in for video frame extraction; offsets are real, frame
    decode is the stub above)."""
    from pyspark.sql import functions as F

    return (df.withColumn(
        "frame_offset",
        F.explode(F.sequence(F.lit(0),
                             F.greatest(F.length("payload") - 1, F.lit(0)),
                             F.lit(every_n_bytes))))
        .select("doc_id", "frame_offset"))
