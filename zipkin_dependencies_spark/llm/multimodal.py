"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

The decode kernels are STUBS — the container has no image/audio libraries, so
each decoder tries the real library first (PIL/soundfile behind import-try,
raising NotImplementedError with a clear message) and otherwise uses a
DETERMINISTIC FAKE (utf-8 / md5-derived) so the Spark-side plumbing — schema,
binary Arrow transfer, batch iteration, row fan-out — is real, tested, and
oracle-checkable end to end. Swapping in a real decoder changes one function.

Scale design (100 TB of media):
- payloads stay opaque binary end-to-end; nothing row-at-a-time touches the
  JVM (Arrow moves the bytes to Python once per batch);
- decode / feature-extract are mapInPandas (no shuffle at all — narrow,
  embarrassingly parallel, AQE-irrelevant);
- frame sampling fans out rows inside the Python stage (yield per batch), so
  the fan-out never materializes JVM-side before downstream filters;
- `spark.sql.execution.arrow.maxRecordsPerBatch` bounds peak Python memory:
  payload_bytes × batch_rows per worker.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media table: one row per asset; payload is the opaque encoded bytes.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_digest", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(docs: DataFrame, frame_bytes: int = 100) -> DataFrame:
    """Deterministic fake media table derived from the documents fixture:
    payload = utf-8 bytes of the text, kind round-robins image/audio/video,
    metadata derived from payload size. Pure Column expressions — the
    derivation is reproducible in any engine (the oracle's view of the same
    table)."""
    n_bytes = F.octet_length(F.col("text"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/v1").alias("format"),
            (n_bytes % 640).cast("int").alias("width"),
            (n_bytes % 480).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            F.floor(n_bytes / frame_bytes).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _try_real_image_decode(payload: bytes):  # pragma: no cover - no lib in env
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return None
    raise NotImplementedError(
        "real image decode (PIL) is stubbed in this environment; "
        "replace _fake_decode with PIL.Image.open(io.BytesIO(payload))"
    )


def _fake_decode(payload: bytes) -> str:
    """STUB decoder: utf-8 decode standing in for pixel/sample decoding.
    Deterministic, so downstream digests/features are oracle-checkable."""
    return bytes(payload).decode("utf-8", errors="replace")


def sample_frames(media: DataFrame, frame_bytes: int = 100) -> DataFrame:
    """Frame sampling: split each payload into fixed-size frames, emitting
    (media_id, frame_idx, frame_digest, n_bytes) per frame. The fan-out
    happens inside the Python stage — one input batch yields one output
    DataFrame with ~payload/frame_bytes × rows."""
    import hashlib

    def explode_frames(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[int, int, str, int]] = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                _try_real_image_decode(payload)
                data = _fake_decode(payload).encode("utf-8")
                for idx in range(len(data) // frame_bytes):
                    chunk = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out.append(
                        (int(mid), idx, hashlib.md5(chunk).hexdigest(), len(chunk))
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_digest", "n_bytes"]
            )

    from ..scaling import ensure_min_parallelism

    return ensure_min_parallelism(media.select("media_id", "payload")).mapInPandas(
        explode_frames, schema=FRAME_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: payload → dense float embedding. The STUB derives
    component j from md5(j || ':' || decoded_payload) — deterministic and
    exactly reproducible in SQL — while exercising the real plumbing
    (binary in, array<float> out, Arrow both ways). A real extractor swaps
    the per-row lambda for a vision/audio model batch call."""
    import hashlib

    def featurize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                text = _fake_decode(payload)
                vec = [
                    int(hashlib.md5(f"{j}:{text}".encode("utf-8")).hexdigest()[:2], 16)
                    / 255.0
                    for j in range(dim)
                ]
                rows.append((int(mid), vec))
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    from ..scaling import ensure_min_parallelism

    return ensure_min_parallelism(media.select("media_id", "payload")).mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata projection + content digest — pure Column expressions
    over the binary payload (md5 over binary stays JVM-side)."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )
