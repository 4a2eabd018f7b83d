"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

Decoding is REAL where no third-party library is needed: PNG images decode
via a stdlib inflate+unfilter path and WAV audio via the stdlib ``wave``
reader (``decode_media``); PIL is used when installed (any format it knows)
and its absence degrades only non-PNG images, carried per row as a
``decode_error`` instead of failing (skip-and-log parity). The frame/feature
pipelines additionally keep a DETERMINISTIC FAKE decode (utf-8/md5-derived)
so their DuckDB oracle twins can reproduce the values bit-for-bit — an
engine-independent correctness gate a real pixel pipeline can't offer.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_WAV_MAGIC = b"RIFF"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL stdlib PNG decode (no third-party libs): IHDR parse, IDAT
    inflate, per-scanline unfilter (None/Sub/Up/Average/Paeth) → raw 8-bit
    pixel bytes. Supports the common non-interlaced 8-bit color types
    (grayscale 0, RGB 2, gray+alpha 4, RGBA 6); anything else raises
    ValueError and the caller falls back."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, height, channels, idat = 8, 0, 0, 0, b""
    while pos < len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG (need 8-bit, non-interlaced)")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        filt = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if filt == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad PNG filter {filt}")
        out += line
        prev = line
    return width, height, channels, bytes(out)


def _decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL stdlib WAV decode: (sample_rate, n_frames, n_channels, pcm)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        return (
            w.getframerate(),
            w.getnframes(),
            w.getnchannels(),
            w.readframes(w.getnframes()),
        )


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """Image payload → (width, height, channels, raw pixel bytes).

    Tries PIL when installed (any format PIL knows); without it, the
    stdlib PNG decoder handles real PNG payloads. Non-PNG payloads without
    PIL raise NotImplementedError with a clear message — the honest
    boundary of this environment."""
    try:
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(bytes(payload)))
        img.load()
        channels = len(img.getbands())
        return img.width, img.height, channels, img.tobytes()
    except ImportError:
        pass
    if bytes(payload[:8]) == _PNG_MAGIC:
        return _decode_png(bytes(payload))
    raise NotImplementedError(
        "real decode for this image format needs PIL (not installed); "
        "PNG decodes via the stdlib path, other formats need the library"
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


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("content_digest", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL media decode over the binary column: PNG images via the stdlib
    inflate+unfilter path (or PIL when installed, any format), WAV audio via
    the stdlib wave reader. Emits decoded dimensions plus an md5 over the
    DECODED content (pixels / PCM) — the digest only matches across storage
    encodings if the decode actually ran. Undecodable payloads carry the
    error message in ``decode_error`` instead of failing the batch
    (skip-and-log parity, P4).

    Same 100 TB shape as the other media kernels: narrow mapInPandas, no
    shuffle, payload crosses to Python once per Arrow batch."""
    import hashlib

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                w = h = ch = sr = nf = None
                digest = err = None
                try:
                    b = bytes(payload)
                    if b[:8] == _PNG_MAGIC or kind == "image":
                        w, h, ch, pixels = decode_image(b)
                        digest = hashlib.md5(pixels).hexdigest()
                    elif b[:4] == _WAV_MAGIC or kind == "audio":
                        sr, nf, ch, pcm = _decode_wav(b)
                        digest = hashlib.md5(pcm).hexdigest()
                    else:
                        raise NotImplementedError(f"no real decoder for kind={kind}")
                except Exception as e:  # skip-and-log, never fail the batch
                    err = f"{type(e).__name__}: {e}"
                rows.append((int(mid), kind, w, h, ch, sr, nf, digest, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height", "channels",
                    "sample_rate", "n_frames", "content_digest", "decode_error",
                ],
            )

    from ..scaling import ensure_min_parallelism

    return ensure_min_parallelism(
        media.select("media_id", "kind", "payload")
    ).mapInPandas(run, schema=DECODED_SCHEMA)


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


RESIZED_SCHEMA = (
    "media_id long, src_width int, src_height int, width int, height int, "
    "channels int, pixels binary, resize_error string"
)


def resize_images(
    media: DataFrame, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """REAL image resize over the binary column: decode (stdlib PNG / PIL),
    nearest-neighbor sample to (target_w, target_h) with pure integer
    index arithmetic (``floor(i·src/target)`` — deterministic across
    platforms, no float filtering), emit the resized interleaved pixel
    bytes. Undecodable payloads carry ``resize_error`` instead of failing
    the batch (skip-and-log, P4 parity).

    Same 100 TB shape as the other media kernels: narrow ``mapInPandas``,
    no shuffle, payloads cross to Python once per Arrow batch; the output
    rows are target-size-bounded (tw·th·channels bytes) regardless of
    source dimensions — the step that makes a heterogeneous image corpus
    uniform for a training pipeline."""
    import numpy as np

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                sw = sh = w = h = ch = None
                out = err = None
                try:
                    sw, sh, ch, pixels = decode_image(bytes(payload))
                    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(sh, sw, ch)
                    ys = (np.arange(target_h) * sh) // target_h
                    xs = (np.arange(target_w) * sw) // target_w
                    out = arr[ys][:, xs].tobytes()
                    w, h = target_w, target_h
                except Exception as e:  # skip-and-log, never fail the batch
                    err = f"{type(e).__name__}: {e}"
                rows.append((int(mid), sw, sh, w, h, ch, out, err))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_width", "src_height", "width", "height",
                    "channels", "pixels", "resize_error",
                ],
            )

    from ..scaling import ensure_min_parallelism

    return ensure_min_parallelism(
        media.select("media_id", "payload")
    ).mapInPandas(run, schema=RESIZED_SCHEMA)
