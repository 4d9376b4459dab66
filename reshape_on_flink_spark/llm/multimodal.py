"""Multimodal column handling: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a pointer column for > ~1 MB blobs) next to a typed
metadata struct; run decode / feature-extraction as Arrow-batched
``mapInPandas`` stages so the Python boundary is columnar, and keep every
filter/join on the metadata columns (JVM side, pushdown-friendly) so the
binary bytes are only materialized inside the stage that needs them.

The container image has no image/audio codecs, so the decoders below are
STUBS (`decode='fake'` produces deterministic pseudo-features;
`decode='real'` raises NotImplementedError). The Spark-side plumbing —
schemas, batch iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried next to every payload
MEDIA_META_FIELDS = "media_type string, byte_len int, payload_md5 string"

#: schema appended by extract_features
FEATURE_FIELDS = "feat_mean double, feat_dim int"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize an opaque binary column + metadata
    struct from the documents table (stand-in for real image/audio bytes).
    All metadata is computed JVM-side."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        "*",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(payload).alias("byte_len"),
            F.md5(payload).alias("payload_md5"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[float, int]:
    """Deterministic stand-in for a codec: mean byte value + length."""
    if not payload:
        return 0.0, 0
    return sum(payload) / len(payload), len(payload)


def extract_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``decode='real'`` is where PIL/ffmpeg-style codecs plug in —
    unavailable in this container, so it raises. The 'fake' path runs the
    identical mapInPandas plumbing (batch shapes, schema contract).
    Scale: stage parallelism = input partitions; each Arrow batch holds
    ~10k payloads — tune spark.sql.execution.arrow.maxRecordsPerBatch
    down for multi-MB media so batches fit executor memory.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in this "
            "environment; plug a PIL/av decoder into _decode_batch here"
        )

    out_schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in df.dtypes] + ["feat_mean double", "feat_dim int"]
    )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            pdf = pdf.assign(
                feat_mean=feats.map(lambda t: t[0]),
                feat_dim=feats.map(lambda t: t[1]).astype("int32"),
            )
            yield pdf

    return df.mapInPandas(_decode_batch, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    decode: str = "fake",
) -> DataFrame:
    """Image resize stage: payload -> resized payload + (width, height).

    ``decode='real'`` is the PIL/turbojpeg plug point (absent in this
    container -> NotImplementedError). The 'fake' codec emits a
    deterministic payload of exactly width*height bytes derived from the
    source bytes, so the batch plumbing — binary in/binary out through
    Arrow, output size contracts — is test-checkable. Scale: resizing is
    embarrassingly parallel; cap Arrow batch bytes via
    spark.sql.execution.arrow.maxRecordsPerBatch for multi-MB images so a
    batch fits executor memory.
    """
    if decode == "real":
        raise NotImplementedError(
            "real image resize requires PIL/libjpeg — plug the decoder in here"
        )
    out_schema = ", ".join(
        [f"{n} {t}" for n, t in df.dtypes] + ["resized binary", "out_w int", "out_h int"]
    )
    n_bytes = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake(p: bytes) -> bytes:
                if not p:
                    return b"\x00" * n_bytes
                reps = (n_bytes // len(p)) + 1
                return (p * reps)[:n_bytes]

            pdf = pdf.assign(
                resized=pdf[payload_col].map(fake),
                out_w=width,
                out_h=height,
            )
            pdf["out_w"] = pdf["out_w"].astype("int32")
            pdf["out_h"] = pdf["out_h"].astype("int32")
            yield pdf

    return df.mapInPandas(_resize, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int,
    max_frames: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """Video frame sampling: one payload row -> N frame rows
    (id, frame_idx, frame binary). The row-expanding mapInPandas shape is
    the real contract (a video decoder replaces the fake slicer).
    Scale: output is a generator stage — no buffering of all frames; at
    100 TB keep frame rows co-partitioned with their source by
    repartitioning on id AFTER sampling only if a keyed op follows.
    """
    if decode == "real":
        raise NotImplementedError(
            "real frame sampling requires ffmpeg/av — plug the demuxer in here"
        )
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                p = p or b""
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(p[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames}).astype(
                {id_col: "int64", "frame_idx": "int32"}
            )

    return df.mapInPandas(_sample, schema=out_schema)
