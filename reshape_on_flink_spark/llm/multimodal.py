"""Multimodal column handling: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a pointer column for > ~1 MB blobs) next to a typed
metadata struct; run decode / feature-extraction as Arrow-batched
``mapInPandas`` stages so the Python boundary is columnar, and keep every
filter/join on the metadata columns (JVM side, pushdown-friendly) so the
binary bytes are only materialized inside the stage that needs them.

Codec support: ``decode='real'`` runs REAL decoders for every format the
standard library + numpy can handle — PPM/PGM images (P5/P6), BMP
(24-bit uncompressed), WAV audio (PCM16), and raw concatenated-PPM video
streams — parsed with struct/wave/numpy, no external codec libraries.
Compressed formats (JPEG/PNG/MP4/...) are the documented plug point: the
format sniffer raises a loud error naming the magic it saw, and a
PIL/av decoder drops into ``_decode_real`` / ``_resize_real`` /
``_demux_real`` without touching the Spark plumbing. ``decode='fake'``
keeps the deterministic pseudo-codec used by the cross-engine oracle
queries (a real codec's floats are not oracle-reproducible in SQL).
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
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


# ---- real stdlib codecs ---------------------------------------------------


def _parse_ppm_header(p: bytes) -> tuple[str, int, int, int, int]:
    """Parse a P5/P6 netpbm header -> (magic, width, height, maxval,
    data_offset). Whitespace/comment handling per the netpbm spec."""
    magic = p[:2].decode("ascii", "replace")
    if magic not in ("P5", "P6"):
        raise ValueError(f"not a netpbm payload (magic {magic!r})")
    fields, i, n = [], 2, len(p)
    while len(fields) < 3 and i < n:
        while i < n and p[i : i + 1].isspace():
            i += 1
        if p[i : i + 1] == b"#":  # comment to end of line
            while i < n and p[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < n and not p[i : i + 1].isspace():
            i += 1
        fields.append(int(p[start:i]))
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    return magic, w, h, maxval, i


def _decode_real(payload: bytes) -> tuple[float, int]:
    """Real feature extraction via format sniffing.

    - P5/P6 netpbm: mean pixel value, dim = pixel count (x3 for RGB)
    - BM (24-bit uncompressed BMP): mean over pixel bytes, dim = w*h*3
    - RIFF/WAVE (PCM16): mean |amplitude| / 32768, dim = frame count
    Anything else raises with the sniffed magic — the PIL/av plug point.
    """
    if not payload:
        return 0.0, 0
    if payload[:2] in (b"P5", b"P6"):
        magic, w, h, _maxval, off = _parse_ppm_header(payload)
        ch = 3 if magic == "P6" else 1
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
        return float(px.mean()), int(px.size)
    if payload[:2] == b"BM":
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise ValueError(f"BMP subset: 24-bit uncompressed only (bpp={bpp})")
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
        ).reshape(h, row_bytes)[:, : w * 3]
        return float(rows.mean()), int(w * h * 3)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                raise ValueError("WAV subset: PCM16 only")
            frames = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
        return float(np.abs(frames).mean() / 32768.0), int(len(frames))
    raise ValueError(
        f"unsupported media magic {payload[:4]!r}: stdlib codecs cover "
        "P5/P6 netpbm, 24-bit BMP, PCM16 WAV; plug PIL/av here for "
        "compressed formats"
    )


def extract_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``decode='real'`` decodes P5/P6 netpbm, 24-bit BMP and PCM16 WAV
    payloads with stdlib codecs (format-sniffed per payload; compressed
    formats raise loudly at the documented PIL/av plug point).
    ``decode='fake'`` keeps the oracle-reproducible pseudo-codec on the
    identical mapInPandas plumbing (batch shapes, schema contract).
    Scale: stage parallelism = input partitions; each Arrow batch holds
    ~10k payloads — tune spark.sql.execution.arrow.maxRecordsPerBatch
    down for multi-MB media so batches fit executor memory.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    kernel = _decode_real if decode == "real" else _fake_decode

    out_schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in df.dtypes] + ["feat_mean double", "feat_dim int"]
    )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(kernel)
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

    ``decode='real'`` performs a REAL nearest-neighbor resize for
    P5/P6 netpbm payloads (numpy row/column index sampling, re-emitted
    as a valid netpbm of the target size); other magics raise at the
    PIL/turbojpeg plug point. The 'fake' codec emits a deterministic
    payload of exactly width*height bytes derived from the source bytes,
    so the batch plumbing — binary in/binary out through Arrow, output
    size contracts — is oracle-checkable. Scale: resizing is
    embarrassingly parallel; cap Arrow batch bytes via
    spark.sql.execution.arrow.maxRecordsPerBatch for multi-MB images so a
    batch fits executor memory.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    out_schema = ", ".join(
        [f"{n} {t}" for n, t in df.dtypes] + ["resized binary", "out_w int", "out_h int"]
    )
    n_bytes = width * height

    def _resize_real(p: bytes) -> bytes:
        magic, w, h, maxval, off = _parse_ppm_header(p)
        ch = 3 if magic == "P6" else 1
        img = np.frombuffer(p, dtype=np.uint8, count=w * h * ch, offset=off).reshape(
            h, w, ch
        )
        rows = (np.arange(height) * h // height).clip(0, h - 1)
        cols = (np.arange(width) * w // width).clip(0, w - 1)
        out = img[rows][:, cols]
        header = f"{magic}\n{width} {height}\n{maxval}\n".encode()
        return header + out.tobytes()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake(p: bytes) -> bytes:
                if not p:
                    return b"\x00" * n_bytes
                reps = (n_bytes // len(p)) + 1
                return (p * reps)[:n_bytes]

            kernel = _resize_real if decode == "real" else fake
            pdf = pdf.assign(
                resized=pdf[payload_col].map(kernel),
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
    (id, frame_idx, frame binary). ``decode='real'`` demuxes raw
    concatenated-netpbm streams (back-to-back P5/P6 images — the
    uncompressed-video container this environment can actually parse):
    each emitted frame is a complete, valid netpbm image, and
    ``every_n_bytes`` becomes every-nth-FRAME. Compressed containers
    (mp4/webm) raise at the ffmpeg/av plug point. The 'fake' slicer
    cuts fixed-size byte windows on the same row-expanding plumbing.
    Scale: output is a generator stage — no buffering of all frames; at
    100 TB keep frame rows co-partitioned with their source by
    repartitioning on id AFTER sampling only if a keyed op follows.
    """
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def _demux_real(p: bytes) -> list[bytes]:
        if p[:2] not in (b"P5", b"P6"):
            raise ValueError(
                f"unsupported video magic {p[:4]!r}: the stdlib demuxer "
                "reads concatenated netpbm streams; plug ffmpeg/av here"
            )
        frames, off = [], 0
        while off < len(p):
            magic, w, h, _mx, hdr = _parse_ppm_header(p[off:])
            ch = 3 if magic == "P6" else 1
            end = off + hdr + w * h * ch
            frames.append(p[off:end])
            off = end
        return frames

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                p = p or b""
                if decode == "real":
                    all_frames = _demux_real(p) if p else []
                    stride = max(1, every_n_bytes)
                    for i, fr in enumerate(all_frames[::stride][:max_frames]):
                        ids.append(int(did))
                        idxs.append(i)
                        frames.append(fr)
                    continue
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(p[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames}).astype(
                {id_col: "int64", "frame_idx": "int32"}
            )

    return df.mapInPandas(_sample, schema=out_schema)
