"""Multimodal (binary) column handling for training-data pipelines.

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual media decode is stubbed (codecs aren't in this container) behind
``DECODERS``: a deterministic fake for tests, ``NotImplementedError``
raisers for real formats.

Pattern at scale: binary payloads ride the scan as a single column;
per-batch Python work happens once per Arrow batch (not per row), and
output is metadata-only (never re-emit payload bytes you don't need —
column pruning can then drop the blob for downstream stages).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata emitted per media object.
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height) from the payload hash. Replaces PIL/libvips decode,
    which is unavailable in this container."""
    import hashlib
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 1024, 16 + h[1] % 1024


def _decode_unavailable(_: bytes) -> tuple[int, int]:
    raise NotImplementedError(
        "real media codecs are not available in this environment; "
        "register a decoder in DECODERS to enable this media_type")


DECODERS: dict[str, Callable[[bytes], tuple[int, int]]] = {
    "fake": _decode_fake,
    "image/jpeg": _decode_unavailable,
    "image/png": _decode_unavailable,
    "audio/wav": _decode_unavailable,
    "video/mp4": _decode_unavailable,
}


def extract_media_meta(df: DataFrame, id_col: str, payload_col: str,
                       media_type: str = "fake") -> DataFrame:
    """``mapInPandas`` over Arrow batches: payload → typed metadata.

    Input needs (id_col, payload_col: binary); output is
    MEDIA_META_SCHEMA. One Python roundtrip per Arrow batch.
    """
    decoder = DECODERS[media_type]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [decoder(p) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": media_type,
                "n_bytes": payloads.str.len().astype("int64"),
                "sha": [hashlib.sha256(p).hexdigest() for p in payloads],
                "width": pd.Series([d[0] for d in dims], dtype="int32"),
                "height": pd.Series([d[1] for d in dims], dtype="int32"),
            })

    return df.select(F.col(id_col), F.col(payload_col)) \
             .mapInPandas(fn, MEDIA_META_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, payload_col: str,
                      every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* shape: explodes per-object frame
    indices (metadata-only; decode stubbed). Demonstrates the
    fan-out-then-process partitioning without the codec."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.octet_length(payload_col).alias("n_bytes"))
          .withColumn("n_frames", (F.col("n_bytes") % 300 + 30).cast("int"))
          .withColumn("frame_idx",
                      F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                                           F.lit(every_n))))
          .select("doc_id", "frame_idx")
    )


#: (group, bin 0-15, count) — byte-histogram partials per Arrow batch.
BYTE_HIST_SCHEMA = T.StructType([
    T.StructField("grp", T.StringType()),
    T.StructField("bin", T.IntegerType()),
    T.StructField("cnt", T.LongType()),
])


def byte_histograms(df: DataFrame, group_col: str,
                    payload_col: str) -> DataFrame:
    """REAL (non-stubbed) media feature extraction: 16-bin byte-value
    histogram per group — the codec-free signal layer (magic-byte
    mixes, compression-ratio proxies, corrupt-payload screens) every
    multimodal ingest runs before spending decode CPU.

    Scale shape: the Python stage PRE-AGGREGATES — numpy bincount over
    the whole Arrow batch, emitting at most |groups-in-batch| x 16
    partial rows per batch instead of one row per payload, so the
    shuffle after mapInPandas carries partials, not payloads (the
    map-side-combine pattern, hand-rolled at the Arrow boundary).
    Final groupBy sums partials.
    """
    import numpy as np

    def fn(batches) :
        for pdf in batches:
            out_g, out_b, out_c = [], [], []
            for grp, part in pdf.groupby(group_col, sort=False):
                # null payloads would TypeError inside b"".join and
                # kill the job — exactly the corrupt-input case this
                # screen exists for. Drop them; they contribute no bytes.
                buf = np.frombuffer(
                    b"".join(part[payload_col].dropna()), dtype=np.uint8)
                hist = np.bincount(buf >> 4, minlength=16)
                nz = np.nonzero(hist)[0]
                out_g += [grp] * len(nz)
                out_b += nz.tolist()
                out_c += hist[nz].tolist()
            yield pd.DataFrame({
                "grp": pd.Series(out_g, dtype="object"),
                "bin": pd.Series(out_b, dtype="int32"),
                "cnt": pd.Series(out_c, dtype="int64")})

    partials = (df.select(F.col(group_col), F.col(payload_col))
                  .mapInPandas(fn, BYTE_HIST_SCHEMA))
    return (partials.groupBy("grp", "bin")
                    .agg(F.sum("cnt").alias("cnt")))


def resize_dims(width, height, target: int = 224):
    """Aspect-preserving resize plan in pure integer math (engine- and
    libm-independent): the longer edge maps to ``target``, the shorter
    scales by the same exact ratio via integer division. Returns
    (out_w, out_h) Columns; feed decoded dims, get the resize schedule
    without touching pixels."""
    le = f"greatest({width}, {height})"
    return (F.expr(f"CAST(({target} * {width}) div {le} AS INT)")
             .alias("out_w"),
            F.expr(f"CAST(({target} * {height}) div {le} AS INT)")
             .alias("out_h"))
