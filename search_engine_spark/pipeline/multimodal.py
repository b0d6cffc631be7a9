"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted via Arrow-batched ``mapInPandas``.

The image/audio libraries are not present in this container, so the
*decode* step is stubbed: ``decode_features`` applies a deterministic fake
decoder (documented, SQL-replicable) unless a real decoder import
succeeds; ``sample_frames`` raises ``NotImplementedError`` unless the
deterministic fake is requested.  The Spark-side plumbing — binary column
schema, Arrow batch shape, partition-parallel mapInPandas, typed output
schema — is real and tested; swapping in PIL/ffmpeg is a one-function
change inside the batch iterator.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "id long, n_bytes long, width long, height long, feat array<double>"
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Treat content as an opaque binary payload + typed metadata struct —
    the storage shape an image/audio corpus table would use."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _fake_decode(buf: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decode: pretend the payload is a
    (width x height) raster derived from its length, with a 4-dim feature
    vector from simple byte statistics."""
    n = len(buf)
    width = n % 256
    height = (n // 256) % 256
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size:
        feat = [
            float(n) / 1000.0,
            float(arr.mean()),
            float(arr.min()),
            float(arr.max()),
        ]
    else:
        feat = [0.0, 0.0, 0.0, 0.0]
    return n, width, height, feat


def _pil_decode(buf: bytes) -> tuple[int, int, int, list[float]]:
    """Real image decode (activates on any PIL-equipped host): open the
    payload, report true raster dims, and a 4-dim byte/pixel stat
    feature.  Import inside so only executors with PIL run it."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(buf)) as im:
        w, h = im.size
        arr = np.asarray(im.convert("L"), dtype=np.float64)
    return (
        len(buf),
        int(w),
        int(h),
        [len(buf) / 1000.0, float(arr.mean()), float(arr.min()),
         float(arr.max())],
    )


def decode_features(binary_df: DataFrame, decoder: str = "auto") -> DataFrame:
    """mapInPandas batch decoder -> DECODE_SCHEMA.

    ``decoder``: ``"auto"`` uses PIL when importable, else the
    deterministic fake; ``"pil"`` requires PIL (raises otherwise);
    ``"fake"`` pins the SQL-replicable fake (the contract oracle pins
    this so its hashes don't depend on the host's libraries).  Batches
    arrive as Arrow; the loop is per payload (decoding is inherently
    per-object) but all statistics are numpy-vectorized per payload.
    """
    if decoder not in ("auto", "pil", "fake"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = False
        if decoder in ("auto", "pil"):
            try:
                from PIL import Image  # noqa: F401

                use_pil = True
            except ImportError:
                if decoder == "pil":
                    raise NotImplementedError(
                        "decoder='pil' requires the PIL package"
                    )
        decode = _pil_decode if use_pil else _fake_decode
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for id_, buf in zip(pdf["id"], pdf["payload"]):
                n, w, h, feat = decode(bytes(buf))
                rows.append((int(id_), n, w, h, feat))
            yield pd.DataFrame(
                rows, columns=["id", "n_bytes", "width", "height", "feat"]
            )

    return binary_df.select("id", "payload").mapInPandas(mapper, DECODE_SCHEMA)


def sample_frames(
    binary_df: DataFrame, n_frames: int = 4, deterministic_fake: bool = False
) -> DataFrame:
    """Video frame sampling stub.  Real implementation needs ffmpeg/av —
    not available in this container."""
    if not deterministic_fake:
        raise NotImplementedError(
            "frame sampling requires an av/ffmpeg decoder; pass "
            "deterministic_fake=True for the plumbing-test path"
        )
    # fake: frame f's "offset" is a deterministic slice position
    return binary_df.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_frames - 1)),
                lambda f: F.substring(
                    F.col("payload").cast("string"), f * 16 + 1, 16
                ),
            )
        ).alias("frame_idx", "frame_sample"),
    )
