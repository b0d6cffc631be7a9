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


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-batch fake decode: one buffer concatenation + segmented
    reductions (``np.*.reduceat``) instead of a per-payload Python loop —
    bit-identical to :func:`_fake_decode` applied row-wise (tested), in
    the same in-batch-kernel style as the dedup signature kernels."""
    bufs = [bytes(b) for b in pdf["payload"]]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    offsets = np.zeros(len(bufs), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    nonempty = lens > 0
    # byte sums are exact integers (< 2**53), so the segmented reduction
    # order can't diverge from np.mean's pairwise summation
    sums = np.zeros(len(bufs), dtype=np.int64)
    mins = np.zeros(len(bufs), dtype=np.float64)
    maxs = np.zeros(len(bufs), dtype=np.float64)
    if cat.size:
        # reduceat misbehaves on zero-length segments (returns the element
        # at the offset); compute on the nonempty segments only
        ne_off = offsets[nonempty]
        sums[nonempty] = np.add.reduceat(cat.astype(np.int64), ne_off)
        mins[nonempty] = np.minimum.reduceat(cat, ne_off).astype(np.float64)
        maxs[nonempty] = np.maximum.reduceat(cat, ne_off).astype(np.float64)
    means = np.divide(
        sums.astype(np.float64),
        lens.astype(np.float64),
        out=np.zeros(len(bufs)),
        where=nonempty,
    )
    f0 = lens.astype(np.float64) / 1000.0
    f0[~nonempty] = 0.0
    return pd.DataFrame(
        {
            "id": pdf["id"].astype("int64").to_numpy(),
            "n_bytes": lens,
            "width": lens % 256,
            "height": (lens // 256) % 256,
            "feat": [
                [float(a), float(b), float(c), float(d)]
                for a, b, c, d in zip(f0, means, mins, maxs)
            ],
        }
    )


def decode_features(binary_df: DataFrame, decoder: str = "auto") -> DataFrame:
    """mapInPandas batch decoder -> DECODE_SCHEMA.

    ``decoder``: ``"auto"`` uses PIL when importable, else the
    deterministic fake; ``"pil"`` requires PIL (raises otherwise);
    ``"fake"`` pins the SQL-replicable fake (the contract oracle pins
    this so its hashes don't depend on the host's libraries).  Batches
    arrive as Arrow; the PIL path loops per payload (image decoding is
    inherently per-object), the fake path runs whole-batch segmented
    numpy reductions.
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
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not use_pil:
                yield _fake_decode_batch(pdf)
                continue
            rows = []
            for id_, buf in zip(pdf["id"], pdf["payload"]):
                n, w, h, feat = _pil_decode(bytes(buf))
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
