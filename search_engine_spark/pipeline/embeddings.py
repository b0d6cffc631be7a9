"""Embedding ingestion (reference B13) — Spark twin of
``/root/reference/search_engine/embedding_ingestion_nomic.py:48-130``:

``"search_document: " + title + body`` (:109) -> batch encode (:48-52)
-> layer-norm (:53) -> Matryoshka truncate (:54) -> L2-normalize (:55)
-> persist.

The *encoder* is the only part that needs a model: it runs as a batched
``mapInPandas`` stage (Arrow batches sub-sliced to ``batch_size``, the
reference's model-memory knob).  sentence-transformers/torch are not in
this container, so the model slot is pluggable — :func:`get_encoder`
returns the deterministic md5 fake (hash-replicable in the DuckDB
contract oracle) and raises ``NotImplementedError`` for real model names,
exactly like the multimodal decode stub.  The normalize/truncate math
runs in the SAME Arrow batch as the encoder (vectorized over rows,
dimension sums accumulated left-to-right so the DuckDB ``list_reduce``
oracle is bit-identical) — expressing per-element layer-norm as nested
JVM higher-order functions was measured 40x slower here: Catalyst
re-inlines the mean/variance aggregates into every element's lambda.

At 10^12 docs this is one projection pass: no shuffle, encoder
parallelism == input partitions, output written straight to the
embedding table the ANN indexes (`similarity.LshIndex`/`IvfIndex`) are
built from.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PREFIX = "search_document: "  # embedding_ingestion_nomic.py:109
LAYER_NORM_EPS = 1e-5                 # torch F.layer_norm default
L2_EPS = 1e-12                        # torch F.normalize default

Encoder = Callable[[list[str]], np.ndarray]


def fake_md5_encoder(model_dim: int = 64) -> Encoder:
    """Deterministic stand-in for a sentence-transformer: component i of a
    text's vector is ``md5(text + '|' + i)``'s first-8-hex int scaled to
    [-0.5, 0.5).  Bit-replicable in SQL (md5 prefix over the same
    concatenation), so the full ingestion chain is hash-checkable."""

    def encode(texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), model_dim), dtype=np.float64)
        for r, t in enumerate(texts):
            for i in range(model_dim):
                h = hashlib.md5(f"{t}|{i}".encode()).hexdigest()[:8]
                out[r, i] = int(h, 16) / 4294967296.0 - 0.5
        return out

    return encode


_ST_MODELS: dict = {}  # per-process model cache (one load per executor)


def sentence_transformer_encoder(model_name: str) -> Encoder:
    """Real encoder seam: lazily loads a sentence-transformers model ON
    FIRST CALL (i.e. on the executor, once per process — the closure
    ships only the model *name*, never model weights), encodes to
    float64.  Importable only on a torch-equipped host; the import lives
    inside the call so building the closure on a bare driver still
    works when executors have the package."""

    def encode(texts: list[str]) -> np.ndarray:
        model = _ST_MODELS.get(model_name)
        if model is None:
            from sentence_transformers import SentenceTransformer

            model = _ST_MODELS[model_name] = SentenceTransformer(model_name)
        out = model.encode(
            texts, convert_to_numpy=True, normalize_embeddings=False
        )
        return np.asarray(out, dtype=np.float64)

    return encode


def get_encoder(model_name: str, model_dim: int = 64) -> Encoder:
    """'fake-md5' -> the deterministic fake; any other name -> the
    sentence-transformers seam (activates without code changes on a
    host that has the package; raises a clear error at encode time
    otherwise)."""
    if model_name == "fake-md5":
        return fake_md5_encoder(model_dim)
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"model {model_name!r} needs sentence-transformers (not in "
            f"this container); pass a custom encoder callable "
            f"(list[str] -> ndarray[n, dim]) instead"
        )
    return sentence_transformer_encoder(model_name)


def encode_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    title_col: str | None = None,
    model_dim: int = 64,
    batch_size: int = 32,
    encoder: Encoder | None = None,
    prefix: str = DEFAULT_PREFIX,
) -> DataFrame:
    """-> (id, raw: array<double> length ``model_dim``) — the batched
    encode stage.  Rows reach the encoder in Arrow batches further sliced
    to ``batch_size`` texts per call (reference batch loop,
    embedding_ingestion_nomic.py:112-130)."""
    encoder = encoder or fake_md5_encoder(model_dim)
    title = F.coalesce(F.col(title_col), F.lit("")) if title_col else F.lit("")
    src = df.select(
        F.col(id_col).alias("id"),
        F.concat(F.lit(prefix), title, F.col(body_col)).alias("_enc_text"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf["_enc_text"].tolist()
            vecs = []
            for lo in range(0, len(texts), batch_size):
                vecs.append(encoder(texts[lo : lo + batch_size]))
            mat = np.concatenate(vecs, axis=0)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "raw": list(mat)}
            )

    return src.mapInPandas(run, _out_schema(df, id_col, "raw"))


def _out_schema(df: DataFrame, id_col: str, vec_col: str):
    """(id: <source id type>, <vec_col>: array<double>) — ids keep their
    input type (string paths work as well as int doc ids)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField(vec_col, T.ArrayType(T.DoubleType())),
        ]
    )


def _seq_row_sum(mat: np.ndarray) -> np.ndarray:
    """Row-wise sum with strict left-to-right accumulation over the
    dimension axis (vectorized over rows) — the order the DuckDB oracle's
    ``list_reduce`` uses."""
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    for j in range(mat.shape[1]):
        acc += mat[:, j]
    return acc


def postprocess(
    mat: np.ndarray,
    truncate_dim: int,
    ln_eps: float = LAYER_NORM_EPS,
    l2_eps: float = L2_EPS,
) -> np.ndarray:
    """layer-norm (torch ``F.layer_norm``: biased variance, eps inside
    sqrt) -> Matryoshka truncate -> L2-normalize, per row
    (embedding_ingestion_nomic.py:53-55)."""
    dim = mat.shape[1]
    mean = _seq_row_sum(mat) / float(dim)
    centered = mat - mean[:, None]
    var = _seq_row_sum(centered * centered) / float(dim)
    ln = centered / np.sqrt(var + ln_eps)[:, None]
    tr = ln[:, :truncate_dim]
    norm = np.sqrt(_seq_row_sum(tr * tr))
    return tr / np.maximum(norm, l2_eps)[:, None]


def embed_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    body_col: str = "text",
    title_col: str | None = None,
    model_dim: int = 64,
    truncate_dim: int = 32,
    batch_size: int = 32,
    encoder: Encoder | None = None,
    prefix: str = DEFAULT_PREFIX,
) -> DataFrame:
    """Full ingestion chain -> (id, embedding: array<double> length
    ``truncate_dim``, unit L2 norm).  One projection pass: encode and
    post-process share the Arrow batch."""
    encoder = encoder or fake_md5_encoder(model_dim)
    title = F.coalesce(F.col(title_col), F.lit("")) if title_col else F.lit("")
    src = df.select(
        F.col(id_col).alias("id"),
        F.concat(F.lit(prefix), title, F.col(body_col)).alias("_enc_text"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf["_enc_text"].tolist()
            vecs = []
            for lo in range(0, len(texts), batch_size):
                vecs.append(encoder(texts[lo : lo + batch_size]))
            mat = postprocess(np.concatenate(vecs, axis=0), truncate_dim)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "embedding": list(mat)}
            )

    return src.mapInPandas(run, _out_schema(df, id_col, "embedding"))
