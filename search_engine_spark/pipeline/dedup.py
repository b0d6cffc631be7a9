"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All hash functions are built from ``md5`` prefixes so the DuckDB oracle can
replicate them bit-for-bit (both engines produce identical lowercase-hex
md5).  Shingle hash x = first 8 hex chars of md5 as int (< 2^32); MinHash
permutations are ``(a_i * x + b_i) mod p`` with p prime > 2^32 and (a_i,
b_i) from a fixed seeded table — products stay < 2^52, exact in int64 and
in DuckDB's BIGINT.

Scale notes (100 TB design):
* signatures/bands are one narrow projection pass (no shuffle);
* candidate pairs come from a shuffle on the band key — band buckets are
  the unit of work.  Degenerate buckets (web boilerplate: empty files,
  license headers) are **dropped** above ``max_bucket_size`` before the
  self-join: AQE skew-splitting rebalances tasks but cannot shrink the
  O(b^2) join *output*, and the identical-content mass such buckets hold
  is already captured by ``exact_dup_groups``
  (``oversize_band_buckets`` reports what was dropped);
* verification joins are semi-joins on (id1, id2) candidate keys only —
  never an O(n^2) cross join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MINHASH_P = 4294967311  # prime > 2^32
TOKEN_RE = "[a-z0-9_]+"


def minhash_params(n_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 20, size=n_hashes)
    b = rng.integers(0, 1 << 20, size=n_hashes)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def tokens_col(text_col: str):
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")


def raw_shingles_col(text_col: str, k: int):
    """k-gram word shingles as strings (space-joined), in document order."""
    toks = tokens_col(text_col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )


def shingles_col(text_col: str, k: int):
    """Distinct k-gram word shingles as strings (space-joined)."""
    return F.array_distinct(raw_shingles_col(text_col, k))


def _shingle_hash(s):
    """First 8 md5 hex chars as int64 (< 2^32)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content md5 -> (content_md5, n_docs,
    keep_id = min id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def minhash_sig_col(text_col: str, n_hashes: int, shingle_k: int, seed: int):
    """JVM-expression SPECIFICATION of the signature function (the DuckDB
    contract oracle mirrors this).  Do NOT use it on large frames:
    Catalyst re-inlines the shared shingle/token subtrees into every
    per-element lambda — the tokenizer regex and md5 run once per
    (shingle x hash) instead of once per doc, measured ~1000x slower at
    100k+ rows.  ``minhash_signatures`` evaluates the bit-identical
    in-batch kernel instead (integer md5-prefix + (a*x+b) mod p math is
    exact in both runtimes)."""
    params = minhash_params(n_hashes, seed)
    sh = shingles_col(text_col, shingle_k)
    xs = F.transform(sh, _shingle_hash)
    return F.array(
        *[
            F.array_min(
                F.transform(xs, lambda x: (a * x + b) % F.lit(MINHASH_P))
            )
            for a, b in params
        ]
    )


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, sh: array<string> distinct shingles) via one in-batch pass —
    the set twin of ``shingles_col`` without the per-element re-inline
    cost (element order differs; all consumers are set operations)."""
    import re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    token_re = re.compile(TOKEN_RE)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "sh": [
                        sorted(_py_shingles(t, k, token_re))
                        for t in pdf[text_col]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("sh", T.ArrayType(T.StringType())),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def _py_shingles(text: str, k: int, token_re) -> set[str]:
    """Python twin of ``shingles_col``: positions 0..max(n-k, 0) of the
    token list (short docs yield their full token run; empty docs yield
    the empty-string shingle), distinct."""
    toks = token_re.findall(text.lower()) if text is not None else []
    upper = max(len(toks) - k, 0)
    return {" ".join(toks[i : i + k]) for i in range(upper + 1)}


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """-> (id, sig: array<long> length n_hashes).  One Arrow-batched
    projection pass; bit-identical to :func:`minhash_sig_col` (asserted
    in tests) but evaluated in-batch — shingling and hashing run once
    per doc instead of once per (shingle x hash)."""
    import hashlib
    import re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    params = minhash_params(n_hashes, seed)
    ab = np.array(params, dtype=np.int64)  # (n_hashes, 2)
    token_re = re.compile(TOKEN_RE)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            sigs = []
            for text in pdf[text_col]:
                sh = _py_shingles(text, shingle_k, token_re)
                xs = np.fromiter(
                    (
                        int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
                # (a*x+b) % p: a < 2^20, x < 2^32 -> product < 2^52, no
                # int64 overflow; min over shingles per hash function
                sigs.append(
                    (
                        (ab[:, :1] * xs[None, :] + ab[:, 1:]) % MINHASH_P
                    ).min(axis=1).tolist()
                )
            yield pd.DataFrame({"id": pdf[id_col], "sig": sigs})

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def _cap_buckets(
    banded: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """Drop band buckets larger than ``max_bucket_size`` before the
    per-bucket self-join.

    A b-row bucket emits O(b^2) candidate pairs; on web-scale boilerplate
    (empty files, license headers) a single bucket can hold 10^7 docs →
    10^14 pair rows, which no amount of AQE skew-splitting can shrink
    (the join *output* is the problem).  The identical-content mass a
    dropped bucket represents is already caught by ``exact_dup_groups``;
    use :func:`oversize_band_buckets` to report what was dropped."""
    if max_bucket_size is None:
        return banded
    w = Window.partitionBy("band_idx", "band_key")
    return (
        banded.withColumn("_n", F.count("*").over(w))
        .where(F.col("_n") <= max_bucket_size)
        .drop("_n")
    )


def _banded_sigs(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    return sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[
                            F.col("sig")[b * rows_per_band + r]
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )


def oversize_band_buckets(
    sigs: DataFrame,
    max_bucket_size: int,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Buckets that :func:`lsh_candidate_pairs` will drop under the given
    cap -> (band_idx, band_key, n_docs) — the skew/coverage report a
    100 TB run should log alongside the dedup output."""
    return (
        _banded_sigs(sigs, bands, rows_per_band)
        .groupBy("band_idx", "band_key")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .where(F.col("n_docs") > max_bucket_size)
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """MinHash-LSH banding -> candidate (id1 < id2) pairs.

    Explodes each signature into ``bands`` (band_idx, band_key) rows, then
    self-joins per bucket — the shuffle key is (band_idx, band_key).
    Buckets over ``max_bucket_size`` rows are dropped first (see
    :func:`_cap_buckets`; the size count reuses the join's own shuffle
    partitioning, so the cap costs no extra exchange).
    """
    banded = _cap_buckets(
        _banded_sigs(sigs, bands, rows_per_band), max_bucket_size
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs -> (id1, id2, jaccard).

    Shingles are computed in-batch (see ``minhash_signatures``) and only
    for docs that appear in a candidate pair (semi-join first): at web
    scale the pair table is orders of magnitude smaller than the corpus,
    and the corpus rows that never made a candidate bucket must not pay
    the shingling pass."""
    cand_ids = (
        pairs.select(F.col("id1").alias("cid"))
        .unionByName(pairs.select(F.col("id2").alias("cid")))
        .distinct()
    )
    needed = df.join(
        cand_ids, F.col(id_col) == F.col("cid"), "left_semi"
    )
    sh = shingle_table(needed, id_col, text_col, shingle_k)
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        pairs.join(a, pairs.id1 == F.col("a.id"))
        .join(b, pairs.id2 == F.col("b.id"))
        .select(
            "id1",
            "id2",
            (
                F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    seed: int = 7,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline -> verified (id1, id2, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k, seed)
    cands = lsh_candidate_pairs(
        sigs, bands, n_hashes // bands, max_bucket_size
    )
    return jaccard_pairs(df, cands, id_col, text_col, shingle_k).where(
        F.col("jaccard") >= threshold
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    seed: int = 11,
    max_bucket_size: int | None = 10_000,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicates: candidates from shared LSH
    sign-bucket (same hyperplane family as ``similarity.LshIndex``), exact
    pairwise cosine inside each bucket, keep pairs >= ``threshold``.

    Same scale shape as the MinHash path: one assignment pass, shuffle on
    the bucket key, per-bucket self-join with the same ``max_bucket_size``
    cap (an all-identical-embedding mass would otherwise emit O(b^2)
    pairs).  Bucket-exact candidates only — at high thresholds
    (near-duplicates, cos ≈ 1) both members of a pair almost surely share
    every hyperplane sign; widen with Hamming-1 probing via
    ``similarity.LshIndex`` if lower thresholds are needed.
    """
    from search_engine_spark.pipeline import similarity

    planes = similarity.hyperplanes(
        int(emb.select(F.size(emb_col)).head()[0]), n_planes, seed
    )
    banded = similarity._with_assignment(
        emb.select(F.col(id_col).alias("id"), F.col(emb_col).alias("e")),
        planes, "lsh", "e", "band_key",
    ).withColumn("band_idx", F.lit(0))
    banded = _cap_buckets(banded, max_bucket_size)
    l, r = banded.alias("l"), banded.alias("r")
    ac = lambda c: F.transform(c, lambda v: v.cast("double"))
    dot = F.aggregate(
        F.zip_with(ac(F.col("l.e")), ac(F.col("r.e")), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(ac(c), F.lit(0.0), lambda a, v: a + v * v)
    )
    return (
        l.join(
            r,
            (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id1"),
            F.col("r.id").alias("id2"),
            (dot / (norm(F.col("l.e")) * norm(F.col("r.e")))).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def components_two_phase(
    pairs: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    O(log n) rounds regardless of graph diameter, the scale path for
    adversarially long chains where min-label propagation needs
    O(diameter) rounds.  Same output contract as
    :func:`dedup_components`: (id, component = min id of the component)
    for every vertex appearing in ``pairs``.

    Each round is two groupBy-min aggregations + joins on the EDGE set
    (never the corpus); per-round ``localCheckpoint`` truncates lineage.

    * large-star: every node's strictly-larger neighbors re-attach to
      ``m(u) = min(Γ(u) ∪ {u})``;
    * small-star: edges directed high→low re-attach each smaller
      neighbor (and the node itself) to the node's minimum neighbor.

    Converges when the edge set is a fixpoint — at that point edges
    form per-component stars (member → root=min).
    """
    # checkpoint the pair table first: edges + vertices reference it
    # three times, and each reference would re-run the full upstream
    # pair pipeline (see dedup_components)
    pairs = pairs.select("id1", "id2").localCheckpoint()
    edges = (
        pairs.select(F.col("id1").alias("u"), F.col("id2").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        pairs.select(F.col("id1").alias("id"))
        .unionByName(pairs.select(F.col("id2").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        both = (
            edges.unionByName(
                edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            .distinct()
        )
        mins = both.groupBy("u").agg(F.min("v").alias("_mn"))
        mins = mins.select(
            "u", F.least(F.col("_mn"), F.col("u")).alias("m")
        )
        lg = (
            both.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        hl = lg.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = hl.groupBy("u").agg(F.min("v").alias("m"))
        sm = (
            hl.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(
                mins2.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        edges = sm.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).localCheckpoint()
        # fixpoint signature: count + order-insensitive XOR of two row
        # hashes (sum would overflow long under ANSI; edges are distinct
        # so XOR never self-cancels)
        sig = edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h1"),
            F.expr("bit_xor(xxhash64(v, u))").alias("h2"),
        ).head()
        sig = (int(sig.n), int(sig.h1 or 0), int(sig.h2 or 0))
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"components_two_phase did not converge in {max_iter} rounds"
        )
    # stars: member -> root; roots get their own (root, root) row, and
    # every pairs-vertex must appear (a vertex can be its own star)
    labels = edges.select(
        F.col("u").alias("id"), F.col("v").alias("component")
    )
    roots = vertices.join(
        labels.select("id"), "id", "left_anti"
    ).select("id", F.col("id").alias("component"))
    return labels.unionByName(roots)


def dedup_components(
    pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Near-dup pairs -> connected components: (id, component) where
    ``component`` is the minimum doc id reachable through the pair graph
    (the canonical "keep" doc of each duplicate cluster).

    Iterative min-label propagation with DataFrame joins: each round every
    vertex takes the min of its own label and its neighbours' labels;
    converges in O(graph diameter) rounds — near-dup clusters are
    star/clique-shaped (banding links everything similar to everything
    similar), so the diameter is tiny.  Each round is one shuffle join +
    one aggregation on the *pair* table (never the corpus); the loop exits
    on a fixpoint check (one count per round).  For adversarially long
    chains at 10^12-doc scale, swap the loop body for the large-star/
    small-star algorithm (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — same join primitives, O(log n) rounds.

    Only vertices that appear in ``pairs`` are emitted (singletons are
    their own trivial components).
    """
    # materialize the PAIR table once, then the symmetric edge set once:
    # the undirected union references ``pairs`` twice, so without the
    # first checkpoint the upstream pair pipeline (MinHash + LSH banding
    # + Jaccard verification — the expensive part) evaluates once per
    # branch, and without the second it would re-run every loop round
    # (measured 2x and 8x slowdowns respectively; the pair table itself
    # is tiny — near-dup pairs, never the corpus)
    pairs = pairs.select("id1", "id2").localCheckpoint()
    edges = (
        pairs.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .union(
            pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    for _ in range(max_iter):
        neighbor = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
        )
        # localCheckpoint truncates the per-round lineage — without it the
        # plan doubles every iteration (use a reliable checkpoint dir on a
        # real cluster for executor-loss tolerance)
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # exhausting max_iter with labels still moving means the graph
        # diameter exceeds the round budget — returning the partial
        # labels silently would look like valid (wrong) components
        raise RuntimeError(
            f"dedup_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or use a "
            f"large-star/small-star variant for long-chain graphs"
        )
    return labels


# ------------------------------------------- representatives / materialize

def representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 25,
) -> DataFrame:
    """Pick ONE canonical document per duplicate cluster — the step that
    turns near-dup *detection* into an actual deduplicated training
    corpus.  Returns ``(id, component, keep)``: one row per document
    that appears in ``pairs``, with ``keep = 1`` for the cluster's
    representative (longest text wins — the most complete version of a
    boilerplate-padded family — ties broken by the smallest id, so the
    choice is deterministic) and ``keep = 0`` for the members it
    supersedes.  Documents in no pair are untouched singletons and are
    not emitted — they are kept implicitly.

    Scale shape: the window runs over the *cluster member* table (dup
    pairs only, never the corpus), and the docs join is a semi-join on
    those member ids — at a typical few-percent dup rate the whole
    operator is corpus-scan + one small shuffle.
    """
    comp = dedup_components(pairs, max_iter=max_iter)
    members = (
        docs.select(
            F.col(id_col).alias("id"), F.length(text_col).alias("_len")
        )
        .join(comp, "id")
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("_len"), F.asc("id")
    )
    return members.select(
        "id",
        "component",
        (F.row_number().over(w) == 1).cast("int").alias("keep"),
    )


def dedup_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 25,
) -> DataFrame:
    """Materialize the deduplicated corpus: ``docs`` minus every
    non-representative duplicate-cluster member (see
    :func:`representatives`).  The drop set is cluster members only —
    tiny next to the corpus — so the anti-join broadcasts under AQE at
    any realistic dup rate; the corpus itself is never shuffled."""
    drop = (
        representatives(docs, pairs, id_col, text_col, max_iter=max_iter)
        .where(F.col("keep") == 0)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------- SimHash

def simhash_col(text_col: str, bits: int = 32):
    """``bits``-bit SimHash over tf-weighted token hashes, pure built-ins.

    Per token: h = 32-bit md5-prefix hash; bit i contributes +tf if set
    else -tf; fingerprint bit i = 1 iff the sum is positive.

    JVM-expression SPECIFICATION only (the DuckDB oracle mirrors it) —
    the per-distinct-token tf filter is O(tokens^2) per doc and Catalyst
    re-inlines the token array into each of the 32 bit sums (measured
    ~100 rows/s at corpus scale).  ``simhash_table`` evaluates the
    bit-identical in-batch kernel instead.
    """
    toks = tokens_col(text_col)
    uniq = F.array_distinct(toks)
    # per distinct token: struct(hash, tf)
    tok_h = F.transform(
        uniq,
        lambda t: F.struct(
            _shingle_hash(t).alias("h"),
            F.size(F.filter(toks, lambda x: x == t)).alias("tf"),
        ),
    )
    # for each bit: sum of +-tf, then set bit if positive
    def bit_sum(i: int):
        return F.aggregate(
            tok_h,
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.when(
                F.shiftright(s["h"], i).bitwiseAND(F.lit(1)) == 1, s["tf"]
            ).otherwise(-s["tf"]),
        )

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.when(bit_sum(i) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def simhash_table(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash) via one in-batch pass — bit-identical to
    :func:`simhash_col` (asserted in tests): same md5-prefix token hash,
    same +-tf bit sums, strict-positive bit rule."""
    import hashlib
    import re
    from collections import Counter
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    token_re = re.compile(TOKEN_RE)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for text in pdf[text_col]:
                toks = token_re.findall(text.lower()) if text else []
                tfs = Counter(toks)
                if not tfs:
                    out.append(0)
                    continue
                hs = np.fromiter(
                    (
                        int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                        for t in tfs
                    ),
                    dtype=np.int64,
                    count=len(tfs),
                )
                tf = np.fromiter(tfs.values(), dtype=np.int64, count=len(tfs))
                # (n_tokens, bits) sign matrix: +tf where bit set, else -tf
                bitset = (hs[:, None] >> np.arange(bits)[None, :]) & 1
                sums = (np.where(bitset == 1, tf[:, None], -tf[:, None])).sum(
                    axis=0
                )
                out.append(
                    int(
                        (
                            (sums > 0).astype(np.int64)
                            << np.arange(bits, dtype=np.int64)
                        ).sum()
                    )
                )
            yield pd.DataFrame({"id": pdf[id_col], "simhash": out})

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("simhash", T.LongType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, schema)


def simhash_near_pairs(
    sims: DataFrame,
    max_hamming: int = 3,
    band_bits: int = 8,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Candidate pairs via 8-bit band blocking, verified by popcount of XOR.
    Band buckets over ``max_bucket_size`` are dropped (see
    :func:`_cap_buckets` for why a cap, not skew-splitting)."""
    n_bands = 32 // band_bits
    banded = _cap_buckets(
        sims.select(
            "id",
            "simhash",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(
                            F.col("simhash"), b * band_bits
                        ).bitwiseAND(F.lit((1 << band_bits) - 1))
                        for b in range(n_bands)
                    ]
                )
            ).alias("band_idx", "band_key"),
        ),
        max_bucket_size,
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id1"),
            F.col("r.id").alias("id2"),
            F.col("l.simhash").alias("s1"),
            F.col("r.simhash").alias("s2"),
        )
        .distinct()
    )
    return cand.select(
        "id1",
        "id2",
        F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).cast("long").alias(
            "hamming"
        ),
    ).where(F.col("hamming") <= max_hamming)
