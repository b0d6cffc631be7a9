"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape matches BASELINE.json's input_hint exactly:
``(repo:string, path:string, commit:string, lang:string, content:string)``.
``path`` plays the reference's *title* role, ``content`` the *body*
(reference scores title×2.0 — ingestion.py:751-752, inverted_index.py:1410).

Generation is seeded (numpy ``default_rng(seed)``) and order-stable so
doc_id assignment, sha256 invariants and rank-identity fixtures are
reproducible.  The term-df distribution is Zipf-skewed: a handful of
stop-word-like tokens land in most documents (exercises build-time
salting), a long tail is rare (exercises IDF pruning and partition
pruning).
"""

from __future__ import annotations

import hashlib

import numpy as np

_LANGS = ["python", "java", "go", "rust", "js", "c", "md", "txt"]
_EXT = {
    "python": "py",
    "java": "java",
    "go": "go",
    "rust": "rs",
    "js": "js",
    "c": "c",
    "md": "md",
    "txt": "txt",
}
_KEYWORDS = [  # high-frequency "stop words" of the synthetic language
    "def", "return", "if", "else", "for", "import", "class", "self",
    "data", "value",
]
_DIRS = ["src", "lib", "core", "util", "io", "net", "test", "api"]


def _vocab(n_terms: int) -> list[str]:
    base = [
        "parse", "token", "index", "merge", "shard", "query", "score",
        "buffer", "stream", "codec", "block", "batch", "spill", "fetch",
        "cache", "flush", "probe", "scan", "emit", "fold",
    ]
    vocab = list(_KEYWORDS)
    i = 0
    while len(vocab) < n_terms:
        stem = base[i % len(base)]
        vocab.append(f"{stem}_{i // len(base)}")
        i += 1
    return vocab[:n_terms]


def synth_corpus(
    n_docs: int = 200,
    seed: int = 42,
    n_terms: int = 1000,
    min_len: int = 5,
    max_len: int = 200,
    n_repos: int = 12,
) -> list[dict]:
    """Rows of (repo, path, commit, lang, content); deterministic in args."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(n_terms), dtype=object)
    # Zipf-ish weights over vocab rank
    ranks = np.arange(1, n_terms + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)

    rows: list[dict] = []
    seen_paths: set[tuple[str, str]] = set()
    for i in range(n_docs):
        repo = f"org{int(rng.integers(0, max(1, n_repos // 3)))}/project{int(rng.integers(0, n_repos))}"
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        length = int(rng.integers(min_len, max_len + 1))
        words = rng.choice(vocab, size=length, p=probs)
        # inject deterministic structure: repeated tokens, adjacent pairs
        if length >= 4 and i % 9 == 0:
            words[1], words[2] = "zqmerge", "zqshard"  # rare phrase material
        if length >= 6 and i % 5 == 0:
            words[3] = words[4]  # tf > 1 adjacency
        content = " ".join(words.tolist())
        if i % 17 == 0:
            content += " naïve_café"  # unicode
        if i % 29 == 0:
            content = "tiny"  # near-empty doc
        d1, d2 = _DIRS[i % len(_DIRS)], _DIRS[(i * 7 + 3) % len(_DIRS)]
        stem = str(vocab[int(rng.integers(0, n_terms))])
        path = f"{d1}/{d2}/{stem}_{i}.{_EXT[lang]}"
        while (repo, path) in seen_paths:  # pragma: no cover
            path = "x/" + path
        seen_paths.add((repo, path))
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": lang,
                "content": content,
            }
        )
    return rows


def corpus_to_tokens(
    rows: list[dict], tokenizer: str = "simplemma"
) -> list[tuple[list[str], list[str]]]:
    """(title_tokens, body_tokens) per row, ordered by (repo, path, commit) —
    the engine's dense doc_id order."""
    from search_engine_spark.functions.tokenizer import tokenize_text

    ordered = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    return [
        (
            tokenize_text(r["path"], tokenizer),
            tokenize_text(r["content"], tokenizer),
        )
        for r in ordered
    ]
