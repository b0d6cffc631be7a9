"""Trigram extraction + edit distance for spelling correction.

``get_trigrams_from_token`` reproduces the reference's sliding extraction
with ``$`` boundary markers (``/root/reference/search_engine/utils.py:
15-43``): "abc" -> {"$ab", "abc", "bc$"}; single-char "a" -> {"$a$"};
"ab" -> {"$ab", "ab$"}.

``levenshtein`` is a plain DP edit distance standing in for the
``editdistance`` package the reference uses (inverted_index.py:1029).
"""

from __future__ import annotations


def get_trigrams_from_token(token: str) -> set[str]:
    n = len(token)
    if n == 0:
        return set()
    if n == 1:
        return {"$" + token + "$"}
    out = {"$" + token[:2]}
    for i in range(n - 2):
        out.add(token[i : i + 3])
    out.add(token[n - 2 :] + "$")
    return out


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]
