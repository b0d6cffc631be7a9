"""Reference-semantics oracle: an independent, single-process, pure-Python
re-implementation of the reference engine's query semantics, used ONLY to
generate rank-identity fixtures for the distributed engine.

Behavioral spec re-implemented (all cites into ``/root/reference``):

* posting build: ``search_engine/ingestion.py:588-632`` (``add_document``) —
  title positions 0..title_len-1, body positions restart at 0
* term fetch + IDF pruning sentinel ``(-1,)``:
  ``search_engine/inverted_index.py:1091-1150`` (threshold 1.5 at :1094);
  phrase fetch without pruning (:1152-1184)
* heap k-way intersection/union, early exit, sentinel filtering:
  ``inverted_index.py:227-533``
* NOT complement (:601-625), phrase adjacency in body OR title
  (:200-225, 681-761)
* evaluator tree walk with its shape quirks (:763-953)
* fielded BM25 k=1.6 b=0.75 title×2.0, IDF-vs-tf zip truncation
  (:1221-1242, 1388-1429, 1726-1746)
* bounded top-k heap with strict-``>`` replacement (:1748-1776)

Pinned deterministic deviations (degenerate paths where the reference's
behavior is a CPython implementation detail or an out-of-bounds access;
each is covered by a fixture and mirrored by the engine):

1. NOT-complement iteration order is ascending doc_id (reference iterates a
   Python ``set``; for the bounded top-k with all-zero scores the kept set
   equals "first 100 ascending", which ascending iteration reproduces).
2. Equal-score ties are ordered by ascending doc_id everywhere.  When the
   *top-k cut itself* falls inside a group of bit-equal scores, the
   reference's selected subset is a heap-array/set-iteration artifact
   (``heapq`` pushes full candidate tuples, then stable-sorts by score
   only, :1776) — e.g. an all-identical-docs corpus returns a permuted,
   arbitrary 10-of-12 subset.  The oracle pins "smallest doc_ids win the
   cut"; the property test compares score sequences exactly and doc-id
   sets per score group except the straddling group, whose reference
   picks are only required to be genuine tied candidates.
3. The all-terms-pruned AND result is empty (the reference propagates a
   ``[-1]`` sentinel into scoring and would index ``document_lengths[-1]``,
   i.e. score a nonexistent doc — ``inverted_index.py:251-252``).
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field

from search_engine_spark.plans.parser import (
    QueryNode,
    SearchMode,
    parse_query,
)

_SENTINEL = (-1,)


@dataclass
class _Posting:
    doc_ids: list[int] = field(default_factory=list)
    tfs_body: list[int] = field(default_factory=list)
    tfs_title: list[int] = field(default_factory=list)
    pos_body: list[list[int]] = field(default_factory=list)
    pos_title: list[list[int]] = field(default_factory=list)


class RefSemIndex:
    """In-memory inverted index with reference-identical query semantics."""

    def __init__(
        self,
        docs: list[tuple[list[str], list[str]]],
        k1: float = 1.6,
        b: float = 0.75,
        title_weight: float = 2.0,
        idf_threshold: float = 1.5,
    ):
        """``docs[i] = (title_tokens, body_tokens)`` for doc_id i."""
        self.k1 = k1
        self.b = b
        self.title_weight = title_weight
        self.idf_threshold = idf_threshold
        self.index: dict[str, _Posting] = {}
        self.doc_lengths: list[int] = []
        self.title_lengths: list[int] = []
        for doc_id, (title_tokens, body_tokens) in enumerate(docs):
            self._add_document(doc_id, title_tokens, body_tokens)
        self.num_docs = len(docs)
        self.avg_doc_length = (
            sum(self.doc_lengths) / self.num_docs if self.num_docs else 0.0
        )
        self.avg_title_length = (
            sum(self.title_lengths) / self.num_docs if self.num_docs else 0.0
        )

    # ----- build (mirror of ingestion.py:588-632) -----

    def _add_document(
        self, doc_id: int, title_tokens: list[str], body_tokens: list[str]
    ) -> None:
        self.doc_lengths.append(len(body_tokens))
        self.title_lengths.append(len(title_tokens))
        for pos, term in enumerate(title_tokens):
            p = self.index.setdefault(term, _Posting())
            if not p.doc_ids or p.doc_ids[-1] != doc_id:
                p.doc_ids.append(doc_id)
                p.tfs_body.append(0)
                p.tfs_title.append(0)
                p.pos_body.append([])
                p.pos_title.append([])
            p.tfs_title[-1] += 1
            p.pos_title[-1].append(pos)
        for pos, term in enumerate(body_tokens):
            p = self.index.setdefault(term, _Posting())
            if not p.doc_ids or p.doc_ids[-1] != doc_id:
                p.doc_ids.append(doc_id)
                p.tfs_body.append(0)
                p.tfs_title.append(0)
                p.pos_body.append([])
                p.pos_title.append([])
            p.tfs_body[-1] += 1
            p.pos_body[-1].append(pos)

    # ----- term fetch (inverted_index.py:1091-1184) -----

    def calculate_idf(self, df: int) -> float:
        return math.log((self.num_docs - df + 0.5) / (df + 0.5))

    def get_docs(self, token: str, enable_threshold: bool = True):
        p = self.index.get(token)
        if p is None:
            return (), (), (), ()
        df = len(p.doc_ids)
        idf = self.calculate_idf(df)
        if enable_threshold and (idf < self.idf_threshold or df == 0):
            return _SENTINEL, _SENTINEL, _SENTINEL, _SENTINEL
        pos_payload = tuple(zip(p.pos_body, p.pos_title))
        return tuple(p.doc_ids), pos_payload, tuple(p.tfs_body), tuple(p.tfs_title)

    def get_docs_phrase(self, token: str):
        return self.get_docs(token, enable_threshold=False)

    # ----- boolean kernels (inverted_index.py:227-625) -----

    @staticmethod
    def _drop_sentinels(doc_ids, pos, tfs, tfs_title):
        kept = [
            i
            for i, dl in enumerate(doc_ids)
            if len(dl) <= 0 or dl[0] != -1
        ]
        n_filtered = len(doc_ids) - len(kept)
        return (
            [doc_ids[i] for i in kept],
            [pos[i] for i in kept],
            [tfs[i] for i in kept],
            [tfs_title[i] for i in kept],
            n_filtered,
        )

    def intersection(self, doc_ids, pos, tfs, tfs_title):
        doc_ids, pos, tfs, tfs_title, n_filtered = self._drop_sentinels(
            doc_ids, pos, tfs, tfs_title
        )
        if n_filtered and not doc_ids:
            return [-1], [[-1]], [[-1]], [[-1]]
        if any(len(dl) <= 0 for dl in doc_ids):
            return [], [[]], [[]], [[]]

        k = len(doc_ids)
        ptr = [0] * k
        heap = [
            (dl[0], i, 0)  # (doc, list idx, element idx) — payload via idx
            for i, dl in enumerate(doc_ids)
        ]
        heapq.heapify(heap)
        out_docs: list[int] = []
        out_pos: list[list] = []
        out_tf: list[list] = []
        out_tf_t: list[list] = []
        run_pos: list = []
        run_tf: list = []
        run_tf_t: list = []
        same = 0
        last = -1
        finished = False
        while heap:
            cur, i, j = heapq.heappop(heap)
            if last == cur:
                same += 1
            else:
                if finished:
                    break
                run_pos, run_tf, run_tf_t = [], [], []
                same = 0
            run_pos.append(pos[i][j])
            run_tf.append(tfs[i][j])
            run_tf_t.append(tfs_title[i][j])
            if same == k - 1:
                out_docs.append(cur)
                out_pos.append(run_pos)
                out_tf.append(run_tf)
                out_tf_t.append(run_tf_t)
            ptr[i] += 1
            last = cur
            if ptr[i] >= len(doc_ids[i]):
                finished = True
                continue
            heapq.heappush(heap, (doc_ids[i][ptr[i]], i, ptr[i]))
        return out_docs, out_pos, out_tf, out_tf_t

    def union(self, doc_ids, pos, tfs, tfs_title):
        doc_ids, pos, tfs, tfs_title, _ = self._drop_sentinels(
            doc_ids, pos, tfs, tfs_title
        )
        k = len(doc_ids)
        ptr = [0] * k
        heap = [(dl[0], i) for i, dl in enumerate(doc_ids) if dl]
        heapq.heapify(heap)
        out_docs: list[int] = []
        out_pos: list[list] = []
        out_tf: list[list] = []
        out_tf_t: list[list] = []
        cur_pos: list = []
        cur_tf: list = []
        cur_tf_t: list = []
        last = -1
        while heap:
            doc, i = heapq.heappop(heap)
            if doc != last:
                if last != -1:
                    out_pos.append(cur_pos)
                    out_tf.append(cur_tf)
                    out_tf_t.append(cur_tf_t)
                last = doc
                out_docs.append(doc)
                cur_pos = [0] * k
                cur_tf = [0] * k
                cur_tf_t = [0] * k
            j = ptr[i]
            cur_pos[i] = pos[i][j]
            cur_tf[i] = tfs[i][j]
            cur_tf_t[i] = tfs_title[i][j]
            ptr[i] += 1
            if ptr[i] < len(doc_ids[i]):
                heapq.heappush(heap, (doc_ids[i][ptr[i]], i))
        if last != -1:
            out_pos.append(cur_pos)
            out_tf.append(cur_tf)
            out_tf_t.append(cur_tf_t)
        return out_docs, out_pos, out_tf, out_tf_t

    def not_statement(self, doc_lists):
        """Complement over all doc ids; pinned ascending order (deviation 1)."""
        if len(doc_lists) == 0:
            docs = list(range(self.num_docs))
            zeros = [0] * len(docs)
            return docs, [-1] * len(docs), zeros, list(zeros)
        excluded = set()
        for dl in doc_lists:
            excluded.update(dl)
        docs = [d for d in range(self.num_docs) if d not in excluded]
        n = len(docs)
        return docs, [[-1] * n], [[0] * n], [[0] * n]

    @staticmethod
    def has_phrase(pos_lists: list[tuple[int, ...]]) -> bool:
        """Cursor sweep asserting adjacent positions
        (inverted_index.py:200-225)."""
        idx = [0] * len(pos_lists)
        found = False
        for _ in range(len(pos_lists[0])):
            for i, pl in enumerate(pos_lists[1:]):
                while pl[idx[i + 1]] <= pos_lists[i][idx[i]]:
                    idx[i + 1] += 1
                    if idx[i + 1] >= len(pl):
                        return False
                if pl[idx[i + 1]] == pos_lists[i][idx[i]] + 1:
                    found = True
                else:
                    found = False
                    break
            if found:
                break
            idx[0] += 1
        return found

    def and_statement(self, doc_lists, pos, tfs, tfs_title):
        if len(doc_lists) == 1 and len(doc_lists[0]) and doc_lists[0][0] == -1:
            return [], [], [], []
        if len(doc_lists) == 1:
            return (
                list(doc_lists[0]),
                list(zip(*pos)),
                list(zip(*tfs)),
                list(zip(*tfs_title)),
            )
        return self.intersection(doc_lists, pos, tfs, tfs_title)

    def or_statement(self, doc_lists, pos, tfs, tfs_title):
        if len(doc_lists) == 1 and len(doc_lists[0]) and doc_lists[0][0] == -1:
            return [], [], [], []
        if len(doc_lists) == 1:
            return (
                list(doc_lists[0]),
                [list(pos[0])],
                [list(tfs[0])],
                [list(tfs_title[0])],
            )
        return self.union(doc_lists, pos, tfs, tfs_title)

    def phrase_statement(self, doc_lists, pos, tfs, tfs_title):
        if len(doc_lists) == 1:
            return list(doc_lists[0]), pos, tfs, tfs_title
        cand_docs, cand_tf, cand_tf_t, cand_pos = self._intersection_phrase(
            doc_lists, pos, tfs, tfs_title
        )
        matched, m_pos, m_tf, m_tf_t = [], [], [], []
        for doc, payload, tf_row, tf_t_row in zip(
            cand_docs, cand_pos, cand_tf, cand_tf_t
        ):
            body_lists = [pb for (pb, pt) in payload]
            title_lists = [pt for (pb, pt) in payload]
            if all(body_lists) and self.has_phrase(body_lists):
                ok = True
            elif all(title_lists) and self.has_phrase(title_lists):
                ok = True
            else:
                ok = False
            if ok:
                matched.append(doc)
                m_pos.append(payload)
                m_tf.append(tf_row)
                m_tf_t.append(tf_t_row)
        return matched, m_pos, m_tf, m_tf_t

    def _intersection_phrase(self, doc_lists, pos, tfs, tfs_title):
        """Same heap merge, payload carried (inverted_index.py:346-455);
        returns (docs, tfs, tfs_title, pos) per reference ordering."""
        docs, m_pos, m_tf, m_tf_t = self.intersection(doc_lists, pos, tfs, tfs_title)
        if docs and docs[0] == -1:  # phrase fetch never yields sentinels
            return [], [[]], [[]], [[]]
        return docs, m_tf, m_tf_t, m_pos

    # ----- evaluator (inverted_index.py:763-953) -----

    def evaluate_subtree(self, node: QueryNode):
        if isinstance(node.value, SearchMode):
            if node.value in (SearchMode.AND, SearchMode.OR):
                l_df, l_docs, l_pos, l_tf, l_tf_t = self.evaluate_subtree(node.left)
                r_df, r_docs, r_pos, r_tf, r_tf_t = self.evaluate_subtree(node.right)
                pos_cols = list(l_pos)
                tf_cols = list(l_tf)
                tf_t_cols = list(l_tf_t)
                if not isinstance(node.left.value, str) and not (
                    node.left.value == SearchMode.NOT
                ):
                    pos_cols = [pos_cols]
                    tf_cols = [tf_cols]
                    tf_t_cols = [tf_t_cols]
                if not isinstance(node.right.value, str) and not (
                    node.right.value == SearchMode.NOT
                ):
                    r_pos = [r_pos]
                    r_tf = [r_tf]
                    r_tf_t = [r_tf_t]
                pos_cols.extend(r_pos)
                tf_cols.extend(r_tf)
                tf_t_cols.extend(r_tf_t)
                dfs = list(l_df) + list(r_df)
                op = (
                    self.and_statement
                    if node.value == SearchMode.AND
                    else self.or_statement
                )
                return (
                    dfs,
                    *op([l_docs, r_docs], pos_cols, tf_cols, tf_t_cols),
                )
            if node.value == SearchMode.NOT:
                l_df, l_docs, *_ = self.evaluate_subtree(node.left)
                return (l_df, *self.not_statement([l_docs]))

        if isinstance(node.value, list):  # phrase leaf
            doc_lists, pos_l, tf_l, tf_t_l, dfs = [], [], [], [], []
            for token in node.value:
                dl, pp, tf, tf_t = self.get_docs_phrase(token)
                doc_lists.append(dl)
                pos_l.append(pp)
                tf_l.append(tf)
                tf_t_l.append(tf_t)
                dfs.append(len(dl))
            return (dfs, *self.phrase_statement(doc_lists, pos_l, tf_l, tf_t_l))

        # term leaf
        dl, pp, tf, tf_t = self.get_docs(node.value)
        return ([len(dl)], dl, [list(pp)], [list(tf)], [list(tf_t)])

    # ----- scoring + top-k (inverted_index.py:1621-1843) -----

    @staticmethod
    def _flatten(items):
        flat = []
        for it in items:
            if isinstance(it, int) or it is None:
                flat.append(it)
            else:
                flat.extend(RefSemIndex._flatten(it))
        return flat

    def _term_weight(self, tf: float, length: int, avg: float) -> float:
        b = self.b
        return tf / (1 - b + b * (length / avg))

    def _fielded(self, idfs, weights) -> float:
        k = self.k1
        score = 0.0
        for idf, w in zip(idfs, weights):
            score += idf * (w * (k + 1)) / (w + k)
        return score

    def search(
        self,
        query_tokens: list[str],
        mode: SearchMode,
        num_candidates: int = 100,
        num_return: int = 10,
    ) -> tuple[int, list[tuple[float, int]]]:
        """Returns (num_matched, [(score, doc_id) ...] length <= num_return)."""
        doc_lists, pos_l, tf_l, tf_t_l, dfs = [], [], [], [], []
        if mode in (SearchMode.AND, SearchMode.OR, SearchMode.NOT, SearchMode.PHRASE):
            fetch = self.get_docs_phrase if mode == SearchMode.PHRASE else self.get_docs
            for token in query_tokens:
                dl, pp, tf, tf_t = fetch(token)
                doc_lists.append(dl)
                pos_l.append(pp)
                tf_l.append(tf)
                tf_t_l.append(tf_t)
                dfs.append(len(dl))

        if mode == SearchMode.AND:
            docs, m_pos, m_tf, m_tf_t = self.and_statement(
                doc_lists, pos_l, tf_l, tf_t_l
            )
        elif mode == SearchMode.OR:
            docs, m_pos, m_tf, m_tf_t = self.or_statement(
                doc_lists, pos_l, tf_l, tf_t_l
            )
        elif mode == SearchMode.NOT:
            docs, m_pos, m_tf, m_tf_t = self.not_statement(doc_lists)
        elif mode == SearchMode.PHRASE:
            docs, m_pos, m_tf, m_tf_t = self.phrase_statement(
                doc_lists, pos_l, tf_l, tf_t_l
            )
        elif mode == SearchMode.QUERY_EVALUATOR:
            root = parse_query(query_tokens)
            dfs, docs, m_pos, m_tf, m_tf_t = self.evaluate_subtree(root)
        else:  # pragma: no cover
            raise ValueError(f"unsupported mode {mode}")

        # pinned deviation 3: all-pruned sentinel result -> empty
        if len(docs) == 1 and docs[0] == -1:
            return 0, []

        # shape fixes (inverted_index.py:1715-1722)
        if len(m_tf) == 1 and len(docs) != 1:
            m_tf = list(zip(*m_tf))
        if len(m_tf_t) == 1 and len(docs) != 1:
            m_tf_t = list(zip(*m_tf_t))

        idf_per_token = [self.calculate_idf(df) for df in dfs]

        scored: list[tuple[float, int]] = []
        for doc_id, tf_row, tf_t_row in zip(docs, m_tf, m_tf_t):
            tf_flat = self._flatten(tf_row)
            tf_t_flat = self._flatten(tf_t_row)
            dl = self.doc_lengths[doc_id]
            tl = self.title_lengths[doc_id]
            w_body = [self._term_weight(tf, dl, self.avg_doc_length) for tf in tf_flat]
            w_title = [
                self._term_weight(tf, tl, self.avg_title_length) for tf in tf_t_flat
            ]
            w = [
                wb + self.title_weight * wt for wb, wt in zip(w_body, w_title)
            ]
            score = self._fielded(idf_per_token, w)
            scored.append((score, doc_id))

        # bounded top-k; pinned deviation 2: (-score, doc_id) ordering
        scored.sort(key=lambda x: (-x[0], x[1]))
        top = scored[:num_candidates][:num_return]
        return len(docs), top

    def search_text(self, query: str, mode: SearchMode, **kw):
        from search_engine_spark.functions.tokenizer import tokenize_text

        return self.search(tokenize_text(query), mode, **kw)
