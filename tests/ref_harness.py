"""Import the reference engine's pure query algorithms for parity testing.

The reference tree at /root/reference is read-only PUBLIC content we treat
as a behavioral oracle.  Its modules import heavy deps (torch, marisa_trie,
sentence_transformers, ...) that are absent here and irrelevant to the pure
heap/scoring algorithms under test, so we stub them in sys.modules before
import, then build an ``InvertedIndex`` instance via ``object.__new__`` whose
I/O methods (``get_docs``/``get_docs_phrase``/``get_pos_offsets``/
``get_doc_info``) are replaced with in-memory equivalents.  Everything else —
intersection/union/not/phrase statements, the evaluator tree walk, shape
fixes, BM25, the bounded top-k heap — runs the reference's own code.
"""

from __future__ import annotations

import math
import sys
import types
from functools import partial

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real-looking spec so later ``import x.y`` probes of an already-
    # stubbed parent don't fail with "x.__spec__ is None" (e.g. pyspark's
    # sklearn feature detection in the same pytest process)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__path__ = []  # mark as package so submodule imports are attempted
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


def load_reference():
    """Returns the reference's inverted_index module (or raises ImportError)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    from search_engine_spark.functions.tokenizer import simplemma_tokenize

    # simplemma.simple_tokenizer operates on already-lowercased text in the
    # reference (preprocessing.py:43); our regex twin stands in for it.
    _stub_module("simplemma", simple_tokenizer=lambda t: simplemma_tokenize(t))
    _stub_module("editdistance", eval=lambda a, b: abs(len(a) - len(b)))
    _stub_module("marisa_trie", RecordTrie=object)
    _stub_module("ordered_set", OrderedSet=set)
    _stub_module("sklearn")
    _stub_module("sklearn.cluster", MiniBatchKMeans=object)
    _stub_module("sentence_transformers", SentenceTransformer=object, util=None)
    torch = _stub_module("torch", no_grad=lambda: None, Tensor=object)
    nn = types.ModuleType("torch.nn")

    class _Module:  # minimal torch.nn.Module stand-in
        def __init__(self, *a, **k):
            pass

    nn.Module = _Module
    nn.Linear = lambda *a, **k: None
    nn.ReLU = lambda *a, **k: None
    nn.Sequential = lambda *a, **k: None
    sys.modules.setdefault("torch.nn", nn)
    torch.nn = nn
    _stub_module("torch.nn.functional")

    import search_engine.inverted_index as ref_ii  # noqa: E402

    return ref_ii


def make_reference_index(docs, k1=1.6, b=0.75, idf_threshold=1.5):
    """Build a reference InvertedIndex over in-memory postings.

    ``docs[i] = (title_tokens, body_tokens)``.
    """
    ref_ii = load_reference()
    idx = object.__new__(ref_ii.InvertedIndex)

    # in-memory postings, built with the same field semantics as
    # ingestion.py:588-632
    postings: dict[str, dict] = {}
    doc_lengths, title_lengths = [], []
    for doc_id, (title_tokens, body_tokens) in enumerate(docs):
        doc_lengths.append(len(body_tokens))
        title_lengths.append(len(title_tokens))
        for pos, term in enumerate(title_tokens):
            p = postings.setdefault(
                term, {"docs": [], "tfb": [], "tft": [], "pb": [], "pt": []}
            )
            if not p["docs"] or p["docs"][-1] != doc_id:
                p["docs"].append(doc_id)
                p["tfb"].append(0)
                p["tft"].append(0)
                p["pb"].append([])
                p["pt"].append([])
            p["tft"][-1] += 1
            p["pt"][-1].append(pos)
        for pos, term in enumerate(body_tokens):
            p = postings.setdefault(
                term, {"docs": [], "tfb": [], "tft": [], "pb": [], "pt": []}
            )
            if not p["docs"] or p["docs"][-1] != doc_id:
                p["docs"].append(doc_id)
                p["tfb"].append(0)
                p["tft"].append(0)
                p["pb"].append([])
                p["pt"].append([])
            p["tfb"][-1] += 1
            p["pb"][-1].append(pos)

    num_docs = len(docs)
    idx.document_lengths = doc_lengths
    idx.title_lengths = title_lengths
    idx.metadata = {
        "num_docs": num_docs,
        "average_doc_length": sum(doc_lengths) / num_docs,
        "average_title_length": sum(title_lengths) / num_docs,
        "max_doc_length": max(doc_lengths),
        "max_title_length": max(title_lengths),
    }
    idx.enable_ranking_model = False
    idx.enable_semantic_search = False
    idx.enable_spelling_correction = False
    idx.calculate_term_weight_body = partial(
        idx.calculate_term_weight, avg_length=idx.metadata["average_doc_length"]
    )
    idx.calculate_term_weight_title = partial(
        idx.calculate_term_weight, avg_length=idx.metadata["average_title_length"]
    )

    def get_docs(token, idf_threshold_=idf_threshold, enable_threshold=True):
        p = postings.get(token)
        if p is None:
            return (), (), (), ()
        df = len(p["docs"])
        idf = math.log((num_docs - df + 0.5) / (df + 0.5))
        if enable_threshold and (idf < idf_threshold_ or df == 0):
            s = tuple([-1])
            return s, s, s, s
        payload = tuple(zip(p["pb"], p["pt"]))
        return tuple(p["docs"]), payload, tuple(p["tfb"]), tuple(p["tft"])

    def get_docs_phrase(token):
        return get_docs(token, enable_threshold=False)

    def get_pos_offsets(pos_tokens_per_doc, tfs_per_doc, tfs_title_per_doc):
        body_out, title_out = [], []
        for d, payload_row in enumerate(pos_tokens_per_doc):
            body_row, title_row = [], []
            for t, payload in enumerate(payload_row):
                tf = tfs_per_doc[d][t]
                tft = tfs_title_per_doc[d][t]
                body_row.append(tuple(payload[0]) if tf else tuple())
                title_row.append(tuple(payload[1]) if tft else tuple())
            body_out.append(body_row)
            title_out.append(title_row)
        return body_out, title_out

    def get_doc_info(doc_id, snippet_length):
        return ref_ii.DocumentInfo(str(doc_id), "", "", "")

    idx.get_docs = get_docs
    idx.get_docs_phrase = get_docs_phrase
    idx.get_pos_offsets = get_pos_offsets
    idx.get_doc_info = get_doc_info
    return idx, ref_ii
