"""HTTP serving layer: a warm engine behind ThreadingHTTPServer answers
/search with results identical to the direct SearchEngine call (the
parity the reference's web.py has with its CLI)."""

from __future__ import annotations

import json
import threading
import urllib.parse
import urllib.request

import pytest

from search_engine_spark.build.builder import IndexBuilder
from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.parser import SearchMode
from search_engine_spark.query.engine import SearchEngine
from search_engine_spark.serve import SearchService, make_server
from search_engine_spark.testing.synth import synth_corpus

CFG = EngineConfig(chunk_docs=64, chunks_per_batch=2, block_docs=8,
                   n_term_buckets=8)


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("serve")
    index_dir = str(base / "idx")
    corpus_path = str(base / "corpus.parquet")
    corpus = spark.createDataFrame(synth_corpus(n_docs=100, seed=41))
    corpus.select("repo", "path", "commit", "lang", "content").write.parquet(
        corpus_path
    )
    IndexBuilder(spark, index_dir, CFG).build_all(
        spark.read.parquet(corpus_path)
    )
    service = SearchService(spark, index_dir, CFG, corpus_path=corpus_path)
    httpd = make_server(service)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield spark, index_dir, f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def _get(url: str) -> tuple[int, dict]:
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    _spark, _idx, base = served
    code, body = _get(base + "/healthz")
    assert code == 200
    assert body["status"] == "ok" and body["num_docs"] == 100


def test_search_matches_cli_engine(served):
    """Endpoint results == direct SearchEngine.search on the same index
    (the 'identical to cli.py search' bar from the round-2 verdict)."""
    spark, index_dir, base = served
    engine = SearchEngine(spark, index_dir, CFG)
    for query, mode in [
        ("zqmerge", "AND"),
        ("zqmerge zqshard", "OR"),
        ("zqmerge AND ( zqshard OR codec_2 )", "QUERY_EVALUATOR"),
    ]:
        code, body = _get(
            base + "/search?" + urllib.parse.urlencode(
                {"q": query, "mode": mode, "k": 5}
            )
        )
        assert code == 200, body
        want = [
            (r.doc_id, round(r.score, 9), r.rank)
            for r in sorted(
                engine.search(query, SearchMode[mode], num_return=5)
                .collect(),
                key=lambda r: r.rank,
            )
        ]
        got = [
            (r["doc_id"], round(r["score"], 9), r["rank"])
            for r in body["results"]
        ]
        assert got == want, query
        assert body["num_results"] == len(want)
        assert body["took_sec"] >= 0
        # snippets came from the corpus join
        if body["results"]:
            assert "snippet" in body["results"][0]


def test_bad_requests(served):
    _spark, _idx, base = served
    code, body = _get(base + "/search")  # missing q
    assert code == 400 and "q" in body["error"]
    code, body = _get(base + "/search?q=x&mode=NOPE")
    assert code == 400 and "NOPE" in body["error"]
    code, _body = _get(base + "/nothere")
    assert code == 404


def test_concurrent_requests(served):
    """Thread-per-request against one engine: Spark job submission is
    thread-safe; all responses must be complete and consistent."""
    _spark, _idx, base = served
    results: list[dict] = []
    errs: list[Exception] = []

    def hit():
        try:
            code, body = _get(
                base + "/search?q=zqmerge&mode=AND&k=3"
            )
            assert code == 200
            results.append(body)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(results) == 4
    first = [(r["doc_id"], r["rank"]) for r in results[0]["results"]]
    for body in results[1:]:
        assert [(r["doc_id"], r["rank"]) for r in body["results"]] == first


def test_result_cache_hits_and_k_semantics(served):
    """The snapshot-scoped result cache: a repeated (query, mode) costs
    zero Spark jobs and returns identical rows; a smaller k is served as
    the cached prefix; a larger k misses and recomputes deeper."""
    spark, index_dir, _base = served
    svc = SearchService(spark, index_dir, CFG)
    calls = []
    orig = svc.engine.search_batch

    def counting(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    svc.engine.search_batch = counting
    first = svc.search({"q": "zqmerge zqshard", "mode": "OR", "k": 5})
    assert len(calls) == 1
    again = svc.search({"q": "zqmerge zqshard", "mode": "OR", "k": 5})
    assert len(calls) == 1  # cache hit: no new Spark batch
    assert again["results"] == first["results"]
    # smaller k = prefix of the cached result, still no new job
    k2 = svc.search({"q": "zqmerge zqshard", "mode": "OR", "k": 2})
    assert len(calls) == 1
    assert k2["results"] == first["results"][:2]
    # larger k misses (cached depth insufficient) and recomputes
    k9 = svc.search({"q": "zqmerge zqshard", "mode": "OR", "k": 9})
    assert len(calls) == 2
    assert [r["doc_id"] for r in k9["results"][:5]] == [
        r["doc_id"] for r in first["results"]
    ]
    # ...after which the deeper entry serves the old k again
    svc.search({"q": "zqmerge zqshard", "mode": "OR", "k": 5})
    assert len(calls) == 2


def test_result_cache_disabled(served):
    spark, index_dir, _base = served
    svc = SearchService(spark, index_dir, CFG, result_cache_size=0)
    calls = []
    orig = svc.engine.search_batch

    def counting(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    svc.engine.search_batch = counting
    r1 = svc.search({"q": "zqmerge", "mode": "AND", "k": 3})
    r2 = svc.search({"q": "zqmerge", "mode": "AND", "k": 3})
    assert len(calls) == 2  # every request pays a job when disabled
    assert r1["results"] == r2["results"]


def test_micro_batch_mixed_k_and_bad_query_isolation(served):
    """Concurrent requests ride one micro-batched search_batch job; a
    request's k is honored via the rank<=k prefix even when batch-mates
    asked for more, and a malformed query in the batch fails ALONE (the
    batcher re-runs the batch solo on failure) while its mates still get
    full results."""
    _spark, _idx, base = served
    out: dict[int, tuple[int, dict]] = {}

    reqs = [
        ("zqmerge", "AND", 2),
        ("zqmerge zqshard", "OR", 5),
        (")zqmerge(", "QUERY_EVALUATOR", 3),  # mismatched parens: raises
        ("zqmerge", "AND", 5),
    ]

    def hit(i, q, mode, k):
        out[i] = _get(
            base + "/search?" + urllib.parse.urlencode(
                {"q": q, "mode": mode, "k": k}
            )
        )

    threads = [
        threading.Thread(target=hit, args=(i, *r))
        for i, r in enumerate(reqs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # the malformed query fails alone
    assert out[2][0] in (400, 500)
    # k=2 is the prefix of the same query's k=5 result
    assert out[0][0] == 200 and out[3][0] == 200
    top2 = [(r["doc_id"], r["rank"]) for r in out[0][1]["results"]]
    top5 = [(r["doc_id"], r["rank"]) for r in out[3][1]["results"]]
    assert len(top2) <= 2 and top5[: len(top2)] == top2
    assert out[1][0] == 200 and len(out[1][1]["results"]) <= 5
    # every good response carries snippets from the corpus join
    for i in (0, 1, 3):
        if out[i][1]["results"]:
            assert "snippet" in out[i][1]["results"][0]
