"""HTTP serving layer — twin of the reference's web UI
(``/root/reference/web.py:1-47``): a long-lived process holds ONE warm
index (the reference's ``@st.cache_resource create_index``) and answers
search requests with ranked results, snippets, and wall-clock timing.

The reference serves streamlit; neither streamlit nor FastAPI ships in
this container, so the twin is a dependency-free stdlib
``ThreadingHTTPServer`` speaking JSON — the part that matters for parity
is the warm-engine request loop, not the widget toolkit.  Endpoints:

* ``GET /search?q=<query>&mode=<MODE>&k=<n>&rerank=0|1`` ->
  ``{"num_results": n, "took_sec": t, "results": [...]}`` — results
  identical to ``cli.py search`` on the same index (same SearchEngine
  call path).
* ``GET /healthz`` -> collection stats + config echo (liveness probe).

Serving economics vs the CLI: every ``cli.py search`` pays SparkSession
startup plus first-touch index metadata reads (~seconds); here both are
paid once at bind time, so per-request cost is just the query jobs.  On
a cluster the server process IS the Spark driver — executors stay
allocated between requests (use dynamic allocation to shrink an idle
pool).

Concurrent requests are MICRO-BATCHED: every Spark action pays a
job-scheduling floor (~0.1 s at 40k docs, ~1.5 s/query at 20M docs
single-shot vs 0.29 s/query when 64 queries share one ``search_batch``
cogroup job), so one job per HTTP request caps throughput at
1/floor regardless of cluster size.  ``_MicroBatcher`` funnels requests
through a single worker that drains everything queued at the moment it
becomes free into ONE ``search_batch`` + ONE ``with_doc_info`` job —
zero added latency when idle (a lone request is a batch of one), full
coalescing under load (while a batch runs, arrivals pile up and ride
the next one).  Per-request results are identical to the solo path:
``search_batch`` funnels through the same compile/execute pipeline with
qid = batch position, and a request asking for a smaller k than its
batch-mates takes the rank <= k prefix (top-k is rank-stable in k).
Rerank requests keep the solo path (the MLP stage is per-query).
"""

from __future__ import annotations

import json
import queue as _queue
import threading
import time
from collections import defaultdict
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.parser import SearchMode
from search_engine_spark.query.engine import SearchEngine


class _MicroBatcher:
    """Coalesce concurrent (query, mode, k) requests into one
    ``search_batch`` job per worker wake-up.  A failed batch falls back
    to per-request solo execution so one malformed query can't poison
    its batch-mates' responses."""

    def __init__(
        self,
        service: "SearchService",
        max_batch: int = 64,
        window_sec: float = 0.02,
        workers: int = 3,
    ):
        self._service = service
        self._max_batch = max_batch
        # a few workers, not one: a request that arrives just after a
        # batch departs would otherwise serialize behind that batch's
        # whole job.  2-3 overlapping batch jobs keep the scheduler fed
        # (Spark job submission is thread-safe) while each job still
        # amortizes its floor over everything queued at its wake-up.
        self._workers = workers
        # short gather window after the first request: concurrent clients
        # never hit the queue at the exact same instant, and without the
        # window the worker wakes on the first arrival and runs a batch
        # of 1-2 while the rest are still in-flight — fragmenting what
        # should be one job into several.  20 ms is noise against the
        # ~0.1 s+ Spark job floor it saves.
        self._window_sec = window_sec
        self._q: _queue.Queue = _queue.Queue()
        self._start_lock = threading.Lock()
        self._thread: threading.Thread | None = None

    def submit(self, query: str, mode: SearchMode, k: int) -> list:
        """Block until this request's result rows are ready."""
        if self._thread is None:
            with self._start_lock:
                if self._thread is None:
                    ts = [
                        threading.Thread(target=self._loop, daemon=True)
                        for _ in range(self._workers)
                    ]
                    for t in ts:
                        t.start()
                    self._thread = ts[0]
        fut: Future = Future()
        self._q.put((query, mode, k, fut))
        return fut.result()

    def _loop(self) -> None:
        while True:
            batch = [self._q.get()]  # block for the first request
            # gather until the window closes or the batch is full; while
            # a batch's job runs, later arrivals pile up and are drained
            # instantly at the next wake-up
            deadline = time.time() + self._window_sec
            while len(batch) < self._max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except _queue.Empty:
                    break
            self._run(batch)

    def _run(self, batch: list) -> None:
        eng = self._service.engine
        try:
            kmax = max(k for _q2, _m, k, _f in batch)
            # concurrent clients often ask the same thing — compile and
            # score each DISTINCT (query, mode) once, fan results back out
            uniq: dict[tuple, int] = {}
            for q, m, _k, _f in batch:
                uniq.setdefault((q, m), len(uniq))
            ranked = eng.search_batch(
                list(uniq), num_return=kmax
            )
            rows = eng.with_doc_info(ranked, self._service.corpus).collect()
            by_qid: dict[int, list] = defaultdict(list)
            for r in rows:
                by_qid[r.qid].append(r)
            for q, m, k, fut in batch:
                qid = uniq[(q, m)]
                fut.set_result([r for r in by_qid[qid] if r.rank <= k])
        except Exception:
            # isolate the failure: re-run each request solo and let the
            # offender (e.g. a parse error) fail alone
            for q, m, k, fut in batch:
                try:
                    rows = eng.with_doc_info(
                        eng.search(q, m, num_return=k), self._service.corpus
                    ).collect()
                    fut.set_result(rows)
                except Exception as exc:
                    fut.set_exception(exc)


class SearchService:
    """Warm-engine request handler core, HTTP-free (testable directly)."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        config: EngineConfig | None = None,
        corpus_path: str | None = None,
        model_path: str | None = None,
    ):
        self.engine = SearchEngine(spark, index_dir, config)
        self.corpus = (
            spark.read.parquet(corpus_path) if corpus_path else None
        )
        self.model = None
        if model_path:
            from search_engine_spark.ranking.model import RankingModel

            self.model = RankingModel.load(model_path)
        self._batcher = _MicroBatcher(self)

    def search(self, params: dict) -> dict:
        query = params.get("q")
        if not query:
            raise ValueError("missing required parameter: q")
        mode_name = params.get("mode", "QUERY_EVALUATOR")
        try:
            mode = SearchMode[mode_name]
        except KeyError:
            raise ValueError(
                f"unknown mode {mode_name!r}; one of "
                f"{[m.name for m in SearchMode if m.name != 'SEMANTIC']}"
            )
        if mode is SearchMode.SEMANTIC:
            raise ValueError(
                "SEMANTIC mode needs a query embedding; use the CLI "
                "(search --mode SEMANTIC) which owns the encoder seam"
            )
        k = int(params.get("k", 10))
        rerank = params.get("rerank", "0") not in ("0", "", "false")
        t0 = time.time()
        if rerank:
            # the MLP rerank stage is per-query — solo path
            ranked = self.engine.search_reranked(
                query, mode, num_return=k, model=self.model
            )
            rows = self.engine.with_doc_info(ranked, self.corpus).collect()
        else:
            rows = self._batcher.submit(query, mode, k)
        took = time.time() - t0
        return {
            "query": query,
            "mode": mode.name,
            "num_results": len(rows),
            "took_sec": round(took, 4),
            "results": [
                {
                    k_: v
                    for k_, v in r.asDict().items()
                    if k_ != "qid" and v is not None
                }
                for r in sorted(rows, key=lambda r: r.rank)
            ],
        }

    def healthz(self) -> dict:
        s = self.engine.stats
        return {
            "status": "ok",
            "num_docs": int(s["num_docs"]),
            "avg_doc_len": float(s["avg_doc_len"]),
            "tokenizer": self.engine.config.tokenizer,
        }


def make_server(
    service: SearchService, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral) and return the server; caller runs
    ``serve_forever`` (or ``handle_request`` in tests)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            url = urlparse(self.path)
            try:
                if url.path == "/healthz":
                    body, code = service.healthz(), 200
                elif url.path == "/search":
                    qs = {
                        k: v[0] for k, v in parse_qs(url.query).items()
                    }
                    body, code = service.search(qs), 200
                else:
                    body, code = {"error": f"no route {url.path}"}, 404
            except ValueError as exc:
                body, code = {"error": str(exc)}, 400
            except Exception as exc:  # surface, don't kill the thread
                body, code = {"error": f"{type(exc).__name__}: {exc}"}, 500
            payload = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve(
    spark: SparkSession,
    index_dir: str,
    host: str = "127.0.0.1",
    port: int = 8080,
    config: EngineConfig | None = None,
    corpus_path: str | None = None,
    model_path: str | None = None,
) -> None:
    service = SearchService(spark, index_dir, config, corpus_path, model_path)
    httpd = make_server(service, host, port)
    print(
        f"serving index {index_dir} on http://{host}:{httpd.server_port} "
        f"({service.healthz()['num_docs']} docs)"
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
