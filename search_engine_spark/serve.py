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
pool).  Requests run concurrently: Spark job submission is thread-safe,
and each HTTP thread submits independent jobs (FAIR scheduling pools
apply if configured).
"""

from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from search_engine_spark.config import EngineConfig
from search_engine_spark.plans.parser import SearchMode
from search_engine_spark.query.engine import SearchEngine


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
            ranked = self.engine.search_reranked(
                query, mode, num_return=k, model=self.model
            )
        else:
            ranked = self.engine.search(query, mode, num_return=k)
        rows = self.engine.with_doc_info(ranked, self.corpus).collect()
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
