"""spark-submit --py-files launch path (the north-rule deployment shape).

The reference is driven as a single-process CLI; the rebuild's cluster
story is ``spark-submit --py-files se_spark.zip cli.py build/search ...``
(``cli.py:1-17``).  This test executes that exact shape end to end:

* the package is zipped (no .pyc, no tests) exactly as the README says;
* the driver file is a *copy* of ``cli.py`` in a scratch cwd, so
  ``search_engine_spark`` is importable ONLY from the ``--py-files`` zip
  — a stale repo-dir import would defeat the point of the test;
* build and search each run in a fresh spark-submit JVM (cold start,
  like a cluster submission), with parallelism coming from
  ``--master local[4]`` on the submit line, not from engine code;
* the search results must be rank- and score-identical to an in-process
  ``SearchEngine`` over the same index (the north rule's rank-identity
  requirement, applied across launch paths).

Uses pyspark's own ``bin/spark-submit`` so the submitted runtime is the
same version as the library under test.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _make_zip(dest: str) -> None:
    pkg = os.path.join(REPO, "search_engine_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


def _submit(workdir: str, zip_path: str, argv: list[str]) -> str:
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    # keep any repo-root PYTHONPATH out of the subprocess: imports must
    # come from the zip
    env.pop("PYTHONPATH", None)
    cmd = [
        _spark_submit_bin(),
        "--master", "local[4]",
        "--driver-memory", "2g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(workdir, "cli.py"),
        *argv,
    ]
    proc = subprocess.run(
        cmd, cwd=workdir, env=env, capture_output=True, text=True, timeout=420
    )
    assert proc.returncode == 0, (
        f"spark-submit failed ({argv[0]}):\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-4000:]}"
    )
    return proc.stdout


@pytest.fixture(scope="module")
def submit_ws(tmp_path_factory):
    if not os.path.exists(_spark_submit_bin()):  # pragma: no cover
        pytest.skip("pyspark spark-submit launcher not present")
    base = tmp_path_factory.mktemp("submitws")
    workdir = str(base / "work")
    os.makedirs(workdir)
    zip_path = os.path.join(workdir, "se_spark.zip")
    _make_zip(zip_path)
    shutil.copy(
        os.path.join(REPO, "search_engine_spark", "cli.py"),
        os.path.join(workdir, "cli.py"),
    )
    # corpus parquet written driver-free (pyarrow): the subprocess is the
    # first Spark to touch this workspace
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, REPO)
    from search_engine_spark.testing.synth import synth_corpus

    rows = synth_corpus(n_docs=100, seed=31)
    corpus_path = os.path.join(workdir, "corpus.parquet")
    pq.write_table(pa.Table.from_pylist(rows), corpus_path)
    return workdir, zip_path, corpus_path


def test_spark_submit_build_then_search_rank_identical(submit_ws, spark):
    workdir, zip_path, corpus_path = submit_ws
    idx = os.path.join(workdir, "idx")

    out = _submit(workdir, zip_path, [
        "build", "--corpus", corpus_path, "--index", idx,
        "--chunk-docs", "64", "--chunks-per-batch", "2",
        "--term-buckets", "8",
    ])
    built = json.loads(
        [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    )
    assert built["stats"]["num_docs"] == 100
    assert os.path.exists(os.path.join(idx, "meta.json"))

    out = _submit(workdir, zip_path, [
        "search", "--index", idx, "--query", "zqmerge OR zqshard",
        "--mode", "QUERY_EVALUATOR", "--k", "10",
    ])
    submitted = [
        (int(p[0]), float(p[1]), int(p[2]))
        for p in (l.split() for l in out.strip().splitlines())
        if len(p) == 4 and p[0].isdigit()
    ]
    assert submitted, f"no result rows in spark-submit output:\n{out}"

    # rank/score identity vs an in-process engine on the same index
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.plans.parser import SearchMode
    from search_engine_spark.query.engine import SearchEngine

    eng = SearchEngine(spark, idx, EngineConfig())
    local = [
        (r.rank, round(r.score, 6), r.doc_id)
        for r in eng.search(
            "zqmerge OR zqshard", SearchMode.QUERY_EVALUATOR, num_return=10
        ).collect()
    ]
    assert [(r, round(s, 6), d) for r, s, d in submitted] == local
