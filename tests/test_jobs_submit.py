"""End-to-end spark-submit drive of the shipped jobs (north_rule: the
engine ships as ``spark-submit --py-files`` jobs). This is the real
deployment path — a fresh JVM, the package imported ONLY from the
scripts/package.py zip artifact (executor pandas-UDF workers re-import
from it too), no repo PYTHONPATH."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _submit(zip_path: str, job: str, *args: str) -> str:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYSPARK_DRIVER_PYTHON")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "meilibridge_spark", "jobs", job), *args],
        capture_output=True, text=True, timeout=280, env=env, cwd="/tmp",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.strip().splitlines()
    assert lines, f"job printed nothing; stderr tail: {out.stderr[-2000:]}"
    return lines[-1]


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_build_then_query_via_spark_submit(tmp_path):
    zip_path = str(tmp_path / "mbs.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py"),
         "--out", zip_path],
        check=True, capture_output=True,
    )
    idx_dir = str(tmp_path / "idx")
    built = json.loads(_submit(
        zip_path, "build_index.py",
        "--index-dir", idx_dir, "--synthetic-convs", "12",
    ))
    assert built["snapshot_id"] == 1 and built["n_docs"] > 0
    res = json.loads(_submit(
        zip_path, "query.py",
        "--index-dir", idx_dir, "--query", "baba cedi", "-k", "3",
    ))
    assert 0 < len(res["hits"]) <= 3
    assert all(h["score"] > 0 for h in res["hits"])
    scores = [h["score"] for h in res["hits"]]
    assert scores == sorted(scores, reverse=True)

    # dump export -> import into a fresh dir -> the imported index
    # serves the same query (dump.py is the upgrade/migration path)
    dump_dir = str(tmp_path / "dump")
    idx2_dir = str(tmp_path / "idx2")
    dumped = json.loads(_submit(
        zip_path, "dump.py", "export",
        "--index-dir", idx_dir, "--dump-dir", dump_dir,
    ))
    assert dumped["n_docs"] == built["n_docs"]
    imported = json.loads(_submit(
        zip_path, "dump.py", "import",
        "--dump-dir", dump_dir, "--index-dir", idx2_dir,
    ))
    assert imported["n_docs"] == built["n_docs"]
    res2 = json.loads(_submit(
        zip_path, "query.py",
        "--index-dir", idx2_dir, "--query", "baba cedi", "-k", "3",
    ))
    assert [(h["doc_id"], h["score"]) for h in res2["hits"]] == [
        (h["doc_id"], h["score"]) for h in res["hits"]
    ]

    # multi-search job: the endpoint's POST body over the same root
    # (indexUid 'idx' resolves to tmp_path/idx)
    body = {"queries": [
        {"indexUid": "idx", "q": "baba cedi", "limit": 3},
        {"indexUid": "idx", "q": "baba cedi", "page": 1,
         "hitsPerPage": 2},
    ]}
    bf = str(tmp_path / "body.json")
    with open(bf, "w") as f:
        json.dump(body, f)
    ms = json.loads(_submit(
        zip_path, "multi_search.py",
        "--root", str(tmp_path), "--requests-file", bf,
    ))
    r0, r1 = ms["results"]
    assert [h["doc_id"] for h in r0["hits"]] == [
        h["doc_id"] for h in res["hits"]
    ]
    assert r1["totalHits"] >= 2 and r1["totalPages"] >= 1
    assert [h["doc_id"] for h in r1["hits"]] == [
        h["doc_id"] for h in r0["hits"][:2]
    ]


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_vectors_compact_hybrid_via_spark_submit(tmp_path, spark):
    """Round-4 jobs end-to-end off the zip artifact: build an index,
    train+store the IVF vector layout (build_vectors.py), compact the
    snapshot (compact.py), then serve a hybrid query with
    --semantic auto — the stored layout must answer it."""
    import json as _json

    zip_path = str(tmp_path / "mbs.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py"),
         "--out", zip_path],
        check=True, capture_output=True,
    )
    idx_dir = str(tmp_path / "idx")
    built = _json.loads(_submit(
        zip_path, "build_index.py",
        "--index-dir", idx_dir, "--synthetic-convs", "12",
    ))
    assert built["snapshot_id"] == 1

    # embeddings keyed by the built doc_ids (tiny deterministic panel)
    emb_path = str(tmp_path / "emb.parquet")
    n = built["n_docs"]
    rows = [(i, [float((i % 7) + 1), float((i % 3) + 1)]) for i in range(n)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(emb_path)

    vec = _json.loads(_submit(
        zip_path, "build_vectors.py",
        "--index-dir", idx_dir, "--embeddings", emb_path,
        "--n-centroids", "3", "--n-probe", "3", "--train-iters", "1",
    ))
    assert vec["n_vectors"] == n and vec["n_probe"] == 3

    # maintenance mode: fresh balanced layout -> the drift gate holds
    ret = _json.loads(_submit(
        zip_path, "build_vectors.py", "--index-dir", idx_dir, "--retrain",
    ))
    assert ret["retrained"] is False
    assert ret["list_stats"]["retrain_recommended"] is False

    comp = _json.loads(_submit(
        zip_path, "compact.py", "--index-dir", idx_dir,
    ))
    assert comp["snapshot_id"] == 2
    assert (
        comp["compaction"]["after"]["postings"]["files"]
        <= comp["compaction"]["before"]["postings"]["files"]
    )

    res = _json.loads(_submit(
        zip_path, "query.py",
        "--index-dir", idx_dir, "--embeddings", emb_path,
        "--query", "baba cedi", "--query-vec-id", "1", "-k", "3",
    ))
    assert 0 < len(res["hits"]) <= 3
    assert all("hybrid" in h for h in res["hits"])
