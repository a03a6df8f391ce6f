"""Scaling-efficiency evidence (north_rule: >=0.8 between N and 4N).

No real cluster exists in this sandbox, so per driver instruction the
two-cluster-size criterion is evidenced by running the SAME job on the
SAME input at two parallelism levels — local[8] vs local[32] on the
32-core host — in separate JVMs, and reporting throughput at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Usage: python scripts/scaling.py [--convs 40000] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
from meilibridge_spark.config import IndexConfig
from meilibridge_spark.operators.search import search_many
from meilibridge_spark.plans.build import build_index
from meilibridge_spark.session import build_session
from meilibridge_spark.sources.transcripts import generate_transcripts

cores = int(sys.argv[1]); n_convs = int(sys.argv[2])
# Partitioning is a property of the DATA, not the cluster size: both
# runs use the same partition count (as a real cluster would when
# scaling executors against a fixed input), so only parallelism varies.
PARTS = 64
spark = build_session(f"scaling-{{cores}}", cores=cores, shuffle_partitions=PARTS)
src = generate_transcripts(spark, n_convs=n_convs, seed=42,
                           num_partitions=PARTS).persist()
n_turns = src.count()
t0 = time.time()
idx = build_index(src, IndexConfig(index_name="scaling"))
idx.postings = idx.postings.persist()
idx.postings.count()
build_s = time.time() - t0
idx.terms = idx.terms.persist(); idx.terms.count()
from meilibridge_spark.sources.transcripts import build_vocab
vocab = build_vocab(500)
queries = [(f"s{{i}}", vocab[(i * 7) % 500]) for i in range(18)]
queries += [(f"d{{i}}", f"{{vocab[(i * 13) % 500]}} {{vocab[(i * 29 + 3) % 500]}}")
            for i in range(18)]
queries += [(f"t{{i}}", " ".join(vocab[(i * j + 11) % 500] for j in (17, 31, 47)))
            for i in range(18)]
t0 = time.time()
search_many(idx, queries, k=10).count()
query_s = time.time() - t0
print("RESULT " + json.dumps({{
    "cores": cores, "n_turns": n_turns,
    "build_s": round(build_s, 3),
    "build_turns_per_sec": round(n_turns / build_s, 1),
    "query_s": round(query_s, 3),
    "queries_per_sec": round(len(queries) / query_s, 2),
}}))
"""


def run_at(cores: int, n_convs: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=REPO), str(cores), str(n_convs)],
        capture_output=True,
        text=True,
        env=env,
        timeout=3000,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT from cores={cores}: {proc.stdout[-500:]} {proc.stderr[-2000:]}"
    )


def _best(trials: "list[dict]") -> dict:
    """Take the fastest trial per level: JVM warmup, page cache and GC
    make single local-mode runs noisy by +-30%; min wall time is the
    standard noise-floor estimator."""
    return min(trials, key=lambda r: r["build_s"] + r["query_s"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=40000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    args = ap.parse_args()
    lo = _best([run_at(args.n, args.convs) for _ in range(args.trials)])
    hi = _best([run_at(args.n * 4, args.convs) for _ in range(args.trials)])
    factor = (args.n * 4) / args.n
    out = {
        "input_convs": args.convs,
        "n_turns": lo["n_turns"],
        "low": lo,
        "high": hi,
        "build_speedup": round(
            hi["build_turns_per_sec"] / lo["build_turns_per_sec"], 3
        ),
        "build_efficiency": round(
            hi["build_turns_per_sec"] / lo["build_turns_per_sec"] / factor, 3
        ),
        "query_speedup": round(hi["queries_per_sec"] / lo["queries_per_sec"], 3),
        "query_efficiency": round(
            hi["queries_per_sec"] / lo["queries_per_sec"] / factor, 3
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
