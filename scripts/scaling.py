"""Scaling-efficiency evidence (north_rule: >=0.8 between N and 4N executors).

No real cluster exists in this sandbox, so per driver instruction the
two-cluster-size criterion is evidenced by running the SAME job on the
SAME input at two parallelism levels — local[N] vs local[4N] on the
32-core host — in separate JVMs, and reporting throughput at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Methodology notes (all of which a real N->4N cluster comparison would
not need, but a single shared host does):

- The input is materialized ONCE to parquet and read by both levels —
  identical bytes, no in-heap cache eviction noise.
- Each level warms up first (small build + query in the same JVM) so
  Python-worker fork, JIT and codegen are excluded from the timing;
  the timed section then runs twice and the fastest rep is reported
  (standard noise-floor estimator for shared hosts).
- Driver memory scales with cores (a 4N-executor cluster has 4x the
  memory; per-core memory is the invariant).
- HOST ENVELOPE: on this box, all-core turbo is lower than few-core
  turbo, so even a perfectly parallel embarrassing workload cannot
  reach efficiency 1.0 between N and 4N busy cores. The harness
  measures that ceiling with a pure-Python multiprocessing burn
  (no Spark, no shared state) and reports it as
  ``host_envelope_efficiency``; ``*_efficiency_vs_envelope`` is the
  job's efficiency normalized by what the host itself allows.

Usage: python scripts/scaling.py [--convs 120000] [--n 2] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from meilibridge_spark.session import build_session
from meilibridge_spark.sources.transcripts import generate_transcripts
spark = build_session("scaling-gen", cores=32, shuffle_partitions=64)
generate_transcripts(spark, n_convs=int(sys.argv[1]), seed=42,
                     num_partitions=64).write.mode("overwrite").parquet(sys.argv[2])
print("GENERATED")
"""

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
from pyspark.sql import functions as F
from meilibridge_spark.config import IndexConfig
from meilibridge_spark.operators.search import prepare_serving, search_many
from meilibridge_spark.plans.build import build_index
from meilibridge_spark.session import build_session
from meilibridge_spark.sources.transcripts import build_vocab

cores = int(sys.argv[1]); src_path = sys.argv[2]
# Partitioning is a property of the DATA, not the cluster size: both
# levels read the same 64-file parquet and shuffle to the same 64
# partitions, so only parallelism varies.
PARTS = 64
mem = f"{{max(8, cores)}}g"  # per-core memory is the cluster invariant
spark = build_session(f"scaling-{{cores}}", cores=cores, shuffle_partitions=PARTS,
                      extra_conf={{"spark.driver.memory": mem}})
src = spark.read.parquet(src_path)
n_turns = src.count()
cfg = IndexConfig(index_name="scaling")

vocab = build_vocab(500)
queries = [(f"s{{i}}", vocab[(i * 7) % 500]) for i in range(100)]
queries += [(f"d{{i}}", f"{{vocab[(i * 13) % 500]}} {{vocab[(i * 29 + 3) % 500]}}")
            for i in range(100)]
queries += [(f"t{{i}}", " ".join(vocab[(i * j + 11) % 500] for j in (17, 31, 47)))
            for i in range(100)]

def timed_build():
    t0 = time.perf_counter()
    idx = build_index(src, cfg)
    idx.postings = idx.postings.persist()
    idx.postings.count()
    dt = time.perf_counter() - t0
    idx.terms = idx.terms.persist(); idx.terms.count()
    prepare_serving(idx)  # serving tier: queries run shuffle-free
    return idx, dt

def timed_query(idx):
    t0 = time.perf_counter()
    search_many(idx, queries, k=10).count()
    return time.perf_counter() - t0

# ---- warmup: pay Python-worker fork / JIT / codegen once ----
warm_idx = build_index(src.limit(20000), cfg)
warm_idx.postings.count()
search_many(warm_idx, queries[:20], k=10).count()

# ---- timed: two reps, keep the fastest ----
build_s, query_s = [], []
for _ in range(2):
    idx, bs = timed_build()
    build_s.append(bs)
    qs = [timed_query(idx) for _ in range(3)]
    query_s.append(min(qs))
    spark.catalog.clearCache()  # drop postings/terms AND build-internal caches
build_best = min(build_s); query_best = min(query_s)
print("RESULT " + json.dumps({{
    "cores": cores, "n_turns": n_turns,
    "build_s": round(build_best, 3),
    "build_turns_per_sec": round(n_turns / build_best, 1),
    "query_s": round(query_best, 3),
    "queries_per_sec": round(len(queries) / query_best, 2),
}}))
"""


def _burn(_: int) -> int:
    x = 0
    for i in range(5_000_000):
        x += i
    return x


def _triad(_: int) -> float:
    """STREAM-triad-style memory-bandwidth burn (numpy, ~300 MB/s of
    traffic per call, working set >> L3)."""
    import numpy as np

    n = 12_000_000
    a = np.empty(n)
    b = np.random.rand(n)
    c = np.random.rand(n)
    t0 = time.perf_counter()
    for _ in range(8):
        np.multiply(b, 1.1, out=a)
        a += c
    return time.perf_counter() - t0


def host_envelope(n: int, fn=_burn, total_chunks: int = 128) -> float:
    """Strong-scaling efficiency ceiling of the host itself between n and
    4n busy cores for the given kernel, run as separate processes with
    zero shared software state.

    - ``_burn`` (pure CPU): captures frequency/turbo scaling only — the
      ceiling for compute-bound stages.
    - ``_triad`` (streaming numpy): additionally captures the shared
      memory-bandwidth wall — the ceiling for Arrow/shuffle/cache-bound
      stages. A REAL 4N-executor cluster scales bandwidth with nodes and
      does not have this wall; on one box it dominates above ~8 cores.
    """

    def wall(procs: int) -> float:
        chunks = total_chunks if fn is _burn else 32
        with mp.Pool(procs) as p:
            p.map(fn, range(procs))  # warm the pool
            t0 = time.perf_counter()
            p.map(fn, range(chunks))
            return time.perf_counter() - t0

    lo, hi = wall(n), wall(4 * n)
    return round(lo / hi / 4.0, 3)


def run_at(cores: int, src_path: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER.format(repo=REPO), str(cores), src_path],
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


def generate_input(n_convs: int, path: str) -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _GEN.format(repo=REPO), str(n_convs), path],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    if "GENERATED" not in proc.stdout:
        raise RuntimeError(f"input generation failed: {proc.stderr[-2000:]}")


def measure_pair(n: int, src_path: str) -> dict:
    # envelopes first, on a quiet host (Spark JVM teardown right before
    # an envelope measurement skews it badly)
    env_eff = host_envelope(n)
    bw_eff = host_envelope(n, fn=_triad)
    time.sleep(5)
    def best(cores: int) -> dict:
        # two independent JVM trials per level, keep the better one per
        # metric-sum: across-JVM variance (page cache, turbo state) is
        # the dominant noise source at this runtime
        trials = []
        for _ in range(2):
            trials.append(run_at(cores, src_path))
            time.sleep(5)
        return min(trials, key=lambda r: r["build_s"] + r["query_s"])

    lo = best(n)
    hi = best(n * 4)
    b_eff = round(hi["build_turns_per_sec"] / lo["build_turns_per_sec"] / 4, 3)
    q_eff = round(hi["queries_per_sec"] / lo["queries_per_sec"] / 4, 3)
    return {
        "n": n,
        "n_turns": lo["n_turns"],
        "low": lo,
        "high": hi,
        "build_speedup": round(4 * b_eff, 3),
        "build_efficiency": b_eff,
        "query_speedup": round(4 * q_eff, 3),
        "query_efficiency": q_eff,
        "host_envelope_efficiency": env_eff,
        "host_bandwidth_envelope_efficiency": bw_eff,
        "build_efficiency_vs_envelope": round(b_eff / env_eff, 3),
        "query_efficiency_vs_envelope": round(q_eff / env_eff, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=120000)
    ap.add_argument("--n", type=int, default=2,
                    help="low parallelism level; high is 4*n")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    args = ap.parse_args()
    with tempfile.TemporaryDirectory(prefix="scaling_src_") as tmp:
        src_path = os.path.join(tmp, "transcripts")
        generate_input(args.convs, src_path)
        out = measure_pair(args.n, src_path)
    out["input_convs"] = args.convs
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
