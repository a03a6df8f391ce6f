"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Runs the engine's headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus derived throughput fields}.

Workloads:
  build_transcripts   full inverted-index build over the deterministic
                      synthetic transcripts table (~1.5k turns per sf
                      unit x 100) -> turns/sec
  build_documents     index build over {sf_dir}/documents.parquet
  query_batch         ~50-query reference set in ONE Spark job
                      (search_many) -> queries/sec
  query_wand          driver-side block-max WAND serving path, same
                      queries sequentially
  query_wand_filtered driver-side FILTERED serving (round 5): the
                      tenant-token forced filter resolved once to a
                      bounded allowed-id array (prepare_filter), every
                      query then served at zero Spark jobs
  query_hybrid        keyword+semantic fusion over the documents index
                      and the embeddings table (semanticRatio blend)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, REPO)


def reference_queries() -> "list[tuple[str, str]]":
    """~50 queries over the transcripts vocabulary (FIXTURES.md §5):
    hot Zipf-head, mid, rare, multi-term, absent, unicode, repeated."""
    from meilibridge_spark.sources.transcripts import build_vocab

    vocab = build_vocab(500)
    qs: list[str] = []
    # single-term: head / mid / tail of the Zipf distribution
    qs += [vocab[i] for i in (0, 1, 2, 5, 10, 20, 50, 100, 200, 350, 480)]
    # two-term combos mixing frequencies
    qs += [f"{vocab[i]} {vocab[j]}" for i, j in
           [(0, 3), (1, 50), (2, 200), (10, 300), (5, 5), (0, 499)]]
    # three/four-term
    qs += [
        " ".join(vocab[i] for i in (0, 7, 31)),
        " ".join(vocab[i] for i in (2, 90, 180, 410)),
        " ".join(vocab[i] for i in (4, 44, 444)),
    ]
    # absent, unicode, mixed-case, repeated
    qs += ["zzznotaterm", "café 東京", vocab[3].upper(), f"{vocab[0]} {vocab[0]}"]
    # pad to 50 with rotating picks
    i = 0
    while len(qs) < 50:
        qs.append(f"{vocab[(i * 37) % 500]} {vocab[(i * 91 + 13) % 500]}")
        i += 1
    return [(f"q{n:02d}", q) for n, q in enumerate(qs)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_convs = max(200, int(200_000 * sf))
    # sf values the driver ships no parquet for (e.g. sf1.0, ~1.5M
    # turns — the BASELINE.md decade-up evidence run): the transcripts
    # workloads are already fully synthetic/deterministic; documents-
    # table workloads are skipped and the hybrid workloads run over
    # deterministic doc_id-keyed embeddings on the transcripts index.
    synth = not os.path.isdir(sf_dir)

    from meilibridge_spark.config import (
        ASCII_TOKEN_PATTERN,
        AnalyzerConfig,
        IndexConfig,
    )
    from meilibridge_spark.operators.search import search_many
    from meilibridge_spark.plans.build import build_index
    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.transcripts import generate_transcripts

    spark = build_session("bench", cores=cpus, shuffle_partitions=cpus)
    timings: dict[str, float] = {}

    # --- host canary: a fixed single-thread numpy workload, zero Spark.
    # This box's effective speed drifts across the day (hypervisor-level;
    # invisible to /proc steal) — the canary lets any two bench runs be
    # compared in host-normalized terms.
    import numpy as np

    rng = np.random.default_rng(0)
    arr = rng.random(5_000_000)
    t0 = time.time()
    for _ in range(20):
        order = np.argsort(arr[:1_000_000])
        float(arr[order[:1000]].sum())
    host_canary = time.time() - t0

    # --- index build over synthetic transcripts
    src = generate_transcripts(spark, n_convs=n_convs, seed=42).persist()
    n_turns = src.count()  # materialize source outside the build timing
    # warmup: pay Python-worker fork / JIT / codegen once (scaling.py
    # methodology) so the timed sections measure steady-state throughput
    warm = build_index(src.limit(2000), IndexConfig(index_name="warm"))
    warm.postings.count()
    spark.catalog.clearCache()
    src.persist().count()
    t0 = time.time()
    cfg = IndexConfig(index_name="bench-transcripts")
    idx = build_index(src, cfg)
    idx.postings = idx.postings.persist()
    n_blocks = idx.postings.count()
    idx.terms = idx.terms.persist()
    idx.terms.count()
    timings["build_transcripts"] = time.time() - t0

    # --- positional postings build over the same docs (optional phrase
    # table; judged against the main postings build per turn)
    from meilibridge_spark.operators.positions import build_positions

    t0 = time.time()
    positions = build_positions(idx.docs, cfg).persist()
    n_pos_rows = positions.count()
    timings["build_positions"] = time.time() - t0

    # --- index build over the driver's documents table (skipped in
    # synthetic-sf mode: no parquet shipped at that scale)
    didx = None
    if not synth:
        t0 = time.time()
        dcfg = IndexConfig(
            index_name="bench-documents",
            primary_key=("doc_id",),
            analyzer=AnalyzerConfig(token_pattern=ASCII_TOKEN_PATTERN),
        )
        didx = build_index(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            dcfg,
            doc_id_col="doc_id",
        )
        didx.postings.count()
        timings["build_documents"] = time.time() - t0

    # --- batch query throughput (one distributed job, 50 queries,
    # served from the doc-shard cached layout: zero query-time shuffle)
    from meilibridge_spark.operators.search import prepare_serving

    queries = reference_queries()
    t0 = time.time()
    prepare_serving(idx)
    timings["serve_prepare"] = time.time() - t0
    # round-4 methodology change (documented in BASELINE.md): one small
    # warmup batch pays the query path's one-time costs (whole-stage
    # codegen, pandas-UDF worker fork) so query_batch measures
    # STEADY-STATE serving throughput — measured min-of-4 showed rep0
    # 2.4s vs rep2+ 0.89s on identical input, i.e. the r01-r03 numbers
    # mostly measured codegen, with heavy run-to-run jitter. A serving
    # system amortizes that one-time cost over its lifetime; the warmup
    # cost itself is reported as query_warmup.
    t0 = time.time()
    search_many(idx, queries[:5], k=10).count()
    timings["query_warmup"] = time.time() - t0
    t0 = time.time()
    n_hits = search_many(idx, queries, k=10).count()
    timings["query_batch"] = time.time() - t0

    # --- batch exhaustive pagination (page/hitsPerPage over the whole
    # reference set): the page-2 slice of every query plus exhaustive
    # per-query totals — the top-k scatter-gather sliced to the page +
    # ONE shard-count pass riding the same block exchange (two jobs
    # for the 50 queries, vs 50 single-query paged jobs)
    t0 = time.time()
    n_paged_hits = search_many(
        idx, queries, page=2, hits_per_page=10
    ).count()
    timings["query_batch_paged"] = time.time() - t0

    # --- filtered batch (doc-shard bitmap cogroup path)
    from pyspark.sql import functions as F

    filt = idx.docs.filter(F.col("role") == "user").select("doc_id")
    t0 = time.time()
    n_filtered_hits = search_many(idx, queries, k=10, filter_docs=filt).count()
    timings["query_batch_filtered"] = time.time() - t0

    # --- attribute-restricted batch (attributesToSearchOn): attr-mask
    # blocks built for (role, text), co-resided in the serving layout
    # (bkind), the whole 50-query batch restricted to matches in text
    import dataclasses

    from meilibridge_spark.operators.attrs import build_attr_postings

    acfg = dataclasses.replace(cfg, searchable_attributes=("role", "text"))
    t0 = time.time()
    idx.attrs = build_attr_postings(idx.docs, acfg).persist()
    idx.attrs.count()
    timings["build_attrs"] = time.time() - t0
    idx.cfg = acfg
    old_serving = idx.serving
    t0 = time.time()
    prepare_serving(idx)
    timings["serve_prepare_attrs"] = time.time() - t0
    if old_serving is not None:
        old_serving.unpersist()
    t0 = time.time()
    n_search_on_hits = search_many(
        idx, queries, k=10, attributes_to_search_on=("text",)
    ).count()
    timings["query_batch_search_on"] = time.time() - t0

    # --- hybrid keyword+semantic fusion (Q16 embedders): BM25 pools
    # blended with cosine pools, whole batch in ONE job. Synthetic-sf
    # mode: the transcripts index is the keyword side and the vector
    # table is a deterministic doc_id-keyed embedding (16-dim cosine
    # fingerprint, pure Catalyst) — same plan shapes, same join
    # cardinalities, no external data.
    from meilibridge_spark.operators.hybrid import search_hybrid_many

    if synth:
        hidx = idx
        emb = idx.docs.select(
            F.col("doc_id").alias("vec_id"),
            F.array(
                *[
                    F.cos(F.col("doc_id") * F.lit(0.05 * (i + 1)))
                    for i in range(16)
                ]
            ).alias("embedding"),
        ).persist()
        emb.count()
        hy_queries = [q for _, q in queries[11:19]]
    else:
        hidx = didx
        t0 = time.time()
        prepare_serving(didx)
        timings["serve_prepare_docs"] = time.time() - t0
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
        emb.count()
        hy_queries = [
            "spark join table", "the data", "customer window vector merge",
            "scan hash", "key order merge", "fast join", "table scan",
            "window vector",
        ]
    qvecs = [
        list(r[0])
        for r in emb.filter(F.col("vec_id") < 8)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    hq = [(f"h{i}", q) for i, q in enumerate(hy_queries)]
    hv = {f"h{i}": v for i, v in enumerate(qvecs)}
    t0 = time.time()
    hybrid_hits = search_hybrid_many(hidx, emb, hq, hv, k=10, pool=30).count()
    timings["query_hybrid"] = time.time() - t0

    # --- hybrid with the binaryQuantized pool (round 5, Meilisearch
    # v1.10): sign-packed Hamming bit scan selects the pool at 1/32nd
    # the scanned bytes, exact cosine re-scores only the survivors
    t0 = time.time()
    hybrid_bin_hits = search_hybrid_many(
        hidx, emb, hq, hv, k=10, pool=30, semantic="binary"
    ).count()
    timings["query_hybrid_binary"] = time.time() - t0

    # --- hybrid served from the STORED IVF layout (round-4 serving
    # default): quantizer trained + persisted once (vectors_build),
    # then the same batch probes n_probe lists via the list-partitioned
    # stored assignment instead of scanning every embedding
    import tempfile

    from meilibridge_spark.operators.similarity import build_vector_index
    from meilibridge_spark.sources.tables import (
        load_vector_index,
        save_vector_index,
    )

    t0 = time.time()
    vdir = tempfile.mkdtemp(prefix="bench_vec_")
    save_vector_index(
        build_vector_index(emb, n_centroids=16, n_probe=2, train_iters=3),
        vdir,
    )
    timings["vectors_build"] = time.time() - t0
    hidx.vectors = load_vector_index(spark, vdir)
    t0 = time.time()
    hybrid_stored_hits = search_hybrid_many(
        hidx, emb, hq, hv, k=10, pool=30
    ).count()  # semantic='auto' -> stored IVF
    timings["query_hybrid_stored"] = time.time() - t0
    hidx.vectors = None

    # --- proximity-ranked BATCH search (round 4, Q11 rule #3): one
    # scatter-gather job where the pair terms' positional rows ride a
    # cogrouped doc-shard side next to the resident blocks
    idx.positions = positions
    t0 = time.time()
    prox_hits = search_many(
        idx, queries[:10], k=10, words_rank=True, proximity_rank=True
    ).count()
    timings["query_proximity"] = time.time() - t0
    idx.positions = None
    positions.unpersist()

    # --- driver-side WAND serving path (DriverSearcher: dictionary
    # collected once; cold pass fills the postings cache, warm pass is
    # zero-Spark-job latency)
    from meilibridge_spark.operators.search import DriverSearcher

    t0 = time.time()
    searcher = DriverSearcher(idx)
    timings["searcher_init"] = time.time() - t0
    t0 = time.time()
    wand_hits = 0
    for _, q in queries:
        wand_hits += len(searcher.search(q, 10))
    timings["query_wand_cold"] = time.time() - t0
    t0 = time.time()
    for _, q in queries:
        searcher.search(q, 10)
    timings["query_wand_warm"] = time.time() - t0

    # --- batched prewarm (serving-replica startup): a FRESH searcher
    # prefetches all 50 queries' terms in ONE pruned scan (warm()),
    # then serves the same set — one job replaces the cold pass's 50
    t0 = time.time()
    searcher2 = DriverSearcher(idx)
    searcher2.warm([q for _, q in queries])
    timings["wand_prewarm"] = time.time() - t0
    t0 = time.time()
    for _, q in queries:
        searcher2.search(q, 10)
    timings["query_wand_prewarmed"] = time.time() - t0
    del searcher2

    # --- round-5 FILTERED serving: the tenant-token shape — the forced
    # filter (same predicate as query_batch_filtered) resolved ONCE to
    # a bounded sorted allowed-id array (prepare_filter, one Spark
    # job), then every query served at zero jobs with postings
    # restricted before scoring (rank-identical to the distributed
    # filtered path; corpus-global BM25 stats)
    t0 = time.time()
    allowed = searcher.prepare_filter(filt)
    timings["filter_prepare"] = time.time() - t0
    t0 = time.time()
    for _, q in queries:
        searcher.search(q, 10, filter_docs=allowed)
    timings["query_wand_filtered"] = time.time() - t0

    total = sum(timings.values())
    out = {
        "metric": "bm25_engine_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": cpus,
        "synthetic_tables": synth,
        "host_canary_sec": round(host_canary, 3),
        "n_turns": n_turns,
        "n_blocks": n_blocks,
        "build_turns_per_sec": round(n_turns / timings["build_transcripts"], 1),
        "positions_turns_per_sec": round(n_turns / timings["build_positions"], 1),
        "n_position_rows": n_pos_rows,
        "batch_queries_per_sec": round(len(queries) / timings["query_batch"], 2),
        "paged_batch_queries_per_sec": round(
            len(queries) / timings["query_batch_paged"], 2
        ),
        "paged_batch_hits": n_paged_hits,
        "filtered_batch_queries_per_sec": round(
            len(queries) / timings["query_batch_filtered"], 2
        ),
        "filtered_batch_hits": n_filtered_hits,
        "search_on_batch_queries_per_sec": round(
            len(queries) / timings["query_batch_search_on"], 2
        ),
        "search_on_hits": n_search_on_hits,
        "attrs_turns_per_sec": round(n_turns / timings["build_attrs"], 1),
        "hybrid_queries_per_sec": round(
            len(hy_queries) / timings["query_hybrid"], 2
        ),
        "hybrid_hits": hybrid_hits,
        "hybrid_binary_queries_per_sec": round(
            len(hy_queries) / timings["query_hybrid_binary"], 2
        ),
        "hybrid_binary_hits": hybrid_bin_hits,
        "hybrid_stored_queries_per_sec": round(
            len(hy_queries) / timings["query_hybrid_stored"], 2
        ),
        "hybrid_stored_hits": hybrid_stored_hits,
        "proximity_queries_per_sec": round(
            10 / timings["query_proximity"], 2
        ),
        "proximity_hits": prox_hits,
        "wand_cold_queries_per_sec": round(
            len(queries) / timings["query_wand_cold"], 2
        ),
        "wand_warm_queries_per_sec": round(
            len(queries) / timings["query_wand_warm"], 2
        ),
        "wand_prewarmed_queries_per_sec": round(
            len(queries) / timings["query_wand_prewarmed"], 2
        ),
        "wand_filtered_queries_per_sec": round(
            len(queries) / timings["query_wand_filtered"], 2
        ),
        "filter_allowed_docs": int(allowed.size),
        "batch_hits": n_hits,
        "wand_hits": wand_hits,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
