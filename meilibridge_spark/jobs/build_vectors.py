"""spark-submit job: train + store the IVF vector serving layout.

Usage:
  spark-submit --py-files meilibridge_spark.zip \
      meilibridge_spark/jobs/build_vectors.py \
      --index-dir /path/to/index --embeddings emb.parquet \
      [--n-centroids 8] [--n-probe 2] [--train-iters 5] \
      [--train-fraction 0.1]

Writes ``{index_dir}/vectors/`` (centroids + list-partitioned
assignment + meta commit marker). After this, ``query.py
--embeddings ... --semantic auto`` (the default) and
``similar_documents(method='auto', vectors=index.vectors)`` serve the
probed IVF path with zero training/assignment jobs. ``--train-fraction``
samples the training set — at 100 TB the quantizer only needs the
density shape, while the ASSIGNMENT still covers every vector.

Maintenance mode: ``--retrain`` (no --embeddings) re-trains the stored
layout on the CURRENT vectors when the drift signal
(``list_stats.retrain_recommended`` in vectors/meta.json, kept current
through CDC delta commits) is set — the action end of the
measure -> recommend -> act loop; ``--force-retrain`` overrides the
gate. The retrained layout lands as a NEW versioned base dir
(crash-safe meta.json commit), old bases expire via
``expire_vector_bases``.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--embeddings", default=None,
                    help="parquet of (vec_id, embedding); required "
                    "unless --retrain")
    ap.add_argument("--retrain", action="store_true",
                    help="offline IVF maintenance: re-train the stored "
                    "layout's quantizer on the CURRENT vectors (CDC "
                    "folds included) and re-assign — runs only when "
                    "the drift signal (list_stats.retrain_recommended "
                    "in vectors/meta.json) is set, unless "
                    "--force-retrain")
    ap.add_argument("--force-retrain", action="store_true")
    # defaults resolve per mode: build = (8, 2), retrain = the stored
    # layout's values (override by passing the flag explicitly)
    ap.add_argument("--n-centroids", type=int, default=None)
    ap.add_argument("--n-probe", type=int, default=None)
    ap.add_argument("--train-iters", type=int, default=5)
    ap.add_argument("--train-fraction", type=float, default=None)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from meilibridge_spark.config import ConfigError
    from meilibridge_spark.operators.similarity import (
        build_vector_index,
        retrain_vector_index,
        validate_embedder_dims,
    )
    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.tables import (
        load_vector_index,
        save_vector_index,
        stored_index_config,
        vector_drift_stats,
    )

    if args.retrain:
        spark = build_session("retrain_vectors", cores=args.cores)
        vec = load_vector_index(spark, args.index_dir)
        if vec is None:
            ap.error(f"no stored vector layout in {args.index_dir}")
        stats = vector_drift_stats(args.index_dir)
        recommended = bool(stats and stats.get("retrain_recommended"))
        if not (recommended or args.force_retrain):
            print(json.dumps({
                "index_dir": args.index_dir,
                "retrained": False,
                "reason": "retrain not recommended "
                          "(pass --force-retrain to override)",
                "list_stats": stats,
            }))
            return
        new_vec = retrain_vector_index(
            vec,
            n_centroids=args.n_centroids,
            n_probe=args.n_probe,
            train_iters=args.train_iters,
            train_fraction=args.train_fraction,
        )
        save_vector_index(new_vec, args.index_dir)
        print(json.dumps({
            "index_dir": args.index_dir,
            "retrained": True,
            "base": new_vec.base,
            "list_stats": vector_drift_stats(args.index_dir),
        }))
        return
    if args.embeddings is None:
        ap.error("--embeddings is required unless --retrain")

    spark = build_session("build_vectors", cores=args.cores)
    emb = spark.read.parquet(args.embeddings)
    # enforce the index's declared `embedders` setting (userProvided
    # dimensions) before training — the invalid_vector_dimensions analog
    try:
        stored_cfg = stored_index_config(args.index_dir)
    except FileNotFoundError:
        stored_cfg = None
    if stored_cfg is not None:
        try:
            validate_embedder_dims(emb, stored_cfg, vec_col=args.vec_col)
        except ConfigError as e:
            ap.error(str(e))
    vec = build_vector_index(
        emb,
        n_centroids=args.n_centroids if args.n_centroids is not None else 8,
        n_probe=args.n_probe if args.n_probe is not None else 2,
        train_iters=args.train_iters,
        id_col=args.id_col,
        vec_col=args.vec_col,
        train_fraction=args.train_fraction,
    )
    save_vector_index(vec, args.index_dir)
    print(
        json.dumps(
            {
                "index_dir": args.index_dir,
                "n_centroids": vec.n_centroids,
                "n_probe": vec.n_probe,
                "n_vectors": vec.assigned.count(),
            }
        )
    )


if __name__ == "__main__":
    main()
