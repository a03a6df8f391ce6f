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
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--embeddings", required=True,
                    help="parquet of (vec_id, embedding)")
    ap.add_argument("--n-centroids", type=int, default=8)
    ap.add_argument("--n-probe", type=int, default=2)
    ap.add_argument("--train-iters", type=int, default=5)
    ap.add_argument("--train-fraction", type=float, default=None)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from meilibridge_spark.config import ConfigError
    from meilibridge_spark.operators.similarity import (
        build_vector_index,
        validate_embedder_dims,
    )
    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.tables import (
        save_vector_index,
        stored_index_config,
    )

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
        n_centroids=args.n_centroids,
        n_probe=args.n_probe,
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
