"""spark-submit job: portable dump export/import (Meilisearch
``POST /dumps`` + ``meilisearch --import-dump``).

Usage:
  spark-submit --py-files meilibridge_spark.zip \
      meilibridge_spark/jobs/dump.py export \
      --index-dir /path/to/index --dump-dir /path/to/dump \
      [--snapshot-id N]

  spark-submit --py-files meilibridge_spark.zip \
      meilibridge_spark/jobs/dump.py import \
      --dump-dir /path/to/dump --index-dir /path/to/fresh_index

Export reads the stored snapshot (its own stored full configuration —
no config flags needed) and writes original documents + config; import
re-indexes them into a FRESH index directory, rebuilding every dumped
feature table (positions/attrs/typos and the IVF vector layout when
the dump carries vectors). Prints one JSON line per invocation.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("export", help="dump a stored index")
    ex.add_argument("--index-dir", required=True)
    ex.add_argument("--dump-dir", required=True)
    ex.add_argument("--snapshot-id", type=int, default=None)
    ex.add_argument("--keys-file", default=None,
                    help="KeyStore file whose key METADATA rides the "
                         "dump (Meilisearch dumps carry instance keys; "
                         "no secrets — values derive from the master "
                         "key)")
    ex.add_argument("--cores", type=int, default=None)

    im = sub.add_parser("import", help="re-index a dump into a fresh dir")
    im.add_argument("--dump-dir", required=True)
    im.add_argument("--index-dir", required=True)
    im.add_argument("--keys-file", default=None,
                    help="restore the dump's key metadata to this NEW "
                         "key store file")
    im.add_argument("--cores", type=int, default=None)

    args = ap.parse_args()

    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.dumps import create_dump_from_dir, import_dump

    spark = build_session(f"dump-{args.cmd}", cores=args.cores)
    if args.cmd == "export":
        meta = create_dump_from_dir(
            spark, args.index_dir, args.dump_dir,
            snapshot_id=args.snapshot_id, keys_path=args.keys_file,
        )
        print(
            json.dumps(
                {
                    "dumped": args.dump_dir,
                    "n_docs": meta["n_docs"],
                    "source_snapshot_id": meta["source_snapshot_id"],
                    "features": {
                        k: bool(v) for k, v in meta["features"].items()
                    },
                }
            )
        )
    else:
        idx = import_dump(
            spark, args.dump_dir, args.index_dir, keys_path=args.keys_file
        )
        print(
            json.dumps(
                {
                    "imported": args.index_dir,
                    "n_docs": idx.n_docs,
                    "snapshot_id": idx.snapshot_id,
                    "vectors": idx.vectors is not None,
                }
            )
        )


if __name__ == "__main__":
    main()
