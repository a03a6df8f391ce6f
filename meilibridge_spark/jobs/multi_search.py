"""spark-submit job: POST /multi-search (results mode) analog.

Reads the ENDPOINT's request body shape — ``{"queries": [{"indexUid":
..., "q": ..., ...}, ...]}`` (camelCase keys, a bare list also
accepted) — resolves each ``indexUid`` to a snapshot directory under
``--root``, answers the whole batch through
``operators.multisearch.multi_search`` (option groups share
scatter-gather jobs; paged/count-only groups ride the batch paged
path; vector/hybrid groups ride ``search_hybrid_many``), and prints
the endpoint's response: one JSON object with a ``results`` array in
request order.

  spark-submit --py-files meilibridge_spark.zip \
      meilibridge_spark/jobs/multi_search.py \
      --root /indexes --requests-file body.json \
      [--embeddings uid=/path/emb.parquet ...] [--default-k 10]

Accepted per-request keys (the endpoint's names): indexUid, q, limit,
offset, filter, matchingStrategy, attributesToSearchOn, typo, prefix,
proximity, page, hitsPerPage, vector, hybrid. ``limit`` maps to the
engine's ``k``; unknown keys error loudly like the endpoint's 400.
"""

from __future__ import annotations

import argparse
import json
import os

#: endpoint key -> multi_search request key
_KEY_MAP = {
    "indexUid": "index_uid",
    "q": "q",
    "limit": "k",
    "offset": "offset",
    "filter": "filter",
    "matchingStrategy": "matching_strategy",
    "attributesToSearchOn": "attributes_to_search_on",
    "typo": "typo",
    "prefix": "prefix",
    "proximity": "proximity",
    "page": "page",
    "hitsPerPage": "hits_per_page",
    "vector": "vector",
    "hybrid": "hybrid",
}


def translate_requests(body) -> "list[dict]":
    """Endpoint body -> multi_search request dicts. Accepts the
    ``{"queries": [...]}`` wrapper or a bare list; camelCase keys per
    _KEY_MAP; unknown keys raise ValueError (the endpoint 400s)."""
    if isinstance(body, dict):
        if "queries" not in body:
            raise ValueError("request body needs a 'queries' array")
        reqs = body["queries"]
    else:
        reqs = body
    if not isinstance(reqs, list):
        raise ValueError("'queries' must be an array of request objects")
    out = []
    for i, req in enumerate(reqs):
        if not isinstance(req, dict):
            raise ValueError(f"request {i}: not an object")
        unknown = set(req) - set(_KEY_MAP)
        if unknown:
            raise ValueError(
                f"request {i}: unknown key(s) {sorted(unknown)}; "
                f"supported: {sorted(_KEY_MAP)}"
            )
        out.append({_KEY_MAP[k]: v for k, v in req.items()})
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="instance root: one snapshot dir per indexUid")
    ap.add_argument("--requests-file", required=True,
                    help="JSON: {'queries': [...]} (endpoint body) or a "
                         "bare request list")
    ap.add_argument("--embeddings", action="append", default=[],
                    metavar="UID=PATH",
                    help="embeddings parquet for an index (vec_id, "
                         "embedding) — for vector/hybrid requests on "
                         "indexes without a stored vector layout")
    ap.add_argument("--default-k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    with open(args.requests_file) as f:
        body = json.load(f)
    try:
        requests = translate_requests(body)
    except ValueError as e:
        ap.error(str(e))

    emb_paths: "dict[str, str]" = {}
    for spec in args.embeddings:
        uid, sep, path = spec.partition("=")
        if not sep:
            ap.error(f"--embeddings needs UID=PATH, got {spec!r}")
        emb_paths[uid] = path

    from meilibridge_spark.config import IndexConfig
    from meilibridge_spark.operators.multisearch import multi_search
    from meilibridge_spark.session import build_session
    from meilibridge_spark.sources.tables import load_snapshot

    spark = build_session("multi-search", cores=args.cores)
    uids = sorted({r["index_uid"] for r in requests if "index_uid" in r})
    indexes = {}
    for uid in uids:
        d = os.path.join(args.root, uid)
        if not os.path.isdir(d):
            ap.error(f"index_uid {uid!r}: no snapshot dir at {d}")
        indexes[uid] = load_snapshot(
            spark, d, IndexConfig(index_name=uid)
        )
    embeddings = {
        uid: spark.read.parquet(path) for uid, path in emb_paths.items()
    }
    try:
        rows = multi_search(
            indexes, requests, default_k=args.default_k,
            embeddings=embeddings or None,
        ).collect()
    except (ValueError, KeyError) as e:
        ap.error(str(e))

    paged_cols = rows and "total_hits" in rows[0].asDict()
    results = []
    for i, req in enumerate(requests):
        mine = [r for r in rows if r["request_no"] == i]
        mine.sort(key=lambda r: (r["rank"] is None, r["rank"]))
        entry: dict = {
            "indexUid": req.get("index_uid"),
            "hits": [
                {
                    "doc_id": r["doc_id"],
                    "score": round(r["score"], 6),
                    "rank": r["rank"],
                }
                for r in mine
                if r["doc_id"] is not None
            ],
        }
        if "q" in req:
            entry["query"] = req["q"]
        if paged_cols and mine and mine[0]["total_hits"] is not None:
            entry["page"] = mine[0]["page"]
            entry["hitsPerPage"] = mine[0]["hits_per_page"]
            entry["totalHits"] = mine[0]["total_hits"]
            entry["totalPages"] = mine[0]["total_pages"]
        else:
            entry["limit"] = req.get("k", args.default_k)
            entry["offset"] = req.get("offset", 0)
        results.append(entry)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
