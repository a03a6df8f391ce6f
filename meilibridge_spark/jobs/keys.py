"""CLI: API key management + tenant tokens (Meilisearch /keys and
SDK ``generateTenantToken`` analogs, sources/keys.py). Pure metadata —
no SparkSession.

Usage:
  python -m meilibridge_spark.jobs.keys create --keys-file F \
      --master-key K --actions search --indexes 'docs*' \
      [--expires-at EPOCH] [--name N] [--uid U]
  python -m meilibridge_spark.jobs.keys list --keys-file F --master-key K
  python -m meilibridge_spark.jobs.keys get --keys-file F --master-key K \
      --uid U
  python -m meilibridge_spark.jobs.keys delete --keys-file F \
      --master-key K --uid U
  python -m meilibridge_spark.jobs.keys token --keys-file F \
      --master-key K --uid U --rules '{"docs": {"filter": "lang = 1"}}' \
      [--expires-at EPOCH]
  python -m meilibridge_spark.jobs.keys verify --keys-file F \
      --master-key K --token T [--index-uid UID]

The search CLI (jobs/query.py) accepts ``--tenant-token`` +
``--keys-file``/``--master-key`` and forces the token's rule filter
onto the query.
"""

from __future__ import annotations

import argparse
import json

from meilibridge_spark.sources.keys import (
    AuthError,
    KeyStore,
    generate_tenant_token,
    token_search_filter,
    verify_tenant_token,
)


def _csv(s: str) -> "list[str]":
    return [x.strip() for x in s.split(",") if x.strip()]


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--keys-file", required=True)
        p.add_argument("--master-key", required=True)

    cr = sub.add_parser("create")
    common(cr)
    cr.add_argument("--actions", required=True, help="comma-separated")
    cr.add_argument("--indexes", required=True, help="comma-separated")
    cr.add_argument("--expires-at", type=float, default=None)
    cr.add_argument("--name", default=None)
    cr.add_argument("--description", default=None)
    cr.add_argument("--uid", default=None)

    ls = sub.add_parser("list")
    common(ls)

    gt = sub.add_parser("get")
    common(gt)
    gt.add_argument("--uid", required=True)

    dl = sub.add_parser("delete")
    common(dl)
    dl.add_argument("--uid", required=True)

    tk = sub.add_parser("token")
    common(tk)
    tk.add_argument("--uid", required=True)
    tk.add_argument(
        "--rules",
        required=True,
        help='searchRules JSON, e.g. \'{"docs": {"filter": "lang = 1"}}\'',
    )
    tk.add_argument("--expires-at", type=float, default=None)

    vf = sub.add_parser("verify")
    common(vf)
    vf.add_argument("--token", required=True)
    vf.add_argument(
        "--index-uid",
        default=None,
        help="also resolve the forced search filter for this index",
    )

    args = ap.parse_args()
    try:
        store = KeyStore(args.keys_file, args.master_key)
        if args.cmd == "create":
            out = store.create_key(
                _csv(args.actions),
                _csv(args.indexes),
                expires_at=args.expires_at,
                name=args.name,
                description=args.description,
                uid=args.uid,
            )
        elif args.cmd == "list":
            out = store.list_keys()
        elif args.cmd == "get":
            out = store.get_key(args.uid)
        elif args.cmd == "delete":
            store.delete_key(args.uid)
            out = {"deleted": args.uid}
        elif args.cmd == "token":
            try:
                rules = json.loads(args.rules)
            except json.JSONDecodeError as e:
                ap.error(f"--rules is not valid JSON: {e}")
            k = store.get_key(args.uid)
            out = {
                "token": generate_tenant_token(
                    args.uid, k["key"], rules, expires_at=args.expires_at
                )
            }
        elif args.cmd == "verify":
            out = {"payload": verify_tenant_token(args.token, store)}
            if args.index_uid:
                out["forcedFilter"] = token_search_filter(
                    args.token, store, args.index_uid
                )
    except AuthError as e:
        ap.error(str(e))
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
