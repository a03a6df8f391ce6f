"""CLI: instance administration analogs — GET /stats, /webhooks CRUD +
delivery journal, GET/PATCH /network. Pure metadata — no SparkSession
(the reference's admin surface is likewise config/HTTP plumbing around
the engine, cmd/meilibridge/commands/helper.go).

Usage:
  python -m meilibridge_spark.jobs.admin stats --index-dir DIR
  python -m meilibridge_spark.jobs.admin stats --root DIR
  python -m meilibridge_spark.jobs.admin webhooks list --index-dir DIR
  python -m meilibridge_spark.jobs.admin webhooks create --index-dir DIR \
      --url URL [--header k=v ...]
  python -m meilibridge_spark.jobs.admin webhooks update --index-dir DIR \
      --uuid UUID [--url URL] [--header k=v ...]
  python -m meilibridge_spark.jobs.admin webhooks delete --index-dir DIR \
      --uuid UUID
  python -m meilibridge_spark.jobs.admin webhooks deliveries \
      --index-dir DIR [--uuid UUID]
  python -m meilibridge_spark.jobs.admin network get --root DIR
  python -m meilibridge_spark.jobs.admin network set --root DIR \
      [--self NAME] [--remote name=ROOT ...] [--remove-remote NAME ...]
  python -m meilibridge_spark.jobs.admin settings get --index-dir DIR
  python -m meilibridge_spark.jobs.admin settings patch --index-dir DIR \
      --json '{"searchCutoffMs": 800}'   # or --json-file patch.json
"""

from __future__ import annotations

import argparse
import json


def _headers(pairs: "list[str] | None") -> "dict[str, str]":
    out: "dict[str, str]" = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--header needs k=v, got {p!r}")
        k, _, v = p.partition("=")
        out[k] = v
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    st = sub.add_parser("stats")
    g = st.add_mutually_exclusive_group(required=True)
    g.add_argument("--index-dir")
    g.add_argument("--root")

    wh = sub.add_parser("webhooks")
    wh.add_argument("action", choices=(
        "list", "get", "create", "update", "delete", "deliveries",
    ))
    wh.add_argument("--index-dir", required=True)
    wh.add_argument("--uuid", default=None)
    wh.add_argument("--url", default=None)
    wh.add_argument("--header", action="append", default=None)
    wh.add_argument("--config-defined", action="store_true",
                    help="register as non-editable (the instance-config "
                         "webhook kind)")

    nw = sub.add_parser("network")
    nw.add_argument("action", choices=("get", "set"))
    nw.add_argument("--root", required=True)
    nw.add_argument("--self", dest="self_name", default=None)
    nw.add_argument("--remote", action="append", default=None,
                    help="name=ROOT (that instance's index root)")
    nw.add_argument("--remove-remote", action="append", default=None)

    se = sub.add_parser("settings")
    se.add_argument("action", choices=("get", "patch"))
    se.add_argument("--index-dir", required=True)
    se.add_argument("--json", dest="patch_json", default=None,
                    help="partial camelCase settings object (PATCH "
                         "semantics; null values reset)")
    se.add_argument("--json-file", dest="patch_file", default=None)

    args = ap.parse_args()

    if args.cmd == "settings":
        from meilibridge_spark.sources.tables import (
            get_settings,
            update_settings,
        )

        if args.action == "get":
            out = get_settings(args.index_dir)
        else:
            if bool(args.patch_json) == bool(args.patch_file):
                raise SystemExit(
                    "settings patch needs exactly one of --json/--json-file"
                )
            raw = (
                args.patch_json
                if args.patch_json
                else open(args.patch_file).read()
            )
            try:
                patch = json.loads(raw)
            except json.JSONDecodeError as e:
                raise SystemExit(f"invalid settings JSON: {e}") from None
            if not isinstance(patch, dict):
                raise SystemExit("settings patch must be a JSON object")
            out = update_settings(args.index_dir, patch)
    elif args.cmd == "stats":
        from meilibridge_spark.sources.tables import (
            index_stats,
            instance_stats,
        )

        out = (
            index_stats(args.index_dir)
            if args.index_dir
            else instance_stats(args.root)
        )
    elif args.cmd == "webhooks":
        from meilibridge_spark.sources import webhooks as W

        d = args.index_dir
        if args.action == "list":
            out = {"results": W.list_webhooks(d)}
        elif args.action == "get":
            if not args.uuid:
                raise SystemExit("webhooks get needs --uuid")
            out = W.get_webhook(d, args.uuid)
        elif args.action == "create":
            if not args.url:
                raise SystemExit("webhooks create needs --url")
            make = (
                W.register_config_webhook
                if args.config_defined
                else W.create_webhook
            )
            out = make(d, args.url, _headers(args.header))
        elif args.action == "update":
            if not args.uuid:
                raise SystemExit("webhooks update needs --uuid")
            out = W.update_webhook(
                d, args.uuid, url=args.url,
                headers=_headers(args.header) if args.header else None,
            )
        elif args.action == "delete":
            if not args.uuid:
                raise SystemExit("webhooks delete needs --uuid")
            W.delete_webhook(d, args.uuid)
            out = {"deleted": args.uuid}
        else:
            out = {"results": W.get_deliveries(d, args.uuid)}
    else:
        from meilibridge_spark.sources.network import (
            get_network,
            set_network,
        )

        if args.action == "get":
            out = get_network(args.root)
        else:
            remotes: "dict[str, dict | None]" = {}
            for p in args.remote or []:
                if "=" not in p:
                    raise SystemExit(f"--remote needs name=ROOT, got {p!r}")
                name, _, root = p.partition("=")
                remotes[name] = {"root": root}
            for name in args.remove_remote or []:
                remotes[name] = None
            out = set_network(args.root, args.self_name, remotes)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
