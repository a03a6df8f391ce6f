"""CLI: query the task journal (GET /tasks, GET /tasks/{uid},
POST /tasks/cancel analogs). Pure metadata — no SparkSession.

Usage:
  python -m meilibridge_spark.jobs.tasks list --index-dir DIR \
      [--statuses succeeded,failed] [--types documentAdditionOrUpdate] \
      [--from-uid N] [--limit 20]
  python -m meilibridge_spark.jobs.tasks get --index-dir DIR --uid N
  python -m meilibridge_spark.jobs.tasks wait --index-dir DIR --uid N \
      [--timeout 60]
  python -m meilibridge_spark.jobs.tasks cancel --index-dir DIR \
      --uids 1,2,3
  python -m meilibridge_spark.jobs.tasks delete --index-dir DIR \
      --uids 1,2,3
"""

from __future__ import annotations

import argparse
import json


def _csv(s: "str | None") -> "list[str] | None":
    return [x.strip() for x in s.split(",") if x.strip()] if s else None


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list")
    ls.add_argument("--index-dir", required=True)
    ls.add_argument("--statuses", default=None)
    ls.add_argument("--types", default=None)
    ls.add_argument("--index-uids", default=None)
    ls.add_argument("--from-uid", type=int, default=None)
    ls.add_argument("--limit", type=int, default=20)

    gt = sub.add_parser("get")
    gt.add_argument("--index-dir", required=True)
    gt.add_argument("--uid", type=int, required=True)

    wt = sub.add_parser("wait")
    wt.add_argument("--index-dir", required=True)
    wt.add_argument("--uid", type=int, required=True)
    wt.add_argument("--timeout", type=float, default=60.0)

    cn = sub.add_parser("cancel")
    cn.add_argument("--index-dir", required=True)
    cn.add_argument("--uids", required=True)

    dl = sub.add_parser("delete")
    dl.add_argument("--index-dir", required=True)
    dl.add_argument("--uids", required=True)

    bt = sub.add_parser("batches")
    bt.add_argument("--index-dir", required=True)
    bt.add_argument("--from-uid", type=int, default=None)
    bt.add_argument("--limit", type=int, default=20)

    args = ap.parse_args()

    from meilibridge_spark.sources import tasks as T

    if args.cmd == "list":
        out = T.get_tasks(
            args.index_dir,
            statuses=_csv(args.statuses),
            types=_csv(args.types),
            index_uids=_csv(args.index_uids),
            from_uid=args.from_uid,
            limit=args.limit,
        )
    elif args.cmd == "get":
        out = T.get_task(args.index_dir, args.uid)
    elif args.cmd == "wait":
        out = T.wait_for_task(args.index_dir, args.uid, timeout=args.timeout)
    elif args.cmd == "batches":
        out = T.get_batches(
            args.index_dir, from_uid=args.from_uid, limit=args.limit
        )
    elif args.cmd == "delete":
        out = T.delete_tasks(
            args.index_dir, [int(u) for u in args.uids.split(",")]
        )
    else:
        out = T.cancel_tasks(
            args.index_dir, [int(u) for u in args.uids.split(",")]
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
