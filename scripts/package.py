"""Build meilibridge_spark.zip for ``spark-submit --py-files``
(north_rule: the engine ships as --py-files jobs; the module docstrings
of jobs/build_index.py and jobs/query.py reference exactly this
artifact).

The zip contains the pure-Python package only — no tests, no caches —
with deterministic member order and zeroed timestamps so the artifact
is byte-reproducible for a given tree (same property the snapshot
manifests rely on for auditability).

Usage: python scripts/package.py [--out meilibridge_spark.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "meilibridge_spark"


def build_zip(out_path: str, repo: str = REPO) -> "list[str]":
    """Write the --py-files artifact; returns the archived member names
    (sorted, repo-relative, forward-slash) for callers/tests to audit."""
    members: "list[str]" = []
    pkg_root = os.path.join(repo, PKG)
    for root, dirs, files in os.walk(pkg_root):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                members.append(os.path.relpath(full, repo).replace(os.sep, "/"))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in members:
            # fixed date_time -> byte-identical zip for identical sources
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(os.path.join(repo, rel), "rb") as f:
                zf.writestr(info, f.read(), zipfile.ZIP_DEFLATED)
    return members


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, f"{PKG}.zip"))
    args = ap.parse_args()
    members = build_zip(args.out)
    print(f"{args.out}: {len(members)} modules")


if __name__ == "__main__":
    main()
