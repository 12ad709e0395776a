"""Refresh ckpts/MANIFEST.json entries for the round-4 artifacts.

Hashes an orbax checkpoint DIRECTORY deterministically (sorted relative
paths + file bytes) so provenance survives re-serialization layout
differences in file order.

    python tools/update_manifest.py --name r4_full --path ckpts/r4_full \
        --provenance "..."
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "ckpts", "MANIFEST.json")


def dir_sha256(path: str) -> tuple[str, int]:
    h = hashlib.sha256()
    total = 0
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for name in sorted(files):
            fp = os.path.join(root, name)
            rel = os.path.relpath(fp, path)
            h.update(rel.encode())
            with open(fp, "rb") as f:
                while True:
                    chunk = f.read(1 << 20)
                    if not chunk:
                        break
                    h.update(chunk)
                    total += len(chunk)
    return h.hexdigest(), total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--path", required=True)
    ap.add_argument("--provenance", required=True)
    ap.add_argument("--committed", action="store_true",
                    help="mark the artifact as committed to the repo "
                         "(default: gitignored intermediate)")
    args = ap.parse_args()

    # fail fast: a missing/empty directory would otherwise record the
    # empty-input SHA-256 (e3b0c44...) as if it were real provenance
    if not os.path.isdir(args.path):
        raise SystemExit(f"not a directory: {args.path}")
    digest, nbytes = dir_sha256(args.path)
    if nbytes == 0:
        raise SystemExit(f"hashed zero bytes under {args.path}; refusing "
                         "to record empty-tree provenance")
    manifest = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            manifest = json.load(f)
    manifest[args.name] = {
        "path": os.path.relpath(os.path.abspath(args.path), REPO),
        "sha256_of_tree": digest,
        "bytes": nbytes,
        "provenance": args.provenance,
        "committed": args.committed,
    }
    with open(MANIFEST, "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest[args.name]))


if __name__ == "__main__":
    main()
