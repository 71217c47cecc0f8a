#!/usr/bin/env python3
"""Self-evidencing leak scan (round-9 VERDICT ask #2 / r7 ADVICE).

Scans every tracked source/config file under src/, tools/, build.sbt,
project/ for the seven leak categories and rewrites LEAKCHECK.json with
run evidence (UTC timestamp, scanned-file count, per-category hit
lists) so a stale copy is distinguishable from a fresh run.
"""
import json
import os
import re
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PATTERNS = {
    # private/internal package or host shapes that must never appear in
    # a from-public-knowledge build (the categories mirror the driver's)
    "internal-import": r"import\s+(?:com\.anthropic|ant\.|anthropic\.)",
    "internal-url": r"https?://[a-z0-9.-]*\.(?:corp|internal|intranet)\b",
    "internal-pkg2": r"\b(?:claude-cli-internal|anthropics/)",
    "internal-bucket": r"s3://(?!bucket|my-|example|test)[a-z0-9.-]*(?:internal|corp|prod)",
    "slack-link": r"\b(?:go/[a-z-]+|#claude-code-[a-z-]+)\b",
    "api-key": r"\b(?:sk-ant-|AKIA[0-9A-Z]{16}|xox[baprs]-)",
    "axon-env": r"\bAXON_[A-Z_]+\b",
}


def tracked_files():
    out = subprocess.check_output(["git", "ls-files"], cwd=REPO, text=True)
    keep = []
    for f in out.splitlines():
        if f == "tools/leakcheck.py":
            continue  # the pattern definitions match themselves
        if f.startswith(("src/", "tools/", "project/")) or f == "build.sbt":
            keep.append(f)
    return keep


def main():
    files = tracked_files()
    hits = {k: [] for k in PATTERNS}
    compiled = {k: re.compile(v) for k, v in PATTERNS.items()}
    for f in files:
        try:
            text = open(os.path.join(REPO, f), encoding="utf-8",
                        errors="replace").read()
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for cat, rx in compiled.items():
                if rx.search(line):
                    hits[cat].append(f"{f}:{i}")
    n_hits = sum(len(v) for v in hits.values())
    record = {
        "round": int(sys.argv[1]) if len(sys.argv) > 1 else 9,
        "run_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "n_files_scanned": len(files),
        "scanner": "tools/leakcheck.py",
        "n_hits": n_hits,
        "hits": hits,
    }
    out = os.path.join(REPO, "LEAKCHECK.json")
    with open(out, "w") as fh:
        json.dump(record, fh, indent=2)
        fh.write("\n")
    print(f"scanned {len(files)} files, {n_hits} hits -> {out}")
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main())
