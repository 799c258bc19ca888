"""Benchmark-suite runner.

Usage:
    python -m benchmarks.run [--suite poly,lib,binfhe,encoding,serialize,compare]
                             [--out benchmarks/results/<tag>.jsonl]

The in-tree analogue of the reference's benchmark binaries
(/root/reference/benchmark/src/ — google-benchmark; raw outputs
committed as BENCHMARKS_CPU_microbench.txt).  Writes one JSON line per
case, a meta header, and prints a markdown summary table; committed
artifacts live in benchmarks/results/.
"""

from __future__ import annotations

import argparse
import sys

from . import core

SUITES = ("poly", "lib", "binfhe", "encoding", "serialize", "compare")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default=",".join(SUITES))
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    backend = core.ensure_backend()
    print(f"# backend: {backend}", file=sys.stderr)

    done = []
    for name in args.suite.split(","):
        name = name.strip()
        if not name:
            continue
        if name not in SUITES:
            print(f"# unknown suite {name!r} (have {SUITES})",
                  file=sys.stderr)
            continue
        mod = __import__(f"benchmarks.{name}_bench",
                         fromlist=["run"])
        print(f"# === suite {name} ===", file=sys.stderr)
        done.append(mod.run())

    if args.out:
        core.write_results(done, args.out)

    # markdown summary
    print("\n| suite | case | us | vs ref CPU |")
    print("|---|---|---|---|")
    for s in done:
        for rec in s.records:
            if "error" in rec:
                print(f"| {s.name} | {rec['case']} | ERROR | |")
                continue
            v = rec.get("value")
            vs = rec.get("vs_ref", "")
            print(f"| {s.name} | {rec['case']} | "
                  f"{'-' if v is None else v} | {vs} |")


if __name__ == "__main__":
    main()
