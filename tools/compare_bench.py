"""Diff two bench JSON outputs (BENCH_r{N}.json or `python bench.py`
lines): per-query wall-time deltas, sorted by change.

Usage: python tools/compare_bench.py OLD.json NEW.json [--threshold 0.2]
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        # bench.py log output: the JSON object is the last line
        d = json.loads(text.splitlines()[-1])
    # driver BENCH_r{N}.json wraps the bench line under "parsed"
    return d.get("parsed", d) if isinstance(d.get("parsed", None), dict) else d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.2,
                    help="flag |delta| above this fraction")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})

    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a > 0:
            rows.append((name, a, b, (b - a) / a))
        else:
            rows.append((name, a, b, None))
    rows.sort(key=lambda r: (r[3] is None, r[3] if r[3] is not None else 0))

    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for name, a, b, d in rows:
        if d is None:
            tag = "added" if a is None else ("removed" if b is None else "n/a")
            print(f"{name:34s} {a if a is not None else '-':>8} "
                  f"{b if b is not None else '-':>8} {tag:>8s}")
        else:
            flag = "  <<" if abs(d) >= args.threshold else ""
            print(f"{name:34s} {a:8.2f} {b:8.2f} {d:+7.0%}{flag}")

    for key in ("wall_sec", "docs_per_sec"):
        a, b = old.get(key), new.get(key)
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a:
            print(f"headline {key}: {a} -> {b} ({(b - a) / a:+.0%})")


if __name__ == "__main__":
    main()
