#!/usr/bin/env python3
"""Dev-only: diff two Bench JSON lines (or driver BENCH_r*.json files),
flagging per-query regressions beyond a threshold.

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [ratio=2.0]

Accepts either the raw one-line Bench output or the driver's wrapper
({"tail": "..."} — the JSON line is extracted from the tail text).
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "queries" in d:
            return d
        if isinstance(d, dict) and "tail" in d:
            m = re.search(r'\{"metric".*\}', d["tail"])
            if m:
                return json.loads(m.group(0))
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*\}', text)
    if m:
        return json.loads(m.group(0))
    # Driver wrappers truncate the head of the JSON line; scrape the
    # "name":seconds pairs instead (names that look like query keys).
    pairs = re.findall(r'\\?"([a-z][a-z0-9_]+)\\?":([0-9]+\.[0-9]+)', text)
    qs = {k: float(v) for k, v in pairs if k not in ("value", "sf")}
    if not qs:
        raise SystemExit(f"no bench JSON found in {path}")
    return {"queries": qs}


def main(old_path, new_path, ratio=2.0):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"shared queries: {len(shared)}  "
          f"(old total {sum(oq[q] for q in shared):.1f}s, "
          f"new total {sum(nq[q] for q in shared):.1f}s)")
    regressions = [(q, oq[q], nq[q]) for q in shared
                   if nq[q] > oq[q] * ratio and nq[q] - oq[q] > 0.25]
    wins = [(q, oq[q], nq[q]) for q in shared
            if oq[q] > nq[q] * ratio and oq[q] - nq[q] > 0.25]
    for label, rows in (("REGRESSION", regressions), ("win", wins)):
        for q, a, b in sorted(rows, key=lambda r: r[1] - r[2]):
            print(f"{label:10s} {q:30s} {a:7.2f}s -> {b:7.2f}s")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print("new queries: " + " ".join(
            f"{q}({nq[q]:.2f}s)" for q in only_new))
    return 1 if regressions else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sys.exit(main(sys.argv[1], sys.argv[2], ratio))
