#!/usr/bin/env python3
"""Round-over-round bench comparison (codifies the per-round forensics).

Compares two graft.Bench output files (the full JSON object with
"queries" = per-query min, "spread" = (max-min)/min, "loadavg_*").
Flags queries whose min moved by more than THRESH x, annotated with both
rounds' spreads so an environmental outlier (high spread) is visible
next to a genuine plan change (low spread, stable ratio).

Usage: bench_compare.py OLD.json NEW.json [thresh=1.5]
"""
import json
import sys


def load(path):
    with open(path) as f:
        obj = json.load(f)
    if "queries" not in obj:
        sys.exit(f"{path}: not a bench output (no 'queries' field)")
    return obj


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    for tag, o in (("old", old), ("new", new)):
        print(f"{tag}: total={o.get('value')}s n={len(o['queries'])} "
              f"load={o.get('loadavg_start')} -> {o.get('loadavg_end')} "
              f"sf={o.get('sf')}")
    oq, nq = old["queries"], new["queries"]
    osp, nsp = old.get("spread", {}), new.get("spread", {})
    both = sorted(set(oq) & set(nq))
    moved = []
    for k in both:
        if oq[k] <= 0 or nq[k] <= 0:
            continue  # -1 sentinel = failed iteration
        r = nq[k] / oq[k]
        if r >= thresh or r <= 1 / thresh:
            moved.append((r, k))
    for k in sorted(set(nq) - set(oq)):
        print(f"  NEW       {k:30s} {nq[k]:8.3f}s  spread={nsp.get(k, -1):.2f}")
    for k in sorted(set(oq) - set(nq)):
        print(f"  REMOVED   {k:30s} was {oq[k]:8.3f}s")
    if not moved:
        print(f"no query moved >= {thresh}x in either direction")
        return
    for r, k in sorted(moved, reverse=True):
        arrow = "SLOWER" if r > 1 else "faster"
        print(f"  {arrow}  {k:30s} {oq[k]:8.3f} -> {nq[k]:8.3f}  ({r:4.2f}x)"
              f"  spread {osp.get(k, -1):.2f} -> {nsp.get(k, -1):.2f}")


if __name__ == "__main__":
    main()
