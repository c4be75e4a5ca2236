#!/usr/bin/env python3
"""Summarize a pin_ab.sh run into summary.json (AB_R16_RETENTION shape).

Reads $OUT/{head,pin}_pN.json (graft.Bench one-key outputs), extracts
per-run min + iteration list + loadavg, computes head-over-pin
median-of-mins, and calls it:
  <= 1.15  FLAT       (pin fluke / ambient — re-pin to min over all runs)
  <= 1.35  AMBIGUOUS  (rerun with more pairs/iters or on a quieter box)
  >  1.35  REGRESSED  (real — bisect between pin commit and HEAD)

Usage: pin_ab_summarize.py OUT_DIR KEY PIN_SHORT PAIRS
"""
import json
import statistics
import sys


def main():
    out, key, pin_short, pairs = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
    runs = {}
    mins = {"head": [], "pin": []}
    for side in ("head", "pin"):
        for i in range(1, pairs + 1):
            tag = f"{side}_p{i}"
            try:
                d = json.load(open(f"{out}/{tag}.json"))
            except Exception as e:  # noqa: BLE001 - record and continue
                runs[tag] = {"error": str(e)}
                continue
            its = [t for t in d.get("iterations", {}).get(key, []) if t >= 0]
            q = d.get("queries", {}).get(key, -1)
            runs[tag] = {
                "min_sec": q,
                "iterations": its,
                "loadavg_start": d.get("loadavg_start", "?"),
                "loadavg_end": d.get("loadavg_end", "?"),
            }
            if q >= 0:
                mins[side].append(q)
    if not mins["head"] or not mins["pin"]:
        summary = {"key": key, "error": "missing runs", "runs": runs}
    else:
        ratio = statistics.median(mins["head"]) / statistics.median(mins["pin"])
        verdict = ("FLAT" if ratio <= 1.15
                   else "AMBIGUOUS" if ratio <= 1.35 else "REGRESSED")
        summary = {
            "key": key,
            "pin_commit": pin_short,
            "method": (f"interleaved one-key A/B, HEAD vs {pin_short} worktree, "
                       f"direct-java graft.Bench, SPARK_GRAFT_BENCH_ONLY={key}, "
                       f"{pairs} pairs (tools/pin_ab.sh)"),
            "head_mins": mins["head"],
            "pin_mins": mins["pin"],
            "head_over_pin_median_of_mins": round(ratio, 3),
            "verdict": verdict,
            "conservative_repin": round(min(mins["head"] + mins["pin"]), 4),
            "runs": runs,
        }
    with open(f"{out}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}, indent=1))


if __name__ == "__main__":
    main()
