#!/usr/bin/env python3
"""Summarize a pin_ab.sh run into summary.json (AB_R16_RETENTION shape).

Reads $OUT/{head,pin}_pN.json (graft.Bench outputs), extracts per-run
min + iteration list + loadavg PER KEY (KEY may be a comma-separated
list — one interleaved A/B adjudicates them all, r18), computes
head-over-pin median-of-mins, and calls each key:
  <= 1.15  FLAT       (pin fluke / ambient — re-pin to min over all runs)
  <= 1.35  AMBIGUOUS  (rerun with more pairs/iters or on a quieter box)
  >  1.35  REGRESSED  (real — bisect between pin commit and HEAD)

summary.json: single-key runs keep the flat AB_R16_RETENTION shape;
multi-key runs nest one such object per key under "keys".

Usage: pin_ab_summarize.py OUT_DIR KEY[,KEY...] PIN_SHORT PAIRS
"""
import json
import statistics
import sys


def summarize_key(out, key, pin_short, pairs, bench_only):
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
        return {"key": key, "error": "missing runs", "runs": runs}
    ratio = statistics.median(mins["head"]) / statistics.median(mins["pin"])
    verdict = ("FLAT" if ratio <= 1.15
               else "AMBIGUOUS" if ratio <= 1.35 else "REGRESSED")
    return {
        "key": key,
        "pin_commit": pin_short,
        "method": (f"interleaved A/B, HEAD vs {pin_short} worktree, "
                   f"direct-java graft.Bench, SPARK_GRAFT_BENCH_ONLY={bench_only}, "
                   f"{pairs} pairs (tools/pin_ab.sh)"),
        "head_mins": mins["head"],
        "pin_mins": mins["pin"],
        "head_over_pin_median_of_mins": round(ratio, 3),
        "verdict": verdict,
        "conservative_repin": round(min(mins["head"] + mins["pin"]), 4),
        "runs": runs,
    }


def main():
    out, keys, pin_short, pairs = (
        sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
    key_list = [k.strip() for k in keys.split(",") if k.strip()]
    # provenance must record what the bench ACTUALLY ran: the full
    # comma list, not the single key being summarized (a multi-key
    # session has different warm-up/interleaving than a one-key run)
    if len(key_list) == 1:
        summary = summarize_key(out, key_list[0], pin_short, pairs, keys)
    else:
        summary = {
            "keys": {k: summarize_key(out, k, pin_short, pairs, keys)
                     for k in key_list},
            "pin_commit": pin_short,
        }
    with open(f"{out}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)

    def strip(d):
        return {k: v for k, v in d.items() if k != "runs"}
    if "keys" in summary:
        print(json.dumps({**summary, "keys": {
            k: strip(v) for k, v in summary["keys"].items()}}, indent=1))
    else:
        print(json.dumps(strip(summary), indent=1))


if __name__ == "__main__":
    main()
