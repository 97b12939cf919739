"""Mechanical calibration-to-calibration bench comparison (VERDICT r16 #4).

The adjudication rule written into bench.py's methodology string —
official per-round runs are advisory; same-code calibration runs
adjudicate, on the sentinel-NORMALIZED channel — was prose plus ad-hoc
python until now. This tool takes any two bench payloads
(BENCH_DETAIL_r*.json / BENCH_CAL_*.json, or any file with a
``queries`` timing map) and emits the one number the rule needs plus
the evidence around it:

- common-sentinel sums on each side (the box-drift measure),
- the normalized-common-query geomean (the adjudicated verdict),
- the worst normalized movers in both directions (attribution targets),
- raw totals for context (NEVER the verdict — raw drift is the thing
  the normalization exists to cancel).

Usage:
    python tools/bench_compare.py PRIOR.json CURRENT.json [--top 8] [--json]

Exit code is always 0 — this reports; the human (or SCALE.md record)
adjudicates. ``--json`` prints one machine-readable line instead of the
table, for embedding in round records.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timings(payload: dict) -> dict[str, float]:
    q = payload.get("queries", {})
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float)) and v > 0}


def compare(prior: dict, current: dict) -> dict:
    from bench import SENTINELS  # single source of truth for the set

    ta, tb = _timings(prior), _timings(current)
    common_sentinels = [
        s for s in SENTINELS if ta.get(s, 0) > 0 and tb.get(s, 0) > 0
    ]
    if not common_sentinels:
        raise SystemExit(
            "no common sentinels between the two runs — cannot normalize"
        )
    sa = sum(ta[s] for s in common_sentinels)
    sb = sum(tb[s] for s in common_sentinels)
    common = sorted(set(ta) & set(tb))
    ratios = {q: (tb[q] / sb) / (ta[q] / sa) for q in common}
    geomean = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    movers = sorted(ratios.items(), key=lambda kv: kv[1], reverse=True)
    return {
        "common_sentinels": common_sentinels,
        "sentinel_sum_prior": round(sa, 3),
        "sentinel_sum_current": round(sb, 3),
        "box_drift": round(sb / sa, 3),
        "n_common": len(common),
        "raw_total_prior": round(sum(ta[q] for q in common), 1),
        "raw_total_current": round(sum(tb[q] for q in common), 1),
        "norm_geomean": round(geomean, 3),
        "over_2x": sorted(q for q, r in ratios.items() if r > 2.0),
        # FULL sorted lists — callers slice (ADVICE r17 #1: a pre-slice
        # here silently capped --top values above 8)
        "slowest_movers": [(q, round(r, 2)) for q, r in movers],
        "fastest_movers": [(q, round(r, 2)) for q, r in movers[::-1]],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prior")
    ap.add_argument("current")
    ap.add_argument("--top", type=int, default=8)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    with open(args.prior) as f:
        prior = json.load(f)
    with open(args.current) as f:
        current = json.load(f)
    r = compare(prior, current)
    r["slowest_movers"] = r["slowest_movers"][: args.top]
    r["fastest_movers"] = r["fastest_movers"][: args.top]
    if args.json:
        print(json.dumps({"prior": args.prior, "current": args.current, **r}))
        return
    print(f"prior:   {args.prior}")
    print(f"current: {args.current}")
    print(
        f"common sentinels ({len(r['common_sentinels'])}): "
        f"{', '.join(r['common_sentinels'])}"
    )
    print(
        f"sentinel sum: {r['sentinel_sum_prior']} -> "
        f"{r['sentinel_sum_current']} s  (box drift x{r['box_drift']})"
    )
    print(
        f"raw total over {r['n_common']} common queries: "
        f"{r['raw_total_prior']} -> {r['raw_total_current']} s  (context only)"
    )
    print(f"NORMALIZED GEOMEAN: {r['norm_geomean']}  <- the adjudicated number")
    print(f"queries over 2x normalized: {r['over_2x'] or 'none'}")
    print("worst movers (normalized):")
    for q, ratio in r["slowest_movers"]:
        print(f"  {ratio:6.2f}  {q}")
    print("best movers (normalized):")
    for q, ratio in r["fastest_movers"]:
        print(f"  {ratio:6.2f}  {q}")


if __name__ == "__main__":
    main()
