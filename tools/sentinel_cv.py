"""Per-sentinel normalized-CV validation (VERDICT r16 #6).

The 9-member sentinel set was widened in r16 by picking the
lowest-normalized-CV queries over r11–r15 details; the set's job is to
be a LOW-VARIANCE box-drift denominator, so each member's share of the
sentinel sum should be stable run to run. This tool recomputes that
stability over any set of committed bench payloads: for each sentinel,
its share = seconds / sum(all sentinels in the same run), and the CV
(stddev/mean) of that share across runs. A member whose share-CV
drifts far above the 0.05–0.09 selection band is a noisy denominator
component (q_tpch_q6's 0.1–0.2 s magnitude makes it the usual
suspect) and a candidate for replacement.

Usage:
    python tools/sentinel_cv.py BENCH_DETAIL_r15.json BENCH_DETAIL_r16.json \
        BENCH_CAL_r16b.json BENCH_CAL_r16c.json BENCH_CAL_r17a.json ...

Runs missing any sentinel are skipped loudly. Output: one line per
sentinel — mean share, share CV, plus the raw seconds range — sorted
worst-CV first, ready to paste into SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(paths: list[str]) -> None:
    from bench import SENTINELS

    runs = []
    for p in paths:
        with open(p) as f:
            q = json.load(f).get("queries", {})
        missing = [s for s in SENTINELS if not q.get(s)]
        if missing:
            print(f"# skipping {p}: missing sentinels {missing}")
            continue
        runs.append((os.path.basename(p), {s: float(q[s]) for s in SENTINELS}))
    if len(runs) < 3:
        raise SystemExit(f"need >= 3 usable runs, have {len(runs)}")
    print(f"# {len(runs)} runs: {', '.join(n for n, _ in runs)}")
    rows = []
    for s in SENTINELS:
        shares = [t[s] / sum(t.values()) for _, t in runs]
        mean = sum(shares) / len(shares)
        cv = math.sqrt(
            sum((x - mean) ** 2 for x in shares) / (len(shares) - 1)
        ) / mean
        secs = [t[s] for _, t in runs]
        rows.append((cv, s, mean, min(secs), max(secs)))
    print(f"{'sentinel':24} {'share':>7} {'shareCV':>8} {'sec range':>14}")
    for cv, s, mean, lo, hi in sorted(rows, reverse=True):
        print(f"{s:24} {mean:7.3f} {cv:8.3f} {lo:6.3f}-{hi:.3f}")


if __name__ == "__main__":
    main(sys.argv[1:])
