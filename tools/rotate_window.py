"""Propose the next _WINDOW_PRIORITY for queries_registry.py.

The external correctness driver verifies only the FIRST 50 registered
queries. This tool diffs every CORRECTNESS_r*.json against the current
registry and prints a priority list that puts (1) never-verified queries,
(2) least-recently-verified queries, in front — so the window rotates
until every query has been green at least once, then keeps cycling by
staleness.

Usage:  python tools/rotate_window.py [--window 50] [--front a,b,...]
Paste the output over _WINDOW_PRIORITY before a round's first commit.

``--front``: comma-separated queries forced into the window ahead of the
staleness ranking (after the overdue set, which always comes first).
STANDING RULE (ADVICE r14 #2, applied r15): any query MATERIALLY
REWRITTEN in the current round — a new plan shape, a changed helper in
its value path — must occupy a spare slot in that round's window so the
new shape gets end-to-end driver oracle evidence immediately, instead
of coasting on the last rotation's green for its OLD shape. Spare slots
= window minus overdue count; when rewrites exceed spare slots, prefer
plan-shape rewrites over proven value-identical helper swaps.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    from weightlifting_wod_etl_spark.queries_registry import (
        DRIVER_WINDOW_SIZE,
        _WINDOW_TAIL,
        QUERIES,
    )

    ap.add_argument("--window", type=int, default=DRIVER_WINDOW_SIZE)
    ap.add_argument(
        "--front", default="",
        help="comma-separated queries rewritten this round: forced into "
        "the window right after the overdue set (standing rule, see "
        "module docstring)",
    )
    args = ap.parse_args()

    # last round each query was verified green (rows+schema+hash all true)
    last_green: dict[str, int] = {}
    seen_rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        # regex-guarded like bench.py's artifact parser: a stray
        # CORRECTNESS_r10_bak.json must be skipped, not crash int()
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        seen_rounds.append(rnd)
        with open(path) as f:
            for name, res in json.load(f).items():
                if isinstance(res, dict) and res.get("hash_match"):
                    last_green[name] = max(last_green.get(name, 0), rnd)

    # sort: never-green first, then stalest green, stable by name.
    # _WINDOW_TAIL queries are rows-only BY DESIGN — they can never
    # hash-match, so they must never consume a window slot (they would
    # otherwise rank first forever as "never green").
    ranked = sorted(
        (q for q in QUERIES if q not in _WINDOW_TAIL),
        key=lambda q: (last_green.get(q, -1), q),
    )
    never = [q for q in ranked if q not in last_green]
    print(f"# window={args.window}  total={len(QUERIES)}  "
          f"never-green={len(never)}  rounds-seen={len(seen_rounds)}  "
          f"tail(excluded)={list(_WINDOW_TAIL)}")
    if never:
        print("# never verified green:", ", ".join(never))
    # staleness histogram: how many queries were last green in each round.
    # The bound test (test_driver_staleness_is_bounded) requires everything
    # at <= max(round)-2 to fit inside the window — check feasibility here.
    from collections import Counter

    hist = Counter(last_green.get(q, 0) for q in ranked)
    print("# staleness histogram (round -> count, 0 = never):",
          dict(sorted(hist.items())))
    overdue = sum(
        n for rnd, n in hist.items()
        if seen_rounds and rnd <= max(seen_rounds) - 2
    )
    if overdue > args.window:
        print(f"# WARNING: {overdue} overdue queries exceed the "
              f"{args.window}-slot window — staleness bound not satisfiable "
              "this round; front the stalest and expect the test to flag it")
    forced = [q for q in args.front.split(",") if q]
    unknown = [q for q in forced if q not in QUERIES or q in _WINDOW_TAIL]
    if unknown:
        raise SystemExit(f"--front names not in the (oracled) registry: {unknown}")
    if forced:
        # overdue (<= max-2) keep absolute priority — the staleness test
        # is a hard bound; forced rewrites take the spare slots after them
        cutoff = max(seen_rounds) - 2 if seen_rounds else 0
        overdue_set = [q for q in ranked if last_green.get(q, 0) <= cutoff]
        rest = [q for q in ranked if q not in overdue_set and q not in forced]
        ranked = overdue_set + [q for q in forced if q not in overdue_set] + rest
        # ADVICE r15 #3: forced rewrites that don't fit after the
        # overdue set would be silently truncated by ranked[:window] —
        # the standing rewritten-this-round rule would be violated
        # without a trace. Mirror the overdue-overflow warning.
        dropped = [q for q in forced if q not in ranked[: args.window]]
        if dropped:
            print(f"# WARNING: forced (--front) queries landed OUTSIDE the "
                  f"first {args.window} slots and will NOT be driver-checked "
                  f"this round: {', '.join(dropped)} — retire/merge a "
                  "duplicate query to free slots (VERDICT r15 #2 models)")
    print("_WINDOW_PRIORITY = [")
    for q in ranked[: args.window]:
        tag = "never" if q not in last_green else f"last green r{last_green[q]:02d}"
        print(f'    "{q}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
