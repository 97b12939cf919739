"""Reference golden-fixture parity (SURVEY.md §5 item 3).

``test_events/segmented_sessions.json`` is the reference's own snapshot of
the segment stage for the 2021-01-03 week, and
``test_events/weekly/2021-01-03__2021-01-08--...json`` is the golden weekly
output the reference published for the SAME post. Reconstructing our
mid-pipeline representation from the former and running our
``segments_to_records`` must reproduce the latter field-for-field.

Two documented divergences, both stale-fixture artifacts, not semantic:

  - dates: the golden fixture assigns the Monday session to the SUNDAY
    (2021-01-03). The reference's CURRENT date code
    (``transforms.py:229-258``: ``start = range_start - isoweekday``;
    records use ``dates[1:]``) puts Monday at 2021-01-04 — as does ours.
    We assert the current semantics.
  - rest day: the fixture's day 4 is the flat list ``["session", "rest
    day"]`` (pre-fix), which the old dict-comprehension exploded into
    ``{"s": "e s s i o n", "r": "e s t   d a y"}`` — visible verbatim in
    ``save_sessions_to_bucket.json``. Current reference code
    (``transforms.py:192``) emits ``[['session', 'rest day']]``; we
    assert that, and that ``clean`` maps it to 'Rest Day'.
"""

from __future__ import annotations

import json
import os

import pytest

_EVENTS = "/root/reference/test_events"
_SEGMENTED = os.path.join(_EVENTS, "segmented_sessions.json")
_WEEKLY = os.path.join(
    _EVENTS, "weekly", "2021-01-03__2021-01-08--5-day-weightlifting-program.json"
)

pytestmark = pytest.mark.skipif(
    not (os.path.exists(_SEGMENTED) and os.path.exists(_WEEKLY)),
    reason="reference fixtures absent",
)

_PIVOT_KEYS = ["session", "Suggested Warm-Up", "A.", "B.", "C.", "D.", "E."]


def _reconstruct_segmented(spark):
    """Fixture day/segment lists → our (post_id, day_idx, seg_idx,
    line_idx, line) stage representation."""
    with open(_SEGMENTED) as f:
        days = json.load(f)["segmented_sessions"]
    rows, line_idx = [], 0
    for d, day in enumerate(days, start=1):
        flat_rest = day and isinstance(day[0], str)  # ["session", "rest day"]
        if flat_rest or not day:
            # rest day: exists at day level, no segment rows (seg_idx=0
            # preamble only) — our rest branch must synthesize the record
            rows.append((1, d, 0, line_idx, "Thursday"))
            line_idx += 1
            continue
        for s, seg in enumerate(day, start=1):
            # seg 1 arrives pre-collapsed as ["session", <marker line>]:
            # upstream it was just the marker line
            lines = seg[1:] if s == 1 else seg
            for line in lines:
                rows.append((1, d, s, line_idx, line))
                line_idx += 1
    return spark.createDataFrame(
        rows, ["post_id", "day_idx", "seg_idx", "line_idx", "line"]
    )


def _stripped_meta(spark):
    return spark.createDataFrame(
        [(1, "january-4-10-2021-5-day-weightlifting-program",
          "January 4-10, 2021 - 5 Day Weightlifting Program",
          "2021-01-03T17:00:00", "unused")],
        ["post_id", "slug", "title", "post_date", "text"],
    )


def test_segments_to_records_matches_weekly_golden(spark):
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.plans.wod_pipeline import segments_to_records

    got = (
        segments_to_records(_reconstruct_segmented(spark), _stripped_meta(spark))
        .withColumn("date", F.date_format("date", "yyyy-MM-dd"))
        .orderBy("date")
        .collect()
    )
    with open(_WEEKLY) as f:
        golden = [json.loads(line) for line in f]
    golden.sort(key=lambda r: r["date"])

    assert len(got) == len(golden) == 6
    # current-reference date semantics: Monday session = Monday
    assert [r.date for r in got] == [
        "2021-01-04", "2021-01-05", "2021-01-06",
        "2021-01-07", "2021-01-08", "2021-01-09",
    ]
    for ours, ref in zip(got, golden):
        for key in _PIVOT_KEYS:
            ref_val = ref.get(key)
            our_val = ours[key]
            if ref["session"] is None and key == "session":
                # stale-fixture rest-day bug: golden has null, current
                # reference semantics (transforms.py:192) say 'rest day'
                assert our_val == "rest day"
            else:
                assert our_val == ref_val, f"{ours.date}/{key!r} diverges"


def test_clean_records_rest_day_and_renames(spark):
    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.operators.clean import DEFAULT_RENAME, clean_records
    from weightlifting_wod_etl_spark.plans.wod_pipeline import segments_to_records

    records = segments_to_records(_reconstruct_segmented(spark), _stripped_meta(spark))
    cleaned = clean_records(records, rename_map=DEFAULT_RENAME)
    rows = {r.date: r for r in cleaned.withColumn(
        "date", F.date_format("date", "yyyy-MM-dd")).collect()}
    # reference clean (transforms.py:318-329): segment keys renamed, rest
    # day surfaces as 'Rest Day', nulls become ''
    rest = rows["2021-01-07"]
    assert rest.session in ("rest day", "Rest Day")
    assert rest.warm_up == ""
    assert rest.segment_a == ""
    mon = rows["2021-01-04"]
    assert mon.session == "Monday (Session One)"
    assert mon.warm_up.startswith("3 Minutes of Cardio")
