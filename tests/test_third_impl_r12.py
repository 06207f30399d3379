"""Third-implementation checks for the r12 operators: each distributed
plan is recomputed from the raw parquet in from-scratch pure Python (no
Spark, no DuckDB), so a bug mirrored into the SQL oracle cannot hide.
Runs at sf0.001 to keep the brute-force recurrences cheap."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from kinesis_stream_consumer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> dict:
    return pq.read_table(f"{SF}/{name}.parquet").to_pydict()


def test_gapped_sequence_patterns_match_python_reference(spark):
    """Brute-force skip-gram counting: for every user's ordered chain,
    emit (a, b) for each b within the next W events of a, tally support
    (distinct users), occurrences, gap-1 subset, and half-up mean gap in
    centi-units with the query's exact tiebreak."""
    from kinesis_stream_consumer_spark.plans.r12 import _GAP_W

    ev = _tbl("events")
    chains: dict = defaultdict(list)
    for ts, eid, uid, et in zip(
        ev["ts"], ev["event_id"], ev["user_id"], ev["event_type"]
    ):
        chains[uid].append((ts, eid, et))
    support: Counter = Counter()
    occurrences: Counter = Counter()
    gap_total: Counter = Counter()
    n_adjacent: Counter = Counter()
    for uid, rows in chains.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        types = [r[2] for r in rows]
        seen = set()
        for i, a in enumerate(types):
            if a is None:
                continue
            for g in range(1, _GAP_W + 1):
                if i + g >= len(types) or types[i + g] is None:
                    continue
                pat = f"{a}>{types[i + g]}"
                occurrences[pat] += 1
                gap_total[pat] += g
                if g == 1:
                    n_adjacent[pat] += 1
                seen.add(pat)
        for pat in seen:
            support[pat] += 1
    pats = sorted(
        occurrences, key=lambda p: (-support[p], -occurrences[p], p)
    )
    want = [
        (
            p,
            support[p],
            occurrences[p],
            n_adjacent[p],
            (200 * gap_total[p] + occurrences[p]) // (2 * occurrences[p]),
            rnk,
        )
        for rnk, p in enumerate(pats[:15], start=1)
    ]
    got = [
        (
            r["pattern"],
            r["support"],
            r["occurrences"],
            r["n_adjacent"],
            r["mean_gap_centi"],
            r["rank"],
        )
        for r in QUERIES["events_sequence_patterns_gapped"]
        .fn(spark, SF)
        .collect()
    ]
    assert got == want


def test_chi_square_matches_python_bigint_reference(spark):
    """Exact-integer recompute: Python bigints have no overflow, so the
    HUGEINT/DECIMAL(38) half-up per-cell recurrence is pinned against the
    one implementation that cannot wrap. Weekday = ISO (Mon=1)."""
    ev = _tbl("events")
    cells: Counter = Counter()
    for ts, et in zip(ev["ts"], ev["event_type"]):
        if et is None:
            continue
        cells[(et, ts.isoweekday())] += 1
    n = sum(cells.values())
    rows_: Counter = Counter()
    cols_: Counter = Counter()
    for (et, dw), o in cells.items():
        rows_[et] += o
        cols_[dw] += o
    chi2_micro = 0
    for (et, dw), o in cells.items():
        num = o * n - rows_[et] * cols_[dw]
        den = n * rows_[et] * cols_[dw]
        chi2_micro += (2 * 1000000 * num * num + den) // (2 * den)
    mindf = min(len(rows_) - 1, len(cols_) - 1)
    want_v = round(math.sqrt((chi2_micro / 1000000.0) / (n * mindf)), 6)

    row = QUERIES["agg_chi_square_independence"].fn(spark, SF).collect()[0]
    assert row["n_events"] == n
    assert row["n_types"] == len(rows_)
    assert row["n_dows"] == len(cols_)
    assert row["df"] == (len(rows_) - 1) * (len(cols_) - 1)
    assert row["chi2_micro"] == chi2_micro
    assert row["cramers_v"] == want_v


def test_hodges_lehmann_matches_python_reference(spark):
    """Walsh-average pseudomedian recomputed by materializing every i<=j
    pair of the SAME deterministic sample (modulus from the corpus row
    count) and taking the lower nearest-rank median of the pair SUMS."""
    from kinesis_stream_consumer_spark.plans.r12 import _HL_SAMPLE_TARGET

    ev = _tbl("events")
    n_total = len(ev["event_id"])
    m = max(1, n_total // _HL_SAMPLE_TARGET)
    sample: dict = defaultdict(list)
    for eid, et, v in zip(ev["event_id"], ev["event_type"], ev["value"]):
        if eid % m == 0 and v is not None:
            sample[et].append(v)
    want = []
    for et in sorted(sample):
        vals = sample[et]
        sums = sorted(
            vals[i] + vals[j]
            for i in range(len(vals))
            for j in range(i, len(vals))
        )
        r = (len(sums) + 1) // 2
        want.append(
            (
                et,
                len(vals),
                len(sums),
                round(sums[r - 1] / 2, 4),
                round(sum(vals) / len(vals), 4),
            )
        )
    got = [
        (
            r["event_type"],
            r["n_sample"],
            r["n_pairs"],
            r["hl_location"],
            r["sample_mean"],
        )
        for r in QUERIES["agg_hodges_lehmann"].fn(spark, SF).collect()
    ]
    assert got == want
