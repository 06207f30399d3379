"""Third-implementation checks for the r11 operators: each distributed
plan is recomputed from the raw parquet in from-scratch pure Python (no
Spark, no DuckDB), so a bug mirrored into the SQL oracle cannot hide.
Runs at sf0.001 to keep the brute-force recurrences cheap."""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq

from kinesis_stream_consumer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> dict:
    return pq.read_table(f"{SF}/{name}.parquet").to_pydict()


def test_sequence_patterns_match_python_reference(spark):
    """Brute-force GSP-style counting: materialize every user's ordered
    event-type chain, slide contiguous windows of 2 and 3, count support
    (distinct users) and occurrences, rank with the query's exact
    tiebreak."""
    ev = _tbl("events")
    chains: dict = defaultdict(list)
    for ts, eid, uid, et in zip(
        ev["ts"], ev["event_id"], ev["user_id"], ev["event_type"]
    ):
        chains[uid].append((ts, eid, et))
    support: Counter = Counter()
    occurrences: Counter = Counter()
    for uid, rows in chains.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        types = [r[2] for r in rows]
        seen = set()
        for k in (2, 3):
            for i in range(len(types) - k + 1):
                gram = types[i : i + k]
                if any(t is None for t in gram):
                    continue
                pat = (k, ">".join(gram))
                occurrences[pat] += 1
                seen.add(pat)
        for pat in seen:
            support[pat] += 1
    want = []
    for k in (2, 3):
        pats = [p for p in occurrences if p[0] == k]
        pats.sort(key=lambda p: (-support[p], -occurrences[p], p[1]))
        for rnk, p in enumerate(pats[:10], start=1):
            want.append((k, p[1], support[p], occurrences[p], rnk))

    got = [
        (r["k"], r["pattern"], r["support"], r["occurrences"], r["rank_in_k"])
        for r in QUERIES["events_sequence_patterns"].fn(spark, SF).collect()
    ]
    assert got == want
