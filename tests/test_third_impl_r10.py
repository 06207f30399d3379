"""Third-implementation checks for the r10-continuation operators: each
distributed plan is recomputed from the raw parquet in from-scratch pure
Python (hashlib / int arithmetic — no Spark, no DuckDB), so a bug mirrored
into the SQL oracle cannot hide. Runs at sf0.001 to keep the brute-force
recurrences cheap."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from kinesis_stream_consumer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> dict:
    return pq.read_table(f"{SF}/{name}.parquet").to_pydict()


def _md5_u56(s: str) -> int:
    """Pure-python md5_u56_le: little-endian u64 of the first 8 md5
    bytes, top 56 bits (== DuckDB md5_number_upper(s) >> 8)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") >> 8


def test_changepoint_matches_python_reference(spark):
    ev = _tbl("events")
    daily: Counter = Counter()
    for ts, et in zip(ev["ts"], ev["event_type"]):
        daily[(et, ts.date())] += 1
    by_type: dict = defaultdict(list)
    for (et, day), c in sorted(daily.items()):
        by_type[et].append((day, c))
    want = {}
    for et, rows in by_type.items():
        n = len(rows)
        s = sum(c for _, c in rows)
        q = sum(c * c for _, c in rows)
        best_enc = None
        si = 0
        encs = []
        for i, (day, c) in enumerate(rows, start=1):
            si += c
            if i < n:
                obj = (
                    n * (n - i) * si * si
                    + n * i * (s - si) * (s - si)
                    - i * (n - i) * s * s
                )
                encs.append((obj * 1024 + (1023 - i), i, day, si))
        best = max(encs)
        _, i, day, si = best
        d = i * (n - i) * (n * q - s * s)
        if d <= 0:
            continue
        obj = best[0] // 1024
        want[et] = (
            n,
            day,
            i,
            (2000 * si + i) // (2 * i),
            (2000 * (s - si) + (n - i)) // (2 * (n - i)),
            (20000 * obj + d) // (2 * d),
        )
    got = {
        r["event_type"]: (
            r["n_days"],
            r["split_day"],
            r["left_days"],
            r["left_rate_milli"],
            r["right_rate_milli"],
            r["gain_bp"],
        )
        for r in QUERIES["ts_changepoint_rate"].fn(spark, SF).collect()
    }
    assert got == want


def test_markov_stationary_matches_python_reference(spark):
    ev = _tbl("events")
    per_user: dict = defaultdict(list)
    for ts, eid, uid, et in zip(
        ev["ts"], ev["event_id"], ev["user_id"], ev["event_type"]
    ):
        per_user[uid].append((ts, eid, et))
    tr: Counter = Counter()
    for uid, rows in per_user.items():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            tr[(a, b)] += 1
    n_out: Counter = Counter()
    for (a, _), c in tr.items():
        n_out[a] += c
    k = len(n_out)
    p = {a: 1000000 // k for a in n_out}
    for _ in range(6):
        nxt: Counter = Counter()
        for (a, b), c in tr.items():
            if a in p:
                nxt[b] += (p[a] * c) // n_out[a]
        p = dict(nxt)
    got = {
        r["event_type"]: r["p_micro"]
        for r in QUERIES["events_markov_stationary"].fn(spark, SF).collect()
    }
    assert got == p


def test_poisson_bootstrap_matches_python_reference(spark):
    o = _tbl("orders")
    cents = [math.floor(v * 100 + 0.5) for v in o["o_totalprice"]]
    keys = [str(kk) for kk in o["o_orderkey"]]
    thresholds = (367879, 735759, 919699, 981012, 996340)

    def weight(key: str, b: int) -> int:
        u6 = _md5_u56(f"{key}:{b}") % 1000000
        for w, t in enumerate(thresholds):
            if u6 < t:
                return w
        return 5

    means = []
    for b in range(32):
        wsum = wc = 0
        for key, c in zip(keys, cents):
            w = weight(key, b)
            wsum += w
            wc += w * c
        means.append(((2 * wc + wsum) // (2 * wsum), b))
    means.sort()
    n = len(cents)
    want = {
        "n_orders": n,
        "point_mean_cents": (2 * sum(cents) + n) // (2 * n),
        "boot_lo_cents": means[1][0],
        "boot_hi_cents": means[30][0],
        "boot_median_milli": 500 * (means[15][0] + means[16][0]),
    }
    row = QUERIES["agg_poisson_bootstrap_ci"].fn(spark, SF).collect()[0]
    assert {kk: row[kk] for kk in want} == want


def test_ks_two_sample_matches_python_reference(spark):
    cust = _tbl("customer")
    nat = _tbl("nation")
    nname = dict(zip(nat["n_nationkey"], nat["n_name"]))
    seg_of = {
        ck: (s, nname[nk])
        for ck, s, nk in zip(
            cust["c_custkey"], cust["c_mktsegment"], cust["c_nationkey"]
        )
        if s in ("BUILDING", "MACHINERY")
    }
    o = _tbl("orders")
    per_nation: dict = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for ck, v in zip(o["o_custkey"], o["o_totalprice"]):
        if ck in seg_of:
            seg, nation = seg_of[ck]
            c = math.floor(v * 100 + 0.5)
            per_nation[nation][c][0 if seg == "BUILDING" else 1] += 1
    want = {}
    for nation, grid in per_nation.items():
        cum1 = cum2 = 0
        n1 = sum(v[0] for v in grid.values())
        n2 = sum(v[1] for v in grid.values())
        if n1 == 0 or n2 == 0:
            continue
        d = 0
        for c in sorted(grid):
            cum1 += grid[c][0]
            cum2 += grid[c][1]
            d = max(d, abs(cum1 * n2 - cum2 * n1))
        want[nation] = (n1, n2, d, (2 * 10000 * d + n1 * n2) // (2 * n1 * n2))
    got = {
        r["nation"]: (r["n1"], r["n2"], r["d_num"], r["ks_bp"])
        for r in QUERIES["agg_ks_two_sample"].fn(spark, SF).collect()
    }
    assert got == want


def test_pca_power_iteration_matches_python_reference(spark):
    emb = _tbl("embeddings")
    # quantize exactly as the plan does: double-widened component * 1e4
    rows = [
        [math.floor(float(x) * 10000 + 0.5) for x in vec]
        for vec in emb["embedding"]
    ]
    dim = 64
    gram = [[0] * dim for _ in range(dim)]
    for r in rows:
        for i in range(dim):
            ri = r[i]
            if ri == 0:
                continue
            gi = gram[i]
            for j in range(dim):
                gi[j] += ri * r[j]
    v = [100000] * dim
    for _ in range(3):
        y = [sum(gram[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(t) for t in y)
        assert m >= 100000
        v = [(t + m) // (m // 100000) - 100000 for t in y]
    got = {
        r["dim"]: r["loading_e5"]
        for r in QUERIES["sim_pca_power_iteration"].fn(spark, SF).collect()
    }
    assert got == {i: v[i] for i in range(dim)}


def test_rolling_median_matches_python_reference(spark):
    ev = _tbl("events")
    daily: Counter = Counter()
    for ts, et, v in zip(ev["ts"], ev["event_type"], ev["value"]):
        daily[(et, ts.date())] += math.floor(v * 100 + 0.5)
    by_type: dict = defaultdict(list)
    for (et, day), c in sorted(daily.items()):
        by_type[et].append((day, c))
    want = {}
    for et, rows in by_type.items():
        for i in range(6, len(rows)):
            window = sorted(c for _, c in rows[i - 6 : i + 1])
            want[(et, rows[i][0])] = window[3]  # odd count: exact middle
    got = {
        (r["event_type"], r["day"]): r["med_cents"]
        for r in QUERIES["window_rolling_median"].fn(spark, SF).collect()
    }
    assert got == want


def test_qq_deciles_matches_python_reference(spark):
    cust = _tbl("customer")
    seg_of = {
        ck: s
        for ck, s in zip(cust["c_custkey"], cust["c_mktsegment"])
        if s in ("BUILDING", "MACHINERY")
    }
    o = _tbl("orders")
    series: dict = defaultdict(list)
    for ck, v in zip(o["o_custkey"], o["o_totalprice"]):
        if ck in seg_of:
            series[seg_of[ck]].append(math.floor(v * 100 + 0.5))
    for s in series:
        series[s].sort()
    want = {}
    for d in range(1, 10):
        b = series["BUILDING"][(d * len(series["BUILDING"]) + 9) // 10 - 1]
        m = series["MACHINERY"][(d * len(series["MACHINERY"]) + 9) // 10 - 1]
        want[d] = (b, m, (2 * 10000 * m + b) // (2 * b) - 10000)
    got = {
        r["decile"]: (r["building_cents"], r["machinery_cents"], r["gap_bp"])
        for r in QUERIES["agg_qq_deciles"].fn(spark, SF).collect()
    }
    assert got == want


def test_functional_dependency_matches_python_reference(spark):
    tables = {"customer": _tbl("customer"), "lineitem": _tbl("lineitem"),
              "orders": _tbl("orders")}
    cands = (
        ("c_custkey->c_nationkey", "customer", "c_custkey", "c_nationkey"),
        ("l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag"),
        ("l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
        ("o_custkey->o_orderpriority", "orders", "o_custkey",
         "o_orderpriority"),
    )
    want = {}
    for name, table, det, dep in cands:
        t = tables[table]
        groups: dict = defaultdict(lambda: (set(), 0))
        for k, v in zip(t[det], t[dep]):
            s, c = groups[k]
            s.add(v)
            groups[k] = (s, c + 1)
        n_groups = len(groups)
        vg = sum(1 for s, _ in groups.values() if len(s) > 1)
        vr = sum(c for s, c in groups.values() if len(s) > 1)
        tot = sum(c for _, c in groups.values())
        want[name] = (n_groups, vg, vr, (20000 * vr + tot) // (2 * tot))
    got = {
        r["fd"]: (
            r["n_groups"],
            r["n_violating_groups"],
            r["n_violating_rows"],
            r["violation_bp"],
        )
        for r in QUERIES["audit_functional_dependency"].fn(spark, SF).collect()
    }
    assert got == want


def test_relational_division_matches_python_reference(spark):
    o = _tbl("orders")
    cust = _tbl("customer")
    nat = _tbl("nation")
    nname = dict(zip(nat["n_nationkey"], nat["n_name"]))
    nation_of = {
        ck: nname[nk]
        for ck, nk in zip(cust["c_custkey"], cust["c_nationkey"])
    }
    prios: dict = defaultdict(set)
    for ck, pr in zip(o["o_custkey"], o["o_orderpriority"]):
        prios[ck].add(pr)
    all_p = set(pr for pr in o["o_orderpriority"])
    want: dict = {}
    for ck, ps in prios.items():
        if ps == all_p:
            nation = nation_of[ck]
            n, mn = want.get(nation, (0, None))
            want[nation] = (n + 1, ck if mn is None else min(mn, ck))
    got = {
        r["nation"]: (r["n_covering_customers"], r["min_custkey"])
        for r in QUERIES["join_relational_division"].fn(spark, SF).collect()
    }
    assert got == want
