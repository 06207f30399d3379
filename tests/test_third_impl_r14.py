"""Third-implementation checks for the r14 operators: each distributed
plan is recomputed from the raw parquet in from-scratch pure Python (no
Spark, no DuckDB), so a bug mirrored into the SQL oracle cannot hide.
Runs at sf0.001 to keep the brute-force recurrences cheap. The intended
STATISTICS are separately pinned on published / hand-derivable examples
in test_textbook_pins.py (the Kruskal-Wallis lesson)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from kinesis_stream_consumer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _tbl(name: str) -> dict:
    return pq.read_table(f"{SF}/{name}.parquet").to_pydict()


def _survival_rows(with_stratum: bool = False):
    """(t, event, group[, stratum]) per user, recomputed from raw events
    with an independently-derived day numbering (proleptic ordinal, not
    epoch days — durations are deltas, and the mod-7 stratum partition
    is invariant under the constant shift between the two numberings)."""
    ev = _tbl("events")
    fd: dict = {}
    ld: dict = {}
    pd_: dict = {}
    ec: Counter = Counter()
    for ts, uid, et in zip(ev["ts"], ev["user_id"], ev["event_type"]):
        day = ts.date().toordinal()
        fd[uid] = min(fd.get(uid, day), day)
        ld[uid] = max(ld.get(uid, day), day)
        if et == "purchase":
            pd_[uid] = min(pd_.get(uid, day), day)
        if et == "error":
            ec[uid] += 1
    # ordinal day 1 = 0001-01-01; epoch day 0 = 1970-01-01 = ordinal
    # 719163. The Spark/DuckDB side strata are epoch_day % 7, so shift
    # the ordinal by the constant offset to land on the SAME labels.
    off = 719163
    rows = []
    for uid in fd:
        t = (pd_[uid] - fd[uid]) if uid in pd_ else (ld[uid] - fd[uid])
        e = 1 if uid in pd_ else 0
        g = 1 if ec[uid] >= 14 else 0
        if with_stratum:
            rows.append((t, e, g, (fd[uid] - off) % 7))
        else:
            rows.append((t, e, g))
    return rows


def _logrank_sums(rows):
    """(o1, e1_micro, v_micro) with the documented per-step two-stage
    half-up recurrence, over rows of (t, event, group)."""
    times = sorted({t for t, _, _ in rows})
    o1 = e1 = v = 0
    for t in times:
        n = sum(1 for tt, _, _ in rows if tt >= t)
        d = sum(e for tt, e, _ in rows if tt == t)
        n1 = sum(1 for tt, _, g in rows if tt >= t and g == 1)
        d1 = sum(e for tt, e, g in rows if tt == t and g == 1)
        if d == 0:
            continue
        o1 += d1
        e1 += (2 * 10**6 * n1 * d + n) // (2 * n)
        if n > 1:
            q1 = (2 * 10**6 * n1 * (n - n1) + n) // (2 * n)
            v += (2 * d * q1 * (n - d) + n * (n - 1)) // (
                2 * n * (n - 1)
            )
    return o1, e1, v


def test_logrank_stratified_matches_python_reference(spark):
    rows4 = _survival_rows(with_stratum=True)
    o1 = e1 = v = 0
    for s in sorted({s for *_, s in rows4}):
        so1, se1, sv = _logrank_sums(
            [(t, e, g) for t, e, g, ss in rows4 if ss == s]
        )
        o1 += so1
        e1 += se1
        v += sv
    delta = 10**6 * o1 - e1
    chi2 = (2 * delta * delta + v) // (2 * v)
    row = (
        QUERIES["events_survival_logrank_stratified"]
        .fn(spark, SF)
        .collect()[0]
    )
    assert row["o1"] == o1
    assert row["e1_micro"] == e1
    assert row["v_micro"] == v
    assert row["chi2_micro"] == chi2


def test_hazard_ratio_mh_matches_python_reference(spark):
    rows = _survival_rows()
    times = sorted({t for t, _, _ in rows})
    hr_num = hr_den = o1 = e1 = v = 0
    for t in times:
        n = sum(1 for tt, _, _ in rows if tt >= t)
        d = sum(e for tt, e, _ in rows if tt == t)
        n1 = sum(1 for tt, _, g in rows if tt >= t and g == 1)
        d1 = sum(e for tt, e, g in rows if tt == t and g == 1)
        if d == 0:
            continue
        hr_num += (2 * 10**6 * d1 * (n - n1) + n) // (2 * n)
        hr_den += (2 * 10**6 * (d - d1) * n1 + n) // (2 * n)
        o1 += d1
        e1 += (2 * 10**6 * n1 * d + n) // (2 * n)
        if n > 1:
            q1 = (2 * 10**6 * n1 * (n - n1) + n) // (2 * n)
            v += (2 * d * q1 * (n - d) + n * (n - 1)) // (
                2 * n * (n - 1)
            )
    hr = (2 * 10**6 * hr_num + hr_den) // (2 * hr_den)
    delta = 10**6 * o1 - e1
    shift = 10**12
    peto = (2 * 10**6 * delta + v + 2 * v * shift) // (2 * v) - shift
    row = QUERIES["events_hazard_ratio_mh"].fn(spark, SF).collect()[0]
    assert row["hr_num_micro"] == hr_num
    assert row["hr_den_micro"] == hr_den
    assert row["hr_mh_micro"] == hr
    assert row["peto_loghr_micro"] == peto


def _avg2x_ranks(values):
    """Doubled average ranks of ``values`` (ties share the mean rank)."""
    out = []
    for x in values:
        below = sum(1 for o in values if o < x)
        ties = sum(1 for o in values if o == x)
        out.append(2 * below + (ties - 1) + 2)  # 2*avgrank
    return out


def test_page_trend_matches_python_reference(spark):
    ev = _tbl("events")
    obs: Counter = Counter()
    types = set()
    for ts, et in zip(ev["ts"], ev["event_type"]):
        types.add(et)
        obs[(et, ts.isoweekday())] += 1
    types = sorted(types)
    n = len(types)
    l2 = 0
    for t in types:
        col = [obs.get((t, dow), 0) for dow in range(1, 8)]
        for dow, d2 in zip(range(1, 8), _avg2x_ranks(col)):
            l2 += dow * d2
    e2 = n * 7 * 64 // 2
    row = QUERIES["agg_page_trend"].fn(spark, SF).collect()[0]
    assert row["n_blocks"] == n
    assert row["l2"] == l2
    assert row["e2"] == e2
    assert row["l2_minus_e2"] == l2 - e2


def test_cochran_q_matches_python_reference(spark):
    ev = _tbl("events")
    cnts: Counter = Counter()
    for ts, et in zip(ev["ts"], ev["event_type"]):
        cnts[(ts.date(), et)] += 1
    k = len({typ for _, typ in cnts})
    tots: Counter = Counter()
    for (d, _), c in cnts.items():
        tots[d] += c
    pres = [(d, typ) for (d, typ), c in cnts.items() if k * c > tots[d]]
    n = len(pres)
    cj: Counter = Counter(typ for _, typ in pres)
    ri: Counter = Counter(d for d, _ in pres)
    sc2 = sum(c * c for c in cj.values())
    sr2 = sum(c * c for c in ri.values())
    num = (k - 1) * (k * sc2 - n * n)
    den = k * n - sr2
    assert den > 0, "sf0.001 corpus unexpectedly degenerate"
    q = (2 * 10**6 * num + den) // (2 * den)
    row = QUERIES["agg_cochran_q"].fn(spark, SF).collect()[0]
    assert row["k_treatments"] == k
    assert row["n_present"] == n
    assert row["q_micro"] == q


def test_gamma_matches_python_bruteforce_pairs(spark):
    """C and D recomputed by materializing EVERY cross-group pair — the
    O(n^2) loop the grid plan never builds (n is small at sf0.001)."""
    orders = _tbl("orders")
    li = _tbl("lineitem")
    odate = {
        k: v for k, v in zip(orders["o_orderkey"], orders["o_orderdate"])
    }
    gi_of = {
        k: int(p[0])
        for k, p in zip(orders["o_orderkey"], orders["o_orderpriority"])
    }
    groups = defaultdict(list)
    for ok, sd in zip(li["l_orderkey"], li["l_shipdate"]):
        groups[gi_of[ok]].append((sd.date() - odate[ok].date()).days)
    gis = sorted(groups)
    c = d = 0
    for ai in range(len(gis)):
        for bi in range(ai + 1, len(gis)):
            for x in groups[gis[ai]]:
                for y in groups[gis[bi]]:
                    if x < y:
                        c += 1
                    elif x > y:
                        d += 1
    den = c + d
    shift = 2_000_000
    gamma = (
        2 * 10**6 * (c - d) + den + 2 * den * shift
    ) // (2 * den) - shift
    row = QUERIES["agg_goodman_kruskal_gamma"].fn(spark, SF).collect()[0]
    assert row["c_pairs"] == c
    assert row["d_pairs"] == d
    assert row["gamma_micro"] == gamma


def test_holt_linear_matches_python_reference(spark):
    ev = _tbl("events")
    daily: Counter = Counter()
    for ts, v in zip(ev["ts"], ev["value"]):
        # epoch day, matching the engine-side day numbering (the output
        # carries t_day, so the numbering must MATCH, not just deltas)
        day = ts.date().toordinal() - 719163
        daily[day] += math.floor(v * 100 + 0.5)  # exact FLOOR mirror
    days = sorted(daily)
    assert len(days) >= 2
    ys = [daily[d] for d in days]

    def hu(num, den):  # floor(x + 1/2) for positive den, any-sign num
        return (2 * num + den) // (2 * den)

    lvl, tr = ys[0], ys[1] - ys[0]
    want = [(days[0], ys[0], lvl, tr)]
    for d, y in zip(days[1:], ys[1:]):
        nl = hu(y + 4 * (lvl + tr), 5)
        tr = hu(nl - lvl + 9 * tr, 10)
        lvl = nl
        want.append((d, y, lvl, tr))
    got = [
        (r["t_day"], r["y_cents"], r["level_cents"], r["trend_cents"])
        for r in QUERIES["ts_holt_linear"]
        .fn(spark, SF)
        .orderBy("t_day")
        .collect()
    ]
    assert got == want


def test_mean_excess_matches_python_reference(spark):
    ev = _tbl("events")
    daily: Counter = Counter()
    for ts, v in zip(ev["ts"], ev["value"]):
        daily[ts.date()] += math.floor(v * 100 + 0.5)  # FLOOR mirror
    ys = sorted(daily.values())
    want = []
    for u in sorted(set(ys)):
        exceed = [y for y in ys if y > u]
        if not exceed:
            continue
        n = len(exceed)
        s = sum(exceed)
        me = (2 * 10**6 * (s - u * n) + n) // (2 * n)
        want.append((u, n, me))
    got = [
        (r["threshold_cents"], r["n_exceed"], r["mean_excess_micro"])
        for r in QUERIES["events_mean_excess_curve"]
        .fn(spark, SF)
        .orderBy("threshold_cents")
        .collect()
    ]
    assert got == want
    assert len(want) > 0


def test_recurrent_mcf_matches_python_reference(spark):
    ev = _tbl("events")
    fd: dict = {}
    ld: dict = {}
    purch: Counter = Counter()
    for ts, uid, et in zip(ev["ts"], ev["user_id"], ev["event_type"]):
        day = ts.date().toordinal() - 719163  # epoch day (output-visible)
        fd[uid] = min(fd.get(uid, day), day)
        ld[uid] = max(ld.get(uid, day), day)
        if et == "purchase":
            purch[day] += 1
    # difference-array risk set, evaluated at purchase days
    delta: Counter = Counter()
    for uid in fd:
        delta[fd[uid]] += 1
        delta[ld[uid] + 1] -= 1
    days = sorted(set(delta) | set(purch))
    n = 0
    cum = 0
    want = []
    for d in days:
        n += delta.get(d, 0)
        c = purch.get(d, 0)
        if c > 0:
            h = (2 * 10**6 * c + n) // (2 * n)
            cum += h
            want.append((d, n, c, h, cum))
    got = [
        (
            r["t_day"],
            r["n_risk"],
            r["n_events"],
            r["rate_micro"],
            r["mcf_micro"],
        )
        for r in QUERIES["events_recurrent_mcf"]
        .fn(spark, SF)
        .orderBy("t_day")
        .collect()
    ]
    assert got == want
    assert len(want) > 0


def test_ansari_bradley_matches_python_reference(spark):
    """AB1 recomputed from literally-scored pooled ranks — the per-rank
    loop the closed-form grid plan never builds."""
    orders = _tbl("orders")
    li = _tbl("lineitem")
    odate = {
        k: v for k, v in zip(orders["o_orderkey"], orders["o_orderdate"])
    }
    gi_of = {
        k: int(p[0])
        for k, p in zip(orders["o_orderkey"], orders["o_orderpriority"])
    }
    vals = []
    for ok, sd in zip(li["l_orderkey"], li["l_shipdate"]):
        gi = gi_of[ok]
        if gi in (1, 5):
            vals.append((gi, (sd.date() - odate[ok].date()).days))
    n = len(vals)
    na = sum(1 for gi, _ in vals if gi == 1)
    pooled = sorted(v for _, v in vals)
    score = [min(r, n + 1 - r) for r in range(1, n + 1)]  # literal scores
    # per-distinct-value: S over the tie range, then half-up micro of
    # the value's contribution to the group-1 MEAN score c1*S/(c*na)
    # (the documented per-value rounding)
    m1 = 0
    t_total = sum(score)
    for v in sorted({vv for _, vv in vals}):
        c = pooled.count(v)
        c1 = sum(1 for gi, vv in vals if gi == 1 and vv == v)
        lo = sum(1 for x in pooled if x < v) + 1
        s = sum(score[r - 1] for r in range(lo, lo + c))
        m1 += (2 * 10**6 * c1 * s + c * na) // (2 * c * na)
    e = (2 * 10**6 * t_total + n) // (2 * n)
    row = QUERIES["agg_ansari_bradley"].fn(spark, SF).collect()[0]
    assert row["n_group1"] == na
    assert row["n_group5"] == n - na
    assert row["mean1_micro"] == m1
    assert row["emean_micro"] == e
    assert row["mean1_minus_e_micro"] == m1 - e
