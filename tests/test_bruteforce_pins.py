"""Brute-force semantic pins for AUTHOR-DERIVED recurrences (VERDICT r12
#2's residual): statistics with published worked examples are pinned in
test_textbook_pins.py, but the repo's bespoke recurrences — hash/byte-swap
formulas, argmin encode packings, integer sketch estimators — have no
external ground truth: oracle parity + a third impl prove three
author-written derivations AGREE, which the Kruskal-Wallis episode showed
is not the same as proving them RIGHT.

Each test here recomputes a shipped recurrence's result from its RAW
semantic definition, by a structurally different computation (byte
arithmetic instead of hex-substring shuffles, lexicographic tuple
comparison instead of arithmetic packing, exact Fraction arithmetic
instead of scaled-integer division, bit-string scans instead of
bit-length algebra) on literal data. A failure means the recurrence does
not implement its own docstring even if every engine agrees on it.

The pin ↔ recurrence map and the EXTERNAL/AUTHOR-DERIVED classification
of every existing pin live in tests/PIN_CLASSIFICATION.md.

No Spark, no DuckDB: pure Python + hashlib, runs in milliseconds.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction


# --- the md5 byte-swap hash (operators/dedup.py::md5_u56_le / md5_u40_le) ------
#
# Blast radius: every minhash band, HLL bucket/rho, CMS index, Bloom
# position, reservoir priority, winnowing fingerprint. The shipped form
# is a hex-substring shuffle (Spark positions 15,13,11,9,7[,5,3] + conv);
# its SEMANTIC claim is "little-endian uint64 of the first 8 md5 bytes,
# shifted right 8 (u56) / 24 (u40)" — DuckDB's md5_number_upper >> 8/24.


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _u56_shipped(s: str) -> int:
    # verbatim recurrence: 1-based substring positions 15,13,11,9,7,5,3,
    # two hex chars each, concatenated then parsed base 16
    h = _md5_hex(s)
    le_hex = "".join(h[p - 1 : p + 1] for p in (15, 13, 11, 9, 7, 5, 3))
    return int(le_hex, 16)


def _u40_shipped(s: str) -> int:
    h = _md5_hex(s)
    le_hex = "".join(h[p - 1 : p + 1] for p in (15, 13, 11, 9, 7))
    return int(le_hex, 16)


_HASH_LITERALS = [
    "", "a", "abc", "hello world", "0", "12345", "-7",
    "the quick brown fox", "naïve café ünïcode ✓", "0|x", "1|x",
    "ksc|shingle|three words here", "9999999999",
]


def test_md5_u56_le_is_little_endian_uint64_of_first_8_bytes():
    for s in _HASH_LITERALS:
        d = hashlib.md5(s.encode("utf-8")).digest()
        raw = int.from_bytes(d[:8], "little")
        assert _u56_shipped(s) == raw >> 8, s
        assert _u40_shipped(s) == raw >> 24, s
        assert 0 <= _u56_shipped(s) < 1 << 56
        assert 0 <= _u40_shipped(s) < 1 << 40


# --- the argmin encode packing (operators/similarity.py::_argmin_cell) ---------
#
# Blast radius: every k-means assignment, PQ encode, IVF routing,
# silhouette/distortion eval. Shipped: one primitive long aggregate
# min(dist*k + cell) decoded as (enc % k, enc div k). Semantic claim:
# lexicographic minimum of (dist, cell) with ties to the LOWEST cell.


def test_argmin_cell_packing_is_lexicographic_min():
    k = 16
    groups = {
        # dist ties -> lowest cell must win
        "tie": [(100, 7), (100, 2), (100, 9), (101, 0)],
        # zero distance, top cell
        "zero": [(0, k - 1), (1, 0), (5, 3)],
        # strictly decreasing dist arriving in shuffled order
        "plain": [(9, 4), (3, 11), (7, 0), (3, 12)],
        # single row
        "one": [(42, 5)],
        # large distances (squared-int scale the queries actually use)
        "big": [(10**12 + 5, 3), (10**12 + 5, 1), (10**12 + 4, 15)],
    }
    for g, rows in groups.items():
        assert all(0 <= c < k and d >= 0 for d, c in rows), g
        enc = min(d * k + c for d, c in rows)  # shipped aggregate
        decoded = (enc // k, enc % k)  # shipped decode (dist, cell)
        brute = min(rows)  # raw definition: lexicographic tuple min
        assert decoded == brute, (g, decoded, brute)


# --- the HLL integer estimator (operators/sketches.py::hll_estimate_grouped) ---
#
# Blast radius: every agg_hll_* query + the engine's distinct sketch.
# Shipped: rho = min(RANK_BITS+1 - len(bin(w)), RMAX); S = sum over 32
# registers of 2^(RMAX-rho) (empty register -> rho=0 term); estimate =
# (2*alpha_ppm*m^2*2^RMAX + S*1e6) div (2*S*1e6). Semantic claim: the
# Flajolet et al. raw estimator alpha_m * m^2 / Z, Z = sum 2^-rho,
# alpha_32 = 0.697 (the published m=32 bias constant), rounded half-up.


_HLL_P, _HLL_M, _HLL_RMAX, _ALPHA_PPM = 5, 32, 20, 697000
_RANK_BITS = 56 - _HLL_P


def _rho_shipped(w: int) -> int:
    blen = len(bin(w)) - 2 if w > 0 else 1  # Spark/DuckDB bin(0)='0'
    return min(_RANK_BITS + 1 - blen, _HLL_RMAX)


def _rho_bruteforce(w: int) -> int:
    # raw definition: 1-based position of the first set bit scanning the
    # RANK_BITS-wide field from the MSB — a string scan, not bit algebra
    bits = format(w, f"0{_RANK_BITS}b")
    pos = bits.find("1")
    return min((pos if pos >= 0 else _RANK_BITS) + 1, _HLL_RMAX)


def test_hll_rho_bitlength_formula_matches_msb_scan():
    ws = [0, 1, 2, 3, (1 << _RANK_BITS) - 1, 1 << 30, (1 << 50) + 12345]
    ws += [17, 255, 256, 1 << _HLL_RMAX, (1 << (_RANK_BITS - 1))]
    for w in ws:
        assert _rho_shipped(w) == _rho_bruteforce(w), w


def test_hll_integer_estimate_is_half_up_of_raw_float_estimator():
    register_sets = [
        {0: 3, 5: 1, 31: 7},                      # sparse
        {b: 1 for b in range(_HLL_M)},            # all-ones
        {b: _HLL_RMAX for b in range(_HLL_M)},    # saturated
        {2: 20, 9: 2},                            # mixed with the cap
        {},                                       # all empty
        {b: (b % 13) + 1 for b in range(_HLL_M)},
    ]
    for regs in register_sets:
        assert all(0 <= b < _HLL_M and 1 <= r <= _HLL_RMAX
                   for b, r in regs.items())
        # shipped integer recurrence
        s = sum(1 << (_HLL_RMAX - r) for r in regs.values())
        s += (_HLL_M - len(regs)) * (1 << _HLL_RMAX)  # empty -> rho=0
        num2 = 2 * _ALPHA_PPM * _HLL_M * _HLL_M * (1 << _HLL_RMAX)
        shipped = (num2 + s * 10**6) // (2 * s * 10**6)
        # raw estimator, exact rational arithmetic
        z = sum(Fraction(1, 1 << r) for r in regs.values())
        z += Fraction(_HLL_M - len(regs), 1)  # empty register: 2^-0
        est = Fraction(_ALPHA_PPM, 10**6) * _HLL_M * _HLL_M / z
        brute = (est + Fraction(1, 2)).__floor__()
        assert shipped == brute, (regs, shipped, brute, float(est))


# --- the CMS index recurrence + estimate (operators/sketches.py) ---------------
#
# Blast radius: track_frequency_sketch (engine), agg CMS queries, CMS
# top-k. Shipped: idx_r = r*W + u56("r|" + v) % W for r in 0..D-1;
# estimate(key) = min over r of counter[idx_r] (missing -> 0). Semantic
# claims pinned: (a) the D probe positions live in DISJOINT row strips,
# (b) the estimate NEVER underestimates the true frequency, and equals
# it for keys whose cells took no collision — the Count-Min contract.


_CMS_D, _CMS_W = 2, 64


def _cms_idxs(v: str) -> list:
    return [
        r * _CMS_W + (_u56_shipped(f"{r}|{v}") % _CMS_W)
        for r in range(_CMS_D)
    ]


def test_cms_estimate_never_underestimates_on_literal_stream():
    stream = (
        ["apple"] * 9 + ["pear"] * 4 + ["plum"] * 2
        + [f"noise-{i}" for i in range(40)]
    )
    true = {}
    counters = {}
    for v in stream:
        true[v] = true.get(v, 0) + 1
        for idx in _cms_idxs(v):
            counters[idx] = counters.get(idx, 0) + 1
    for v, t in true.items():
        idxs = _cms_idxs(v)
        # row-strip disjointness: probe r stays inside [r*W, (r+1)*W)
        for r, idx in enumerate(idxs):
            assert r * _CMS_W <= idx < (r + 1) * _CMS_W, v
        est = min(counters.get(i, 0) for i in idxs)
        assert est >= t, (v, est, t)  # the one-sided CMS guarantee
        collided = any(
            set(_cms_idxs(u)) & {idxs[r]}
            for r in range(_CMS_D)
            for u in true
            if u != v and _cms_idxs(u)[r] == idxs[r]
        )
        if not collided:
            assert est == t, (v, est, t)


# --- the Bloom-join sizing + positions (operators/sketches.py) -----------------
#
# Blast radius: bloom_join_prune (the r7 join-pruning operator). Shipped:
# m = clamp(1 << max(10n-1, 1).bit_length(), 2^10, 2^14); the K=4 probe
# positions are disjoint 14-bit fields of the 56-bit md5, each % m.
# Semantic claims pinned: (a) the bit-length sizing equals "smallest
# power of two >= 10n" (the no-float-log claim), (b) the 4 fields are a
# COMPLETE disjoint decomposition of the 56-bit hash, (c) build-then-
# probe has zero false negatives on literal key sets.


def _bloom_m_shipped(n_build: int) -> int:
    return min(1 << 14, max(1 << 10, 1 << max(10 * n_build - 1, 1).bit_length()))


def test_bloom_m_bitlength_equals_next_power_of_two():
    for n in list(range(1, 2500)) + [10**6]:
        target = 10 * n
        p = 1
        while p < target:  # raw definition: smallest power of two >= 10n
            p <<= 1
        assert _bloom_m_shipped(n) == min(1 << 14, max(1 << 10, p)), n


def _bloom_positions(key: str, m: int) -> list:
    h = _u56_shipped(key)
    return [(h >> (14 * j)) % m for j in range(4)]


def test_bloom_fields_decompose_hash_and_probe_has_no_false_negatives():
    build = [f"cust#{i}" for i in range(200)]
    m = _bloom_m_shipped(len(build))
    # (b) disjoint complete decomposition: the four 14-bit fields
    # reassemble the exact 56-bit hash (no overlap, no gap, no spill)
    for key in build[:20]:
        h = _u56_shipped(key)
        fields = [(h >> (14 * j)) % (1 << 14) for j in range(4)]
        assert sum(f << (14 * j) for j, f in enumerate(fields)) == h, key
    bits = set()
    for key in build:
        bits.update(_bloom_positions(key, m))
    assert max(bits) < m
    for key in build:  # (c) membership: never prunes a real build key
        assert all(p in bits for p in _bloom_positions(key, m)), key
    # deterministic fill sanity on this literal set: the 2048-bit filter
    # sized for 200 keys must not have saturated (else it prunes nothing)
    assert len(bits) < m // 2


# --- the reservoir priority sample (operators/sketches.py::reservoir_*) --------
#
# Blast radius: agg_reservoir_sample + the streaming register keeper.
# Shipped: u = u56(str(id)); pri = u div max(w,1); register = n+1
# smallest (pri, id); w_est = max(w, 2^56 div max(pri_{n+1}, 1)), exact
# when the group fits. Pinned: (a) in the uniform (w=1) case the sample
# IS the n smallest md5 hashes (raw sort of raw hashes), (b) a group
# that fits the register is estimated EXACTLY, (c) the subset-sum
# estimator lands near the true total on this literal id set.


def test_reservoir_uniform_sample_is_bottom_n_hashes_and_estimator_sane():
    n = 32
    ids = list(range(1, 201))  # 200 uniform-weight items
    rows = [(i, 1, _u56_shipped(str(i))) for i in ids]
    # shipped ordering: pri = u div max(w,1) = u, tiebreak id
    by_pri = sorted(rows, key=lambda r: (r[2] // max(r[1], 1), r[0]))
    sample, thresh = by_pri[:n], by_pri[n]
    # (a) raw recomputation: sort raw hashes directly
    raw_sorted = sorted(rows, key=lambda r: (r[2], r[0]))
    assert [r[0] for r in sample] == [r[0] for r in raw_sorted[:n]]
    # (c) DLT subset-sum estimate of the group total
    tau = (1 << 56) // max(thresh[2] // max(thresh[1], 1), 1)
    est = sum(max(w, tau) for _, w, _ in sample)
    # deterministic for these literal ids; n=32 of 200 -> the estimator
    # must land well inside its ~1/sqrt(n) error band around 200
    assert 120 <= est <= 320, est


def test_reservoir_group_that_fits_is_exact():
    n = 32
    rows = [(i, 3 + i % 5, _u56_shipped(str(i))) for i in range(1, 11)]
    by_pri = sorted(rows, key=lambda r: (r[2] // max(r[1], 1), r[0]))
    assert len(by_pri) <= n  # no threshold row exists
    # shipped CASE WHEN _tpri IS NULL THEN w: estimates are the weights
    est = sum(w for _, w, _ in by_pri)
    assert est == sum(w for _, w, _ in rows)  # exact subset-sum


# --- the qsketch bucket encode/decode (operators/sketches.py) ------------------
#
# Blast radius: every quantile-sketch query + the engine qsketch rows.
# Shipped encode: qid(0)=0; else b=bitlen(v), lo2=2^(b-1),
# qid=(b-1)*K + ((v-lo2)*K) div lo2 + 1. Shipped decode (lower bound):
# lb(0)=0; else lo2=2^((qid-1) div K), lb=lo2 + (((qid-1)%K)*lo2+K-1)
# div K. Semantic claim: lb(qid(v)) <= v < lb(qid(v)+1) — every value
# lands in the bucket whose [lb, next-lb) range brackets it, so a
# quantile answer is a certified lower bound with 1/K relative width.


_QSK_K = 16


def _qid(v: int) -> int:
    if v == 0:
        return 0
    b = v.bit_length()
    lo2 = 1 << (b - 1)
    return (b - 1) * _QSK_K + ((v - lo2) * _QSK_K) // lo2 + 1


def _lb(qid: int) -> int:
    if qid == 0:
        return 0
    lo2 = 1 << ((qid - 1) // _QSK_K)
    return lo2 + (((qid - 1) % _QSK_K) * lo2 + _QSK_K - 1) // _QSK_K


def test_qsketch_bucket_bounds_bracket_every_value():
    vals = list(range(0, 5000))
    vals += [(1 << 40) - 1, 1 << 40, (1 << 40) + 1, (1 << 57) + 12345]
    for v in vals:
        q = _qid(v)
        assert _lb(q) <= v, (v, q, _lb(q))
        assert v < _lb(q + 1), (v, q, _lb(q + 1))
    # monotone: encode preserves order at bucket granularity
    qids = [_qid(v) for v in range(1, 5000)]
    assert qids == sorted(qids)
    # relative width: bucket spans at most ~1/K of its octave
    for v in [100, 1000, 65536, (1 << 30) + 7]:
        q = _qid(v)
        width = _lb(q + 1) - _lb(q)
        assert width <= (1 << ((q - 1) // _QSK_K)) // _QSK_K + 1, (v, width)


# --- the SimHash vote recurrence (operators/dedup.py::simhash32_df) ------------
#
# Blast radius: simhash dedup + its banded variants. Shipped: h32 = first
# 8 hex digits of md5 as a 32-bit int; fingerprint bit b reads
# (h32 >> (28 - 4*(b//4) + b%4)) & 1, votes are (bit*2 - 1) summed, bit
# set iff sum > 0 (ties -> 0). Semantic claims pinned: (a) the shift map
# is a PERMUTATION of the 32 hash bits (each used exactly once), (b) the
# +/-1-sum sign equals the majority-of-bits rule including the tie
# convention, (c) the full fingerprint matches a recompute that reads
# bits from the hex DIGITS (string parse, not shift algebra).


def _h32(s: str) -> int:
    return int(_md5_hex(s)[:8], 16)


def _simhash_shipped(shingles: list) -> int:
    sums = [0] * 32
    for s in shingles:
        h = _h32(s)
        for b in range(32):
            bit = (h >> (28 - 4 * (b // 4) + b % 4)) & 1
            sums[b] += bit * 2 - 1
    return sum(1 << b for b in range(32) if sums[b] > 0)


def _simhash_digitwise(shingles: list) -> int:
    # independent route: bit b lives in hex digit b//4, digit-bit b%4
    ones = [0] * 32
    for s in shingles:
        hexd = _md5_hex(s)[:8]
        for b in range(32):
            if (int(hexd[b // 4], 16) >> (b % 4)) & 1:
                ones[b] += 1
    n = len(shingles)
    return sum(
        1 << b for b in range(32) if ones[b] > n - ones[b]
    )  # majority; tie (ones == n/2) -> 0


def test_simhash_shift_map_is_a_bit_permutation():
    shifts = [28 - 4 * (b // 4) + b % 4 for b in range(32)]
    assert sorted(shifts) == list(range(32))


def test_simhash_vote_sign_equals_majority_with_tie_to_zero():
    sets = [
        ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon"],
        ["same same same"] * 5,
        ["a b c", "d e f"],  # even count: ties possible
        [f"tok{i} tok{i+1} tok{i+2}" for i in range(20)],
    ]
    for shingles in sets:
        assert _simhash_shipped(shingles) == _simhash_digitwise(shingles)
    # duplicate sets fingerprint identically (distance 0)
    assert _simhash_shipped(sets[0]) == _simhash_shipped(list(sets[0]))


# --- the winnowing pack + rightmost-min (operators/text.py) --------------------
#
# Blast radius: winnowing fingerprint pairs (the MOSS-style shared-
# substring detector). Shipped: enc = u40(gram)*2^20 + (2^20 - 1 - pos);
# MIN(enc) over each w-window is the smallest hash with ties to the
# LARGEST position (the SWA rightmost-min rule). Pinned: (a) pack
# capacity, (b) min(enc) decodes to the lexicographic (hash, -pos) min,
# (c) the published guarantee — two documents sharing a substring of
# length >= k + w - 1 share at least one selected fingerprint — on
# literal documents with a planted shared substring.


def test_winnowing_pack_capacity_and_rightmost_min_decode():
    assert ((1 << 40) - 1) * (1 << 20) + ((1 << 20) - 1) < 1 << 61
    cases = [
        [(100, 1), (100, 3), (200, 2)],  # tie on hash -> largest pos wins
        [(5, 7)],
        [(9, 1), (3, 9), (3, 2), (8, 5)],
    ]
    for rows in cases:
        enc = min(h * (1 << 20) + ((1 << 20) - 1 - p) for h, p in rows)
        got = (enc // (1 << 20), (1 << 20) - 1 - enc % (1 << 20))
        brute = min(rows, key=lambda r: (r[0], -r[1]))
        assert got == brute, (rows, got, brute)


def _winnow(text: str, k: int = 20, w: int = 4) -> set:
    grams = [
        _u40(text[p : p + k]) for p in range(len(text) - k + 1)
    ]
    out = set()
    for j in range(len(grams) - w + 1):
        win = grams[j : j + w]
        m = min(win)
        # rightmost minimal within the window
        pos = max(i for i, h in enumerate(win) if h == m)
        out.add(win[pos])
    return out


def _u40(s: str) -> int:
    d = hashlib.md5(s.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "little") >> 24


def test_winnowing_guarantee_on_planted_shared_substring():
    k, w = 20, 4
    shared = "the quick brown fox jumps over the lazy dog tonight"
    assert len(shared) >= k + w - 1
    doc_a = "completely different prefix material here " + shared
    doc_b = shared + " and now an unrelated suffix follows this text"
    fa, fb = _winnow(doc_a, k, w), _winnow(doc_b, k, w)
    assert fa & fb, "SWA guarantee violated: no shared fingerprint"
    # and two documents with no k-length overlap share nothing
    fc = _winnow("x" * 10 + "entirely disjoint content with other words", k, w)
    assert not (fa & fc)


# --- the minhash mixing family (operators/dedup.py::MINHASH_PERMS) -------------
#
# Blast radius: every minhash/LSH dedup row. Claims pinned: (a) the
# long-arithmetic capacity claim a_max*(2^56-1) + b_max < 2^63 (why the
# 56-bit hash exists at all), (b) the 8 (a, b) mixes are pairwise
# distinct with a != 0 (a degenerate or duplicated permutation silently
# correlates two signature rows and inflates LSH collision rates), and
# (c) P = 2^61 - 1 is PRIME (deterministic Miller-Rabin) — the
# universal-hash family argument needs a prime modulus.


def test_minhash_mix_capacity_and_family_sanity():
    from kinesis_stream_consumer_spark.operators.dedup import (
        MINHASH_P,
        MINHASH_PERMS,
    )

    a_max = max(a for a, _ in MINHASH_PERMS)
    b_max = max(b for _, b in MINHASH_PERMS)
    assert a_max * ((1 << 56) - 1) + b_max < 1 << 63
    assert len(set(MINHASH_PERMS)) == len(MINHASH_PERMS) == 8
    assert all(0 < a < MINHASH_P for a, _ in MINHASH_PERMS)

    def is_prime(n: int) -> bool:
        if n < 2:
            return False
        d, r = n - 1, 0
        while d % 2 == 0:
            d //= 2
            r += 1
        # deterministic witness set for n < 3.3e24
        for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            if a % n == 0:
                continue
            x = pow(a, d, n)
            if x in (1, n - 1):
                continue
            for _ in range(r - 1):
                x = x * x % n
                if x == n - 1:
                    break
            else:
                return False
        return True

    assert MINHASH_P == (1 << 61) - 1
    assert is_prime(MINHASH_P)
