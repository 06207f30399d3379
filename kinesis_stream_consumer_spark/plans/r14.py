"""Round-14 queries: new operators land here so they register inside the
driver's first-50 CORRECTNESS window (registration order = import order in
plans/queries.py; this module is imported right after llm_pipeline, in the
slot plans/r13.py vacated when it parked by import position).

Opens with the five blocks moved in from the (now parked) plans/r13.py
with their VERDICT/ADVICE-r13 fixes — an edited block must re-enter the
window:

- text_langid_kappa (ADVICE r13): the fully-literal denominator in the
  kappa expr could be constant-folded into DIVIDE_BY_ZERO under ANSI
  before the false `.where` pruned the degenerate n² == rc frame. The
  expr now divides by max(den, 1) — the Friedman/log-rank discipline —
  so the degenerate case stays an empty result instead of a crash.
- agg_friedman_test (ADVICE r13): the DECIMAL(38,0) capacity assert
  understated the real worst case by ~2x (checked 1e6*k*num while the
  t1 numerator is 2e6*(k-1)*num + den); tightened to the derived 3e6
  coefficient.
- events_survival_km / events_survival_rmst (VERDICT r13 #2): the
  single-long (t, n_risk, d) packing capped n_risk at 2^24 (16.7M
  users) — below 100x-scale cardinalities. The Spark fold now runs over
  an array<struct<t,n,d>> (no packing on the Spark side at all; fold
  arithmetic fits BIGINT for n < 2^40) and the DuckDB oracle packs into
  HUGEINT with 40-bit fields. Loud capacity: users < 2^40 (~1.1e12).
- events_survival_logrank (VERDICT r13 #2): the one-stage variance
  numerator 2e6*d*n1*(n-n1)*(n-d) peaks at 1.25e5*n^4 and tripped the
  DECIMAL(38,0) assert at ~530M event rows. The per-step term is now a
  documented TWO-STAGE half-up recurrence (q1 = round(1e6*n1*(n-n1)/n),
  then v_t = round(q1*d*(n-d)/(n*(n-1)))) whose worst case is
  1.25e5*n^3 — the assert clears ~9e10 event rows. Both engines and the
  pure-Python third impl compute the identical two-stage integers.

Also re-enters agg_poisson_bootstrap_ci (from parked r10.py) with the
single-corpus-execution fix its migrated session-sweep gate exposed,
and adds NINE new operators: the survival family's reporting surface
(events_survival_logrank_stratified, events_hazard_ratio_mh with
Mantel-Haenszel HR + Peto log-HR, events_recurrent_mcf for repeated
events), the ordered/binary repeated-measures completions
(agg_page_trend, agg_cochran_q, agg_goodman_kruskal_gamma), the scale
test (agg_ansari_bradley), the second sequential fold (ts_holt_linear)
and the EVT tail diagnostic (events_mean_excess_curve) — each with
oracle, pure-Python third impl (tests/test_third_impl_r14.py),
textbook/hand pin, and shuffle gate in the same commit, per the
standing rule.

Certified blocks migrate out of the window at the NEXT round's fold by
moving this module's import to the parked-last section (the
r10/r11/r12/r13 pattern) — never edit a block after its round's
CORRECTNESS file is recorded without re-entering the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# llm_pipeline registers FIRST in plans/queries.py, so a module-level
# import from it cannot reorder the driver window (the import-order trap
# only bites when importing from a module that registers LATER).
from kinesis_stream_consumer_spark.plans.llm_pipeline import _langid_oracle
from kinesis_stream_consumer_spark.plans.queries import (
    _t,
    register,
)

# --- r14 re-entry: Cohen's kappa (ADVICE r13: guard the literal division) ------


@register(
    "text_langid_kappa",
    """
    WITH pred AS ({LANGID_BODY}),
    cells AS (
      SELECT labeled_lang, predicted_lang, COUNT(*) AS o
      FROM pred GROUP BY 1, 2
    ),
    n AS (SELECT SUM(o) AS n FROM cells),
    diag AS (
      SELECT COALESCE(SUM(o), 0) AS d FROM cells
      WHERE labeled_lang = predicted_lang
    ),
    rows_ AS (SELECT labeled_lang AS l, SUM(o) AS r FROM cells GROUP BY 1),
    cols_ AS (SELECT predicted_lang AS l, SUM(o) AS c FROM cells GROUP BY 1),
    pe AS (
      SELECT COALESCE(SUM(CAST(rows_.r AS HUGEINT) * cols_.c), 0) AS rc
      FROM rows_ JOIN cols_ ON cols_.l = rows_.l
    )
    SELECT CAST(n.n AS BIGINT) AS n_docs,
           CAST(diag.d AS BIGINT) AS n_agree,
           CAST(pe.rc AS BIGINT) AS chance_weight,
           CAST((2 * 1000000::HUGEINT * (n.n * diag.d - pe.rc)
                 + (CAST(n.n AS HUGEINT) * n.n - pe.rc)
                 + 2 * (CAST(n.n AS HUGEINT) * n.n - pe.rc) * 2000000)
                // (2 * (CAST(n.n AS HUGEINT) * n.n - pe.rc)) - 2000000
             AS BIGINT) AS kappa_micro
    FROM n CROSS JOIN diag CROSS JOIN pe
    WHERE CAST(n.n AS HUGEINT) * n.n > pe.rc
    """.replace("{LANGID_BODY}", _langid_oracle().strip()),
    doc="Cohen's kappa of the stopword language-ID heuristic against the "
    "labeled lang column: chance-corrected agreement "
    "κ = (p_o − p_e)/(1 − p_e) = (N·diag − Σ r_l·c_l)/(N² − Σ r_l·c_l) "
    "in half-up MICRO-units — the one-number summary of "
    "text_langid_confusion's matrix (raw accuracy flatters a skewed "
    "label mix; kappa subtracts what marginal-matching guessing would "
    "score). κ is SIGNED (worse-than-chance is negative), so the "
    "division takes the standard positivity shift (shift 2e6 > |κ|max "
    "in micro-units) — the graph_modularity discipline — and runs in "
    "wide integers (DuckDB HUGEINT / Spark DECIMAL(38,0): 1e6·N² "
    "breaks int64 at ~3e6 docs), int64 only at the output cast. The "
    "shift regime (κ > −2) is ASSERTED: below it the two engines' "
    "floor-vs-truncate integer division diverges by one micro-unit. "
    "The Spark-side division is a pure literal expression, so ANSI "
    "constant folding would evaluate it BEFORE the false degenerate "
    "filter prunes the project — the denominator is max(den, 1) "
    "(ADVICE r13), value-identical whenever the row survives the "
    "filter. The prediction rides the SAME lang_id_from_tokens "
    "operator / oracle fragment as the certified langid rows (one "
    "materialized lowercase-token projection, per-language stopword "
    "hit counts); everything after it is a labels²-bounded cell "
    "aggregate.",
)
def text_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    # tokens inline would re-split per language (CollapseProject trap) —
    # materialize the token array first
    pred = docs.select(
        "lang", T.tokens(F.lower(F.col("text"))).alias("ltoks")
    ).select(
        F.col("lang").alias("labeled_lang"),
        T.lang_id_from_tokens(F.col("ltoks")).alias("predicted_lang"),
    )
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("o")
    )
    cells = cells.localCheckpoint(eager=True)  # labels²-bounded, read 4x
    n = cells.agg(F.sum("o")).first()[0] or 0
    diag = (
        cells.where(F.col("labeled_lang") == F.col("predicted_lang"))
        .agg(F.coalesce(F.sum("o"), F.lit(0)))
        .first()[0]
    )
    rows_ = cells.groupBy(F.col("labeled_lang").alias("l")).agg(
        F.sum("o").alias("r")
    )
    cols_ = cells.groupBy(F.col("predicted_lang").alias("l")).agg(
        F.sum("o").alias("c")
    )
    rc = (
        rows_.join(cols_, "l")
        .agg(
            F.coalesce(
                F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * c")), F.lit(0)
            )
        )
        .first()[0]
    )
    rc = int(rc)
    # assert the shifted numerator fits DECIMAL(38,0): worst case
    # 2e6*|N*d - rc| + den + 4e6*den <= (6e6 + 1) * N^2 — coefficient
    # derived from the actual terms (r12 review: 5e6 understated it,
    # the same defect class ADVICE r11 found in graph_modularity)
    assert 7_000_000 * n * n < 10**38, "kappa arithmetic needs wider type"
    # ADVICE r12: the 2e6 shift keeps the shifted numerator non-negative
    # only while kappa > -2 (shift > |kappa| in micro-units); below that,
    # DuckDB's floor (//) and Spark's DECIMAL `div` (truncate) differ by
    # 1 micro-unit and parity silently breaks. Assert the regime instead
    # of assuming it — a heuristic that scores kappa <= -2 is a data bug
    # worth stopping on, not rounding through.
    if n * n > rc:
        assert n * diag - rc > -2 * (n * n - rc), (
            "kappa <= -2: positivity shift too small for this regime"
        )
    # ADVICE r13: the division below is a fully-literal expression, so
    # ANSI constant folding can evaluate it even when the trailing
    # `.where` is false — divide by max(den, 1) so the degenerate
    # n² == rc corpus yields the empty frame the oracle's WHERE produces
    # instead of DIVIDE_BY_ZERO. Value-identical when den > 0.
    den = max(n * n - rc, 1)
    return spark.createDataFrame(
        [(int(n), int(diag), rc)], "n_docs long, n_agree long, cw long"
    ).select(
        F.col("n_docs"),
        F.col("n_agree"),
        F.col("cw").alias("chance_weight"),
        F.expr(
            f"CAST((2 * CAST(1000000 AS DECIMAL(38,0))"
            f" * (CAST({n} AS DECIMAL(38,0)) * {diag} - {rc})"
            f" + {den}"
            f" + 2 * CAST({den} AS DECIMAL(38,0)) * 2000000)"
            f" div (2 * CAST({den} AS DECIMAL(38,0)))"
            f" - 2000000 AS BIGINT)"
        ).alias("kappa_micro"),
    ).where(F.lit(n * n > rc))


# --- r14 re-entry: Friedman test (ADVICE r13: derived assert coefficient) ------


@register(
    "agg_friedman_test",
    """
    WITH obs AS (
      SELECT event_type AS typ, isodow(ts) AS dow, COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT typ FROM obs),
    full_grid AS (
      SELECT t.typ, d.dow, COALESCE(o.x, 0) AS x
      FROM types t
      CROSS JOIN (SELECT UNNEST(range(1, 8)) AS dow) d
      LEFT JOIN obs o ON o.typ = t.typ AND o.dow = d.dow
    ),
    tv AS (SELECT dow, x, COUNT(*) AS tot FROM full_grid GROUP BY 1, 2),
    grid AS (
      SELECT dow, x,
             2 * (SUM(tot) OVER (PARTITION BY dow ORDER BY x
                                 ROWS UNBOUNDED PRECEDING) - tot)
               + tot + 1 AS d2
      FROM tv
    ),
    ranked AS (
      SELECT f.typ, f.dow, g.d2
      FROM full_grid f JOIN grid g ON g.dow = f.dow AND g.x = f.x
    ),
    pert AS (SELECT typ, SUM(d2) AS dj FROM ranked GROUP BY 1),
    tot AS (
      SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT dow FROM ranked)) AS n,
             (SELECT COUNT(*) FROM pert) AS k,
             (SELECT SUM(CAST(dj AS HUGEINT) * dj) FROM pert) AS s2,
             (SELECT SUM(CAST(d2 AS HUGEINT) * d2) FROM ranked) AS a2
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           CAST(k AS BIGINT) AS k_treatments,
           CAST((2 * 1000000::HUGEINT * (k - 1)
                   * (s2 - CAST(n AS HUGEINT) * n * k * (k+1) * (k+1))
                 + (a2 - CAST(n AS HUGEINT) * k * (k+1) * (k+1)))
                // (2 * (a2 - CAST(n AS HUGEINT) * k * (k+1) * (k+1)))
             AS BIGINT) AS t1_micro,
           CAST((2 * 1000000::HUGEINT
                   * (s2 - CAST(n AS HUGEINT) * n * k * (k+1) * (k+1))
                 + CAST(n AS HUGEINT)
                   * (a2 - CAST(n AS HUGEINT) * k * (k+1) * (k+1)))
                // (2 * CAST(n AS HUGEINT)
                      * (a2 - CAST(n AS HUGEINT) * k * (k+1) * (k+1)))
             AS BIGINT) AS kendall_w_micro
    FROM tot
    WHERE k > 1 AND a2 > CAST(n AS HUGEINT) * k * (k+1) * (k+1)
    """,
    doc="Friedman test of whether the event-type mix differs across the "
    "week: blocks = ISO weekdays (n=7), treatments = event types, one "
    "observation per cell (the corpus count of that type on that "
    "weekday, missing cells = 0), ranked WITHIN each weekday block with "
    "average ranks for ties via the 2x-rank grid (the Kruskal-Wallis "
    "discipline; in doubled ranks the tie-corrected statistic is the "
    "pure-integer T1 = (k-1)(S'-n^2k(k+1)^2)/(A'-nk(k+1)^2) with "
    "S'=Sum Dj^2, A'=Sum d_ij^2 — equal to the classic "
    "12/(nk(k+1))*Sum Rj^2 - 3n(k+1) when ties are absent, verified "
    "against the perfect-agreement identity Q = n(k-1) in the textbook "
    "pins). Completes the nonparametric family: Mann-Whitney (2 "
    "independent), Kruskal-Wallis (k independent), Friedman (k related "
    "blocks). Kendall's W = T1/(n(k-1)) concordance rides the same "
    "integers. The numerator is non-negative by Cauchy-Schwarz, so no "
    "positivity shift; all-tied blocks (A'=nk(k+1)^2) are filtered on "
    "both sides. Scale shape: ONE map-side-combined (type, dow) "
    "aggregate touches the corpus; everything after runs on the "
    "<=7k-cell grid (types x weekdays — fixed enumerations).",
)
def agg_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    obs = (
        ev.select(
            F.col("event_type").alias("typ"),
            (F.weekday("ts") + F.lit(1)).alias("dow"),
        )
        .groupBy("typ", "dow")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    obs = obs.localCheckpoint(eager=True)  # types x 7 cells, read twice
    # complete blocks without a cross join: every type carries all 7
    # weekdays via explode(sequence), missing observations count 0
    full_grid = (
        obs.select("typ")
        .distinct()
        .select("typ", F.explode(F.expr("sequence(1, 7)")).alias("dow"))
        .join(obs, ["typ", "dow"], "left")
        .select("typ", "dow", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
    )
    full_grid = full_grid.localCheckpoint(eager=True)  # read twice
    tv = full_grid.groupBy("dow", "x").agg(F.count(F.lit(1)).alias("tot"))
    wo = Window.partitionBy("dow").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grid = tv.select(
        "dow",
        "x",
        (2 * (F.sum("tot").over(wo) - F.col("tot")) + F.col("tot") + 1).alias(
            "d2"
        ),
    )
    ranked = full_grid.join(grid, ["dow", "x"]).select("typ", "dow", "d2")
    ranked = ranked.localCheckpoint(eager=True)  # read twice below
    # both summaries are grid-bounded one-row aggregates: pull them as
    # driver literals (the kappa / k-means-model pattern) — a keyless
    # join of two one-row frames would plan as a CartesianProduct
    prow = (
        ranked.groupBy("typ")
        .agg(F.sum("d2").alias("dj"))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.expr("CAST(dj AS DECIMAL(38,0)) * dj")).alias("s2"),
        )
        .first()
    )
    arow = ranked.agg(
        F.countDistinct("dow").alias("n"),
        F.sum(F.expr("CAST(d2 AS DECIMAL(38,0)) * d2")).alias("a2"),
    ).first()
    k = int(prow["k"] or 0) if prow is not None else 0
    s2 = int(prow["s2"] or 0) if prow is not None else 0
    n = int(arow["n"] or 0) if arow is not None else 0
    a2 = int(arow["a2"] or 0) if arow is not None else 0
    den = a2 - n * k * (k + 1) * (k + 1)
    num = s2 - n * n * k * (k + 1) * (k + 1)
    # capacity, coefficient DERIVED from the actual t1 numerator
    # 2e6*(k-1)*num + den (ADVICE r13: the previous 1e6*k*num check
    # understated it ~2x): 2e6*(k-1)*num <= 2e6*k*num, and den <= a2 <=
    # the same n,k envelope as num, so 3e6*k*num dominates the sum.
    # Unreachable below k ~ 4e7 event types, but keep the discipline.
    assert 3 * 10**6 * max(k, 1) * max(num, 1) < 10**38
    assert num >= 0, "Cauchy-Schwarz violated: rank arithmetic is wrong"
    return spark.createDataFrame(
        [(n, k)], "n_blocks long, k_treatments long"
    ).select(
        "n_blocks",
        "k_treatments",
        F.expr(
            f"CAST((2 * CAST(1000000 AS DECIMAL(38,0)) * {k - 1} * {num}"
            f" + {max(den, 1)}) div (2 * {max(den, 1)}) AS BIGINT)"
        ).alias("t1_micro"),
        F.expr(
            f"CAST((2 * CAST(1000000 AS DECIMAL(38,0)) * {num}"
            f" + CAST({n} AS DECIMAL(38,0)) * {max(den, 1)})"
            f" div (2 * CAST({n if n else 1} AS DECIMAL(38,0))"
            f" * {max(den, 1)}) AS BIGINT)"
        ).alias("kendall_w_micro"),
    ).where(F.lit(k > 1 and den > 0))


# --- r14 re-entry: Kaplan-Meier survival (VERDICT r13 #2: widened capacity) ----

# DuckDB-side packing only: el = t*2^80 + n_risk*2^40 + n_deaths in HUGEINT
# (126 usable bits) — t in the top bits so list(el ORDER BY el) is the
# by-time sort the KM fold needs. The Spark side folds over an
# array<struct<t,n,d>> directly (array_sort orders structs by field
# position — t first), so no Spark-side packing and no 2^24 user cap:
# fold arithmetic 2*acc*(n-d) + n stays under int64 while n < 2^40.
_KM_B = 1 << 40
_KM_TB = 1 << 80


@register(
    "events_survival_km",
    f"""
    WITH u AS (
      SELECT user_id,
             MIN((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS fd,
             MAX((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS ld,
             MIN(CASE WHEN event_type = 'purchase' THEN
                   (epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                     + 86400000000) % 86400000000))
                   // 86400000000 END) AS pd
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CASE WHEN pd IS NULL THEN ld - fd ELSE pd - fd END AS t,
             CASE WHEN pd IS NULL THEN 0 ELSE 1 END AS ev
      FROM u
    ),
    hist AS (
      SELECT t, COUNT(*) AS c_all, CAST(SUM(ev) AS BIGINT) AS c_d
      FROM d GROUP BY 1
    ),
    r AS (
      SELECT t, c_d,
             CAST(SUM(c_all) OVER ()
                  - (SUM(c_all) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                     - c_all) AS BIGINT) AS n_t
      FROM hist
    ),
    deaths AS (
      SELECT t, n_t, c_d,
             CAST(t AS HUGEINT) * {_KM_TB}
               + CAST(n_t AS HUGEINT) * {_KM_B} + c_d AS el
      FROM r WHERE c_d > 0
    ),
    arr AS (SELECT list(el ORDER BY el) AS a FROM deaths)
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_t AS BIGINT) AS n_risk,
           CAST(c_d AS BIGINT) AS n_deaths,
           CAST(list_reduce(
                  list_prepend(1000000::HUGEINT,
                    list_filter((SELECT a FROM arr), y -> y <= deaths.el)),
                  (acc, x) ->
                    (2 * acc * ((x // {_KM_B}) % {_KM_B} - x % {_KM_B})
                     + (x // {_KM_B}) % {_KM_B})
                    // (2 * ((x // {_KM_B}) % {_KM_B}))
                ) AS BIGINT) AS survival_micro
    FROM deaths ORDER BY t
    """,
    doc="Kaplan-Meier curve of time-to-first-purchase: duration = days "
    "from a user's FIRST event to their FIRST purchase event; users who "
    "never purchase are right-CENSORED at their last observed day (the "
    "estimand naive conversion averages get wrong — censored users "
    "leave the risk set without converting). At each conversion time "
    "t: S <- S * (n_t - d_t)/n_t with the product kept in half-up "
    "MICRO-units by the integer recurrence S' = (2*S*(n-d) + n) div "
    "(2*n) — sequential, so it runs as a FOLD over the day-level death "
    "list: Spark F.aggregate with an explicit 1e6 seed over a slice of "
    "an array<struct<t,n,d>> sorted by array_sort (struct order = field "
    "order, t first — no Spark-side bit packing, so fold arithmetic "
    "2*acc*(n-d)+n stays in int64 for n < 2^40 users, VERDICT r13 #2's "
    "widened capacity); DuckDB list_reduce with the seed PREPENDED "
    "(list_reduce has no init parameter — the first element IS the "
    "accumulator, so a plain-HUGEINT seed rides as element zero and the "
    "step lambda only ever decodes its x argument) over HUGEINT-packed "
    "(t*2^80 + n_risk*2^40 + d) elements. Capacity asserted LOUDLY: "
    "users < 2^40 (~1.1e12 — comfortably past 100x-scale). Pinned "
    "against the hand-derivable product in the textbook pins. Scale "
    "shape: ONE per-user aggregate touches the corpus; the histogram, "
    "risk suffix sums and the O(D^2) per-row folds all run on the <= "
    "span-days frame (D a few hundred — bounded by calendar time, not "
    "data volume).",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = (
        "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
        " div 86400000000"
    )
    u = (
        ev.select(
            "user_id",
            F.expr(day).alias("day"),
            F.col("event_type").alias("et"),
        )
        .groupBy("user_id")
        .agg(
            F.min("day").alias("fd"),
            F.max("day").alias("ld"),
            F.min(
                F.when(F.col("et") == "purchase", F.col("day"))
            ).alias("pd"),
        )
        .localCheckpoint(eager=True)  # users-bounded, read twice
    )
    row = u.agg(
        F.max("ld").alias("m"),
        F.min("fd").alias("lo"),
        F.count(F.lit(1)).alias("nu"),
    ).first()
    m = int(row["m"]) if row is not None and row["m"] is not None else 0
    lo = int(row["lo"]) if row is not None and row["lo"] is not None else 0
    nu = int(row["nu"] or 0) if row is not None else 0
    # capacity: int64 fold arithmetic + the oracle's 40-bit HUGEINT
    # fields need n_risk < 2^40; the t field has 46 spare bits
    assert nu < _KM_B, "KM fold supports < 2^40 users — widen fields"
    assert 0 <= m - lo < (1 << 44), "corpus span exceeds the t field"
    hist = (
        u.select(
            F.when(
                F.col("pd").isNull(), F.col("ld") - F.col("fd")
            ).otherwise(F.col("pd") - F.col("fd")).alias("t"),
            F.when(F.col("pd").isNull(), 0).otherwise(1).alias("ev"),
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("c_all"),
            F.sum("ev").cast("long").alias("c_d"),
        )
    )
    w_le = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = hist.select(
        "t",
        "c_d",
        (
            F.sum("c_all").over(w_all)
            - (F.sum("c_all").over(w_le) - F.col("c_all"))
        ).cast("long").alias("n_t"),
    )
    deaths = r.where(F.col("c_d") > 0).select(
        F.struct(
            F.col("t").cast("long").alias("t"),
            F.col("n_t").alias("n"),
            F.col("c_d").alias("d"),
        ).alias("el")
    )
    arr = deaths.agg(F.array_sort(F.collect_list("el")).alias("a"))
    fold = (
        "aggregate(slice(a, 1, pos + 1), CAST(1000000 AS BIGINT),"
        " (acc, x) -> (2 * acc * (x.n - x.d) + x.n) div (2 * x.n))"
    )
    return (
        arr.select(F.posexplode("a").alias("pos", "el"), "a")
        .select(
            F.col("el.t").cast("long").alias("t_days"),
            F.col("el.n").cast("long").alias("n_risk"),
            F.col("el.d").cast("long").alias("n_deaths"),
            F.expr(fold).cast("long").alias("survival_micro"),
        )
        .orderBy("t_days")
    )


# --- r14 re-entry: log-rank test (VERDICT r13 #2: two-stage variance) ----------


@register(
    "events_survival_logrank",
    """
    WITH u AS (
      SELECT user_id,
             MIN((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS fd,
             MAX((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS ld,
             MIN(CASE WHEN event_type = 'purchase' THEN
                   (epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                     + 86400000000) % 86400000000))
                   // 86400000000 END) AS pd,
             CASE WHEN SUM(CASE WHEN event_type = 'error' THEN 1
                           ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS g
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CASE WHEN pd IS NULL THEN ld - fd ELSE pd - fd END AS t,
             CASE WHEN pd IS NULL THEN 0 ELSE 1 END AS ev, g
      FROM u
    ),
    hist2 AS (
      SELECT g, t, COUNT(*) AS c_all, CAST(SUM(ev) AS BIGINT) AS c_d
      FROM d GROUP BY 1, 2
    ),
    full_grid AS (
      SELECT gg.g, vals.t,
             COALESCE(h.c_all, 0) AS c_all, COALESCE(h.c_d, 0) AS c_d
      FROM (SELECT DISTINCT t FROM hist2) vals
      CROSS JOIN (SELECT UNNEST([0, 1]) AS g) gg
      LEFT JOIN hist2 h ON h.g = gg.g AND h.t = vals.t
    ),
    riskg AS (
      SELECT g, t, c_d,
             CAST(SUM(c_all) OVER (PARTITION BY g)
                  - (SUM(c_all) OVER (PARTITION BY g ORDER BY t
                                      ROWS UNBOUNDED PRECEDING)
                     - c_all) AS BIGINT) AS n_g
      FROM full_grid
    ),
    steps AS (
      SELECT t,
             SUM(n_g) AS n_t, SUM(c_d) AS d_t,
             SUM(CASE WHEN g = 1 THEN n_g ELSE 0 END) AS n1,
             SUM(CASE WHEN g = 1 THEN c_d ELSE 0 END) AS d1
      FROM riskg GROUP BY 1
    ),
    sums AS (
      SELECT SUM(d1) AS o1,
             SUM((2 * 1000000::HUGEINT * n1 * d_t + n_t)
                 // (2 * CAST(n_t AS HUGEINT))) AS e1_micro,
             SUM(CASE WHEN n_t > 1 THEN
                   (2 * d_t
                      * ((2 * 1000000::HUGEINT * n1 * (n_t - n1) + n_t)
                         // (2 * CAST(n_t AS HUGEINT)))
                      * (n_t - d_t)
                    + CAST(n_t AS HUGEINT) * (n_t - 1))
                   // (2 * CAST(n_t AS HUGEINT) * (n_t - 1))
                 ELSE 0 END) AS v_micro
      FROM steps WHERE d_t > 0
    )
    SELECT CAST(o1 AS BIGINT) AS o1,
           CAST(e1_micro AS BIGINT) AS e1_micro,
           CAST(v_micro AS BIGINT) AS v_micro,
           CAST((2 * (1000000::HUGEINT * o1 - e1_micro)
                   * (1000000::HUGEINT * o1 - e1_micro)
                 + v_micro)
                // (2 * CAST(v_micro AS HUGEINT)) AS BIGINT)
             AS chi2_micro
    FROM sums WHERE v_micro > 0
    """,
    doc="Log-rank test: do ERROR-HEAVY users (>= 14 error events — the "
    "corpus median error load, a fixed calibration literal) convert "
    "(first purchase) on a DIFFERENT survival curve than low-error "
    "users? The standard two-sample censored comparison "
    "(Mantel-Cox): at each conversion day t the group-1 observed deaths "
    "d1 are compared to the expected e1 = n1*d_t/n_t under the shared-"
    "hazard null, with hypergeometric variance v_t = d_t*n1*(n_t-n1)*"
    "(n_t-d_t)/(n_t^2*(n_t-1)); chi2 = (O1-E1)^2/V. Every per-step term "
    "is an exact half-up MICRO-unit integer (documented per-step "
    "rounding, so both engines sum IDENTICAL integers — the Nelson-"
    "Aalen discipline). The variance is a documented TWO-STAGE "
    "recurrence (VERDICT r13 #2): q1 = round(1e6*n1*(n-n1)/n) then "
    "v_t = round(q1*d*(n-d)/(n*(n-1))) — dividing before the product "
    "accumulates caps the wide-integer numerator at 2*q1*(n^2/4) = "
    "1.25e5*n^3 (was 1.25e5*n^4 one-stage), so the DECIMAL(38,0)/"
    "HUGEINT assert clears ~9e10 event rows instead of ~5.3e8; chi2 "
    "derives from the exact integer O-E in micro (its square is "
    "non-negative — no positivity shift). Completes the survival "
    "family: KM curve (events_survival_km), Nelson-Aalen cumulative "
    "hazard, log-rank comparison. Scale shape: ONE per-user aggregate "
    "touches the corpus; the 2 x days grid, per-group risk suffix "
    "windows and the step sums are all span-days-bounded.",
)
def events_survival_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.plans.queries import _table_row_count

    n_rows = _table_row_count(sf_dir, "events")
    # variance-term capacity, coefficient DERIVED from the real worst
    # case of the TWO-STAGE recurrence (VERDICT r13 #2): stage 1's
    # q1 = round(1e6*n1*(n-n1)/n) peaks at 1e6*n/4; stage 2's shifted
    # numerator 2*d*q1*(n-d) + n*(n-1) peaks at 2*(n^2/4)*(1e6*n/4) =
    # 1.25e5 * n^3 — users <= event rows, gate on the footer count
    # (supports < ~9.3e10 event rows; the one-stage form capped at
    # ~5.3e8)
    assert 125_000 * n_rows**3 < 10**38, (
        "log-rank variance arithmetic needs a wider type at this scale"
    )
    ev = _t(spark, sf_dir, "events")
    day = (
        "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
        " div 86400000000"
    )
    u = (
        ev.select(
            "user_id",
            F.expr(day).alias("day"),
            F.col("event_type").alias("et"),
        )
        .groupBy("user_id")
        .agg(
            F.min("day").alias("fd"),
            F.max("day").alias("ld"),
            F.min(
                F.when(F.col("et") == "purchase", F.col("day"))
            ).alias("pd"),
            F.when(
                F.sum(
                    F.when(F.col("et") == "error", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("g"),
        )
    )
    hist2 = (
        u.select(
            F.when(
                F.col("pd").isNull(), F.col("ld") - F.col("fd")
            ).otherwise(F.col("pd") - F.col("fd")).alias("t"),
            F.when(F.col("pd").isNull(), 0).otherwise(1).alias("ev"),
            "g",
        )
        .groupBy("g", "t")
        .agg(
            F.count(F.lit(1)).alias("c_all"),
            F.sum("ev").cast("long").alias("c_d"),
        )
        .localCheckpoint(eager=True)  # 2 x days cells, read twice
    )
    full_grid = (
        hist2.select("t")
        .distinct()
        .select("t", F.explode(F.expr("array(0, 1)")).alias("g"))
        .join(hist2, ["g", "t"], "left")
        .select(
            "g",
            "t",
            F.coalesce(F.col("c_all"), F.lit(0)).alias("c_all"),
            F.coalesce(F.col("c_d"), F.lit(0)).alias("c_d"),
        )
    )
    w_g = Window.partitionBy("g")
    w_le = Window.partitionBy("g").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    riskg = full_grid.select(
        "g",
        "t",
        "c_d",
        (
            F.sum("c_all").over(w_g)
            - (F.sum("c_all").over(w_le) - F.col("c_all"))
        ).cast("long").alias("n_g"),
    )
    steps = riskg.groupBy("t").agg(
        F.sum("n_g").alias("n_t"),
        F.sum("c_d").alias("d_t"),
        F.sum(F.when(F.col("g") == 1, F.col("n_g")).otherwise(0)).alias(
            "n1"
        ),
        F.sum(F.when(F.col("g") == 1, F.col("c_d")).otherwise(0)).alias(
            "d1"
        ),
    )
    row = (
        steps.where(F.col("d_t") > 0)
        .agg(
            F.sum("d1").alias("o1"),
            F.sum(
                F.expr(
                    "(2 * CAST(1000000 AS DECIMAL(38,0)) * n1 * d_t + n_t)"
                    " div (2 * CAST(n_t AS DECIMAL(38,0)))"
                )
            ).alias("e1"),
            F.sum(
                F.expr(
                    "CASE WHEN n_t > 1 THEN"
                    " (2 * d_t"
                    "    * ((2 * CAST(1000000 AS DECIMAL(38,0)) * n1"
                    "          * (n_t - n1) + n_t)"
                    "       div (2 * CAST(n_t AS DECIMAL(38,0))))"
                    "    * (n_t - d_t)"
                    "  + CAST(n_t AS DECIMAL(38,0)) * (n_t - 1))"
                    " div (2 * CAST(n_t AS DECIMAL(38,0)) * (n_t - 1))"
                    " ELSE CAST(0 AS DECIMAL(38,0)) END"
                )
            ).alias("v"),
        )
        .first()
    )
    o1 = int(row["o1"] or 0) if row is not None else 0
    e1 = int(row["e1"] or 0) if row is not None else 0
    v = int(row["v"] or 0) if row is not None else 0
    delta = 10**6 * o1 - e1  # O-E in exact micro-units (signed)
    return spark.createDataFrame(
        [(o1, e1, v)], "o1 long, e1_micro long, v_micro long"
    ).select(
        "o1",
        "e1_micro",
        "v_micro",
        F.expr(
            f"CAST((2 * CAST({delta} AS DECIMAL(38,0)) * {delta}"
            f" + {max(v, 1)}) div (2 * CAST({max(v, 1)} AS DECIMAL(38,0)))"
            f" AS BIGINT)"
        ).alias("chi2_micro"),
    ).where(F.lit(v > 0))


# --- r14 re-entry: RMST + median time-to-conversion (widened KM capacity) ------


@register(
    "events_survival_rmst",
    f"""
    WITH u AS (
      SELECT user_id,
             MIN((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS fd,
             MAX((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS ld,
             MIN(CASE WHEN event_type = 'purchase' THEN
                   (epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                     + 86400000000) % 86400000000))
                   // 86400000000 END) AS pd
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CASE WHEN pd IS NULL THEN ld - fd ELSE pd - fd END AS t,
             CASE WHEN pd IS NULL THEN 0 ELSE 1 END AS ev
      FROM u
    ),
    hist AS (
      SELECT t, COUNT(*) AS c_all, CAST(SUM(ev) AS BIGINT) AS c_d
      FROM d GROUP BY 1
    ),
    r AS (
      SELECT t, c_d,
             CAST(SUM(c_all) OVER ()
                  - (SUM(c_all) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                     - c_all) AS BIGINT) AS n_t
      FROM hist
    ),
    deaths AS (
      SELECT t, n_t, c_d,
             CAST(t AS HUGEINT) * {_KM_TB}
               + CAST(n_t AS HUGEINT) * {_KM_B} + c_d AS el
      FROM r WHERE c_d > 0
    ),
    arr AS (SELECT list(el ORDER BY el) AS a FROM deaths),
    curve AS (
      SELECT t,
             CAST(list_reduce(
               list_prepend(1000000::HUGEINT,
                 list_filter((SELECT a FROM arr), y -> y <= deaths.el)),
               (acc, x) ->
                 (2 * acc * ((x // {_KM_B}) % {_KM_B} - x % {_KM_B})
                  + (x // {_KM_B}) % {_KM_B})
                 // (2 * ((x // {_KM_B}) % {_KM_B}))
             ) AS BIGINT) AS s
      FROM deaths
    ),
    tau AS (SELECT MAX(t) AS tau FROM hist),
    seg AS (
      SELECT t, s,
             COALESCE(LEAD(t) OVER (ORDER BY t),
                      (SELECT tau FROM tau)) AS t_next
      FROM curve
    ),
    agg AS (
      SELECT (SELECT COUNT(*) FROM d) AS n_users,
             (SELECT tau FROM tau) AS horizon_days,
             COALESCE((SELECT MIN(t) FROM curve WHERE s <= 500000), -1)
               AS median_ttc_days,
             (SELECT COALESCE(MIN(t), (SELECT tau FROM tau)) FROM curve)
               * 1000000 AS head_area,
             COALESCE((SELECT SUM(s * (t_next - t)) FROM seg), 0)
               AS step_area
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(horizon_days AS BIGINT) AS horizon_days,
           CAST(median_ttc_days AS BIGINT) AS median_ttc_days,
           CAST(head_area + step_area AS BIGINT) AS rmst_micro_days
    FROM agg
    """,
    doc="Restricted mean survival time + median time-to-conversion from "
    "the Kaplan-Meier curve — THE two reporting estimands of survival "
    "analysis (RMST = area under the KM step function up to the horizon "
    "tau = the longest observed duration; it stays defined and "
    "comparable when the median never crosses). Exact integers end to "
    "end: S is 1e6-scaled from the same seeded fold as "
    "events_survival_km (Spark: array<struct<t,n,d>> fold, no bit "
    "packing — users < 2^40, VERDICT r13 #2's widened capacity; DuckDB: "
    "HUGEINT 40-bit-field packing), the area is 1e6*t_1 (the S=1 head "
    "segment) + Sum S_i*(t_{{i+1}}-t_i) with LEAD over the bounded "
    "death-day frame and the last segment closed at tau, in micro-DAYS; "
    "the median is the first death day with S <= 0.5 (-1 sentinel when "
    "the curve never crosses — half the users still unconverted at "
    "horizon). Pinned against the hand-integrated area of the KM pin "
    "example. Same scale shape as the KM row: one per-user aggregate "
    "touches the corpus, everything after is span-days-bounded.",
)
def events_survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = (
        "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
        " div 86400000000"
    )
    u = (
        ev.select(
            "user_id",
            F.expr(day).alias("day"),
            F.col("event_type").alias("et"),
        )
        .groupBy("user_id")
        .agg(
            F.min("day").alias("fd"),
            F.max("day").alias("ld"),
            F.min(
                F.when(F.col("et") == "purchase", F.col("day"))
            ).alias("pd"),
        )
        .localCheckpoint(eager=True)  # users-bounded, read twice
    )
    row = u.agg(
        F.max("ld").alias("m"),
        F.min("fd").alias("lo"),
        F.count(F.lit(1)).alias("nu"),
    ).first()
    m = int(row["m"]) if row is not None and row["m"] is not None else 0
    lo = int(row["lo"]) if row is not None and row["lo"] is not None else 0
    nu = int(row["nu"] or 0) if row is not None else 0
    assert nu < _KM_B, "KM fold supports < 2^40 users — widen fields"
    assert 0 <= m - lo < (1 << 44), "corpus span exceeds the t field"
    dur = u.select(
        F.when(
            F.col("pd").isNull(), F.col("ld") - F.col("fd")
        ).otherwise(F.col("pd") - F.col("fd")).alias("t"),
        F.when(F.col("pd").isNull(), 0).otherwise(1).alias("ev"),
    )
    hist = dur.groupBy("t").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum("ev").cast("long").alias("c_d"),
    )
    hist = hist.localCheckpoint(eager=True)  # days-bounded, read twice
    trow = hist.agg(
        F.max("t").alias("tau"), F.sum("c_all").alias("nu2")
    ).first()
    tau = int(trow["tau"]) if trow is not None and trow["tau"] is not None else 0
    n_users = int(trow["nu2"] or 0) if trow is not None else 0
    w_le = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = hist.select(
        "t",
        "c_d",
        (
            F.sum("c_all").over(w_all)
            - (F.sum("c_all").over(w_le) - F.col("c_all"))
        ).cast("long").alias("n_t"),
    )
    deaths = r.where(F.col("c_d") > 0).select(
        F.struct(
            F.col("t").cast("long").alias("t"),
            F.col("n_t").alias("n"),
            F.col("c_d").alias("d"),
        ).alias("el")
    )
    arr = deaths.agg(F.array_sort(F.collect_list("el")).alias("a"))
    fold = (
        "aggregate(slice(a, 1, pos + 1), CAST(1000000 AS BIGINT),"
        " (acc, x) -> (2 * acc * (x.n - x.d) + x.n) div (2 * x.n))"
    )
    curve = arr.select(
        F.posexplode("a").alias("pos", "el"), "a"
    ).select(
        F.col("el.t").cast("long").alias("t"),
        F.expr(fold).cast("long").alias("s"),
    )
    wl = Window.orderBy("t")
    seg = curve.select(
        "t",
        "s",
        F.coalesce(F.lead("t").over(wl), F.lit(tau)).alias("t_next"),
    )
    srow = seg.agg(
        F.coalesce(
            F.min(F.when(F.col("s") <= 500_000, F.col("t"))), F.lit(-1)
        ).alias("median"),
        F.coalesce(F.min("t"), F.lit(tau)).alias("t1"),
        F.coalesce(
            F.sum(F.expr("s * (t_next - t)")), F.lit(0)
        ).alias("step_area"),
    ).first()
    median = int(srow["median"]) if srow is not None else -1
    t1 = int(srow["t1"]) if srow is not None else tau
    step_area = int(srow["step_area"] or 0) if srow is not None else 0
    rmst = 10**6 * t1 + step_area
    return spark.createDataFrame(
        [(n_users, tau, median, rmst)],
        "n_users long, horizon_days long, median_ttc_days long,"
        " rmst_micro_days long",
    )


# --- r14 re-entry: Poisson bootstrap (single corpus execution) -----------------

@register(
    "agg_poisson_bootstrap_ci",
    """
    WITH base AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS k,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    bs AS (SELECT unnest(generate_series(0, 31)) AS b),
    ex AS (
      SELECT bs.b, base.cents,
             CAST((md5_number_upper(base.k || ':' || CAST(bs.b AS VARCHAR))
                   >> 8) AS BIGINT) % 1000000 AS u6
      FROM base CROSS JOIN bs
    ),
    wts AS (
      SELECT b, cents,
             CASE WHEN u6 < 367879 THEN 0
                  WHEN u6 < 735759 THEN 1
                  WHEN u6 < 919699 THEN 2
                  WHEN u6 < 981012 THEN 3
                  WHEN u6 < 996340 THEN 4
                  ELSE 5 END AS w
      FROM ex
    ),
    res AS (SELECT b, SUM(w) AS wsum, SUM(w * cents) AS wc
            FROM wts GROUP BY b),
    means AS (SELECT b, (2 * wc + wsum) // (2 * wsum) AS m FROM res),
    rk AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM means),
    pt AS (SELECT COUNT(*) AS n,
                  (2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*)) AS pm
           FROM base)
    SELECT CAST(pt.n AS BIGINT) AS n_orders,
           CAST(pt.pm AS BIGINT) AS point_mean_cents,
           CAST(SUM(CASE WHEN rn = 2 THEN m END) AS BIGINT)
             AS boot_lo_cents,
           CAST(SUM(CASE WHEN rn = 31 THEN m END) AS BIGINT)
             AS boot_hi_cents,
           CAST(500 * SUM(CASE WHEN rn IN (16, 17) THEN m END) AS BIGINT)
             AS boot_median_milli
    FROM rk CROSS JOIN pt
    GROUP BY pt.n, pt.pm
    """,
    doc="Poisson-bootstrap confidence interval for mean order value — the "
    "canonical web-scale resampling method (resample multiplicities are "
    "independent Poisson(1) draws, so no pass ever needs the sample "
    "size up front and the whole bootstrap is ONE scan). Deterministic "
    "by construction: replicate b's weight for an order is the inverse "
    "Poisson CDF evaluated on the md5 parity hash of (orderkey ':' b) "
    "mod 1e6 — integer thresholds 367879/735759/919699/981012/996340 "
    "(CDF of Poisson(1) at k=0..4, capped at 5) — identical on both "
    "engines via md5_number_upper>>8 ≡ md5_u56_le. Per-replicate means "
    "are exact half-up integer cents over positive sums; the interval "
    "is ORDER STATISTICS over the 32 replicate means (2nd/31st ≈ 94% "
    "coverage, median as the exact 500·(m16+m17) milli-cents). The slim "
    "(key, cents) projection rebalances across cores and is "
    "checkpointed once (r14: the point-estimate pull and the bootstrap "
    "previously each re-executed the scan+exchange) (32 md5s per "
    "row would otherwise pin to the single-row-group scan task); the "
    "explode-by-32 itself never reaches a shuffle — per-replicate "
    "aggregates combine map-side into 32 groups, so only 32 rows per "
    "partition follow the rebalance over the wire (gate-asserted); the "
    "point estimate crosses as driver literals (k-means-model pattern — "
    "a one-row cross join would plan as BNLJ).",
)
def agg_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.dedup import md5_u56_le

    # rebalance: 32 md5 hashes per order fuse onto the scan with NO
    # exchange before the 32-group combine — the single-row-group local
    # files would pin all that CPU to one task (the CLAUDE.md criterion)
    o = _t(spark, sf_dir, "orders", rebalance=True)
    base = o.select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    # ONE corpus execution (r14, found by the migrated session-sweep
    # gate): the scalar pull below and the bootstrap path each re-ran
    # the rebalanced scan+exchange — checkpoint the slim (key, cents)
    # frame so the corpus crosses the wire exactly once.
    base = base.localCheckpoint(eager=True)
    pt = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("(2 * sum(cents) + count(*)) div (2 * count(*))").alias("pm"),
    ).first()
    n_orders, point_mean = int(pt["n"]), int(pt["pm"])
    ex = base.select(
        "k", "cents", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b")
    )
    u6 = md5_u56_le(
        F.concat(F.col("k"), F.lit(":"), F.col("b").cast("string"))
    ) % F.lit(1000000)
    w = (
        F.when(u6 < 367879, 0)
        .when(u6 < 735759, 1)
        .when(u6 < 919699, 2)
        .when(u6 < 981012, 3)
        .when(u6 < 996340, 4)
        .otherwise(5)
    )
    res = (
        ex.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(F.sum("w").alias("wsum"), F.sum(F.col("w") * F.col("cents")).alias("wc"))
    )
    means = res.select(
        "b", F.expr("(2 * wc + wsum) div (2 * wsum)").alias("m")
    )
    rk = means.select(
        "m", "b", F.row_number().over(Window.orderBy("m", "b")).alias("rn")
    )
    return rk.agg(
        F.lit(n_orders).cast("long").alias("n_orders"),
        F.lit(point_mean).cast("long").alias("point_mean_cents"),
        F.sum(F.when(F.col("rn") == 2, F.col("m"))).cast("long").alias("boot_lo_cents"),
        F.sum(F.when(F.col("rn") == 31, F.col("m")))
        .cast("long")
        .alias("boot_hi_cents"),
        (F.lit(500) * F.sum(F.when(F.col("rn").isin(16, 17), F.col("m"))))
        .cast("long")
        .alias("boot_median_milli"),
    )


# (events_survival_logrank_stratified moved to plans/r15.py for its
#  r15 optimization re-entry — an edited block must sit inside the window.)


# --- r14: Mantel-Haenszel hazard ratio + Peto log-HR ---------------------------


@register(
    "events_hazard_ratio_mh",
    """
    WITH u AS (
      SELECT user_id,
             MIN((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS fd,
             MAX((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS ld,
             MIN(CASE WHEN event_type = 'purchase' THEN
                   (epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                     + 86400000000) % 86400000000))
                   // 86400000000 END) AS pd,
             CASE WHEN SUM(CASE WHEN event_type = 'error' THEN 1
                           ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS g
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT CASE WHEN pd IS NULL THEN ld - fd ELSE pd - fd END AS t,
             CASE WHEN pd IS NULL THEN 0 ELSE 1 END AS ev, g
      FROM u
    ),
    hist2 AS (
      SELECT g, t, COUNT(*) AS c_all, CAST(SUM(ev) AS BIGINT) AS c_d
      FROM d GROUP BY 1, 2
    ),
    full_grid AS (
      SELECT gg.g, vals.t,
             COALESCE(h.c_all, 0) AS c_all, COALESCE(h.c_d, 0) AS c_d
      FROM (SELECT DISTINCT t FROM hist2) vals
      CROSS JOIN (SELECT UNNEST([0, 1]) AS g) gg
      LEFT JOIN hist2 h ON h.g = gg.g AND h.t = vals.t
    ),
    riskg AS (
      SELECT g, t, c_d,
             CAST(SUM(c_all) OVER (PARTITION BY g)
                  - (SUM(c_all) OVER (PARTITION BY g ORDER BY t
                                      ROWS UNBOUNDED PRECEDING)
                     - c_all) AS BIGINT) AS n_g
      FROM full_grid
    ),
    steps AS (
      SELECT t,
             SUM(n_g) AS n_t, SUM(c_d) AS d_t,
             SUM(CASE WHEN g = 1 THEN n_g ELSE 0 END) AS n1,
             SUM(CASE WHEN g = 1 THEN c_d ELSE 0 END) AS d1
      FROM riskg GROUP BY 1
    ),
    sums AS (
      SELECT SUM((2 * 1000000::HUGEINT * d1 * (n_t - n1) + n_t)
                 // (2 * CAST(n_t AS HUGEINT))) AS hr_num,
             SUM((2 * 1000000::HUGEINT * (d_t - d1) * n1 + n_t)
                 // (2 * CAST(n_t AS HUGEINT))) AS hr_den,
             SUM(d1) AS o1,
             SUM((2 * 1000000::HUGEINT * n1 * d_t + n_t)
                 // (2 * CAST(n_t AS HUGEINT))) AS e1_micro,
             SUM(CASE WHEN n_t > 1 THEN
                   (2 * d_t
                      * ((2 * 1000000::HUGEINT * n1 * (n_t - n1) + n_t)
                         // (2 * CAST(n_t AS HUGEINT)))
                      * (n_t - d_t)
                    + CAST(n_t AS HUGEINT) * (n_t - 1))
                   // (2 * CAST(n_t AS HUGEINT) * (n_t - 1))
                 ELSE 0 END) AS v_micro
      FROM steps WHERE d_t > 0
    )
    SELECT CAST(hr_num AS BIGINT) AS hr_num_micro,
           CAST(hr_den AS BIGINT) AS hr_den_micro,
           CAST((2 * 1000000::HUGEINT * hr_num + hr_den)
                // (2 * CAST(hr_den AS HUGEINT)) AS BIGINT) AS hr_mh_micro,
           CAST((2 * 1000000::HUGEINT * (1000000 * o1 - e1_micro)
                 + v_micro
                 + 2 * CAST(v_micro AS HUGEINT) * 1000000000000)
                // (2 * CAST(v_micro AS HUGEINT)) - 1000000000000
             AS BIGINT) AS peto_loghr_micro
    FROM sums WHERE hr_den > 0 AND v_micro > 0
    """,
    doc="Mantel-Haenszel hazard-ratio estimate + Peto one-step log-HR "
    "for the error-heavy-vs-clean conversion comparison — the REPORTING "
    "companions to events_survival_logrank's hypothesis test (a "
    "significant chi2 says the curves differ; the HR says by how much). "
    "HR_MH = Sum_t[d1*(n_t-n1)/n_t] / Sum_t[d0*n1/n_t] — each per-step "
    "term an exact half-up MICRO integer (the Nelson-Aalen discipline: "
    "both engines sum identical integers), the final ratio one more "
    "half-up division; Peto's one-step estimator ln(HR) ~ (O1-E1)/V "
    "rides the log-rank machinery's exact integers (same two-stage "
    "variance recurrence) with the SIGNED division taking a 1e12 "
    "positivity shift (|ln HR| < 1e6 natural units asserted — the "
    "kappa discipline: floor-vs-truncate divergence is a regime to "
    "assert, not assume). This pair completes the survival family's "
    "reporting surface: effect size (HR_MH, Peto log-HR), test "
    "(log-rank, stratified log-rank), curves (KM), cumulative hazard "
    "(Nelson-Aalen), summaries (RMST, median). Scale shape: identical "
    "to the log-rank row — one per-user aggregate, then "
    "span-days-bounded grids.",
)
def events_hazard_ratio_mh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.plans.queries import _table_row_count

    n_rows = _table_row_count(sf_dir, "events")
    # the Peto variance reuses the two-stage log-rank recurrence
    # (1.25e5 * n^3 worst case); the HR numerator/denominator terms are
    # 2e6*d*n + n <= 3e6*n^2 — dominated by the variance bound
    assert 125_000 * n_rows**3 < 10**38, (
        "hazard-ratio arithmetic needs a wider type at this scale"
    )
    ev = _t(spark, sf_dir, "events")
    day = (
        "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
        " div 86400000000"
    )
    u = (
        ev.select(
            "user_id",
            F.expr(day).alias("day"),
            F.col("event_type").alias("et"),
        )
        .groupBy("user_id")
        .agg(
            F.min("day").alias("fd"),
            F.max("day").alias("ld"),
            F.min(
                F.when(F.col("et") == "purchase", F.col("day"))
            ).alias("pd"),
            F.when(
                F.sum(
                    F.when(F.col("et") == "error", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("g"),
        )
    )
    hist2 = (
        u.select(
            F.when(
                F.col("pd").isNull(), F.col("ld") - F.col("fd")
            ).otherwise(F.col("pd") - F.col("fd")).alias("t"),
            F.when(F.col("pd").isNull(), 0).otherwise(1).alias("ev"),
            "g",
        )
        .groupBy("g", "t")
        .agg(
            F.count(F.lit(1)).alias("c_all"),
            F.sum("ev").cast("long").alias("c_d"),
        )
        .localCheckpoint(eager=True)  # 2 x days cells, read twice
    )
    full_grid = (
        hist2.select("t")
        .distinct()
        .select("t", F.explode(F.expr("array(0, 1)")).alias("g"))
        .join(hist2, ["g", "t"], "left")
        .select(
            "g",
            "t",
            F.coalesce(F.col("c_all"), F.lit(0)).alias("c_all"),
            F.coalesce(F.col("c_d"), F.lit(0)).alias("c_d"),
        )
    )
    w_g = Window.partitionBy("g")
    w_le = Window.partitionBy("g").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    riskg = full_grid.select(
        "g",
        "t",
        "c_d",
        (
            F.sum("c_all").over(w_g)
            - (F.sum("c_all").over(w_le) - F.col("c_all"))
        ).cast("long").alias("n_g"),
    )
    steps = riskg.groupBy("t").agg(
        F.sum("n_g").alias("n_t"),
        F.sum("c_d").alias("d_t"),
        F.sum(F.when(F.col("g") == 1, F.col("n_g")).otherwise(0)).alias(
            "n1"
        ),
        F.sum(F.when(F.col("g") == 1, F.col("c_d")).otherwise(0)).alias(
            "d1"
        ),
    )
    row = (
        steps.where(F.col("d_t") > 0)
        .agg(
            F.sum(
                F.expr(
                    "(2 * CAST(1000000 AS DECIMAL(38,0)) * d1"
                    " * (n_t - n1) + n_t)"
                    " div (2 * CAST(n_t AS DECIMAL(38,0)))"
                )
            ).alias("hr_num"),
            F.sum(
                F.expr(
                    "(2 * CAST(1000000 AS DECIMAL(38,0)) * (d_t - d1)"
                    " * n1 + n_t)"
                    " div (2 * CAST(n_t AS DECIMAL(38,0)))"
                )
            ).alias("hr_den"),
            F.sum("d1").alias("o1"),
            F.sum(
                F.expr(
                    "(2 * CAST(1000000 AS DECIMAL(38,0)) * n1 * d_t + n_t)"
                    " div (2 * CAST(n_t AS DECIMAL(38,0)))"
                )
            ).alias("e1"),
            F.sum(
                F.expr(
                    "CASE WHEN n_t > 1 THEN"
                    " (2 * d_t"
                    "    * ((2 * CAST(1000000 AS DECIMAL(38,0)) * n1"
                    "          * (n_t - n1) + n_t)"
                    "       div (2 * CAST(n_t AS DECIMAL(38,0))))"
                    "    * (n_t - d_t)"
                    "  + CAST(n_t AS DECIMAL(38,0)) * (n_t - 1))"
                    " div (2 * CAST(n_t AS DECIMAL(38,0)) * (n_t - 1))"
                    " ELSE CAST(0 AS DECIMAL(38,0)) END"
                )
            ).alias("v"),
        )
        .first()
    )
    hr_num = int(row["hr_num"] or 0) if row is not None else 0
    hr_den = int(row["hr_den"] or 0) if row is not None else 0
    o1 = int(row["o1"] or 0) if row is not None else 0
    e1 = int(row["e1"] or 0) if row is not None else 0
    v = int(row["v"] or 0) if row is not None else 0
    delta = 10**6 * o1 - e1  # signed micro O-E
    # Peto shift regime (the kappa discipline): |ln HR| must stay below
    # the 1e12-micro shift, i.e. |delta/v| < 1e6 natural units — any
    # real effect is |ln HR| < ~20, so this only trips on data bugs
    if v > 0:
        assert abs(delta) < 10**6 * v, (
            "peto log-HR outside the positivity-shift regime"
        )
    return spark.createDataFrame(
        [(hr_num, hr_den)], "hr_num_micro long, hr_den_micro long"
    ).select(
        "hr_num_micro",
        "hr_den_micro",
        F.expr(
            f"CAST((2 * CAST(1000000 AS DECIMAL(38,0)) * {hr_num}"
            f" + {max(hr_den, 1)})"
            f" div (2 * CAST({max(hr_den, 1)} AS DECIMAL(38,0)))"
            f" AS BIGINT)"
        ).alias("hr_mh_micro"),
        F.expr(
            f"CAST((2 * CAST(1000000 AS DECIMAL(38,0)) * {delta}"
            f" + {max(v, 1)}"
            f" + 2 * CAST({max(v, 1)} AS DECIMAL(38,0)) * 1000000000000)"
            f" div (2 * CAST({max(v, 1)} AS DECIMAL(38,0)))"
            f" - 1000000000000 AS BIGINT)"
        ).alias("peto_loghr_micro"),
    ).where(F.lit(hr_den > 0 and v > 0))


# --- r14: Page's trend test — within-type weekday activity trend ---------------


@register(
    "agg_page_trend",
    """
    WITH obs AS (
      SELECT event_type AS typ, isodow(ts) AS dow, COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT typ FROM obs),
    full_grid AS (
      SELECT t.typ, d.dow, COALESCE(o.x, 0) AS x
      FROM types t
      CROSS JOIN (SELECT UNNEST(range(1, 8)) AS dow) d
      LEFT JOIN obs o ON o.typ = t.typ AND o.dow = d.dow
    ),
    tv AS (SELECT typ, x, COUNT(*) AS tot FROM full_grid GROUP BY 1, 2),
    grid AS (
      SELECT typ, x,
             2 * (SUM(tot) OVER (PARTITION BY typ ORDER BY x
                                 ROWS UNBOUNDED PRECEDING) - tot)
               + tot + 1 AS d2
      FROM tv
    ),
    ranked AS (
      SELECT f.typ, f.dow, g.d2
      FROM full_grid f JOIN grid g ON g.typ = f.typ AND g.x = f.x
    ),
    tot AS (
      SELECT (SELECT COUNT(*) FROM types) AS n,
             (SELECT SUM(CAST(dow AS HUGEINT) * d2) FROM ranked) AS l2
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           CAST(l2 AS BIGINT) AS l2,
           CAST(n * 7 * 64 // 2 AS BIGINT) AS e2,
           CAST(l2 - n * 7 * 64 // 2 AS BIGINT) AS l2_minus_e2
    FROM tot WHERE n > 0
    """,
    doc="Page's trend test for an ORDERED alternative in a randomized "
    "block design: blocks = event types, treatments = the 7 ISO "
    "weekdays in calendar order — does activity MONOTONICALLY rise (or "
    "fall) through the week within each type? L = Sum_j j*R_j over "
    "within-block ranks of the weekday counts; strictly more powerful "
    "than Friedman when the alternative is monotone — Page is to "
    "Friedman exactly what Jonckheere-Terpstra is to Kruskal-Wallis, "
    "completing the ordered-alternative pair on BOTH designs "
    "(independent groups: KW/JT; related blocks: Friedman/Page). "
    "Doubled average ranks keep ties integer (the 2x-rank grid "
    "discipline shared with the Friedman row — same corpus aggregate, "
    "ranks transposed: within TYPE across weekdays instead of within "
    "weekday across types); the expectation under H0 is the exact "
    "integer 2E[L] = n*k*(k+1)^2/2 (k=7 fixed: 224n, unchanged by ties "
    "since tied average ranks preserve each block's rank sum), so the "
    "JT reporting discipline applies: exact integers (L2, E2, L2-E2), "
    "no float variance. Pinned on the perfect-ordering identity "
    "L = Sum j^2 in the textbook pins. Scale shape: ONE "
    "map-side-combined (type, dow) aggregate touches the corpus; "
    "ranking and the L sum run on the 7k-cell grid.",
)
def agg_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    obs = (
        ev.select(
            F.col("event_type").alias("typ"),
            (F.weekday("ts") + F.lit(1)).alias("dow"),
        )
        .groupBy("typ", "dow")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    obs = obs.localCheckpoint(eager=True)  # types x 7 cells, read twice
    full_grid = (
        obs.select("typ")
        .distinct()
        .select("typ", F.explode(F.expr("sequence(1, 7)")).alias("dow"))
        .join(obs, ["typ", "dow"], "left")
        .select("typ", "dow", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
    )
    full_grid = full_grid.localCheckpoint(eager=True)  # read twice
    tv = full_grid.groupBy("typ", "x").agg(F.count(F.lit(1)).alias("tot"))
    wo = Window.partitionBy("typ").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grid = tv.select(
        "typ",
        "x",
        (2 * (F.sum("tot").over(wo) - F.col("tot")) + F.col("tot") + 1).alias(
            "d2"
        ),
    )
    ranked = full_grid.join(grid, ["typ", "x"]).select("typ", "dow", "d2")
    row = ranked.agg(
        F.countDistinct("typ").alias("n"),
        F.sum(F.expr("CAST(dow AS DECIMAL(38,0)) * d2")).alias("l2"),
    ).first()
    n = int(row["n"] or 0) if row is not None else 0
    l2 = int(row["l2"] or 0) if row is not None else 0
    e2 = n * 7 * 64 // 2  # n*k*(k+1)^2/2, k=7 — exact (even product)
    return spark.createDataFrame(
        [(n, l2, e2, l2 - e2)],
        "n_blocks long, l2 long, e2 long, l2_minus_e2 long",
    ).where(F.lit(n > 0))


# --- r14: Cochran's Q — binary day-presence homogeneity across types -----------


@register(
    "agg_cochran_q",
    """
    WITH cnts AS (
      SELECT CAST(ts AS DATE) AS d, event_type AS typ, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    k_ AS (SELECT COUNT(DISTINCT typ) AS k FROM cnts),
    tots AS (SELECT d, SUM(c) AS tot FROM cnts GROUP BY 1),
    obs AS (
      SELECT cnts.d, cnts.typ
      FROM cnts JOIN tots ON tots.d = cnts.d CROSS JOIN k_
      WHERE k_.k * cnts.c > tots.tot
    ),
    n_ AS (SELECT COUNT(*) AS n FROM obs),
    cj AS (SELECT SUM(CAST(c AS HUGEINT) * c) AS sc2
           FROM (SELECT typ, COUNT(*) AS c FROM obs GROUP BY 1)),
    ri AS (SELECT SUM(CAST(c AS HUGEINT) * c) AS sr2
           FROM (SELECT d, COUNT(*) AS c FROM obs GROUP BY 1))
    SELECT CAST(k AS BIGINT) AS k_treatments,
           CAST(n AS BIGINT) AS n_present,
           CAST((2 * 1000000::HUGEINT * (k - 1)
                   * (k * sc2 - CAST(n AS HUGEINT) * n)
                 + (CAST(k AS HUGEINT) * n - sr2))
                // (2 * (CAST(k AS HUGEINT) * n - sr2)) AS BIGINT)
             AS q_micro
    FROM k_ CROSS JOIN n_ CROSS JOIN cj CROSS JOIN ri
    WHERE CAST(k AS HUGEINT) * n > sr2 AND k > 1
    """,
    doc="Cochran's Q test for BINARY repeated measures: blocks = "
    "calendar days, treatments = event types, x_ij = 1 iff type j "
    "OVERPERFORMED its equal share of day i's events (k*c_ij > day "
    "total — an exact-integer, scale-invariant indicator; raw "
    "at-least-once presence saturates to all-ones on any high-volume "
    "corpus and a fixed count literal would not survive a scale-factor "
    "change) — do the types differ in how often they run above their "
    "equal daily share? The k-treatment generalization of McNemar "
    "(k=2 reduces to it), completing the repeated-measures family "
    "alongside Friedman (ordinal) and Page (ordered): "
    "Q = (k-1)*(k*Sum C_j^2 - N^2) / (k*N - Sum R_i^2) with C_j = "
    "per-type block counts, R_i = per-day present-type counts, N = "
    "total presences — PURE integers (numerator non-negative by "
    "Cauchy-Schwarz since Sum C_j = N over k terms; the denominator is "
    "Sum R_i*(k - R_i), zero only when no day has a strict "
    "overperformer — R_i = k is impossible since not all k types can "
    "exceed the day mean), one half-up micro division at the end. "
    "Pinned on a hand-computed 4x3 presence matrix in the textbook "
    "pins. Scale shape: ONE map-side-combined (day, type) aggregate "
    "touches the corpus; the share filter is a days-partitioned window "
    "over the grid, and k, N and both square sums are grid aggregates "
    "pulled as driver literals (the kappa pattern).",
)
def agg_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cnts = (
        ev.select(
            F.col("ts").cast("date").alias("d"),
            F.col("event_type").alias("typ"),
        )
        .groupBy("d", "typ")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # days x types cells, read 4x
    )
    k = int(cnts.agg(F.countDistinct("typ")).first()[0] or 0)
    w_d = Window.partitionBy("d")
    obs = (
        cnts.withColumn("tot", F.sum("c").over(w_d))
        .where(F.lit(k) * F.col("c") > F.col("tot"))
        .select("d", "typ")
        .localCheckpoint(eager=True)  # presence cells, read 3x
    )
    n = int(obs.agg(F.count(F.lit(1))).first()[0] or 0)
    crow = (
        obs.groupBy("typ")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sc2"))
        .first()
    )
    rrow = (
        obs.groupBy("d")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sr2"))
        .first()
    )
    sc2 = int(crow["sc2"] or 0) if crow is not None else 0
    sr2 = int(rrow["sr2"] or 0) if rrow is not None else 0
    num = (k - 1) * (k * sc2 - n * n)
    den = k * n - sr2
    assert num >= 0, "Cauchy-Schwarz violated: presence arithmetic wrong"
    # capacity: sc2 <= N^2 so num <= k^2*N^2; N <= days*types (grid
    # cells, NOT event rows) — trivially inside DECIMAL(38,0) at any
    # calendar scale, asserted for the discipline
    assert 2 * 10**6 * max(num, 1) < 10**38
    return spark.createDataFrame(
        [(k, n)], "k_treatments long, n_present long"
    ).select(
        "k_treatments",
        "n_present",
        F.expr(
            f"CAST((2 * CAST(1000000 AS DECIMAL(38,0)) * {num}"
            f" + {max(den, 1)}) div (2 * CAST({max(den, 1)}"
            f" AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("q_micro"),
    ).where(F.lit(den > 0 and k > 1))


# --- r14: Goodman-Kruskal gamma — ordinal association without ties -------------


@register(
    "agg_goodman_kruskal_gamma",
    """
    WITH j AS (
      SELECT CAST(SUBSTR(o.o_orderpriority, 1, 1) AS INTEGER) AS gi,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS v
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    g AS (SELECT gi, v, COUNT(*) AS cnt FROM j GROUP BY 1, 2),
    ng AS (SELECT gi, SUM(cnt) AS n_g FROM g GROUP BY 1),
    vals AS (SELECT DISTINCT v FROM g),
    full_grid AS (
      SELECT i.gi, vals.v, COALESCE(g.cnt, 0) AS cnt,
             COALESCE(ng.n_g, 0) AS n_g
      FROM vals CROSS JOIN (SELECT UNNEST(range(1, 6)) AS gi) i
      LEFT JOIN g ON g.gi = i.gi AND g.v = vals.v
      LEFT JOIN ng ON ng.gi = i.gi
    ),
    cume AS (
      SELECT gi, v, cnt, n_g,
             SUM(cnt) OVER (PARTITION BY gi ORDER BY v
                            ROWS UNBOUNDED PRECEDING) - cnt AS below
      FROM full_grid
    ),
    pref AS (
      SELECT gi, v, cnt,
             SUM(below) OVER (PARTITION BY v ORDER BY gi
                              ROWS UNBOUNDED PRECEDING) - below AS wb,
             SUM(cnt) OVER (PARTITION BY v ORDER BY gi
                            ROWS UNBOUNDED PRECEDING) - cnt AS wc,
             SUM(n_g) OVER (PARTITION BY v ORDER BY gi
                            ROWS UNBOUNDED PRECEDING) - n_g AS wn
      FROM cume
    ),
    tot AS (
      SELECT SUM(CAST(cnt AS HUGEINT) * wb) AS c_pairs,
             SUM(CAST(cnt AS HUGEINT) * (wn - wb - wc)) AS d_pairs
      FROM pref
    )
    SELECT CAST(c_pairs AS BIGINT) AS c_pairs,
           CAST(d_pairs AS BIGINT) AS d_pairs,
           CAST((2 * 1000000::HUGEINT * (c_pairs - d_pairs)
                 + (c_pairs + d_pairs)
                 + 2 * (c_pairs + d_pairs) * 2000000)
                // (2 * (CAST(c_pairs AS HUGEINT) + d_pairs)) - 2000000
             AS BIGINT) AS gamma_micro
    FROM tot WHERE c_pairs + d_pairs > 0
    """,
    doc="Goodman-Kruskal gamma between order priority (ordinal 1-URGENT "
    "..5-LOW) and shipping latency: gamma = (C - D)/(C + D) over "
    "cross-group pairs, EXCLUDING ties — the ordinal-association "
    "effect size that complements agg_jonckheere_trend's test on the "
    "same surface (JT answers 'is there a monotone trend'; gamma "
    "answers 'how strong', in [-1, 1] regardless of marginals — "
    "Kendall's tau-b divides by geometric tie terms instead and needs "
    "sqrt; gamma stays pure-integer). NO pair is materialized: on the "
    "Jonckheere (group x latency) count grid, a pair with x from group "
    "a < b and value v_b is concordant iff x < v_b (per-group "
    "below-prefix) and discordant iff x > v_b (group total minus below "
    "minus equal) — C = Sum cnt_b*Sum_{a<b} below_a, D = Sum cnt_b*"
    "Sum_{a<b}(n_a - below_a - cnt_a), both exact wide integers from "
    "ONE corpus-touching aggregate + grid windows (brute-force "
    "pair-loop third impl at sf0.001). Gamma is SIGNED, so the micro "
    "division takes the standard 2e6 positivity shift — always in "
    "regime since |gamma| <= 1 by construction. Capacity asserted from "
    "footer counts (C, D <= n^2/2).",
)
def agg_goodman_kruskal_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.plans.queries import (
        _bcast_if_small,
        _table_row_count,
    )

    n_li = _table_row_count(sf_dir, "lineitem")
    # shifted numerator: 2e6*|C-D| + (C+D) + 4e6*(C+D) <= ~7e6 * n^2/2
    assert 4 * 10**6 * n_li * n_li < 10**38, (
        "gamma arithmetic needs a wider type at this scale"
    )
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(
        _bcast_if_small(
            orders.select(
                "o_orderkey",
                F.expr(
                    "CAST(SUBSTR(o_orderpriority, 1, 1) AS INT)"
                ).alias("gi"),
                "o_orderdate",
            ),
            sf_dir,
            "orders",
        ),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("gi", F.datediff("l_shipdate", "o_orderdate").alias("v"))
    g = j.groupBy("gi", "v").agg(F.count(F.lit(1)).alias("cnt"))
    g = g.localCheckpoint(eager=True)  # grid-bounded, read twice
    ng = g.groupBy("gi").agg(F.sum("cnt").alias("n_g"))
    full_grid = (
        g.select("v")
        .distinct()
        .select("v", F.explode(F.expr("sequence(1, 5)")).alias("gi"))
        .join(g, ["gi", "v"], "left")
        .join(ng, ["gi"], "left")
        .select(
            "gi",
            "v",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
            F.coalesce(F.col("n_g"), F.lit(0)).alias("n_g"),
        )
    )
    wv = Window.partitionBy("gi").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cume = full_grid.select(
        "gi",
        "v",
        "cnt",
        "n_g",
        (F.sum("cnt").over(wv) - F.col("cnt")).alias("below"),
    )
    wg = Window.partitionBy("v").orderBy("gi").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pref = cume.select(
        "gi",
        "v",
        "cnt",
        (F.sum("below").over(wg) - F.col("below")).alias("wb"),
        (F.sum("cnt").over(wg) - F.col("cnt")).alias("wc"),
        (F.sum("n_g").over(wg) - F.col("n_g")).alias("wn"),
    )
    trow = pref.agg(
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * wb")).alias("c_pairs"),
        F.sum(
            F.expr("CAST(cnt AS DECIMAL(38,0)) * (wn - wb - wc)")
        ).alias("d_pairs"),
    ).first()
    c_pairs = int(trow["c_pairs"] or 0) if trow is not None else 0
    d_pairs = int(trow["d_pairs"] or 0) if trow is not None else 0
    den = max(c_pairs + d_pairs, 1)
    return spark.createDataFrame(
        [(c_pairs, d_pairs)], "c_pairs long, d_pairs long"
    ).select(
        "c_pairs",
        "d_pairs",
        F.expr(
            f"CAST((2 * CAST(1000000 AS DECIMAL(38,0))"
            f" * ({c_pairs} - {d_pairs})"
            f" + {den}"
            f" + 2 * CAST({den} AS DECIMAL(38,0)) * 2000000)"
            f" div (2 * CAST({den} AS DECIMAL(38,0)))"
            f" - 2000000 AS BIGINT)"
        ).alias("gamma_micro"),
    ).where(F.lit(c_pairs + d_pairs > 0))


# --- r14: Holt linear smoothing — the 2-component sequential fold --------------

# DuckDB-side packing for the (level, trend) accumulator: both signed,
# offset by 2^61 and packed into one HUGEINT with a 2^62 field — the KM
# technique extended to TWO state components. Spark needs no packing:
# F.aggregate's accumulator is a named_struct. Half-up steps on SIGNED
# numerators use the standard positivity shift (hu(n,d) = (2n + d +
# 2dS) intdiv (2d) - S with S = 2^50): MEASURED on this box, DuckDB
# 1.0.0's integer `//` TRUNCATES toward zero exactly like Spark's
# `div` (SELECT (-115)::HUGEINT // 10 = -11, not -12), so an unshifted
# signed step would round-toward-zero on BOTH engines — agreeing with
# each other but computing the wrong statistic (floor(x+1/2) is the
# documented rounding). The shift makes every numerator positive, where
# truncate == floor on both engines AND matches the pure-Python floor
# third impl.
_HOLT_OFF = 1 << 61
_HOLT_F = 1 << 62
_HOLT_S = 1 << 50


@register(
    "ts_holt_linear",
    f"""
    WITH series AS (
      SELECT (epoch_us(ts) - ((epoch_us(ts) % 86400000000
                               + 86400000000) % 86400000000))
             // 86400000000 AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    days AS (
      SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM series
    ),
    arr AS (SELECT list(y ORDER BY day) AS a FROM days),
    seed AS (
      SELECT ((a[1] + {_HOLT_OFF}::HUGEINT) * {_HOLT_F}
              + (a[2] - a[1] + {_HOLT_OFF})) AS s0
      FROM arr
    ),
    curve AS (
      SELECT day, y, rn,
             list_reduce(
               list_prepend((SELECT s0 FROM seed),
                            (SELECT a FROM arr)[2:days.rn]),
               (acc, x) ->
                 ((2 * (x + 4 * (acc // {_HOLT_F} - {_HOLT_OFF}
                                 + acc % {_HOLT_F} - {_HOLT_OFF}))
                   + 5 + {10 * _HOLT_S})
                  // 10 - {_HOLT_S} + {_HOLT_OFF}::HUGEINT)
                 * {_HOLT_F}
                 + ((2 * ((2 * (x + 4 * (acc // {_HOLT_F} - {_HOLT_OFF}
                                         + acc % {_HOLT_F}
                                         - {_HOLT_OFF}))
                           + 5 + {10 * _HOLT_S}) // 10 - {_HOLT_S}
                          - (acc // {_HOLT_F} - {_HOLT_OFF})
                          + 9 * (acc % {_HOLT_F} - {_HOLT_OFF}))
                     + 10 + {20 * _HOLT_S})
                    // 20 - {_HOLT_S} + {_HOLT_OFF})
             ) AS st
      FROM days
    )
    SELECT CAST(day AS BIGINT) AS t_day,
           CAST(y AS BIGINT) AS y_cents,
           CAST(st // {_HOLT_F} - {_HOLT_OFF} AS BIGINT)
             AS level_cents,
           CAST(st % {_HOLT_F} - {_HOLT_OFF} AS BIGINT)
             AS trend_cents
    FROM curve
    WHERE (SELECT COUNT(*) FROM days) >= 2
    ORDER BY t_day
    """,
    doc="Holt's linear (double-exponential) smoothing of the daily "
    "revenue series with alpha = 1/5, beta = 1/10 — the INFINITE-memory "
    "trend smoother (window_ewma_smoothing is the truncated-window "
    "approximation; this is the true recurrence): l_t = "
    "round((y_t + 4*(l+b))/5), b_t = round((l_t - l + 9*b)/10), seeded "
    "l_1 = y_1, b_1 = y_2 - y_1, rounding floor(x + 1/2) per step. A "
    "sequential TWO-component recurrence, run as the KM-style "
    "cross-engine fold: Spark F.aggregate with a named_struct "
    "accumulator (no packing; the l' formula is inlined twice in the "
    "lambda because HOF lambdas have no let-binding); DuckDB "
    "list_reduce with the accumulator packed into one HUGEINT (2^62 "
    "field, 2^61 offset — both components SIGNED, the extension past "
    "KM's positive-only state) and the seed prepended. The state is "
    "signed, and integer division TRUNCATES toward zero on BOTH "
    "engines (measured: DuckDB 1.0.0 (-115)::HUGEINT // 10 = -11 — "
    "its integer `//` is NOT floor), so every half-up step takes the "
    "standard positivity shift (+2dS before the divide, -S after, "
    "S = 2^50) — the spearman_bp discipline applied INSIDE a fold "
    "lambda for the first time. Capacity: |level|, |trend| < 2^50 "
    "cents asserted via the max |daily total| < 2^40 driver check "
    "(exponential smoothing of a bounded series is bounded). Pinned "
    "against the hand recurrence on perfect-trend and falling series "
    "(where unshifted truncation diverges from the documented floor "
    "half-up). Scale shape: ONE map-side-combined per-day aggregate "
    "touches the corpus; the O(D^2) per-day folds run on the "
    "span-days frame (calendar-bounded — the KM argument).",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = (
        "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
        " div 86400000000"
    )
    series = (
        ev.select(
            F.expr(day).alias("day"),
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("y"))
        .localCheckpoint(eager=True)  # span-days-bounded, read twice
    )
    row = series.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.abs(F.col("y"))).alias("m"),
    ).first()
    n_days = int(row["n"] or 0) if row is not None else 0
    max_y = int(row["m"] or 0) if row is not None else 0
    if n_days < 2:
        return spark.createDataFrame(
            [],
            "t_day long, y_cents long, level_cents long, trend_cents long",
        )
    # positivity-shift regime: |level|, |trend| stay within a small
    # multiple of max |y| (exponential smoothing is a stable filter),
    # so bounding the series bounds the state far below S = 2^50
    assert max_y < (1 << 40), (
        "holt arithmetic needs a wider shift at this magnitude"
    )
    # l' inlined twice (Spark HOF lambdas have no let-binding); signed
    # half-up via the positivity shift: (2n + d + 2dS) div (2d) - S
    lp = (
        f"((2 * (x.y + 4 * (acc.l + acc.b)) + 5 + {10 * _HOLT_S}L)"
        f" div 10 - {_HOLT_S}L)"
    )
    fold = (
        f"aggregate("
        f" slice(s, 2, pos),"
        f" named_struct('l', s[0].y, 'b', s[1].y - s[0].y),"
        f" (acc, x) -> named_struct("
        f"   'l', {lp},"
        f"   'b', (2 * ({lp} - acc.l + 9 * acc.b) + 10"
        f"         + {20 * _HOLT_S}L) div 20 - {_HOLT_S}L))"
    )
    arr = series.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("day").alias("d"), "y"))
        ).alias("s")
    )
    # materialize the fold ONCE per row, then read both fields in a
    # following select — CollapseProject spares multiply-referenced
    # aliases, so `fold.l` + `fold.b` inline would run the whole O(pos)
    # fold twice per row (the r14 code review catch; same CLAUDE.md
    # rule as the shingle/token projections)
    return (
        arr.select(F.posexplode("s").alias("pos", "el"), "s")
        .select("el", F.expr(fold).alias("st"))
        .select(
            F.col("el.d").cast("long").alias("t_day"),
            F.col("el.y").cast("long").alias("y_cents"),
            F.col("st.l").cast("long").alias("level_cents"),
            F.col("st.b").cast("long").alias("trend_cents"),
        )
        .orderBy("t_day")
    )


# --- r14: mean-excess curve — the EVT tail diagnostic --------------------------


@register(
    "events_mean_excess_curve",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    hist AS (SELECT y AS u, COUNT(*) AS c FROM daily GROUP BY 1),
    cum AS (
      SELECT u,
             SUM(c) OVER ()
               - SUM(c) OVER (ORDER BY u ROWS UNBOUNDED PRECEDING)
               AS n_gt,
             SUM(CAST(u AS HUGEINT) * c) OVER ()
               - SUM(CAST(u AS HUGEINT) * c)
                   OVER (ORDER BY u ROWS UNBOUNDED PRECEDING)
               AS s_gt
      FROM hist
    )
    SELECT CAST(u AS BIGINT) AS threshold_cents,
           CAST(n_gt AS BIGINT) AS n_exceed,
           CAST((2 * 1000000::HUGEINT * (s_gt - CAST(u AS HUGEINT) * n_gt)
                 + n_gt)
                // (2 * CAST(n_gt AS HUGEINT)) AS BIGINT)
             AS mean_excess_micro
    FROM cum WHERE n_gt > 0 ORDER BY threshold_cents
    """,
    doc="Mean-excess (mean residual life) curve of daily revenue — the "
    "standard extreme-value-theory tail diagnostic: e(u) = E[Y - u | "
    "Y > u] for every realized threshold u; a linear-in-u mean excess "
    "is the GPD-tail signature (rising slope = heavy tail, flat = "
    "exponential, falling = short tail), which is how a pipeline "
    "decides whether peak-load provisioning can extrapolate from "
    "observed days. NO per-threshold subset is ever built (the "
    "rich-club technique on a value axis): the daily-total histogram "
    "gives suffix counts n_>u and suffix sums S_>u by two windows over "
    "the distinct-value frame, and e(u) = (S_>u - u*n_>u)/n_>u exact "
    "half-up micro-cents. Scale shape: ONE map-side-combined per-day "
    "aggregate touches the corpus; the histogram and suffix windows "
    "run on the distinct-daily-total frame (span-days-bounded).",
)
def events_mean_excess_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.col("ts").cast("date").alias("d"),
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").alias("y"))
    )
    hist = daily.groupBy(F.col("y").alias("u")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_le = Window.orderBy("u").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    su = F.expr("CAST(u AS DECIMAL(38,0)) * c")
    cum = hist.select(
        "u",
        (F.sum("c").over(w_all) - F.sum("c").over(w_le)).alias("n_gt"),
        (F.sum(su).over(w_all) - F.sum(su).over(w_le)).alias("s_gt"),
    )
    return (
        cum.where(F.col("n_gt") > 0)
        .select(
            F.col("u").cast("long").alias("threshold_cents"),
            F.col("n_gt").cast("long").alias("n_exceed"),
            F.expr(
                "CAST((2 * CAST(1000000 AS DECIMAL(38,0))"
                " * (s_gt - CAST(u AS DECIMAL(38,0)) * n_gt) + n_gt)"
                " div (2 * CAST(n_gt AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("mean_excess_micro"),
        )
        .orderBy("threshold_cents")
    )


# --- r14: mean cumulative function — recurrent-event rate with staggered entry -


@register(
    "events_recurrent_mcf",
    """
    WITH u AS (
      SELECT user_id,
             MIN((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS fd,
             MAX((epoch_us(ts) - ((epoch_us(ts) % 86400000000
                                   + 86400000000) % 86400000000))
                 // 86400000000) AS ld
      FROM events GROUP BY 1
    ),
    deltas AS (
      SELECT fd AS day, 1 AS delta FROM u
      UNION ALL
      SELECT ld + 1, -1 FROM u
    ),
    purch AS (
      SELECT (epoch_us(ts) - ((epoch_us(ts) % 86400000000
                               + 86400000000) % 86400000000))
             // 86400000000 AS day,
             COUNT(*) AS d
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    axis AS (
      SELECT day, SUM(delta) AS delta, CAST(0 AS BIGINT) AS d FROM deltas
      GROUP BY 1
      UNION ALL
      SELECT day, 0, d FROM purch
    ),
    merged AS (
      SELECT day, SUM(delta) AS delta, SUM(d) AS d
      FROM axis GROUP BY 1
    ),
    risk AS (
      SELECT day, d,
             SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS n_risk
      FROM merged
    ),
    steps AS (
      SELECT day, d, n_risk,
             (2 * 1000000 * d + n_risk) // (2 * n_risk) AS h_micro
      FROM risk WHERE d > 0
    )
    SELECT CAST(day AS BIGINT) AS t_day,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(h_micro AS BIGINT) AS rate_micro,
           CAST(SUM(h_micro) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS mcf_micro
    FROM steps ORDER BY t_day
    """,
    doc="Mean cumulative function (Nelson-Aalen for RECURRENT events) of "
    "purchases per user-at-risk by calendar day, with STAGGERED "
    "entry/exit: users enter the risk set at their first observed day "
    "and leave after their last, so the denominator n(s) is the count "
    "of users whose observation window covers day s — the estimand "
    "naive purchases-per-user-per-day gets wrong when the panel is "
    "unbalanced (late joiners would dilute early rates). MCF(t) = "
    "Sum_{s<=t} d(s)/n(s) over purchase days, each step an exact "
    "half-up MICRO integer cumulated by a plain window (the "
    "Nelson-Aalen discipline — both engines sum identical integers, "
    "parity exact by construction; all quantities non-negative, no "
    "shift needed). The risk set is NEVER materialized per day: "
    "entry/exit become a DIFFERENCE ARRAY (+1 at first day, -1 after "
    "last) and n(s) is its prefix sum over the merged day axis — the "
    "classic sweep, new to the suite (KM/log-rank risk sets are "
    "duration-indexed suffix sums; this one is calendar-indexed with "
    "both ends staggered). Completes the survival family for repeated "
    "events: single-event (KM/NA/log-rank/RMST), recurrent (MCF). "
    "Scale shape: ONE per-user aggregate + ONE filtered per-day "
    "aggregate touch the corpus; the difference array, merge and "
    "windows all run on span-days-bounded frames.",
)
def events_recurrent_mcf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = (
        "(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
        " div 86400000000"
    )
    u = (
        ev.select("user_id", F.expr(day).alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("fd"), F.max("day").alias("ld"))
    )
    deltas = u.select(
        F.col("fd").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        u.select((F.col("ld") + 1).alias("day"), F.lit(-1).alias("delta"))
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.expr(day).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    axis = (
        deltas.groupBy("day")
        .agg(F.sum("delta").alias("delta"))
        .select("day", "delta", F.lit(0).cast("long").alias("d"))
        .unionByName(
            purch.select(
                "day", F.lit(0).alias("delta"), F.col("d").cast("long")
            )
        )
    )
    merged = axis.groupBy("day").agg(
        F.sum("delta").alias("delta"), F.sum("d").alias("d")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    risk = merged.select(
        "day", "d", F.sum("delta").over(w).alias("n_risk")
    )
    steps = risk.where(F.col("d") > 0).select(
        "day",
        "d",
        "n_risk",
        F.expr("(2 * 1000000 * d + n_risk) div (2 * n_risk)").alias(
            "h_micro"
        ),
    )
    wm = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return steps.select(
        F.col("day").cast("long").alias("t_day"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("h_micro").cast("long").alias("rate_micro"),
        F.sum("h_micro").over(wm).cast("long").alias("mcf_micro"),
    ).orderBy("t_day")


# --- r14: Ansari-Bradley scale test — latency dispersion urgent vs low ---------


@register(
    "agg_ansari_bradley",
    """
    WITH j AS (
      SELECT CAST(SUBSTR(o.o_orderpriority, 1, 1) AS INTEGER) AS gi,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS v
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE SUBSTR(o.o_orderpriority, 1, 1) IN ('1', '5')
    ),
    g AS (
      SELECT v,
             SUM(CASE WHEN gi = 1 THEN 1 ELSE 0 END) AS c1,
             COUNT(*) AS c
      FROM j GROUP BY 1
    ),
    tot AS (SELECT SUM(c1) AS na, SUM(c) AS n FROM g),
    grid AS (
      SELECT v, c1, c,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
               AS below
      FROM g
    ),
    scores AS (
      SELECT c1, c,
             -- 2S = DOUBLED sum of AB scores min(r, N+1-r) over the tie
             -- range [below+1, below+c], split at h = (N+1) div 2:
             -- ascending triangle up to h, descending after — two
             -- arithmetic series kept UNDIVIDED (the /2 would need the
             -- consecutive-int-evenness argument per piece; doubled
             -- units sidestep it, the Mann-Whitney discipline)
             (CASE WHEN LEAST(below + c, (n + 1) // 2) >= below + 1
                   THEN (below + 1 + LEAST(below + c, (n + 1) // 2))
                        * (LEAST(below + c, (n + 1) // 2) - below)
                   ELSE 0 END
              + CASE WHEN below + c >= GREATEST(below + 1, (n + 1) // 2 + 1)
                     THEN ((n + 1 - (below + c))
                           + (n + 1 - GREATEST(below + 1,
                                               (n + 1) // 2 + 1)))
                          * (below + c
                             - GREATEST(below + 1, (n + 1) // 2 + 1) + 1)
                     ELSE 0 END) AS s2
      FROM grid CROSS JOIN tot
    ),
    stat AS (
      -- per-value half-up micro of the value's contribution to the
      -- group-1 MEAN score: c1*S/(c*na) with S = s2/2
      SELECT SUM((1000000::HUGEINT * c1 * s2 + c * na)
                 // (2 * CAST(c AS HUGEINT) * na)) AS m1
      FROM scores CROSS JOIN tot
    ),
    tt AS (
      SELECT ((n + 1) // 2) * ((n + 1) // 2 + 1)
             + CASE WHEN n >= (n + 1) // 2 + 1
                    THEN ((n + 1 - n) + (n + 1 - ((n + 1) // 2 + 1)))
                         * (n - (n + 1) // 2)
                    ELSE 0 END AS t2
      FROM tot
    )
    SELECT CAST(na AS BIGINT) AS n_group1,
           CAST(n - na AS BIGINT) AS n_group5,
           CAST(m1 AS BIGINT) AS mean1_micro,
           CAST((1000000::HUGEINT * t2 + n)
                // (2 * CAST(n AS HUGEINT)) AS BIGINT) AS emean_micro,
           CAST(m1 - (1000000::HUGEINT * t2 + n)
                // (2 * CAST(n AS HUGEINT)) AS BIGINT)
             AS mean1_minus_e_micro
    FROM stat CROSS JOIN tot CROSS JOIN tt
    WHERE na > 0 AND n > na
    """,
    doc="Ansari-Bradley two-sample SCALE test: are 1-URGENT shipping "
    "latencies more DISPERSED than 5-LOW ones? Pooled ranks score "
    "a(r) = min(r, N+1-r) — extremes score low, the middle high — so a "
    "group-1 MEAN score below the null expectation T/N means group 1 "
    "occupies the tails (larger spread). Closes the dispersion gap in "
    "the nonparametric family (Mann-Whitney tests location; AB is its "
    "scale companion on the same rank machinery). Reported as MEAN "
    "scores (mean1, E[mean] = T/N, difference), not raw sums: the sum "
    "statistic grows O(N^2) in micro-units and would overflow the "
    "BIGINT output column near N ~ 4e6 — the mean stays O(N) and the "
    "int64 output holds to ~1.8e13 rows (the r14 code review's "
    "capacity-vs-output-type catch). Tied values share the AVERAGE "
    "score over their rank range, computed in CLOSED FORM from the "
    "value grid: the range [below+1, below+c] splits at h = (N+1) div "
    "2 into two arithmetic series kept in DOUBLED units (2S — no "
    "intermediate halving), and each value contributes the half-up "
    "MICRO of c1*S/(c*na) (documented per-value rounding, the "
    "Nelson-Aalen discipline; all terms non-negative). Spark-side "
    "series arithmetic runs in DECIMAL(38,0) — the O(N^2) doubled "
    "series product exceeds int64 past ~3e9 rows while per-value "
    "quotients stay long-safe. Capacity: 1e6*c1*2S <= 2e6*N^3, "
    "asserted from footer counts. Scale shape: ONE corpus-touching "
    "(value) grid combine; score arithmetic and the sums run on the "
    "distinct-latency frame (days-bounded).",
)
def agg_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.plans.queries import (
        _bcast_if_small,
        _table_row_count,
    )

    n_li = _table_row_count(sf_dir, "lineitem")
    # per-value contribution numerator 1e6*c1*2S + c*na <= ~2e6 * N^3
    assert 2 * 10**6 * n_li**3 < 10**38, (
        "ansari-bradley arithmetic needs a wider type at this scale"
    )
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(
        _bcast_if_small(
            orders.select(
                "o_orderkey",
                F.expr(
                    "CAST(SUBSTR(o_orderpriority, 1, 1) AS INT)"
                ).alias("gi"),
                "o_orderdate",
            ).where(F.expr("SUBSTR(o_orderpriority, 1, 1) IN ('1', '5')")),
            sf_dir,
            "orders",
        ),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("gi", F.datediff("l_shipdate", "o_orderdate").alias("v"))
    g = (
        j.groupBy("v")
        .agg(
            F.sum(F.when(F.col("gi") == 1, 1).otherwise(0)).alias("c1"),
            F.count(F.lit(1)).alias("c"),
        )
        .localCheckpoint(eager=True)  # distinct-latency grid, read twice
    )
    trow = g.agg(F.sum("c1").alias("na"), F.sum("c").alias("n")).first()
    na = int(trow["na"] or 0) if trow is not None else 0
    n = int(trow["n"] or 0) if trow is not None else 0
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    grid = g.select(
        "c1", "c", (F.sum("c").over(w) - F.col("c")).alias("below")
    )
    h = (n + 1) // 2
    # DOUBLED series sum 2S in DECIMAL(38,0): the O(N^2) products
    # overflow int64 past ~3e9 rows under ANSI (the review catch); no
    # intermediate halving, so no evenness argument needed
    s2_expr = (
        f"(CASE WHEN LEAST(below + c, {h}L) >= below + 1"
        f" THEN CAST(below + 1 + LEAST(below + c, {h}L)"
        f"      AS DECIMAL(38,0))"
        f"      * (LEAST(below + c, {h}L) - below)"
        f" ELSE CAST(0 AS DECIMAL(38,0)) END"
        f" + CASE WHEN below + c >= GREATEST(below + 1, {h + 1}L)"
        f" THEN CAST(({n + 1}L - (below + c))"
        f"       + ({n + 1}L - GREATEST(below + 1, {h + 1}L))"
        f"      AS DECIMAL(38,0))"
        f"      * (below + c - GREATEST(below + 1, {h + 1}L) + 1)"
        f" ELSE CAST(0 AS DECIMAL(38,0)) END)"
    )
    srow = grid.agg(
        F.sum(
            F.expr(
                f"(CAST(1000000 AS DECIMAL(38,0)) * c1 * {s2_expr}"
                f" + c * CAST({max(na, 1)} AS DECIMAL(38,0)))"
                f" div (2 * CAST(c AS DECIMAL(38,0)) * {max(na, 1)})"
            )
        ).alias("m1")
    ).first()
    m1 = int(srow["m1"] or 0) if srow is not None else 0
    # doubled total score 2T over [1, N]: ascending to h, descending
    t2 = h * (h + 1)
    if n >= h + 1:
        t2 += ((n + 1 - n) + (n + 1 - (h + 1))) * (n - h)
    emean = (10**6 * t2 + n) // (2 * n) if n else 0
    return spark.createDataFrame(
        [(na, n - na, m1, emean, m1 - emean)],
        "n_group1 long, n_group5 long, mean1_micro long, emean_micro"
        " long, mean1_minus_e_micro long",
    ).where(F.lit(na > 0 and n > na))
