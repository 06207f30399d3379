"""Round-10 operators: graph ranking (personalized PageRank, Adamic-Adar),
behavioral/text information measures, robust & distribution aggregates,
drift audits, and similarity range search.

Registered between llm_pipeline and engine_queries so every entry sits
inside the driver's first-50 correctness window this round (certified
r8/r9 entries displaced by these insertions are hash-held by the ledger).
Same contracts as every plans module: idiomatic-DataFrame plan + DuckDB
oracle with identical aliases, identical rounding, no HUGEINT/DECIMAL
oracle outputs, and the integer-division positivity discipline from
CLAUDE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_stream_consumer_spark.operators import similarity as S
from kinesis_stream_consumer_spark.operators import text as T
from kinesis_stream_consumer_spark.plans.queries import (
    _bcast_if_small,
    _t,
    register,
)
from kinesis_stream_consumer_spark.plans.graph_shared import (
    _COEDGES_SQL,
    _co_edges,
)

# --- graph ranking ----------------------------------------------------------

_PPR_BRAND = "Brand#4"
_PPR_ROUNDS = 3
_PPR_TOP = 30


def _ppr_round_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
    p{i} AS (
      SELECT b.d AS node, (17 * SUM(p.pr // g.dg)) // 20 AS prop
      FROM bidir b
      JOIN {prev} p ON p.node = b.s
      JOIN deg g ON g.s = b.s
      GROUP BY 1
    ),
    r{i} AS (
      SELECT COALESCE(t.node, p.node) AS node,
             COALESCE(t.tel, 0) + COALESCE(p.prop, 0) AS pr
      FROM tel t FULL JOIN p{i} p ON p.node = t.node
    )"""


@register(
    "graph_personalized_pagerank",
    f"""
    WITH {_COEDGES_SQL},
    bidir AS (
      SELECT u AS s, v AS d FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    deg AS (SELECT s, COUNT(*) AS dg FROM bidir GROUP BY s),
    seeds AS (
      SELECT DISTINCT p_partkey AS node FROM part
      WHERE p_brand = '{_PPR_BRAND}'
    ),
    tel AS (SELECT node, CAST(150000 AS BIGINT) AS tel FROM seeds),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM seeds),
    {",".join(_ppr_round_sql(i).lstrip() for i in range(1, _PPR_ROUNDS + 1))}
    SELECT node AS part_id, CAST(pr AS BIGINT) AS ppr_micro, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS rnk
      FROM r{_PPR_ROUNDS}
    ) WHERE rnk <= {_PPR_TOP}
    ORDER BY rnk
    """,
    doc="Personalized PageRank over the co-purchase graph with a teleport "
    f"vector on one brand's parts ({_PPR_BRAND}) — 'rank the catalog by "
    "proximity to THIS product line', the recommender/expansion query "
    f"plain PageRank can't answer. {_PPR_ROUNDS} unrolled power "
    "iterations in exact integer micro-units (teleport 150000 per seed "
    "per round, damping 0.85 as (17·x) div 20, per-edge mass pr div deg "
    "— all masses non-negative so truncating and flooring division "
    "agree), so the DuckDB unrolled-CTE oracle matches bit-for-bit. "
    "Scale shape: per round one vertex-keyed equi-join of the CURRENT "
    "mass frontier (bounded by the seed set's i-hop neighbourhood, "
    "never the whole graph) with the shared checkpointed edge frame + "
    "one destination-keyed aggregate with map-side combine + a full "
    "outer join against the #seeds-bounded teleport frame; per-round "
    "checkpoints keep lineage flat (gate-asserted vertex-bounded round "
    "shuffles in test_shuffle_volume); global top-30 plans as "
    "TakeOrderedAndProject.",
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = _co_edges(spark, sf_dir)  # session-cached checkpoint
    seeds = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == _PPR_BRAND)
        .select(F.col("p_partkey").alias("node"))
        .distinct()
    )
    pr = personalized_pagerank(edges, seeds, rounds=_PPR_ROUNDS)
    top = pr.orderBy(F.col("pr").desc(), "node").limit(_PPR_TOP)
    w = Window.orderBy(F.col("pr").desc(), "node")
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(
            F.col("node").alias("part_id"),
            F.col("pr").alias("ppr_micro"),
            "rnk",
        )
        .orderBy("rnk")
    )


_AA_CAP = 32
_AA_TOP = 20


@register(
    "graph_adamic_adar",
    f"""
    WITH {_COEDGES_SQL},
    bidir AS (
      SELECT u AS s, v AS d FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    degs AS (SELECT s, COUNT(*) AS dg FROM bidir GROUP BY s),
    adj AS (
      SELECT s, d FROM (
        SELECT s, d, ROW_NUMBER() OVER (PARTITION BY s ORDER BY d) AS rn
        FROM bidir) WHERE rn <= {_AA_CAP}
    ),
    wadj AS (
      SELECT a.s, a.d,
             CASE WHEN g.dg >= 2
                  THEN CAST(FLOOR(1000000.0 / LN(g.dg) + 0.5) AS BIGINT)
                  ELSE 0 END AS w_micro
      FROM adj a JOIN degs g ON g.s = a.s
    ),
    wedges AS (
      SELECT e1.d AS a, e2.d AS b, e1.w_micro
      FROM wadj e1 JOIN adj e2 ON e1.s = e2.s AND e1.d < e2.d
    ),
    aa AS (
      SELECT a, b, COUNT(*) AS n_common, SUM(w_micro) AS aa_micro
      FROM wedges GROUP BY 1, 2
    ),
    nonadj AS (
      SELECT aa.a, aa.b, aa.n_common, aa.aa_micro FROM aa
      LEFT JOIN edges x ON x.u = aa.a AND x.v = aa.b
      WHERE x.u IS NULL
    )
    SELECT a, b, CAST(n_common AS BIGINT) AS n_common,
           CAST(aa_micro AS BIGINT) AS aa_micro, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY aa_micro DESC, a, b) AS rnk
      FROM nonadj
    ) WHERE rnk <= {_AA_TOP}
    ORDER BY rnk
    """,
    doc="Adamic-Adar link prediction on the co-purchase graph: top-20 "
    "non-adjacent pairs by Σ 1/ln(deg(w)) over common neighbours w — "
    "the degree-discounted upgrade of the raw common-neighbour count "
    "(a shared rare part says more than a shared bestseller). Per-apex "
    "weight floor(1e6/ln(deg)+0.5) is ONE deterministic IEEE op chain; "
    "pair scores are INTEGER sums of those micro-units, so the ranking "
    "never depends on float summation order. Same degree-capped wedge "
    f"bound as graph_link_prediction (first {_AA_CAP} neighbours per "
    "apex, rank filter plans as WindowGroupLimit, wedge volume under "
    "Σ C(min(d,cap),2) whatever the hub skew — gate-asserted); true "
    "(uncapped) degrees feed the weight; candidates anti-join the edge "
    "table; global top-20 plans as TakeOrderedAndProject.",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.graph import (
        adamic_adar_pairs,
    )

    edges = _co_edges(spark, sf_dir)  # session-cached checkpoint
    aa = adamic_adar_pairs(edges, cap=_AA_CAP)
    top = aa.orderBy(F.col("aa_micro").desc(), "a", "b").limit(_AA_TOP)
    w = Window.orderBy(F.col("aa_micro").desc(), "a", "b")
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("a", "b", "n_common", "aa_micro", "rnk")
        .orderBy("rnk")
    )


# --- behavioral / text information measures ---------------------------------


@register(
    "events_transition_entropy",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    tr AS (
      SELECT user_id, prev_type, event_type, COUNT(*) AS c
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2, 3
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_transitions,
           CAST(COUNT(*) AS BIGINT) AS n_patterns,
           ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 4) AS entropy_nats
    FROM tr GROUP BY user_id ORDER BY user_id
    """,
    doc="Per-user behavioral entropy over (prev_event_type → event_type) "
    "transition counts — the predictability signal on top of the "
    "corpus-level Markov matrix (events_markov_transitions): near-zero "
    "entropy = scripted/bot-like sessions, high entropy = erratic "
    "exploration; the per-entity feature a fraud or engagement model "
    "consumes. The lag is a per-user window with deterministic ordering "
    "(ts, event_id); entropy uses the same counts identity "
    "H = ln n − Σ c·ln c / n and LN + ROUND(·,4) discipline as the "
    "token-entropy query. One user-keyed window shuffle, one counting "
    "aggregate with map-side combine, one per-user rollup — shuffles "
    "carry type pairs and counts, never payloads.",
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    tr = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("user_id", "prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        tr.groupBy("user_id")
        .agg(
            F.sum("c").cast("long").alias("n_transitions"),
            F.count(F.lit(1)).cast("long").alias("n_patterns"),
            F.round(
                F.log(F.sum("c"))
                - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                4,
            ).alias("entropy_nats"),
        )
        .orderBy("user_id")
    )


@register(
    "text_char_entropy",
    """
    WITH ch AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]')) AS c
      FROM documents
    ),
    cf AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_letters,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_letters,
           ROUND(LN(SUM(n)) - SUM(n * LN(n)) / SUM(n), 4) AS entropy_nats
    FROM cf GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Per-document CHARACTER-level entropy over letter frequencies — "
    "the junk detector token entropy misses: base64 blobs, key-mash and "
    "ciphertext have near-uniform (maximal) letter entropy while natural "
    "language sits near its language's signature (~2.9 nats for "
    "English); repeated-character spam sits near zero. Alphabet is "
    "bounded (26), so the counting shuffle carries at most 26 rows per "
    "doc; same counts identity and LN + ROUND(·,4) discipline as the "
    "token/transition entropies.",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]"), 0)
        ).alias("c"),
    )
    cf = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    return (
        cf.groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_letters"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_letters"),
            F.round(
                F.log(F.sum("n"))
                - F.sum(F.col("n") * F.log("n")) / F.sum("n"),
                4,
            ).alias("entropy_nats"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_jsd_source_divergence",
    """
    WITH t AS (
      SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT source, term, COUNT(*) AS c FROM t GROUP BY 1, 2),
    st AS (SELECT source, SUM(c) AS ns FROM tf GROUP BY source),
    ct AS (SELECT term, SUM(c) AS cc FROM tf GROUP BY term),
    tot AS (SELECT SUM(c) AS nt FROM tf),
    terms AS (
      SELECT tf.source,
             CAST(tf.c AS DOUBLE) / st.ns AS p,
             CAST(ct.cc AS DOUBLE) / tot.nt AS q
      FROM tf
      JOIN st USING (source)
      JOIN ct USING (term)
      CROSS JOIN tot
    ),
    s AS (
      SELECT source,
             SUM(p * LN(2.0 * p / (p + q))) AS kp,
             SUM(q * LN(2.0 * q / (p + q))) AS kq,
             SUM(q) AS qs
      FROM terms GROUP BY source
    )
    SELECT s.source,
           CAST(st.ns AS BIGINT) AS n_tokens,
           ROUND(0.5 * (kp + kq + (1.0 - qs) * LN(2.0)), 4) AS jsd_nats
    FROM s JOIN st USING (source)
    ORDER BY source
    """,
    doc="Jensen-Shannon divergence of each source's unigram distribution "
    "from the corpus distribution — the mixture-health audit a data-"
    "composition pipeline tracks (JSD is symmetric and bounded by ln 2, "
    "unlike KL): a source drifting toward ln 2 contributes vocabulary "
    "the rest of the corpus never uses. Closed form over the SOURCE'S "
    "OWN support only: terms the source lacks contribute exactly "
    "(1 − Σ_{t∈S} q_t)·ln 2 to the q-side sum, so the scored frame is "
    "per-source vocabularies, never vocab × sources. Corpus counts "
    "reduce from the same (source, term) frame (tokenize once); "
    "shuffles carry term counts, never text; same LN + ROUND(·,4) "
    "discipline as the entropy family.",
)
def text_jsd_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    tf = t.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    tf = tf.localCheckpoint(eager=True)  # read 3x: st, ct, terms
    stot = tf.groupBy("source").agg(F.sum("c").alias("ns"))
    ct = tf.groupBy("term").agg(F.sum("c").alias("cc"))
    nt = int(stot.agg(F.sum("ns")).first()[0])
    terms = (
        tf.join(ct, "term")
        .join(F.broadcast(stot), "source")
        .select(
            "source",
            (F.col("c").cast("double") / F.col("ns")).alias("p"),
            (F.col("cc").cast("double") / F.lit(nt)).alias("q"),
        )
    )
    s = terms.groupBy("source").agg(
        F.sum(
            F.col("p") * F.log(F.lit(2.0) * F.col("p") / (F.col("p") + F.col("q")))
        ).alias("kp"),
        F.sum(
            F.col("q") * F.log(F.lit(2.0) * F.col("q") / (F.col("p") + F.col("q")))
        ).alias("kq"),
        F.sum("q").alias("qs"),
    )
    return (
        s.join(F.broadcast(stot), "source")
        .select(
            "source",
            F.col("ns").cast("long").alias("n_tokens"),
            F.round(
                F.lit(0.5)
                * (
                    F.col("kp")
                    + F.col("kq")
                    + (F.lit(1.0) - F.col("qs")) * F.log(F.lit(2.0))
                ),
                4,
            ).alias("jsd_nats"),
        )
        .orderBy("source")
    )


@register(
    "curation_source_dup_rate",
    """
    WITH h AS (SELECT doc_id, source, md5(text) AS th FROM documents),
    hc AS (SELECT th, COUNT(*) AS n FROM h GROUP BY th)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN hc.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST((20000 * SUM(CASE WHEN hc.n > 1 THEN 1 ELSE 0 END)
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS dup_bp
    FROM h JOIN hc USING (th)
    GROUP BY source ORDER BY source
    """,
    doc="Per-source exact-duplicate rate: share of a source's documents "
    "whose md5(text) occurs more than once ANYWHERE in the corpus, in "
    "basis points — the triage table that tells you WHICH feed to "
    "deduplicate (or drop) before paying for near-dup passes; a mirror "
    "feed shows up as dup_bp ≈ 10000 here long before MinHash runs. One "
    "hash projection (map-side), one hash-keyed counting aggregate, one "
    "count-carrying join back — shuffles carry 32-byte hashes and "
    "counts, never text; integer-exact half-up shares.",
)
def curation_source_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    h = docs.select("doc_id", "source", F.md5(F.col("text")).alias("th"))
    hc = h.groupBy("th").agg(F.count(F.lit(1)).alias("n"))
    j = h.join(hc, "th").select(
        "source", F.when(F.col("n") > 1, 1).otherwise(0).alias("dup")
    )
    g = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("dup").alias("sd")
    )
    return g.select(
        "source",
        F.col("nd").cast("long").alias("n_docs"),
        F.col("sd").cast("long").alias("n_dup_docs"),
        F.expr("(20000 * sd + nd) div (2 * nd)").cast("long").alias("dup_bp"),
    ).orderBy("source")


# --- robust / distribution aggregates ---------------------------------------


@register(
    "agg_skewness_kurtosis",
    """
    WITH rev AS (
      SELECT n.n_name AS nation,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    m AS (
      SELECT nation, COUNT(*) AS n,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mu
      FROM rev GROUP BY nation
    ),
    d AS (
      SELECT r.nation, m.n,
             (CAST(r.cents AS DOUBLE) - m.mu) AS dv
      FROM rev r JOIN m USING (nation)
    ),
    s AS (
      SELECT nation, n,
             SUM(dv * dv) / n AS m2,
             SUM(dv * dv * dv) / n AS m3,
             SUM(dv * dv * dv * dv) / n AS m4
      FROM d GROUP BY nation, n
    )
    SELECT nation,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(m3 / POWER(m2, 1.5), 4) AS skewness,
           ROUND(m4 / (m2 * m2) - 3.0, 4) AS excess_kurtosis
    FROM s ORDER BY nation
    """,
    doc="Exact skewness and excess kurtosis of per-nation order totals — "
    "the distribution-shape audit (heavy right tail? peaked?) behind "
    "outlier policy and mixture decisions. TWO-PASS central moments: "
    "pass 1 reduces each nation to (n, mean); pass 2 re-scans with the "
    "#nations-bounded mean frame broadcast and sums centered powers — "
    "the numerically stable formulation (raw-moment algebra cancels "
    "catastrophically at these magnitudes, and BIGINT fourth powers "
    "would overflow / widen to the banned HUGEINT). Per-row deviations "
    "are identical IEEE doubles on both engines; the 4-dp rounding "
    "absorbs summation-order noise (the zipf-slope discipline). "
    "Shuffles carry nation-keyed partial sums only.",
)
def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.select("o_custkey", (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))).cast("long").alias("cents"))
        .join(_bcast_if_small(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "cents")
    )
    natm = rev.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    d = rev.join(F.broadcast(natm), "nation").select(
        "nation", "n", (F.col("cents").cast("double") - F.col("mu")).alias("dv")
    )
    s = d.groupBy("nation", "n").agg(
        (F.sum(F.col("dv") * F.col("dv")) / F.col("n")).alias("m2"),
        (F.sum(F.col("dv") * F.col("dv") * F.col("dv")) / F.col("n")).alias("m3"),
        (
            F.sum(F.col("dv") * F.col("dv") * F.col("dv") * F.col("dv"))
            / F.col("n")
        ).alias("m4"),
    )
    return s.select(
        "nation",
        F.col("n").cast("long").alias("n_orders"),
        F.round(F.col("m3") / F.pow(F.col("m2"), F.lit(1.5)), 4).alias(
            "skewness"
        ),
        F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - F.lit(3.0), 4).alias(
            "excess_kurtosis"
        ),
    ).orderBy("nation")


@register(
    "agg_trimmed_mean",
    """
    WITH rev AS (
      SELECT n.n_name AS nation, o.o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    rk AS (
      SELECT nation, cents,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY cents, o_orderkey) AS i,
             COUNT(*) OVER (PARTITION BY nation) AS n
      FROM rev
    ),
    kept AS (
      SELECT nation, n, cents FROM rk
      WHERE i > n // 10 AND i <= n - n // 10
    )
    SELECT nation,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_trimmed,
           CAST((2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
             AS trimmed_mean_cents
    FROM kept GROUP BY nation ORDER BY nation
    """,
    doc="10% two-sided trimmed mean of per-nation order totals, integer-"
    "exact in cents — the robust location estimate between the mean "
    "(outlier-hostage) and the median (information-discarding); the "
    "winsorized variant clamps instead of dropping (parked "
    "agg_winsorized_mean). Trim ranks come from a per-nation window "
    "with deterministic ties (cents, orderkey); k = n div 10 rows drop "
    "from each side; the kept-sum divides half-up (all values "
    "non-negative, so truncating and flooring division agree). The "
    "per-group sort is the price of exact order statistics at scale — "
    "the sketch tier (qsketch) is the approximate alternative.",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.select(
            "o_custkey",
            "o_orderkey",
            (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("cents"),
        )
        .join(_bcast_if_small(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "o_orderkey", "cents")
    )
    w = Window.partitionBy("nation").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("nation")
    rk = rev.select(
        "nation",
        "cents",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = rk.where(
        (F.col("i") > F.expr("n div 10"))
        & (F.col("i") <= F.col("n") - F.expr("n div 10"))
    )
    return (
        kept.groupBy("nation")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.count(F.lit(1)).cast("long").alias("n_trimmed"),
            F.expr(
                "cast((2 * sum(cents) + count(*)) div (2 * count(*)) as bigint)"
            ).alias("trimmed_mean_cents"),
        )
        .orderBy("nation")
    )


@register(
    "agg_theil_index",
    """
    WITH rev AS (
      SELECT n.n_name AS nation,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, o.o_custkey
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(CAST(cents AS DOUBLE) * LN(CAST(cents AS DOUBLE)))
                   / SUM(CAST(cents AS DOUBLE))
                 - LN(SUM(CAST(cents AS DOUBLE)) / COUNT(*)), 4)
             AS theil_index
    FROM rev GROUP BY nation ORDER BY nation
    """,
    doc="Theil T inequality index of customer revenue per nation — the "
    "decomposable companion to the Gini (agg_gini_concentration): 0 = "
    "perfect equality, ln n = one customer holds everything; unlike "
    "Gini it splits exactly into within/between-group terms, which is "
    "why economics and data-balance audits prefer it for nested "
    "rollups. Identity T = Σ x·ln x / S − ln(S/n) over exact integer "
    "cents (customer grain reduces first — shuffles carry per-customer "
    "sums, never order rows); per-row LN on identical doubles, 4-dp "
    "rounding absorbs summation order (the zipf discipline). Customers "
    "with orders all have cents > 0, so LN never sees zero.",
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.select(
            "o_custkey",
            (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("cents"),
        )
        .join(_bcast_if_small(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_custkey"))
        .agg(F.sum("cents").alias("cents"))
    )
    x = F.col("cents").cast("double")
    return (
        rev.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                F.sum(x * F.log(x)) / F.sum(x)
                - F.log(F.sum(x) / F.count(F.lit(1))),
                4,
            ).alias("theil_index"),
        )
        .orderBy("nation")
    )


@register(
    "agg_magnitude_histogram",
    """
    WITH v AS (
      SELECT event_type,
             LENGTH(CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                         AS VARCHAR)) AS magnitude
      FROM events
    ),
    g AS (
      SELECT event_type, magnitude, COUNT(*) AS n FROM v GROUP BY 1, 2
    ),
    t AS (SELECT event_type, SUM(n) AS tot FROM g GROUP BY 1)
    SELECT g.event_type, CAST(g.magnitude AS BIGINT) AS magnitude,
           CAST(g.n AS BIGINT) AS n_events,
           CAST((20000 * g.n + t.tot) // (2 * t.tot) AS BIGINT) AS share_bp
    FROM g JOIN t USING (event_type)
    ORDER BY event_type, magnitude
    """,
    doc="Order-of-magnitude histogram of event values per type: bucket = "
    "number of DECIMAL DIGITS of the integer cents amount — the exact, "
    "engine-portable magnitude bucketing (floor(log10)+1 via string "
    "length, no floating log whose boundary values could round "
    "differently across engines; the log2 variant is exactly the trap). "
    "The fixed-magnitude spread audit that catches unit errors (a 100× "
    "price bug shifts the whole histogram two buckets right) — "
    "complements Benford's first-digit audit (parked "
    "audit_benford_digits). Map-side projection, one (type, magnitude) "
    "counting aggregate — at most ~19 buckets per type ever cross the "
    "exchange.",
)
def agg_magnitude_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.length(
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .cast("string")
        ).alias("magnitude"),
    )
    g = v.groupBy("event_type", "magnitude").agg(
        F.count(F.lit(1)).alias("n")
    )
    ttot = g.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return (
        g.join(F.broadcast(ttot), "event_type")
        .select(
            "event_type",
            F.col("magnitude").cast("long").alias("magnitude"),
            F.col("n").cast("long").alias("n_events"),
            F.expr("(20000 * n + tot) div (2 * tot)")
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy("event_type", "magnitude")
    )


# --- time-series / audit ----------------------------------------------------


@register(
    "ts_seasonal_strength",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2
    ),
    dw AS (SELECT event_type, isodow(day) AS dow, y FROM daily),
    g AS (
      SELECT event_type, dow, COUNT(*) AS cnt,
             CAST(SUM(y) AS DOUBLE) AS sg
      FROM dw GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, COUNT(*) AS n, CAST(SUM(y) AS DOUBLE) AS s,
             SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS sy2
      FROM dw GROUP BY 1
    )
    SELECT t.event_type,
           CAST(t.n AS BIGINT) AS n_days,
           ROUND((ssb.v - t.s * t.s / t.n) / (t.sy2 - t.s * t.s / t.n), 4)
             AS seasonal_strength
    FROM t JOIN (
      SELECT event_type, SUM(sg * sg / cnt) AS v FROM g GROUP BY 1
    ) ssb USING (event_type)
    ORDER BY event_type
    """,
    doc="Day-of-week seasonal strength per event type: the share of "
    "daily-revenue variance explained by day-of-week means (the R² of "
    "the one-way DOW ANOVA, SSB/SST) — near 1 means the series is "
    "weekly-periodic (gate weekly batch jobs on it), near 0 means DOW "
    "carries no signal (the companion to ts_dow_seasonality's level "
    "table and ts_autocorrelation's lag-7 probe). Daily totals are "
    "exact integer cents; the variance ratio runs in doubles over "
    "#days-bounded frames (BIGINT squares of daily totals would "
    "overflow at bench scale) with per-row IEEE identical on both "
    "engines and ROUND(·,4) absorbing summation order. ISO day-of-week "
    "on both engines (DuckDB isodow = Spark weekday+1). Shuffles carry "
    "(type, day) then (type, dow) partial sums only.",
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("y")
    )
    dw = daily.select(
        "event_type", (F.weekday("day") + F.lit(1)).alias("dow"), "y"
    ).localCheckpoint(eager=True)  # #days×#types rows; read twice
    g = dw.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("y").cast("double").alias("sg"),
    )
    ssb = g.groupBy("event_type").agg(
        F.sum(F.col("sg") * F.col("sg") / F.col("cnt")).alias("v")
    )
    yd = F.col("y").cast("double")
    t = dw.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("double").alias("s"),
        F.sum(yd * yd).alias("sy2"),
    )
    return (
        t.join(F.broadcast(ssb), "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.round(
                (F.col("v") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("sy2") - F.col("s") * F.col("s") / F.col("n")),
                4,
            ).alias("seasonal_strength"),
        )
        .orderBy("event_type")
    )


@register(
    "audit_distribution_drift",
    """
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0,
             DATEDIFF('day', MIN(CAST(ts AS DATE)),
                      MAX(CAST(ts AS DATE))) AS span
      FROM events
    ),
    h AS (
      SELECT event_type,
             CASE WHEN 2 * DATEDIFF('day', b.d0, CAST(e.ts AS DATE))
                       <= b.span
                  THEN 1 ELSE 2 END AS half
      FROM events e CROSS JOIN bounds b
    ),
    g AS (
      SELECT event_type,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS n2
      FROM h GROUP BY event_type
    ),
    t AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM g)
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_h1,
           CAST(n2 AS BIGINT) AS n_h2,
           CAST((20000 * n1 + t.t1) // (2 * t.t1) AS BIGINT) AS share1_bp,
           CAST((20000 * n2 + t.t2) // (2 * t.t2) AS BIGINT) AS share2_bp,
           CAST(ABS((20000 * n2 + t.t2) // (2 * t.t2)
                    - (20000 * n1 + t.t1) // (2 * t.t1)) AS BIGINT)
             AS drift_bp
    FROM g CROSS JOIN t ORDER BY event_type
    """,
    doc="Event-mix drift between the first and second half of the "
    "observed time range: per-type composition shares (bp) in each "
    "half and their absolute delta — the population-stability check "
    "(a bounded cousin of PSI) a pipeline runs before assuming "
    "yesterday's model/filter thresholds still fit today's mix. The "
    "split day comes from the data's own min/max (no hard-coded "
    "dates): half = 1 iff 2·(day − d0) ≤ span, integer day arithmetic "
    "on both engines; the two scalars cross the driver as literals "
    "(the k-means-model pattern). Shares are exact half-up basis "
    "points; one counting aggregate, #types rows shuffle.",
)
def audit_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("span"),
    ).first()
    d0, span = b["d0"], int(b["span"])
    h = ev.select(
        "event_type",
        F.when(
            2 * F.datediff(F.col("ts").cast("date"), F.lit(d0)) <= F.lit(span),
            1,
        )
        .otherwise(2)
        .alias("half"),
    )
    g = h.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("n2"),
    ).localCheckpoint(eager=True)  # #types rows; totals + shares read it
    tot = g.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2")).first()
    t1, t2 = int(tot["t1"]), int(tot["t2"])
    return g.select(
        "event_type",
        F.col("n1").cast("long").alias("n_h1"),
        F.col("n2").cast("long").alias("n_h2"),
        F.expr(f"(20000 * n1 + {t1}) div (2 * {t1})")
        .cast("long")
        .alias("share1_bp"),
        F.expr(f"(20000 * n2 + {t2}) div (2 * {t2})")
        .cast("long")
        .alias("share2_bp"),
        F.abs(
            F.expr(f"(20000 * n2 + {t2}) div (2 * {t2})")
            - F.expr(f"(20000 * n1 + {t1}) div (2 * {t1})")
        )
        .cast("long")
        .alias("drift_bp"),
    ).orderBy("event_type")


# --- similarity range search -------------------------------------------------

_RADIUS_TAU = 0.32


@register(
    "sim_radius_search",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    norms AS (
      SELECT vec_id, sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
      GROUP BY vec_id
    ),
    dots AS (
      SELECT q.vec_id AS query_id, e.vec_id AS match_id,
             SUM(CAST(e.embedding[i] AS DOUBLE)
                 * CAST(q.embedding[i] AS DOUBLE)) AS dp
      FROM q JOIN embeddings e ON e.vec_id != q.vec_id
      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dims
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, match_id,
             ROUND(dp / (nq.nrm * nm.nrm), 4) AS cosine_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nm ON nm.vec_id = match_id
    )
    SELECT query_id, match_id, cosine_sim
    FROM scored
    WHERE cosine_sim >= CAST({_RADIUS_TAU!r} AS DOUBLE)
    ORDER BY query_id, cosine_sim DESC, match_id
    """,
    doc="Cosine RANGE search (radius query): every corpus vector within "
    f"cosine ≥ {_RADIUS_TAU} of each query — the threshold dual of "
    "top-k (top-k answers 'k nearest whatever the quality'; radius "
    "answers 'everything above the quality bar', the shape retrieval "
    "filters and dedup candidate generation actually want). Exact "
    "brute-force tier: queries broadcast, corpus scored map-side with "
    "zip_with/aggregate dot products (JVM, no UDF), NO top-k window — "
    "the threshold filter is map-side too, so the only exchange is the "
    "output sort; the cell-probed tier for selective radii is "
    "sim_kmeans_cells' assignment reused as a pre-filter. Threshold "
    "compares the ROUNDED 4-dp cosine via a python-repr'd CAST-AS-"
    "DOUBLE literal (the decimal-vs-double trap), so boundary "
    "membership is identical across engines.",
)
def sim_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: every corpus row does 10 dot products map-side with no
    # exchange before the threshold filter (the brute-force-topk shape)
    emb = _t(spark, sf_dir, "embeddings", rebalance=True)
    queries = emb.where(F.col("vec_id") < 10)
    return S.brute_force_radius(emb, queries, tau=_RADIUS_TAU).orderBy(
        "query_id", F.col("cosine_sim").desc(), "match_id"
    )


# --- scan matrix: schema evolution -------------------------------------------

_JSON_EVO_CACHE: dict = {}


@register(
    "scan_json_schema_evolution",
    """
    WITH src AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN event_id % 2 = 1
                  THEN CAST(CAST(ts AS DATE) AS VARCHAR) END AS day
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN day IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v2_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days_v2
    FROM src GROUP BY event_type ORDER BY event_type
    """,
    doc="Schema-evolution scan roundtrip — the OTHER lake-layout primitive "
    "next to partition pruning: half the events are written as JSONL in "
    "schema v1 (event_id, event_type, cents) and half in v2 (adds a day "
    "column), into one directory; the read unifies the schemas (v1 rows "
    "surface NULL day — exactly how a real feed evolves without "
    "rewriting history) and the aggregate must match the oracle's flat-"
    "parquet CASE-split. Only integers and strings cross the JSON "
    "boundary (a double roundtrip would expose float-formatting "
    "differences — cents are derived BEFORE the write). Layout written "
    "once per session (cached); the read is one directory scan + one "
    "map-side-combined aggregate.",
)
def scan_json_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _JSON_EVO_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ksc-json-evo-")
        ev = _t(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.col("ts").cast("date").cast("string").alias("day"),
        )
        ev.where(F.col("event_id") % 2 == 0).select(
            "event_id", "event_type", "cents"
        ).write.mode("append").json(path)
        ev.where(F.col("event_id") % 2 == 1).select(
            "event_id", "event_type", "cents", "day"
        ).write.mode("append").json(path)
        _JSON_EVO_CACHE[key] = path
    back = spark.read.json(path)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("day").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_v2_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.countDistinct("day").cast("long").alias("n_days_v2"),
        )
        .orderBy("event_type")
    )


# --- modal value / audience overlap ------------------------------------------


@register(
    "events_modal_type",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY 1),
    rk AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM c
    )
    SELECT rk.user_id, rk.event_type AS modal_type,
           CAST(rk.n AS BIGINT) AS n_modal,
           CAST(t.tot AS BIGINT) AS n_events,
           CAST((20000 * rk.n + t.tot) // (2 * t.tot) AS BIGINT)
             AS modal_share_bp
    FROM rk JOIN t USING (user_id)
    WHERE rk.rn = 1
    ORDER BY user_id
    """,
    doc="Exact per-user modal event type (most frequent, ties to the "
    "smallest type string) with its count and share — the exact MODE "
    "aggregate the SQL standard lacks, the per-entity companion to the "
    "Misra-Gries corpus summary (exact because the per-user type "
    "cardinality is bounded; MG is for unbounded key spaces). One "
    "counting aggregate with map-side combine, then a top-1 rank that "
    "plans as WindowGroupLimit (≤ 1 row per user per map partition "
    "crosses the exchange); per-user totals reduce from the same count "
    "frame. Integer-exact half-up share.",
)
def events_modal_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)  # users×types rows; rank + totals read it
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), "event_type"
    )
    rk = (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "n")
    )
    return (
        rk.join(t, "user_id")
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("n").cast("long").alias("n_modal"),
            F.col("tot").cast("long").alias("n_events"),
            F.expr("(20000 * n + tot) div (2 * tot)")
            .cast("long")
            .alias("modal_share_bp"),
        )
        .orderBy("user_id")
    )


@register(
    "events_audience_overlap",
    """
    WITH m AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, COUNT(*) AS n FROM m GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM m a JOIN m b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(i.n_both AS BIGINT) AS n_both,
           CAST((20000 * i.n_both + (sa.n + sb.n - i.n_both))
                // (2 * (sa.n + sb.n - i.n_both)) AS BIGINT) AS jaccard_bp
    FROM inter i
    JOIN sz sa ON sa.event_type = i.type_a
    JOIN sz sb ON sb.event_type = i.type_b
    ORDER BY type_a, type_b
    """,
    doc="Pairwise audience overlap between event types: exact Jaccard of "
    "the user sets for every type pair — the segmentation/cannibalization "
    "audit ('do signups and purchases reach the same users?'), and the "
    "exact small-cardinality counterpart of the KMV set-algebra sketch "
    "(text_source_overlap_kmv) which serves the same question when the "
    "label space is unbounded. The user-keyed self-join of the distinct "
    "(type, user) membership frame emits at most C(#types, 2) rows per "
    "user — #types is a bounded enumeration, so the pair frame is "
    "O(users), never quadratic in users. Integer-exact half-up Jaccard "
    "in basis points.",
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = ev.select("event_type", "user_id").distinct().localCheckpoint(
        eager=True  # membership frame; sizes + both join sides read it
    )
    sz = m.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = m.select(F.col("event_type").alias("type_a"), "user_id")
    b = m.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sza = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    szb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sza), "type_a")
        .join(F.broadcast(szb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            F.expr(
                "(20000 * n_both + (n_a + n_b - n_both))"
                " div (2 * (n_a + n_b - n_both))"
            )
            .cast("long")
            .alias("jaccard_bp"),
        )
        .orderBy("type_a", "type_b")
    )


# --- audit / time-series closers ---------------------------------------------


@register(
    "audit_pk_uniqueness",
    """
    WITH u AS (
      SELECT 'region' AS tbl, COUNT(*) AS n_rows,
             COUNT(DISTINCT r_regionkey) AS n_keys FROM region
      UNION ALL SELECT 'nation', COUNT(*), COUNT(DISTINCT n_nationkey)
      FROM nation
      UNION ALL SELECT 'customer', COUNT(*), COUNT(DISTINCT c_custkey)
      FROM customer
      UNION ALL SELECT 'supplier', COUNT(*), COUNT(DISTINCT s_suppkey)
      FROM supplier
      UNION ALL SELECT 'part', COUNT(*), COUNT(DISTINCT p_partkey) FROM part
      UNION ALL SELECT 'orders', COUNT(*), COUNT(DISTINCT o_orderkey)
      FROM orders
      UNION ALL SELECT 'lineitem', COUNT(*),
             COUNT(DISTINCT l_orderkey * 100 + l_linenumber) FROM lineitem
      UNION ALL SELECT 'events', COUNT(*), COUNT(DISTINCT event_id)
      FROM events
      UNION ALL SELECT 'documents', COUNT(*), COUNT(DISTINCT doc_id)
      FROM documents
      UNION ALL SELECT 'embeddings', COUNT(*), COUNT(DISTINCT vec_id)
      FROM embeddings
    )
    SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_keys AS BIGINT) AS n_distinct_keys,
           CAST(n_rows - n_keys AS BIGINT) AS n_dup_key_rows
    FROM u ORDER BY tbl
    """,
    doc="Primary-key uniqueness audit across ALL TEN tables in one query: "
    "rows vs distinct declared keys per table (lineitem's key is the "
    "composite (l_orderkey, l_linenumber), folded into one integer since "
    "linenumber < 100) — the first data-quality gate any warehouse load "
    "runs; a nonzero n_dup_key_rows breaks every downstream join "
    "cardinality assumption. Each leg is one scan + one distinct "
    "aggregate (map-side partials); legs union to a 10-row frame. At "
    "100 TB the distinct-count legs are the exact tier — the HLL sketch "
    "family is the one-pass approximate tier over the same question.",
)
def audit_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    legs = []
    for tbl, key in [
        ("region", F.col("r_regionkey")),
        ("nation", F.col("n_nationkey")),
        ("customer", F.col("c_custkey")),
        ("supplier", F.col("s_suppkey")),
        ("part", F.col("p_partkey")),
        ("orders", F.col("o_orderkey")),
        ("lineitem", F.col("l_orderkey") * 100 + F.col("l_linenumber")),
        ("events", F.col("event_id")),
        ("documents", F.col("doc_id")),
        ("embeddings", F.col("vec_id")),
    ]:
        legs.append(
            _t(spark, sf_dir, tbl).agg(
                F.lit(tbl).alias("tbl"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(key).alias("n_keys"),
            )
        )
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    return u.select(
        "tbl",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_distinct_keys"),
        (F.col("n_rows") - F.col("n_keys")).cast("long").alias(
            "n_dup_key_rows"
        ),
    ).orderBy("tbl")


@register(
    "ts_week_over_week",
    """
    WITH wk AS (
      SELECT event_type, date_trunc('week', CAST(ts AS DATE)) AS week,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, week, cents,
             LAG(cents) OVER (PARTITION BY event_type ORDER BY week)
               AS prev_cents
      FROM wk
    )
    SELECT event_type, CAST(week AS DATE) AS week,
           CAST(cents AS BIGINT) AS cents,
           CAST(prev_cents AS BIGINT) AS prev_cents,
           CAST((2 * 10000 * cents + prev_cents) // (2 * prev_cents)
                - 10000 AS BIGINT) AS wow_growth_bp
    FROM lagged WHERE prev_cents IS NOT NULL
    ORDER BY event_type, week
    """,
    doc="Week-over-week revenue growth per event type in signed basis "
    "points — the KPI-trend staple. Weekly totals are exact integer "
    "cents (ISO-Monday date_trunc('week') on both engines); the growth "
    "ratio uses the POSITIVITY-SHIFT form (2·10⁴·cur + prev) div "
    "(2·prev) − 10⁴ so the half-up division only ever sees a positive "
    "numerator — a direct (cur − prev) numerator is negative on down "
    "weeks and Spark's truncating div disagrees with DuckDB's flooring "
    "// exactly there (the CLAUDE.md signed-division trap). One "
    "(type, week) aggregate, one #weeks-bounded lag window.",
)
def ts_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wk = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("week"),
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("week")
    lagged = wk.withColumn("prev_cents", F.lag("cents").over(w))
    return (
        lagged.where(F.col("prev_cents").isNotNull())
        .select(
            "event_type",
            "week",
            F.col("cents").cast("long").alias("cents"),
            F.col("prev_cents").cast("long").alias("prev_cents"),
            (
                F.expr("(2 * 10000 * cents + prev_cents) div (2 * prev_cents)")
                - F.lit(10000)
            )
            .cast("long")
            .alias("wow_growth_bp"),
        )
        .orderBy("event_type", "week")
    )


# --- final window closers: Lorenz curve, bigram entropy rate, null-safe join


@register(
    "agg_lorenz_curve",
    """
    WITH rev AS (
      SELECT n.n_name AS nation, o.o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT nation, cents,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY cents, o_custkey) AS i,
             SUM(cents) OVER (PARTITION BY nation
                              ORDER BY cents, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             COUNT(*) OVER (PARTITION BY nation) AS n,
             SUM(cents) OVER (PARTITION BY nation) AS tot
      FROM rev
    )
    SELECT nation, CAST(d.d AS BIGINT) AS decile,
           CAST(i AS BIGINT) AS n_cust,
           CAST((20000 * cum + tot) // (2 * tot) AS BIGINT) AS cum_share_bp
    FROM rk CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS d) d
    WHERE (d.d * n) // 10 = i
    ORDER BY nation, decile
    """,
    doc="Lorenz curve points per nation: cumulative revenue share held by "
    "the bottom d/10 of customers, for each decile — the CURVE the Gini "
    "coefficient (agg_gini_concentration) integrates and the Pareto "
    "share (agg_pareto_share) reads one point of; together the three "
    "close the inequality-analytics family. Customers rank ascending by "
    "exact integer cents (custkey ties), one per-nation window pass "
    "computes rank/cumsum/total together, and the decile cuts attach by "
    "exploding d ∈ 1..10 against (d·n) div 10 = rank — integer on both "
    "engines, duplicate-free whenever n ≥ 10 per group. Half-up "
    "basis-point shares against the in-window total; shuffles carry "
    "customer-grain sums, never order rows.",
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.select(
            "o_custkey",
            (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("cents"),
        )
        .join(_bcast_if_small(c, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_custkey"))
        .agg(F.sum("cents").alias("cents"))
    )
    wo = Window.partitionBy("nation").orderBy("cents", "o_custkey")
    wn = Window.partitionBy("nation")
    rk = rev.select(
        "nation",
        F.row_number().over(wo).alias("i"),
        F.sum("cents").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.sum("cents").over(wn).alias("tot"),
    )
    d = rk.select(
        "nation", "i", "cum", "n", "tot",
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("d"),
    ).where(F.expr("(d * n) div 10") == F.col("i"))
    return d.select(
        "nation",
        F.col("d").cast("long").alias("decile"),
        F.col("i").cast("long").alias("n_cust"),
        F.expr("(20000 * cum + tot) div (2 * tot)")
        .cast("long")
        .alias("cum_share_bp"),
    ).orderBy("nation", "decile")


@register(
    "text_bigram_entropy_rate",
    """
    WITH tok AS (
      SELECT lang, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    uni AS (
      SELECT lang, unnest(toks) AS g FROM tok
    ),
    big AS (
      SELECT lang, concat(toks[i], ' ', toks[i+1]) AS g
      FROM (SELECT lang, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM tok)
    ),
    uc AS (SELECT lang, g, COUNT(*) AS c FROM uni GROUP BY 1, 2),
    bc AS (SELECT lang, g, COUNT(*) AS c FROM big GROUP BY 1, 2),
    h1 AS (
      SELECT lang, LN(SUM(c)) - SUM(c * LN(c)) / SUM(c) AS h,
             SUM(c) AS n FROM uc GROUP BY lang
    ),
    h2 AS (
      SELECT lang, LN(SUM(c)) - SUM(c * LN(c)) / SUM(c) AS h,
             SUM(c) AS n FROM bc GROUP BY lang
    )
    SELECT h1.lang,
           CAST(h2.n AS BIGINT) AS n_bigrams,
           ROUND(h1.h, 4) AS unigram_entropy_nats,
           ROUND(h2.h - h1.h, 4) AS entropy_rate_nats
    FROM h1 JOIN h2 USING (lang)
    ORDER BY lang
    """,
    doc="Bigram entropy rate per language: H(bigram) − H(unigram) ≈ the "
    "conditional entropy of the next token given the current one — the "
    "sequence-predictability signal that separates templated/boilerplate "
    "text (near zero: the next word is determined) from natural prose, "
    "invisible to any unigram measure; the information-theoretic "
    "companion to the bigram-LM fluency score. One tokenize pass feeds "
    "both gram frames (bigrams via an index transform over the token "
    "array, 1-based on both engines); counting aggregates with map-side "
    "combine; the counts identity + LN + ROUND(·,4) discipline of the "
    "entropy family. Shuffles carry gram counts, never text.",
)
def text_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("lang", T.tokens(F.col("text")).alias("toks"))
    tok = tok.localCheckpoint(eager=False)  # both gram frames read it
    uni = tok.select("lang", F.explode("toks").alias("g"))
    big = tok.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(toks[i-1], ' ', toks[i]))"
            )
        ).alias("g"),
    )
    def _h(frame):
        cf = frame.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("c"))
        return cf.groupBy("lang").agg(
            (
                F.log(F.sum("c"))
                - F.sum(F.col("c") * F.log("c")) / F.sum("c")
            ).alias("h"),
            F.sum("c").alias("n"),
        )
    h1 = _h(uni)
    h2 = _h(big).select(
        "lang", F.col("h").alias("h2"), F.col("n").alias("n2")
    )
    return (
        h1.join(h2, "lang")
        .select(
            "lang",
            F.col("n2").cast("long").alias("n_bigrams"),
            F.round(F.col("h"), 4).alias("unigram_entropy_nats"),
            F.round(F.col("h2") - F.col("h"), 4).alias("entropy_rate_nats"),
        )
        .orderBy("lang")
    )


@register(
    "join_null_safe_eq",
    """
    WITH l AS (
      SELECT NULLIF(c_nationkey % 5, 0) AS seg, COUNT(*) AS nc
      FROM customer GROUP BY 1
    ),
    r AS (
      SELECT NULLIF(s_nationkey % 5, 0) AS seg, COUNT(*) AS ns
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(CAST(l.seg AS VARCHAR), 'NULL') AS segment,
           CAST(l.nc AS BIGINT) AS n_customers,
           CAST(r.ns AS BIGINT) AS n_suppliers,
           CAST(l.nc * r.ns AS BIGINT) AS n_pairs
    FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg
    ORDER BY segment
    """,
    doc="Null-safe equality join (Spark eqNullSafe <=> / SQL IS NOT "
    "DISTINCT FROM): the relational-completeness entry for the third "
    "equality semantics — plain = drops NULL keys silently, which is "
    "the classic silent-row-loss bug when a segmentation column is "
    "nullable; <=> matches NULL to NULL as one group. Both sides "
    "pre-aggregate to #segments-bounded count frames BEFORE the join "
    "(the null-safe key is still an equi-key, so the join plans "
    "hash/merge, never nested-loop — pinned by the plan-hygiene gate), "
    "and the NULL segment is rendered as a literal so the output "
    "carries no NULL keys. At 100 TB this shape joins registers, never "
    "rows.",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    l = c.groupBy(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("seg")
    ).agg(F.count(F.lit(1)).alias("nc"))
    r = s.groupBy(
        F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("seg")
    ).agg(F.count(F.lit(1)).alias("ns"))
    j = l.join(r, l["seg"].eqNullSafe(r["seg"]))
    return j.select(
        F.coalesce(l["seg"].cast("string"), F.lit("NULL")).alias("segment"),
        F.col("nc").cast("long").alias("n_customers"),
        F.col("ns").cast("long").alias("n_suppliers"),
        (F.col("nc") * F.col("ns")).cast("long").alias("n_pairs"),
    ).orderBy("segment")


# --- moved from relational.py (r10): now rides the shared _co_edges cache ---

@register(
    "graph_triangle_counts",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY 1
    ),
    oe AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
               AS src,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
               AS dst,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END
               AS dst_d
      FROM edges e
      JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ),
    wedges AS (
      SELECT e1.src, e1.dst AS v, e2.dst AS w
      FROM oe e1 JOIN oe e2
        ON e1.src = e2.src AND ((e1.dst_d, e1.dst) < (e2.dst_d, e2.dst))
    ),
    tri AS (
      SELECT wedges.src, wedges.v, wedges.w
      FROM wedges JOIN oe ON oe.src = wedges.v AND oe.dst = wedges.w
    ),
    per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT src AS node FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri
      ) GROUP BY 1
    )
    SELECT p.node AS node, d.d AS degree, p.n_triangles
    FROM per_node p JOIN deg d ON d.node = p.node
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
    doc="Triangle counting over the part co-purchase graph (parts "
    "co-ordered in ≥2 orders) via the degree-oriented wedge join — the "
    "classic distributed triangle algorithm. Orientation (each edge "
    "points from its lower-(degree, id) endpoint) caps every out-degree "
    "at O(√E), so wedge volume is O(E^1.5) regardless of hub skew — the "
    "naive wedge join is Σd² and melts on a skewed graph (gate-asserted: "
    "the oriented wedge count stays under half the unoriented bound). "
    "All stages are vertex-keyed equi-joins; each triangle counts once "
    "at its lowest-ordered apex. Output: top-20 parts by triangle "
    "participation with degree — the clustering-density analytics behind "
    "bundle detection. Edge generation is per-order pairs (bounded by "
    "basket size, the agg_basket_affinity pattern) with a support floor, "
    "via the session-cached shared co-purchase edge frame (r10).",
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.graph import (
        triangle_participation,
    )

    # r10: the inline edge build duplicated _co_edges exactly (distinct
    # order-part pairs -> pair join -> support >= 2); share the session-
    # cached checkpointed frame with the other five graph queries instead
    # (one edge construction per session, bit-identical results).
    edges = _co_edges(spark, sf_dir)
    return (
        triangle_participation(edges)
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(20)
    )


# --- late-r10: hard negatives, centroid classifier eval, normalized dedup ---


@register(
    "sim_hard_negatives",
    """
    WITH q AS (SELECT vec_id, label, embedding FROM embeddings
               WHERE vec_id < 10),
    norms AS (
      SELECT vec_id, sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
      GROUP BY vec_id
    ),
    dots AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             e.vec_id AS match_id, e.label AS match_label,
             SUM(CAST(e.embedding[i] AS DOUBLE)
                 * CAST(q.embedding[i] AS DOUBLE)) AS dp
      FROM q JOIN embeddings e
        ON e.vec_id != q.vec_id AND e.label != q.label
      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dims
      GROUP BY 1, 2, 3, 4
    ),
    scored AS (
      SELECT query_id, CAST(query_label AS BIGINT) AS query_label,
             match_id, CAST(match_label AS BIGINT) AS match_label,
             ROUND(dp / (nq.nrm * nm.nrm), 4) AS cosine_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nm ON nm.vec_id = match_id
    )
    SELECT query_id, query_label, match_id, match_label, cosine_sim, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, match_id)
                  AS rnk
      FROM scored
    ) WHERE rnk <= 3
    ORDER BY query_id, rnk
    """,
    doc="Exact hard-negative mining: per query, the top-3 most similar "
    "corpus vectors with a DIFFERENT label — the contrastive-training "
    "data miner (high-similarity wrong-label neighbours are the "
    "negatives a contrastive/reranker objective learns most from; "
    "random negatives are too easy). Same broadcast-scorer scale shape "
    "as the cosine baseline: queries broadcast WITH their labels, the "
    "corpus never shuffles, the label-mismatch filter is map-side, "
    "per-query top-k reduces through the rank window. The ANN tier "
    "serves the same mining at scale by probing the trained IVF cells "
    "and post-filtering labels.",
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: same scan-fused CPU shape as sim_topk_bruteforce
    emb = _t(spark, sf_dir, "embeddings", rebalance=True)
    queries = emb.where(F.col("vec_id") < 10)
    return (
        S.hard_negative_topk(emb, queries, k=3)
        .select(
            "query_id",
            F.col("query_label").cast("long").alias("query_label"),
            "match_id",
            F.col("match_label").cast("long").alias("match_label"),
            "cosine_sim",
            "rnk",
        )
        .orderBy("query_id", "rnk")
    )


_CC_LABELS = 16  # argmin encoding base: labels are 0-9, strictly < 16


@register(
    "sim_centroid_confusion",
    f"""
    WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
    qr AS (
      SELECT vec_id, label, i.i - 1 AS pos,
             CAST(FLOOR(CAST(embedding[i.i] AS DOUBLE) * 1000 + 0.5)
                  AS BIGINT) AS qx
      FROM embeddings CROSS JOIN dims i
    ),
    cents AS (
      SELECT label AS clabel, pos,
             CAST(FLOOR((2 * SUM(qx) + COUNT(*)) / (2.0 * COUNT(*)))
                  AS BIGINT) AS qc
      FROM qr GROUP BY 1, 2
    ),
    d AS (
      SELECT q.vec_id, q.label, c.clabel,
             SUM((q.qx - c.qc) * (q.qx - c.qc)) AS dist
      FROM qr q JOIN cents c ON c.pos = q.pos
      GROUP BY 1, 2, 3
    ),
    am AS (
      SELECT vec_id, label, MIN(dist * {_CC_LABELS} + clabel) AS m
      FROM d GROUP BY 1, 2
    ),
    pred AS (
      SELECT CAST(label AS BIGINT) AS true_label,
             CAST(m % {_CC_LABELS} AS BIGINT) AS predicted_label
      FROM am
    ),
    cells AS (
      SELECT true_label, predicted_label, COUNT(*) AS n_vecs
      FROM pred GROUP BY 1, 2
    ),
    rt AS (SELECT true_label, SUM(n_vecs) AS n_true FROM cells GROUP BY 1)
    SELECT c.true_label, c.predicted_label,
           CAST(c.n_vecs AS BIGINT) AS n_vecs,
           CAST((20000 * c.n_vecs + rt.n_true) // (2 * rt.n_true)
                AS BIGINT) AS row_share_bp
    FROM cells c JOIN rt USING (true_label)
    ORDER BY true_label, predicted_label
    """,
    doc="Nearest-centroid classifier confusion matrix over the embedding "
    "labels — the embedding-space analogue of text_langid_confusion and "
    "the cheapest label-quality audit (a mislabeled or drifted slice "
    "shows up as off-diagonal mass before any model training): each "
    "vector is assigned to its nearest per-label centroid and the "
    "(true, predicted) cells report resubstitution counts with "
    "row-share bp (the diagonal is per-label separability). EXACT "
    "integer end-to-end via the repo's quantized-arithmetic discipline: "
    "milli-unit components (floor(x·1000+0.5)), centroid means by the "
    "half-up identity floor((2Σ+n)/(2·n)) computed through one IEEE "
    "double division (identical both engines, floors correctly for "
    "NEGATIVE sums — the distributed form of the driver-side Lloyd "
    "rounding), squared-L2 in exact longs, and the argmin as ONE "
    f"primitive long aggregate min(dist·{_CC_LABELS} + label) decoded "
    "by modulus (the _argmin_cell pattern — lexicographic (dist, label) "
    "because label < 16, HashAggregate guaranteed). Shuffles carry "
    "(label, dim) sums and per-vector distance rows, never raw vectors "
    "to a window.",
)
def sim_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qr = S.quantized_vector_rows(emb)
    lab = emb.select(F.col("vec_id").alias("vid"), "label")
    qrl = qr.join(_bcast_if_small(lab, sf_dir, "embeddings"), "vid")
    qrl = qrl.localCheckpoint(eager=True)  # read twice: centroids + dists
    centq = (
        qrl.groupBy(F.col("label").alias("clabel"), "pos")
        .agg(F.sum("qx").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "clabel",
            "pos",
            F.floor(
                (2 * F.col("s") + F.col("n")) / (2.0 * F.col("n"))
            )
            .cast("long")
            .alias("qc"),
        )
    )
    d = (
        qrl.join(F.broadcast(centq), "pos")
        .groupBy("vid", "label", "clabel")
        .agg(
            F.sum(
                (F.col("qx") - F.col("qc")) * (F.col("qx") - F.col("qc"))
            ).alias("dist")
        )
    )
    am = d.groupBy("vid", "label").agg(
        F.min(F.col("dist") * _CC_LABELS + F.col("clabel")).alias("m")
    )
    pred = am.select(
        F.col("label").cast("long").alias("true_label"),
        (F.col("m") % _CC_LABELS).cast("long").alias("predicted_label"),
    )
    cells = pred.groupBy("true_label", "predicted_label").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    rowt = cells.groupBy("true_label").agg(F.sum("n_vecs").alias("n_true"))
    return (
        cells.join(F.broadcast(rowt), "true_label")
        .select(
            "true_label",
            "predicted_label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.expr("(20000 * n_vecs + n_true) div (2 * n_true)")
            .cast("long")
            .alias("row_share_bp"),
        )
        .orderBy("true_label", "predicted_label")
    )


@register(
    "dedup_exact_normalized",
    """
    WITH norm AS (
      SELECT doc_id,
             md5(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
                 '\\s+', ' ', 'g'))) AS nmd5,
             md5(text) AS rmd5
      FROM documents
    ),
    g AS (
      SELECT nmd5,
             COUNT(*) AS n_docs,
             MIN(doc_id) AS keep_doc_id,
             MAX(doc_id) AS max_doc_id,
             COUNT(DISTINCT rmd5) AS n_raw_variants
      FROM norm GROUP BY nmd5 HAVING COUNT(*) >= 2
    )
    SELECT keep_doc_id, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_raw_variants AS BIGINT) AS n_raw_variants,
           max_doc_id
    FROM g ORDER BY keep_doc_id
    """,
    doc="Normalization-aware exact dedup — the 'fuzzy-exact' tier between "
    "raw-hash dedup and MinHash: documents hash AFTER lowercasing, "
    "punctuation stripping, and whitespace collapsing, so trivially "
    "perturbed mirrors (case changes, reflowed whitespace, stripped "
    "markup punctuation) collapse into one group that raw md5 misses — "
    "n_raw_variants > 1 on a group is exactly the set this tier catches "
    "(the standard C4/RefinedWeb normalization step before expensive "
    "near-dup passes). Map-side normalize+hash projection, one "
    "hash-keyed aggregate; shuffles carry 32-byte hashes; keep-rule is "
    "min doc_id, the repo's deterministic keeper convention.",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id",
        F.md5(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.lower(F.col("text")), r"[^a-z0-9\s]", ""
                    ),
                    r"\s+",
                    " ",
                )
            )
        ).alias("nmd5"),
        F.md5(F.col("text")).alias("rmd5"),
    )
    g = (
        norm.groupBy("nmd5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.countDistinct("rmd5").alias("n_raw_variants"),
        )
        .where(F.col("n_docs") >= 2)
    )
    return g.select(
        "keep_doc_id",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_raw_variants").cast("long").alias("n_raw_variants"),
        "max_doc_id",
    ).orderBy("keep_doc_id")


# --- round-10 continuation: changepoints, dependence audits, resampling ----
# ts_autocorrelation moved here VERBATIM from plans/relational.py: its body
# changed this round (the ADVICE non-negative-mean assert), so it must sit
# inside the driver's first-50 window; r10.py registers before the certified
# relational tail, relational.py does not.


@register(
    "ts_autocorrelation",
    """
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    d AS (SELECT day, SUM(cents) AS tot FROM e GROUP BY day),
    m AS (SELECT SUM(tot) // COUNT(*) AS fm FROM d),
    r AS (SELECT day, tot - (SELECT fm FROM m) AS dev FROM d),
    den AS (SELECT SUM(dev * dev) AS dd FROM r),
    lags AS (SELECT unnest([1, 2, 3, 7]) AS lag),
    p AS (
      SELECT l.lag, SUM(a.dev * b.dev) AS num, COUNT(*) AS n_pairs
      FROM lags l
      CROSS JOIN r a
      JOIN r b ON b.day = a.day + l.lag
      GROUP BY l.lag
    )
    SELECT lag,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(FLOOR(10000.0 * CAST(num AS DOUBLE)
                      / CAST((SELECT dd FROM den) AS DOUBLE) + 0.5)
                AS BIGINT) AS acf_bp
    FROM p ORDER BY lag
    """,
    doc="Autocorrelation of the daily-revenue series at lags 1/2/3/7 (the "
    "weekly-seasonality probe), in basis points: cents are demeaned by "
    "the FLOOR of the series mean (integer, so both engines agree on the "
    "residuals bit-for-bit), the lag products come from an equi-join of "
    "the residual series against itself shifted by day+lag, and "
    "acf = Σ dev_t·dev_(t+k) / Σ dev² is computed over exact integer "
    "sums, converted to double only for the final rounded division "
    "(identical IEEE conversion + division both engines; numerators may "
    "be negative, FLOOR(x+0.5) is the shared half-up). The daily frame "
    "is checkpointed once and the two scalars (floor-mean, denominator) "
    "cross the driver as literals — the k-means-model pattern; the "
    "corpus scans once, every later frame is #days-bounded.",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    d = (
        ev.select(F.col("ts").cast("date").alias("day"), cents.alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("tot"))
        .localCheckpoint(eager=True)  # #days rows; read 3x below
    )
    # Spark `div` truncates, DuckDB `//` floors: identical ONLY because
    # events.value >= 0 makes sum(tot) non-negative (pinned by the
    # assert below). A signed series would need the positivity-shift
    # pattern (see text_rank_correlation's spearman_bp).
    mrow = d.agg(
        F.expr("sum(tot) div count(*)").alias("fm")
    ).first()
    fm = int(mrow["fm"])
    assert fm >= 0, "floor-mean relies on non-negative event values"
    r = d.select("day", (F.col("tot") - F.lit(fm)).alias("dev")).localCheckpoint(
        eager=True
    )
    dd = int(r.agg(F.sum(F.col("dev") * F.col("dev")).alias("dd")).first()["dd"])
    lags = r.select(
        "day", "dev", F.explode(F.array(*[F.lit(x) for x in (1, 2, 3, 7)])).alias("lag")
    )
    b = r.select(F.col("day").alias("bday"), F.col("dev").alias("bdev"))
    p = (
        lags.join(b, F.expr("date_add(day, lag) = bday"))
        .groupBy("lag")
        .agg(
            F.sum(F.col("dev") * F.col("bdev")).alias("num"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return p.select(
        "lag",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.floor(
            F.lit(10000.0) * F.col("num").cast("double") / F.lit(float(dd))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("acf_bp"),
    ).orderBy("lag")



@register(
    "agg_mutual_information",
    """
    WITH cell AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_xy
      FROM orders GROUP BY 1, 2
    ),
    m AS (
      SELECT o_orderpriority, o_orderstatus, n_xy,
             SUM(n_xy) OVER (PARTITION BY o_orderpriority) AS n_x,
             SUM(n_xy) OVER (PARTITION BY o_orderstatus) AS n_y,
             SUM(n_xy) OVER () AS n
      FROM cell
    ),
    s AS (
      SELECT o_orderpriority, o_orderstatus, n_xy,
             LN((CAST(n AS DOUBLE) * n_xy) / (CAST(n_x AS DOUBLE) * n_y))
               AS pmi,
             (CAST(n_xy AS DOUBLE) / n)
               * LN((CAST(n AS DOUBLE) * n_xy)
                    / (CAST(n_x AS DOUBLE) * n_y)) AS contrib
      FROM m
    )
    SELECT o_orderpriority, o_orderstatus,
           CAST(n_xy AS BIGINT) AS n_xy,
           ROUND(pmi, 4) AS pmi_nats,
           ROUND(SUM(contrib) OVER (), 4) AS mi_nats
    FROM s
    ORDER BY o_orderpriority, o_orderstatus
    """,
    doc="Mutual information between order priority and order status — the "
    "categorical-dependence audit a feature pipeline runs before "
    "one-hot-encoding two columns that might be redundant. Joint counts "
    "reduce once from the fact table; marginals and the grand total come "
    "from window sums OVER THE CELL FRAME (|X|·|Y| rows, never a second "
    "fact scan), so the only data-sized shuffle is the 15-group "
    "aggregate with map-side partial combine. Per-cell pointwise MI and "
    "the total MI (Σ p_xy · ln(p_xy / p_x p_y), repeated per row via a "
    "global window over 15 cells) use double LN with the entropy "
    "family's ROUND(·,4) discipline; the log argument is formed as "
    "(n·n_xy)/(n_x·n_y) in double so both engines evaluate the same "
    "IEEE quotient.",
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cell = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    wx = Window.partitionBy("o_orderpriority")
    wy = Window.partitionBy("o_orderstatus")
    wall = Window.partitionBy()
    m = cell.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_xy",
        F.sum("n_xy").over(wx).alias("n_x"),
        F.sum("n_xy").over(wy).alias("n_y"),
        F.sum("n_xy").over(wall).alias("n"),
    )
    pmi = F.log(
        (F.col("n").cast("double") * F.col("n_xy"))
        / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    s = m.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_xy",
        pmi.alias("pmi"),
        ((F.col("n_xy").cast("double") / F.col("n")) * pmi).alias("contrib"),
    )
    return s.select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("n_xy").cast("long").alias("n_xy"),
        F.round(F.col("pmi"), 4).alias("pmi_nats"),
        F.round(F.sum("contrib").over(wall), 4).alias("mi_nats"),
    ).orderBy("o_orderpriority", "o_orderstatus")


_FD_CANDIDATES = (
    # (name, table, determinant, dependent) — one held FD (a key always
    # determines its row's attributes) and three expected violations, so
    # the audit exercises both verdicts.
    ("c_custkey->c_nationkey", "customer", "c_custkey", "c_nationkey"),
    ("l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag"),
    ("l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
)


def _fd_oracle_leg(name: str, table: str, det: str, dep: str) -> str:
    return f"""
    SELECT '{name}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(CASE WHEN d > 1 THEN c ELSE 0 END) AS BIGINT)
             AS n_violating_rows,
           CAST((20000 * SUM(CASE WHEN d > 1 THEN c ELSE 0 END) + SUM(c))
                // (2 * SUM(c)) AS BIGINT) AS violation_bp
    FROM (SELECT {det} AS k, COUNT(DISTINCT {dep}) AS d, COUNT(*) AS c
          FROM {table} GROUP BY 1) g"""


@register(
    "audit_functional_dependency",
    "\nUNION ALL".join(
        _fd_oracle_leg(*cand) for cand in _FD_CANDIDATES
    )
    + "\nORDER BY fd",
    doc="Functional-dependency audit: for each candidate determinant → "
    "dependent pair, how many determinant groups carry more than one "
    "distinct dependent value, and what share of rows sit in those "
    "violating groups (half-up bp, all-positive counts so truncating "
    "and flooring division agree). The schema-inference / "
    "normalization check a data catalog runs before declaring a "
    "column derivable: c_custkey→c_nationkey must hold (keys determine "
    "their row), while l_partkey→l_suppkey is expected to fail (TPC-H "
    "parts have multiple suppliers). Each candidate is ONE group-by on "
    "its determinant carrying (distinct-count, count) pairs — partial "
    "aggregation map-side, shuffles keyed on the determinant, never "
    "wider than the candidate's own key cardinality; the four scalar "
    "verdicts union into a 4-row frame.",
)
def audit_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, table, det, dep in _FD_CANDIDATES:
        g = (
            _t(spark, sf_dir, table)
            .groupBy(F.col(det).alias("k"))
            .agg(
                F.countDistinct(dep).alias("d"),
                F.count(F.lit(1)).alias("c"),
            )
        )
        leg = g.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_groups"),
            F.sum(F.when(F.col("d") > 1, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_violating_rows"),
            F.expr(
                "(20000 * sum(CASE WHEN d > 1 THEN c ELSE 0 END) + sum(c))"
                " div (2 * sum(c))"
            )
            .cast("long")
            .alias("violation_bp"),
        ).select(
            F.lit(name).alias("fd"),
            "n_groups",
            "n_violating_groups",
            "n_violating_rows",
            "violation_bp",
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("fd")


@register(
    "agg_ks_two_sample",
    """
    WITH j AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS seg,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    g AS (
      SELECT nation, cents,
             SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS c2
      FROM j GROUP BY 1, 2
    ),
    w AS (
      SELECT nation,
             SUM(c1) OVER (PARTITION BY nation ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS cum1,
             SUM(c2) OVER (PARTITION BY nation ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS cum2,
             SUM(c1) OVER (PARTITION BY nation) AS n1,
             SUM(c2) OVER (PARTITION BY nation) AS n2
      FROM g
    )
    SELECT nation,
           CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
           CAST((2 * 10000 * MAX(ABS(cum1 * n2 - cum2 * n1))
                 + MAX(n1) * MAX(n2)) // (2 * MAX(n1) * MAX(n2)) AS BIGINT)
             AS ks_bp
    FROM w
    WHERE n1 > 0 AND n2 > 0
    GROUP BY nation
    ORDER BY nation
    """,
    doc="Exact two-sample Kolmogorov-Smirnov statistic per nation between "
    "the BUILDING and MACHINERY segments' order-value distributions — "
    "the distribution-equality test behind segment-drift monitoring "
    "(audit_distribution_drift's PSI needs bins; KS is bin-free). "
    "D = max_x |F1(x) − F2(x)| computed WITHOUT doubles: on the pooled "
    "per-value cumulative counts, |cum1·n2 − cum2·n1| is an exact "
    "integer whose maximum over the value grid is D·n1·n2; ks_bp "
    "converts once by half-up positive division. The fact rows reduce "
    "map-side to (nation, cents) pair counts, so the per-nation "
    "cumulative window runs over each nation's DISTINCT price grid "
    "(bounded by the cents domain, not the row count) — the honest "
    "footprint of a global-CDF statistic; broadcast-gated dim joins, "
    "shuffles keyed on nation.",
)
def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_nationkey", "c_mktsegment")
    )
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        o.join(_bcast_if_small(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(na), c.c_nationkey == na.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    g = j.groupBy("nation", "cents").agg(
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("seg") == "MACHINERY", 1).otherwise(0)).alias("c2"),
    )
    wo = Window.partitionBy("nation").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.partitionBy("nation")
    w = g.select(
        "nation",
        F.sum("c1").over(wo).alias("cum1"),
        F.sum("c2").over(wo).alias("cum2"),
        F.sum("c1").over(wa).alias("n1"),
        F.sum("c2").over(wa).alias("n2"),
    )
    return (
        w.where((F.col("n1") > 0) & (F.col("n2") > 0))
        .groupBy("nation")
        .agg(
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
            F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")))
            .cast("long")
            .alias("d_num"),
            F.expr(
                "(2 * 10000 * max(abs(cum1 * n2 - cum2 * n1)) + max(n1) * max(n2))"
                " div (2 * max(n1) * max(n2))"
            )
            .cast("long")
            .alias("ks_bp"),
        )
        .orderBy("nation")
    )


@register(
    "join_relational_division",
    """
    WITH pr AS (SELECT COUNT(DISTINCT o_orderpriority) AS np FROM orders),
    cov AS (
      SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS k
      FROM orders GROUP BY 1
    ),
    full_cov AS (
      SELECT o_custkey FROM cov WHERE k = (SELECT np FROM pr)
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_covering_customers,
           CAST(MIN(f.o_custkey) AS BIGINT) AS min_custkey
    FROM full_cov f
    JOIN customer c ON c.c_custkey = f.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1
    ORDER BY nation
    """,
    doc="Relational division (the 'for all' join the classic algebra names "
    "÷): customers whose orders span EVERY distinct order priority, "
    "rolled up per nation — the textbook 'suppliers who stock all "
    "parts' operator, absent from SQL as a primitive and expressed "
    "Spark-first as a per-divisor distinct count compared to the "
    "divisor's cardinality. The divisor size (5 priorities) crosses the "
    "driver as a literal (k-means-model pattern — a scalar subquery "
    "cross join would plan as BNLJ); the quotient is ONE group-by on "
    "custkey carrying a distinct-count, then broadcast-gated dim joins "
    "roll covering customers up to nations. Shuffles carry "
    "(custkey, priority-count) pairs, never order rows.",
)
def join_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    np = int(
        o.agg(F.countDistinct("o_orderpriority").alias("np")).first()["np"]
    )
    cov = (
        o.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("k"))
        .where(F.col("k") == F.lit(np))
        .select("o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cov.join(_bcast_if_small(c, sf_dir, "customer"), cov.o_custkey == c.c_custkey)
        .join(F.broadcast(na), c.c_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_covering_customers"),
            F.min("o_custkey").cast("long").alias("min_custkey"),
        )
        .orderBy("nation")
    )


@register(
    "text_bigram_perplexity",
    """
    WITH tok AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    big AS (
      SELECT doc_id, source,
             toks[i] AS w1, toks[i + 1] AS w2
      FROM tok CROSS JOIN (SELECT unnest(generate_series(1, 4096)) AS i) g
      WHERE i < len(toks)
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c FROM big
           WHERE doc_id % 2 = 0 GROUP BY 1, 2),
    c1 AS (SELECT w1, SUM(c) AS c FROM c2 GROUP BY 1),
    voc AS (
      SELECT COUNT(DISTINCT term) AS v FROM (
        SELECT unnest(toks) AS term FROM tok WHERE doc_id % 2 = 0
      )
    ),
    scored AS (
      SELECT b.source,
             LN((COALESCE(c2.c, 0) + 1.0)
                / (COALESCE(c1.c, 0) + (SELECT v FROM voc))) AS lp
      FROM big b
      LEFT JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
      LEFT JOIN c1 ON c1.w1 = b.w1
      WHERE b.doc_id % 2 = 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(-SUM(lp) / COUNT(*), 4) AS ce_nats
    FROM scored GROUP BY source ORDER BY source
    """,
    doc="Held-out bigram-LM cross-entropy per source — the real perplexity "
    "gate (text_unigram_logprob is the cheap tier): an add-one-smoothed "
    "bigram model trains on even doc_ids and scores the odd ones, so the "
    "score is honest generalization, not memorization. ln p(w2|w1) = "
    "ln((c(w1,w2)+1)/(c(w1·)+V)) with context counts REDUCED FROM the "
    "bigram frame (one tokenize pass per split; the materialized token "
    "array keeps element_at O(1) — the CLAUDE.md shingle discipline) and "
    "the vocabulary size crossing as a driver literal (k-means-model "
    "pattern). Unseen contexts coalesce to the uniform 1/V floor. "
    "Shuffles carry bigram/context counts keyed on token pairs, never "
    "document text; the model table is vocabulary-bounded at any corpus "
    "size. Docs are capped at 4097 tokens by the oracle's index grid "
    "(generous for the ~60-token corpus; a longer corpus raises the "
    "constant).",
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "source", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    big = toked.where(F.size("toks") >= 2).select(
        "doc_id",
        "source",
        F.expr(
            "explode(transform(sequence(1, size(toks) - 1),"
            " i -> struct(element_at(toks, i) AS w1,"
            " element_at(toks, i + 1) AS w2)))"
        ).alias("bg"),
    ).select("doc_id", "source", "bg.w1", "bg.w2")
    train = big.where(F.col("doc_id") % 2 == 0)
    c2 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2c"))
    c1 = c2.groupBy("w1").agg(F.sum("c2c").alias("c1c"))
    vocab = int(
        toked.where(F.col("doc_id") % 2 == 0)
        .select(F.explode("toks").alias("term"))
        .agg(F.countDistinct("term").alias("v"))
        .first()["v"]
    )
    test = big.where(F.col("doc_id") % 2 == 1)
    scored = (
        test.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            "source",
            F.log(
                (F.coalesce(F.col("c2c"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("c1c"), F.lit(0)) + F.lit(vocab))
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(-F.sum("lp") / F.count(F.lit(1)), 4).alias("ce_nats"),
        )
        .orderBy("source")
    )


_PI_ROUNDS = 3
_PI_SCALE = 100000  # loading resolution (1e5)
_PI_QUANT = 10000  # embedding component quantization (1e4)


def _pi_round_sql(i: int) -> str:
    prev = f"v{i - 1}"
    return f"""
    y{i} AS (
      SELECT g.d1 AS d, SUM(g.gv * v.v) AS y
      FROM gram g JOIN {prev} v ON v.d = g.d2
      GROUP BY 1
    ),
    m{i} AS (SELECT MAX(ABS(y)) AS m FROM y{i}),
    v{i} AS (
      SELECT d,
             (y + (SELECT m FROM m{i}))
               // ((SELECT m FROM m{i}) // {_PI_SCALE}) - {_PI_SCALE} AS v
      FROM y{i}
    )"""


@register(
    "sim_pca_power_iteration",
    f"""
    WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
    eq AS (
      SELECT e.vec_id, i.i AS d,
             CAST(FLOOR(CAST(e.embedding[i.i] AS DOUBLE) * {_PI_QUANT}
                        + 0.5) AS BIGINT) AS q
      FROM embeddings e CROSS JOIN dims i
    ),
    gram AS (
      SELECT a.d AS d1, b.d AS d2, SUM(a.q * b.q) AS gv
      FROM eq a JOIN eq b ON b.vec_id = a.vec_id
      GROUP BY 1, 2
    ),
    v0 AS (SELECT i AS d, {_PI_SCALE} AS v FROM dims),
    {",".join(_pi_round_sql(i) for i in range(1, _PI_ROUNDS + 1))}
    SELECT d - 1 AS dim, CAST(v AS BIGINT) AS loading_e5
    FROM v{_PI_ROUNDS} ORDER BY dim
    """,
    doc="Top principal direction of the embedding matrix by matrix-free "
    f"power iteration ({_PI_ROUNDS} rounds) — the embedding-space QA "
    "primitive behind anisotropy checks and whitening (a space whose "
    "top direction hoards the mass retrieves badly; compare "
    "agg_magnitude_histogram). Components quantize ONCE to exact "
    f"integer 1e-4 units, the 64×64 GRAM MATRIX reduces in a single "
    "corpus pass (per-row transform² explodes 4096 (d,d',q·q) terms "
    "that combine map-side — the wire carries ≤ dim² rows per "
    "partition, never the corpus), and every iteration is a "
    "dim²-bounded join-aggregate: y = G·v in pure long arithmetic "
    "(|q|≤6k, |v|≤1.1e5 ⇒ |y| < 64·|G|max·1.1e5, within int64 through "
    "sf1). Per-round renormalization divides by the driver-collected "
    "max|y| with the POSITIVITY SHIFT (y+M) div (M div 1e5) − 1e5 — "
    "y is signed and Spark div truncates where DuckDB // floors, so "
    "the shift keeps every numerator positive (CLAUDE.md trap). "
    "Uncentered PCA (top right-singular direction of the raw matrix); "
    "deterministic all-ones start, sign fixed by the iteration itself.",
)
def sim_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings", rebalance=True)
    gram = (
        emb.select(
            F.expr(
                f"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
                f" * {_PI_QUANT} + 0.5) AS BIGINT))"
            ).alias("qa")
        )
        .select(
            F.expr(
                "explode(flatten(transform(qa, (x1, i1) ->"
                " transform(qa, (x2, i2) ->"
                " struct(i1 + 1 AS d1, i2 + 1 AS d2, x1 * x2 AS p)))))"
            ).alias("t")
        )
        .groupBy(F.col("t.d1").alias("d1"), F.col("t.d2").alias("d2"))
        .agg(F.sum("t.p").alias("gv"))
        .localCheckpoint(eager=True)  # dim^2 rows; read every round
    )
    # 64-row loading frame, broadcast to every round's join
    rows = [(i, _PI_SCALE) for i in range(1, 65)]
    vdim = gram.sparkSession.createDataFrame(rows, "d INT, v LONG")
    for _ in range(_PI_ROUNDS):
        y = (
            gram.join(F.broadcast(vdim), vdim.d == gram.d2)
            .groupBy(F.col("d1").alias("dd"))
            .agg(F.sum(F.col("gv") * F.col("v")).alias("y"))
        ).localCheckpoint(eager=True)  # 64 rows
        m = int(y.agg(F.max(F.abs(F.col("y"))).alias("m")).first()["m"])
        assert m >= _PI_SCALE, "degenerate embedding matrix"
        # exact long arithmetic end to end: (y+M) div (M div 1e5) - 1e5 —
        # a double quotient here would lose ulps above 2^53 and drift
        # from the oracle's integer //
        vdim = y.select(
            F.col("dd").alias("d"),
            F.expr(f"((y + {m}L) div {m // _PI_SCALE}L) - {_PI_SCALE}")
            .cast("long")
            .alias("v"),
        )
    return vdim.select(
        (F.col("d") - 1).cast("long").alias("dim"),
        F.col("v").cast("long").alias("loading_e5"),
    ).orderBy("dim")


_PG_PERIODS = tuple(range(2, 11))
_PG_PI = "3.141592653589793"


@register(
    "ts_periodogram",
    f"""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS tot
      FROM events GROUP BY 1
    ),
    m AS (SELECT SUM(tot) // COUNT(*) AS fm FROM d),
    r AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t,
             tot - (SELECT fm FROM m) AS dev
      FROM d
    ),
    terms AS (
      SELECT p.p,
             SUM(dev * COS(2 * CAST({_PG_PI} AS DOUBLE)
                           * (t % p.p) / p.p)) AS c,
             SUM(dev * SIN(2 * CAST({_PG_PI} AS DOUBLE)
                           * (t % p.p) / p.p)) AS s
      FROM r CROSS JOIN (SELECT unnest([{", ".join(map(str, _PG_PERIODS))}])
                         AS p) p
      GROUP BY 1
    ),
    pw AS (SELECT p, c * c + s * s AS power FROM terms)
    SELECT CAST(p AS BIGINT) AS period,
           ROUND(power / SUM(power) OVER (), 4) AS power_share
    FROM pw ORDER BY period
    """,
    doc="Coarse periodogram of the daily-revenue series: spectral power at "
    "candidate periods 2..10 days as a share of total candidate power — "
    "the period DISCOVERY probe (ts_seasonal_strength tests the known "
    "weekly period by ANOVA; the DFT sweep finds unknown ones). The "
    "series demeans by the integer floor-mean (driver literal, "
    "non-negative values — the ts_autocorrelation discipline) so the DC "
    "component can't drown the spectrum; angles form as "
    "2π·(t mod p)/p with exact-integer t mod p, so both engines "
    "evaluate cos/sin on bit-identical arguments — the pi literal is "
    "CAST AS DOUBLE in the oracle because DuckDB parses bare decimal "
    "literals as DECIMAL and carries exact arithmetic into the "
    "division, drifting ulps from Spark's double path (the CLAUDE.md "
    "float-literal rule); the share ROUND(·,4) "
    "absorbs summation order (entropy-family discipline). One #days-"
    "bounded frame does everything after the daily reduce: the ×9 "
    "period explode combines map-side into 9 (cos, sin) pairs.",
)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("tot"))
        .localCheckpoint(eager=True)  # #days rows; read twice
    )
    fm = int(d.agg(F.expr("sum(tot) div count(*)").alias("fm")).first()["fm"])
    assert fm >= 0, "floor-mean relies on non-negative event values"
    r = d.select(
        F.row_number().over(Window.orderBy("day")).alias("t"),
        (F.col("tot") - F.lit(fm)).alias("dev"),
    )
    terms = (
        r.select(
            "t",
            "dev",
            F.explode(F.array(*[F.lit(p) for p in _PG_PERIODS])).alias("p"),
        )
        .groupBy("p")
        .agg(
            F.sum(
                F.col("dev")
                * F.cos(F.lit(2.0) * F.lit(float(_PG_PI)) * (F.col("t") % F.col("p")) / F.col("p"))
            ).alias("c"),
            F.sum(
                F.col("dev")
                * F.sin(F.lit(2.0) * F.lit(float(_PG_PI)) * (F.col("t") % F.col("p")) / F.col("p"))
            ).alias("s"),
        )
    )
    pw = terms.select("p", (F.col("c") * F.col("c") + F.col("s") * F.col("s")).alias("power"))
    return pw.select(
        F.col("p").cast("long").alias("period"),
        F.round(F.col("power") / F.sum("power").over(Window.partitionBy()), 4).alias(
            "power_share"
        ),
    ).orderBy("period")


@register(
    "window_rolling_median",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             MEDIAN(cents) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS med
      FROM daily
    )
    SELECT event_type, CAST(day AS DATE) AS day,
           CAST(med AS BIGINT) AS med_cents
    FROM w WHERE rn >= 7
    ORDER BY event_type, day
    """,
    doc="Trailing 7-day rolling MEDIAN of daily revenue per event type — "
    "the robust smoother a monitoring pipeline overlays on spiky "
    "series (window_ewma_smoothing follows spikes; the rolling median "
    "ignores up to 3 outlier days entirely). Only FULL windows emit "
    "(rn ≥ 7), so every median sees exactly 7 integers — an odd count "
    "— and both engines' interpolating quantile returns the exact "
    "middle element, no interpolation ambiguity (cast back to exact "
    "cents). One (type, day) reduce feeds one per-type ordered window; "
    "frames are #days-per-type-bounded at any corpus size.",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    w = daily.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("rn"),
        F.expr("percentile(cents, 0.5)")
        .over(wo.rowsBetween(-6, 0))
        .alias("med"),
    )
    return (
        w.where(F.col("rn") >= 7)
        .select(
            "event_type",
            F.col("day").cast("date").alias("day"),
            F.col("med").cast("long").alias("med_cents"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "agg_qq_deciles",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    ),
    rk AS (
      SELECT seg, cents,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY seg) AS n
      FROM j
    ),
    cuts AS (
      SELECT d.d AS decile, rk.seg, rk.cents
      FROM rk CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) d
      WHERE rk.rn = (d.d * rk.n + 9) // 10
    )
    SELECT decile,
           CAST(MAX(CASE WHEN seg = 'BUILDING' THEN cents END) AS BIGINT)
             AS building_cents,
           CAST(MAX(CASE WHEN seg = 'MACHINERY' THEN cents END) AS BIGINT)
             AS machinery_cents,
           CAST((2 * 10000 * MAX(CASE WHEN seg = 'MACHINERY' THEN cents END)
                 + MAX(CASE WHEN seg = 'BUILDING' THEN cents END))
                // (2 * MAX(CASE WHEN seg = 'BUILDING' THEN cents END))
                - 10000 AS BIGINT) AS gap_bp
    FROM cuts GROUP BY decile ORDER BY decile
    """,
    doc="Quantile-quantile table between the BUILDING and MACHINERY "
    "segments' order values: the exact ceil(d·n/10)-th order statistic "
    "of each distribution at deciles 1..9, side by side — WHERE the "
    "distributions diverge, where agg_ks_two_sample says THAT they do. "
    "Order statistics are exact integer cents selected by rank "
    "((d·n+9) div 10, positive integers both engines; duplicate values "
    "share ranks harmlessly since the value at a rank is tie-invariant); "
    "the gap is a ratio in signed bp via the POSITIVITY-SHIFT form "
    "(2·10⁴·m + b) div (2·b) − 10⁴ — a direct difference numerator "
    "goes negative where machinery runs cheaper and Spark's truncating "
    "div would disagree with DuckDB's flooring //. The per-segment "
    "ranking window is the honest order-statistic cost (pre-aggregate "
    "the cents grid to bound it at scale, as agg_ks_two_sample does).",
)
def agg_qq_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )
    j = o.join(_bcast_if_small(c, sf_dir, "customer"), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    ws = Window.partitionBy("seg")
    rk = j.select(
        "seg",
        "cents",
        F.row_number().over(ws.orderBy("cents")).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    cuts = rk.select(
        "seg",
        "cents",
        "rn",
        "n",
        F.explode(F.array(*[F.lit(i) for i in range(1, 10)])).alias("decile"),
    ).where(F.expr("rn = (decile * n + 9) div 10"))
    return (
        cuts.groupBy("decile")
        .agg(
            F.max(F.when(F.col("seg") == "BUILDING", F.col("cents")))
            .cast("long")
            .alias("building_cents"),
            F.max(F.when(F.col("seg") == "MACHINERY", F.col("cents")))
            .cast("long")
            .alias("machinery_cents"),
            F.expr(
                "(2 * 10000 * max(CASE WHEN seg = 'MACHINERY' THEN cents END)"
                " + max(CASE WHEN seg = 'BUILDING' THEN cents END))"
                " div (2 * max(CASE WHEN seg = 'BUILDING' THEN cents END))"
                " - 10000"
            )
            .cast("long")
            .alias("gap_bp"),
        )
        .orderBy("decile")
    )
