"""Training-data pipeline queries: text analysis, dedup, similarity search,
multimodal plumbing — the driver-mandated extensions (SURVEY §2.3).

Every oracle replicates the Spark computation arithmetically (same md5-based
hashing, same rounding, same tie-breaks) so the value-hash compare is exact.
The gnarlier oracles (SimHash bit extraction, MinHash banding) are generated
programmatically to keep the two sides provably in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import dedup as D
from kinesis_stream_consumer_spark.operators import sketches as SK
from kinesis_stream_consumer_spark.operators import multimodal as M
from kinesis_stream_consumer_spark.operators import similarity as S
from kinesis_stream_consumer_spark.operators import text as T
from kinesis_stream_consumer_spark.functions.numeric import round_half_up
from kinesis_stream_consumer_spark.plans.queries import (
    QUERIES,
    _bcast_if_small,
    _t,
    _table_row_count,
    register,
)

# Shared SQL fragments ------------------------------------------------------

_TOKS = r"regexp_split_to_array(trim(text), '\s+')"
_SHINGLE_ROWS = f"""
  tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
  pos AS (SELECT doc_id, toks,
                 unnest(generate_series(1, GREATEST(len(toks)-2, 1))) AS i
          FROM tok),
  sh  AS (SELECT DISTINCT doc_id,
                 concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
          FROM pos)
"""
_EN_STOP = "('the','and','of','to','in','is','that','for','with','as')"


# --- Text analysis ----------------------------------------------------------

@register(
    "text_quality",
    f"""
    WITH feats AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             len({_TOKS}) AS n_tokens,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(list_filter({_TOKS.replace("text", "lower(text)")},
                             t -> t IN {_EN_STOP})) AS n_stop
      FROM documents
    ), ratios AS (
      SELECT doc_id, n_chars, n_tokens,
             FLOOR(((n_chars - (n_tokens - 1)) / n_tokens) * 10000.0 + 0.5) / 10000.0 AS avg_token_len,
             FLOOR((n_punct / GREATEST(n_chars, 1)) * 10000.0 + 0.5) / 10000.0        AS punct_ratio,
             FLOOR((n_stop / GREATEST(n_tokens, 1)) * 10000.0 + 0.5) / 10000.0        AS stopword_ratio
      FROM feats
    )
    SELECT doc_id, n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
           FLOOR((0.5 * LEAST(n_tokens / 20.0, 1.0)
                + 0.5 * LEAST(stopword_ratio * 5.0, 1.0)
                - 0.25 * LEAST(punct_ratio * 5.0, 1.0)) * 10000.0 + 0.5) / 10000.0 AS quality_score
    FROM ratios
    ORDER BY doc_id
    """,
    doc="Quality scoring from length/punctuation/stopword ratios — the "
    "cheap-filter stage of a training-data pipeline, all JVM-side.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    feats = T.quality_features(t)
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        T.quality_score(t).alias("quality_score"),
    ).orderBy("doc_id")


@register(
    "text_repetition",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    uni AS (SELECT doc_id, 0 AS kind, unnest(toks) AS gram FROM tok),
    big AS (SELECT doc_id, 1 AS kind, concat(toks[i], ' ', toks[i+1]) AS gram
            FROM (SELECT doc_id, toks,
                         unnest(generate_series(1, len(toks) - 1)) AS i
                  FROM tok)),
    cnts AS (SELECT doc_id, kind, gram, COUNT(*) AS c
             FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)
             GROUP BY doc_id, kind, gram),
    stats AS (SELECT doc_id, kind, MAX(c) AS mx, SUM(c) AS tot,
                     COALESCE(SUM(c) FILTER (WHERE c >= 2), 0) AS dup
              FROM cnts GROUP BY doc_id, kind),
    ratios AS (
      SELECT doc_id,
             FLOOR((MAX(CASE WHEN kind = 0 THEN mx END)::DOUBLE
                    / MAX(CASE WHEN kind = 0 THEN tot END)) * 10000.0 + 0.5)
               / 10000.0 AS top_unigram_ratio,
             FLOOR((COALESCE(MAX(CASE WHEN kind = 1 THEN dup END)::DOUBLE
                    / GREATEST(MAX(CASE WHEN kind = 1 THEN tot END), 1), 0))
                    * 10000.0 + 0.5) / 10000.0 AS dup_bigram_frac
      FROM stats GROUP BY doc_id
    )
    SELECT doc_id, top_unigram_ratio, dup_bigram_frac,
           (top_unigram_ratio > CAST({T.REPETITION_TOP_UNIGRAM_MAX!r} AS DOUBLE)
            OR dup_bigram_frac > CAST({T.REPETITION_DUP_BIGRAM_MAX!r} AS DOUBLE))
             AS is_repetitive
    FROM ratios ORDER BY doc_id
    """,
    doc="Gopher-style repetition quality filter (Rae et al. 2021 A1.1): "
    "most-frequent-word ratio and fraction of tokens inside repeated "
    "bigrams, flagged against representative thresholds. Occurrence "
    "counts (not distinct sets), built from ONE materialized token array "
    "per doc — bigrams via an array transform, no window function — then "
    "two slim hash shuffles keyed (doc, kind, gram) and (doc, kind) with "
    "map-side combine: linear at any corpus size.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    grams = T.repetition_gram_rows(docs, "text", "doc_id")
    cnts = grams.groupBy("doc", "kind", "gram").agg(F.count(F.lit(1)).alias("c"))
    stats = cnts.groupBy("doc", "kind").agg(
        F.max("c").alias("mx"),
        F.sum("c").alias("tot"),
        F.coalesce(F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)).alias("dup"),
    )
    uni = F.when(F.col("kind") == 0, F.col("mx"))
    uni_tot = F.when(F.col("kind") == 0, F.col("tot"))
    dup = F.when(F.col("kind") == 1, F.col("dup"))
    big_tot = F.when(F.col("kind") == 1, F.col("tot"))
    ratios = stats.groupBy(F.col("doc").alias("doc_id")).agg(
        round_half_up(F.max(uni) / F.max(uni_tot)).alias("top_unigram_ratio"),
        round_half_up(
            F.coalesce(F.max(dup) / F.greatest(F.max(big_tot), F.lit(1)), F.lit(0.0))
        ).alias("dup_bigram_frac"),
    )
    return ratios.select(
        "doc_id",
        "top_unigram_ratio",
        "dup_bigram_frac",
        (
            (F.col("top_unigram_ratio") > T.REPETITION_TOP_UNIGRAM_MAX)
            | (F.col("dup_bigram_frac") > T.REPETITION_DUP_BIGRAM_MAX)
        ).alias("is_repetitive"),
    ).orderBy("doc_id")


def _langid_oracle() -> str:
    hits = {
        lang: "len(list_filter({toks}, t -> t IN ({words})))".format(
            toks=_TOKS.replace("text", "lower(text)"),
            words=",".join(f"'{w}'" for w in words),
        )
        for lang, words in T.LANG_STOPWORDS.items()
    }
    best = "GREATEST({})".format(", ".join(f"h_{lang}" for lang in hits))
    cases = " ".join(
        f"WHEN h_{lang} > 0 AND h_{lang} = best THEN '{lang}'" for lang in hits
    )
    hit_cols = ", ".join(f"{expr} AS h_{lang}" for lang, expr in hits.items())
    return f"""
    WITH h AS (SELECT doc_id, lang, {hit_cols} FROM documents),
    b AS (SELECT *, {best} AS best FROM h)
    SELECT doc_id, lang AS labeled_lang,
           CASE {cases} ELSE 'und' END AS predicted_lang
    FROM b ORDER BY doc_id
    """


@register(
    "text_unigram_logprob",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    t AS (SELECT doc_id, unnest(toks) AS term FROM tok),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    lm AS (SELECT term, COUNT(*) AS cnt FROM t GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total, COUNT(*) AS vocab FROM lm)
    SELECT tf.doc_id,
           ROUND(SUM(tf.tf * LN((lm.cnt + 1.0) / (tot.total + tot.vocab)))
                 / SUM(tf.tf), 4) AS mean_logprob,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens
    FROM tf JOIN lm USING (term) CROSS JOIN tot
    GROUP BY tf.doc_id
    ORDER BY tf.doc_id
    """,
    doc="Unigram-LM fluency score (the cheap stand-in for perplexity "
    "filtering): train an add-one-smoothed unigram model on the corpus "
    "itself, score each doc by its mean token log-probability. Two passes "
    "over one tokenization: (doc, term) counts shuffle once; the model is "
    "a slim (term, cnt) table joined back on term; the scalar "
    "(total, vocab) pair broadcasts. Low scores flag gibberish/rare-token "
    "docs exactly as a KenLM perplexity gate would at 100 TB.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # The trained model: a slim (term, cnt) table. Checkpoint it once so
    # the normalizer aggregate and the scoring join don't each re-run the
    # tokenize+count pass, then pull the TWO-value normalizer (total mass,
    # vocab size) through the driver as literals — the same "only the
    # model's scalars cross the driver" shape as the k-means trainer.
    # (A crossJoin(broadcast(1-row-agg)) plans as BroadcastNestedLoopJoin
    # — banned by the plan-hygiene gate — and Catalyst folds literal equi
    # keys back into one.)
    lm = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt")).localCheckpoint(
        eager=True
    )
    tot = lm.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    ).first()
    denom = float(tot["total"] + tot["vocab"])
    return (
        tf.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log((F.col("cnt") + 1.0) / denom))
                / F.sum("tf"),
                4,
            ).alias("mean_logprob"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


# --- Deduplication ----------------------------------------------------------

def _minhash_cols_sql() -> str:
    return ",\n             ".join(
        f"MIN(CAST(((md5_number_upper(shingle) >> 8) * {a} + {b}) "
        f"% {D.MINHASH_P} AS BIGINT)) AS mh{i}"
        for i, (a, b) in enumerate(D.MINHASH_PERMS)
    )


def _minhash_lsh_oracle() -> str:
    bands = " , ".join(
        f"mh{2*b}::VARCHAR || '#' || mh{2*b+1}::VARCHAR AS b{b}" for b in range(4)
    )
    cond = " OR ".join(f"l.b{b} = r.b{b}" for b in range(4))
    return f"""
    WITH {_SHINGLE_ROWS},
    sigs AS (
      SELECT doc_id, {_minhash_cols_sql()}
      FROM sh GROUP BY doc_id
    ),
    banded AS (SELECT doc_id, {bands} FROM sigs),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM banded l JOIN banded r ON l.doc_id < r.doc_id AND ({cond})
    ),
    shsets AS (SELECT doc_id, list(DISTINCT shingle) AS shset FROM sh GROUP BY doc_id)
    SELECT doc_a, doc_b,
           ROUND(len(list_intersect(sa.shset, sb.shset))
                 / GREATEST(len(list_distinct(list_cat(sa.shset, sb.shset))), 1), 4)
             AS jaccard_sim
    FROM cand
    JOIN shsets sa ON sa.doc_id = doc_a
    JOIN shsets sb ON sb.doc_id = doc_b
    ORDER BY doc_a, doc_b
    """


@register(
    "dedup_minhash_lsh",
    _minhash_lsh_oracle(),
    doc="MinHash+LSH near-dup candidate pairs: band the 8-hash signature into "
    "4 bands of 2; docs sharing any band collide. Spark plan: "
    "signature (map-side) → explode bands → self-EQUI-join on band key → "
    "distinct pairs → verify with exact shingle Jaccard. The shuffle is on "
    "band hashes (uniform), and no O(n²) cross product ever materializes — "
    "the 100 TB dedup path.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: the pipeline CHECKPOINTS the shingle sets, so a
    # single-row-group scan's 1-partition layout would be frozen into the
    # checkpoint and every downstream stage (signature agg, band join,
    # Jaccard verify) stays single-task — unlike pure-aggregate paths
    # where the first exchange restores parallelism (A/B: 1.65s vs 1.86s
    # median at sf0.1).
    docs = _t(spark, sf_dir, "documents", rebalance=True)
    return D.minhash_lsh_candidate_pairs(docs, "text", "doc_id", 3, 2).orderBy(
        "doc_a", "doc_b"
    )


def _incremental_lsh_oracle() -> str:
    bands = " , ".join(
        f"mh{2*b}::VARCHAR || '#' || mh{2*b+1}::VARCHAR AS b{b}" for b in range(4)
    )
    cond = " OR ".join(f"l.b{b} = r.b{b}" for b in range(4))
    return f"""
    WITH {_SHINGLE_ROWS},
    sigs AS (
      SELECT doc_id, {_minhash_cols_sql()}
      FROM sh GROUP BY doc_id
    ),
    banded AS (SELECT doc_id, {bands} FROM sigs),
    cand AS (
      SELECT DISTINCT r.doc_id AS new_doc, l.doc_id AS match_doc,
             CAST(l.doc_id % 10 = 0 AS INT) AS match_is_new
      FROM banded l JOIN banded r
        ON l.doc_id != r.doc_id AND ({cond})
      WHERE r.doc_id % 10 = 0
    ),
    shsets AS (SELECT doc_id, list(DISTINCT shingle) AS shset FROM sh GROUP BY doc_id)
    SELECT new_doc, match_doc, match_is_new,
           ROUND(len(list_intersect(sa.shset, sb.shset))
                 / GREATEST(len(list_distinct(list_cat(sa.shset, sb.shset))), 1), 4)
             AS jaccard_sim
    FROM cand
    JOIN shsets sa ON sa.doc_id = new_doc
    JOIN shsets sb ON sb.doc_id = match_doc
    ORDER BY new_doc, match_doc
    """


@register(
    "dedup_cluster_components",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_lsh_oracle().rsplit("ORDER BY", 1)[0]}),
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      WHERE jaccard_sim >= CAST(0.8 AS DOUBLE)
      UNION
      SELECT doc_b, doc_a FROM pairs
      WHERE jaccard_sim >= CAST(0.8 AS DOUBLE)
    ),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d AS node, r.lab FROM reach r JOIN edges e ON e.s = r.node
    )
    SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
    FROM reach GROUP BY node
    ORDER BY doc_id
    """,
    doc="Transitive duplicate clusters: connected components over the "
    "verified (Jaccard ≥ 0.8) MinHash-LSH pair graph, component id = "
    "smallest member. Pairwise matches chain — A≈B, B≈C puts {{A,B,C}} in "
    "one group even when A,C never collide in any band — and dedup keeps "
    "one doc per COMPONENT, not per pair. Spark runs min-label "
    "propagation to the fixpoint (slim checkpointed edges, one node-keyed "
    "shuffle per round, rounds = graph diameter — near-dup components are "
    "clique-ish so it converges in a few); the oracle's recursive CTE "
    "reaches the identical fixpoint by construction.",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_candidate_pairs(
        docs, "text", "doc_id", 3, 2, threshold=0.8
    )
    return (
        D.connected_components(pairs)
        .select(F.col("node").alias("doc_id"), "component_id")
        .orderBy("doc_id")
    )


def _components_ctes() -> str:
    """Shared recursive-CTE chain for the duplicate-cluster queries:
    verified LSH pairs → bidirectional edges → min-label fixpoint →
    ``comp(node, component_id)``."""
    return f"""pairs AS ({_minhash_lsh_oracle().rsplit("ORDER BY", 1)[0]}),
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      WHERE jaccard_sim >= CAST(0.8 AS DOUBLE)
      UNION
      SELECT doc_b, doc_a FROM pairs
      WHERE jaccard_sim >= CAST(0.8 AS DOUBLE)
    ),
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d AS node, r.lab FROM reach r JOIN edges e ON e.s = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS component_id FROM reach GROUP BY node)"""


@register(
    "dedup_levenshtein",
    f"""
    WITH cand AS ({_minhash_lsh_oracle().rsplit("ORDER BY", 1)[0]})
    SELECT doc_a, doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
           ROUND(levenshtein(da.text, db.text)
                 / GREATEST(LENGTH(da.text), LENGTH(db.text), 1), 4)
             AS edit_ratio
    FROM cand
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
    WHERE ROUND(levenshtein(da.text, db.text)
                / GREATEST(LENGTH(da.text), LENGTH(db.text), 1), 4)
          <= CAST(0.2 AS DOUBLE)
    ORDER BY doc_a, doc_b
    """,
    doc="Edit-distance near-dup verification: Levenshtein over the "
    "MinHash-LSH candidate pairs only — the character-level complement to "
    "shingle Jaccard (catches small in-place edits that shift every "
    "shingle). O(len²) edit distance is affordable precisely because "
    "banding already cut candidates to near-linear; running it all-pairs "
    "would be the scale mistake. Normalized ratio ≤ 0.2 keeps true "
    "near-dups; both engines implement the same unit-cost DP.",
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cand = D.minhash_lsh_candidate_pairs(docs, "text", "doc_id", 3, 2).select(
        "doc_a", "doc_b"
    )
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    lev = F.levenshtein("ta", "tb")
    ratio = F.round(
        lev / F.greatest(F.length("ta"), F.length("tb"), F.lit(1)), 4
    )
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("edit_dist"),
            ratio.alias("edit_ratio"),
        )
        .where(F.col("edit_ratio") <= 0.2)
        .orderBy("doc_a", "doc_b")
    )


def _simhash_oracle() -> str:
    bit_terms = []
    for b in range(32):
        d, shift = b // 4 + 1, b % 4
        vote = (
            f"(((strpos('0123456789abcdef', substr(md5(shingle), {d}, 1)) - 1)"
            f" // {2 ** shift}) % 2) * 2 - 1"
        )
        bit_terms.append(
            f"CASE WHEN SUM({vote}) > 0 THEN CAST({2 ** b} AS BIGINT) ELSE 0 END"
        )
    fp = " + ".join(bit_terms)
    return f"""
    WITH {_SHINGLE_ROWS}
    SELECT doc_id, {fp} AS simhash
    FROM sh GROUP BY doc_id ORDER BY doc_id
    """

def _ngram_jaccard_oracle() -> str:
    # band keys fold the language into every band hash — same plan as the
    # Spark side: language-aware LSH candidates, never a lang-only join
    bands = " , ".join(
        f"mh{2*b}::VARCHAR || '#' || mh{2*b+1}::VARCHAR || '#' || lang AS b{b}"
        for b in range(4)
    )
    cond = " OR ".join(f"l.b{b} = r.b{b}" for b in range(4))
    return f"""
    WITH {_SHINGLE_ROWS},
    sigs AS (
      SELECT doc_id, {_minhash_cols_sql()}
      FROM sh GROUP BY doc_id
    ),
    banded AS (SELECT s.doc_id, {bands}
               FROM sigs s JOIN documents USING (doc_id)),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM banded l JOIN banded r ON l.doc_id < r.doc_id AND ({cond})
    ),
    shsets AS (SELECT doc_id, list(DISTINCT shingle) AS shset FROM sh GROUP BY doc_id)
    SELECT doc_a, doc_b,
           ROUND(len(list_intersect(sa.shset, sb.shset))
                 / GREATEST(len(list_distinct(list_cat(sa.shset, sb.shset))), 1), 4)
             AS jaccard_sim
    FROM cand
    JOIN shsets sa ON sa.doc_id = doc_a
    JOIN shsets sb ON sb.doc_id = doc_b
    WHERE len(list_intersect(sa.shset, sb.shset))
          / GREATEST(len(list_distinct(list_cat(sa.shset, sb.shset))), 1) >= 0.2
    ORDER BY doc_a, doc_b
    """


# --- Similarity search ------------------------------------------------------

_DIM = 64  # embedding dimensionality of the driver's embeddings table


@register(
    "sim_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    norms AS (
      SELECT vec_id, sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY vec_id
    ),
    dots AS (
      SELECT q.vec_id AS query_id, e.vec_id AS match_id,
             SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)) AS dp
      FROM q JOIN embeddings e ON e.vec_id != q.vec_id
      CROSS JOIN (SELECT unnest(generate_series(1, {_DIM})) AS i) dims
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, match_id,
             ROUND(dp / (nq.nrm * nm.nrm), 4) AS cosine_sim
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nm ON nm.vec_id = match_id
    )
    SELECT query_id, match_id, cosine_sim, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, match_id) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
    doc="Exact cosine top-k (brute force baseline): broadcast the query set, "
    "score map-side over the corpus partitions, per-query window top-k. The "
    "corpus never shuffles; dot products via zip_with/aggregate (JVM, no UDF).",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: every corpus row does k dot products map-side with NO
    # downstream exchange before the per-partition top-k — the one shape
    # where the single-row-group scan pins all the CPU to one task
    # (measured +38% without it at sf0.1/local[32]).
    emb = _t(spark, sf_dir, "embeddings", rebalance=True)
    queries = emb.where(F.col("vec_id") < 10)
    return S.brute_force_topk(emb, queries, k=5).orderBy("query_id", "rnk")


# Trained-model cache: a production index is trained ONCE and queried many
# times, but the registry's queries are self-contained — without a cache
# every trained-index query (k-means cells, IVF, PQ-ADC, IVF-PQ, semantic
# dedup) re-runs the identical Lloyd training in the same session. Keyed by
# (session, sf_dir, params); values are checkpointed slim model/assignment
# frames, so reuse is a checkpoint read. Results are bit-identical either
# way (training is deterministic) — this only removes repeated work.
_MODEL_CACHE: dict = {}

# Wall-clock of each model-cache MISS (train/build/collect), keyed by the
# cache kind — bench.py reads these to attribute a trained-index entry's
# first-invocation cost to its build phases (VERDICT r6 #1: the r6 pack
# shuffle hid inside sim_pq_adc_topk's train mark with no way to see it).
BUILD_MARKS: dict[str, float] = {}


def _mark(kind: str, t0: float) -> None:
    import time

    BUILD_MARKS[kind] = round(time.perf_counter() - t0, 3)


def _now() -> float:
    import time

    return time.perf_counter()


def _train_mod(sf_dir: str, k: int) -> int:
    """Deterministic training-sample modulus from table stats (footer row
    count locally, catalog/ANALYZE at scale) — the Spark-side twin of the
    oracles' ``GREATEST(1, COUNT(*) // (per·k))`` CTE."""
    return S.train_sample_modulus(_table_row_count(sf_dir, "embeddings"), k)


def _coarse_model(spark: SparkSession, sf_dir: str, k: int | None = None,
                  n_iter: int | None = None):
    k = _KMEANS_K if k is None else k
    n_iter = _KMEANS_ITER if n_iter is None else n_iter
    key = ("kmeans", spark.sparkContext.applicationId, sf_dir, k, n_iter)
    hit = _MODEL_CACHE.get(key)
    if hit is None:
        # no rebalance (A/B r5): the assignment pass DOES fuse onto the
        # single-row-group scan, but at embeddings' row budget the
        # explode+broadcast-join is too cheap to repay the full-row
        # exchange (0.47s vs 0.72s steady) — the shuffle-to-agg exchange
        # restores width anyway.
        emb = _t(spark, sf_dir, "embeddings")
        t0 = _now()
        fit, cents = S.kmeans_fit_quantized(
            emb, k, n_iter, return_model=True,
            sample_mod=_train_mod(sf_dir, k),
        )
        t1 = _now()
        hit = (fit.localCheckpoint(eager=True), cents)
        # Keyed per k AND split into sub-phases (VERDICT r7 #1: the k=32
        # miss used to OVERWRITE the k=16 mark, and the lumped number let
        # a 1.8× host-drift smear ship with no way to see which phase
        # moved). assign_ckpt = the full-corpus assignment job the eager
        # checkpoint runs; collect/lloyd come from the fit itself.
        _mark(f"kmeans_train_k{k}", t0)
        BUILD_MARKS[f"kmeans_train_k{k}_sample_collect"] = S.FIT_MARKS.get(
            "sample_collect", 0.0
        )
        BUILD_MARKS[f"kmeans_train_k{k}_lloyd"] = S.FIT_MARKS.get("lloyd", 0.0)
        _mark(f"kmeans_train_k{k}_assign_ckpt", t1)
        _MODEL_CACHE[key] = hit
    return hit


def _pq_model(spark: SparkSession, sf_dir: str):
    """Session-cached PQ model: (packed_codes, codebooks). The corpus is
    encoded PACKED in one fused dataflow (pq_fit(pack=True) — the
    per-(vid, sub) argmin and the pack shuffle collapse into a single
    vid-keyed HashAggregate), so the one checkpoint here IS the serving
    layout; there is no intermediate (vid, sub, code) frame and no
    separate pack phase to charge anywhere (VERDICT r6 #1)."""
    key = ("pq", spark.sparkContext.applicationId, sf_dir, _PQ_M, _PQ_K, _PQ_ITER)
    hit = _MODEL_CACHE.get(key)
    if hit is None:
        # no rebalance — same A/B verdict as _coarse_model
        emb = _t(spark, sf_dir, "embeddings")
        t0 = _now()
        packed, cents = S.pq_fit(
            emb, _PQ_M, _PQ_K, _PQ_ITER,
            sample_mod=_train_mod(sf_dir, _PQ_K), pack=True,
        )
        t1 = _now()
        hit = (packed.localCheckpoint(eager=True), cents)
        _mark("pq_train_encode_pack", t0)
        BUILD_MARKS["pq_train_sample_collect"] = S.FIT_MARKS.get(
            "sample_collect", 0.0
        )
        BUILD_MARKS["pq_train_lloyd"] = S.FIT_MARKS.get("lloyd", 0.0)
        _mark("pq_train_encode_pack_ckpt", t1)
        _MODEL_CACHE[key] = hit
    return hit


def _pq_model_rows(spark: SparkSession, sf_dir: str):
    """Session-cached collected PQ codebook rows — the codebook originates
    DRIVER-SIDE in pq_fit, so serving paths should never pay a collect
    job per query batch to get it back."""
    key = ("pq_rows", spark.sparkContext.applicationId, sf_dir)
    hit = _MODEL_CACHE.get(key)
    if hit is None:
        t0 = _now()
        cents = _pq_model(spark, sf_dir)[1]
        # the codebook originated driver-side in pq_fit and rides the
        # frame as .model_rows — identical to what collect() returns,
        # minus the round-trip job (r15; collect kept as the fallback
        # for frames that crossed a boundary that drops the attribute)
        hit = getattr(cents, "model_rows", None) or cents.collect()
        _mark("pq_rows_collect", t0)
        _MODEL_CACHE[key] = hit
    return hit


def _coarse_model_rows(spark: SparkSession, sf_dir: str):
    """Session-cached collected coarse-centroid rows (same rationale)."""
    key = ("kmeans_rows", spark.sparkContext.applicationId, sf_dir)
    hit = _MODEL_CACHE.get(key)
    if hit is None:
        t0 = _now()
        cents = _coarse_model(spark, sf_dir)[1]
        # same as _pq_model_rows: the rows ride the frame from the fit
        hit = getattr(cents, "model_rows", None) or cents.collect()
        _mark("kmeans_rows_collect", t0)
        _MODEL_CACHE[key] = hit
    return hit


def _sim_qrows(spark: SparkSession, sf_dir: str):
    """Session-cached quantized query vectors for the fixed ANN query
    workload (vec_id < 10): one collect job per session, reused by every
    ADC/IVF-PQ query batch."""
    key = ("sim_qrows", spark.sparkContext.applicationId, sf_dir)
    hit = _MODEL_CACHE.get(key)
    if hit is None:
        emb = _t(spark, sf_dir, "embeddings")
        t0 = _now()
        hit = S.quantized_vector_arrays(
            emb.where(F.col("vec_id") < 10)
        ).select(
            F.col("vid").alias("query_id"), F.col("qarr").alias("qvec")
        ).collect()
        _mark("qrows_collect", t0)
        _MODEL_CACHE[key] = hit
    return hit


def _packed_codes(spark: SparkSession, sf_dir: str):
    """Packed PQ codes (vid, carr): since the r7 fused encode+pack the
    model cache's code frame IS the packed layout — this is a view onto
    _pq_model, kept as the named seam every ADC/IVF-PQ call site uses."""
    return _pq_model(spark, sf_dir)[0]


def _ivfpq_index(spark: SparkSession, sf_dir: str):
    """Session-cached IVF-PQ index: cell-keyed inverted lists + both model
    tables as driver-side rows (see S.ivfpq_build_index). Built ONCE from
    the cached coarse/PQ models; every query batch after that runs with
    zero model exchanges."""
    key = ("ivfpq", spark.sparkContext.applicationId, sf_dir)
    hit = _MODEL_CACHE.get(key)
    if hit is None:
        t0 = _now()
        hit = S.ivfpq_build_index(
            _t(spark, sf_dir, "embeddings"),
            coarse=(*_coarse_model(spark, sf_dir),
                    _coarse_model_rows(spark, sf_dir)),
            pq=(*_pq_model(spark, sf_dir), _pq_model_rows(spark, sf_dir)),
            packed=_packed_codes(spark, sf_dir),
        )
        _mark("ivfpq_build", t0)
        _MODEL_CACHE[key] = hit
    return hit


_KMEANS_K = 8
_KMEANS_ITER = 2


def _kmeans_ctes(k: int = _KMEANS_K, n_iter: int = _KMEANS_ITER,
                 per_cent: int | None = None) -> str:
    """The Lloyd-iteration CTE chain shared by the sim_kmeans_cells oracle
    and the trained-IVF oracle: quantize → deterministic id-modulus
    training sample (``sm.s = GREATEST(1, COUNT(*) // (per_cent·k))`` —
    the SQL twin of operators.similarity.train_sample_modulus) → init
    from the k smallest TRAINING ids → n_iter × (distance, argmin-assign,
    half-up integer centroid update) over the sample → final assignment
    ``fa(vid, cell, dist)`` over the FULL corpus. One CTE pair per
    iteration, generated so Spark and SQL are provably the same
    computation. All arithmetic is integer-exact (see
    operators.similarity.kmeans_fit_quantized), so downstream consumers
    hash-check a TRAINED clustering, not a float coincidence."""
    sc = S.KMEANS_QUANT_SCALE
    per = S.TRAIN_POINTS_PER_CENTROID if per_cent is None else per_cent
    parts = [
        f"""q AS (
      SELECT vec_id AS vid, i - 1 AS pos,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {sc} + 0.5) AS BIGINT) AS qx
      FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, {_DIM})) AS i) d
    ),
    sm AS (SELECT GREATEST(1, COUNT(*) // {per * k}) AS s FROM embeddings),
    qt AS (SELECT q.* FROM q, sm WHERE q.vid % sm.s = 0),
    c0 AS (SELECT CAST(q.vid // sm.s AS INT) AS cell, q.pos, q.qx AS qc
           FROM q, sm WHERE q.vid % sm.s = 0 AND q.vid < {k} * sm.s)"""
    ]
    prev = "c0"
    for it in range(1, n_iter + 1):
        parts.append(f"""d{it} AS (
      SELECT q.vid, c.cell, SUM((q.qx - c.qc) * (q.qx - c.qc)) AS dist
      FROM qt q JOIN {prev} c ON c.pos = q.pos GROUP BY q.vid, c.cell
    ),
    a{it} AS (
      SELECT vid, cell, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cell) AS rn
        FROM d{it}) WHERE rn = 1
    ),
    u{it} AS (
      SELECT a.cell, q.pos,
             CAST(FLOOR((2 * SUM(q.qx) + COUNT(*)) / (2.0 * COUNT(*))) AS BIGINT) AS qc
      FROM a{it} a JOIN qt q USING (vid) GROUP BY a.cell, q.pos
    )""")
        prev = f"u{it}"
    joined = ",\n    ".join(parts)
    return f"""{joined},
    fd AS (
      SELECT q.vid, c.cell, SUM((q.qx - c.qc) * (q.qx - c.qc)) AS dist
      FROM q JOIN {prev} c ON c.pos = q.pos GROUP BY q.vid, c.cell
    ),
    fa AS (
      SELECT vid, cell, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cell) AS rn
        FROM fd) WHERE rn = 1
    )"""


def _kmeans_oracle(k: int = _KMEANS_K, n_iter: int = _KMEANS_ITER) -> str:
    return f"""
    WITH {_kmeans_ctes(k, n_iter)}
    SELECT vid AS vec_id, cell AS cell_id, CAST(dist AS BIGINT) AS dist FROM fa
    ORDER BY vec_id
    """


_PQ_M = 8
_PQ_K = 16
_PQ_ITER = 2
_PQ_RERANK = 40


def _pq_ctes(m: int = _PQ_M, k: int = _PQ_K, n_iter: int = _PQ_ITER,
             p: str = "", per_cent: int | None = None) -> str:
    """CTE chain mirroring operators.similarity.pq_fit: quantized subspace
    rows → deterministic id-modulus training sample (``{p}sm``, the SQL
    twin of train_sample_modulus) → per-subspace Lloyd iterations over
    the sample (the subspace id rides as a key, so ONE chain trains all m
    codebooks, exactly like the Spark dataflow) → final FULL-corpus code
    assignment ``fa(vid, sub, cell)`` and trained codebooks
    ``u{n_iter}(sub, cell, pos, qc)``. All integer-exact."""
    sc = S.KMEANS_QUANT_SCALE
    per = S.TRAIN_POINTS_PER_CENTROID if per_cent is None else per_cent
    sub_dim = _DIM // m
    parts = [
        f"""{p}q AS (
      SELECT vec_id AS vid, CAST((i - 1) // {sub_dim} AS INT) AS sub,
             (i - 1) % {sub_dim} AS pos,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {sc} + 0.5) AS BIGINT) AS qx
      FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, {_DIM})) AS i) d
    ),
    {p}sm AS (SELECT GREATEST(1, COUNT(*) // {per * k}) AS s FROM embeddings),
    {p}qt AS (SELECT q.* FROM {p}q q, {p}sm sm WHERE q.vid % sm.s = 0),
    {p}c0 AS (SELECT q.sub, CAST(q.vid // sm.s AS INT) AS cell, q.pos, q.qx AS qc
           FROM {p}q q, {p}sm sm WHERE q.vid % sm.s = 0 AND q.vid < {k} * sm.s)"""
    ]
    prev = f"{p}c0"
    for it in range(1, n_iter + 1):
        parts.append(f"""{p}d{it} AS (
      SELECT q.vid, q.sub, c.cell, SUM((q.qx - c.qc) * (q.qx - c.qc)) AS dist
      FROM {p}qt q JOIN {prev} c ON c.sub = q.sub AND c.pos = q.pos
      GROUP BY q.vid, q.sub, c.cell
    ),
    {p}a{it} AS (
      SELECT vid, sub, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid, sub
                                     ORDER BY dist, cell) AS rn
        FROM {p}d{it}) WHERE rn = 1
    ),
    {p}u{it} AS (
      SELECT a.sub, a.cell, q.pos,
             CAST(FLOOR((2 * SUM(q.qx) + COUNT(*)) / (2.0 * COUNT(*))) AS BIGINT) AS qc
      FROM {p}a{it} a JOIN {p}qt q ON q.vid = a.vid AND q.sub = a.sub
      GROUP BY a.sub, a.cell, q.pos
    )""")
        prev = f"{p}u{it}"
    joined = ",\n    ".join(parts)
    return f"""{joined},
    {p}fd AS (
      SELECT q.vid, q.sub, c.cell, SUM((q.qx - c.qc) * (q.qx - c.qc)) AS dist
      FROM {p}q q JOIN {prev} c ON c.sub = q.sub AND c.pos = q.pos
      GROUP BY q.vid, q.sub, c.cell
    ),
    {p}fa AS (
      SELECT vid, sub, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vid, sub
                                     ORDER BY dist, cell) AS rn
        FROM {p}fd) WHERE rn = 1
    )"""


_IVFPQ_NPROBE = 3


_LSH_TABLES = 4


_SEMANTIC_K = 32  # cells grow with the corpus: more cells = smaller
# within-cell quadratic stage (SemDeDup's scale knob); 32 on a 500–2000
# vector corpus keeps cells tens-of-vectors sized


_CONTAM_EVAL_LT = 500  # 5% eval slice, same md5-bucket rule as the
# n-gram contamination check (curation_contamination)
_CONTAM_THRESHOLD = 0.35


# --- Multimodal columns -----------------------------------------------------

# --- Composed training-data prep pipeline -----------------------------------


_V2_FLUENCY_MIN = -3.45


def _llm_prep_v2_oracle() -> str:
    """Composed from the SAME certified fragments the component queries
    use (quality, repetition, unigram fluency, recursive components +
    keep-best) — one WITH chain, every stage's arithmetic identical to
    its standalone query, so v2 parity is inherited rather than
    re-derived."""
    quality = QUERIES["text_quality"].oracle.rsplit("ORDER BY", 1)[0]
    rep = QUERIES["text_repetition"].oracle.rsplit("ORDER BY", 1)[0]
    flu = QUERIES["text_unigram_logprob"].oracle.rsplit("ORDER BY", 1)[0]
    return f"""
    WITH q AS ({quality}),
    rep AS ({rep}),
    flu AS ({flu}),
    members AS (
      WITH RECURSIVE {_components_ctes()}
      SELECT node, component_id FROM comp
    ),
    canon AS (
      SELECT component_id, doc_id AS canonical FROM (
        SELECT m.component_id, m.node AS doc_id,
               ROW_NUMBER() OVER (PARTITION BY m.component_id
                                  ORDER BY q.quality_score DESC, m.node) AS rn
        FROM members m JOIN q ON q.doc_id = m.node)
      WHERE rn = 1
    ),
    nodecanon AS (
      SELECT m.node, c.canonical
      FROM members m JOIN canon c USING (component_id)
    ),
    kept AS (
      SELECT d.doc_id, d.source, q.n_tokens, q.quality_score,
             md5(d.text) AS dig
      FROM documents d
      JOIN q ON q.doc_id = d.doc_id
      JOIN rep ON rep.doc_id = d.doc_id
      JOIN flu ON flu.doc_id = d.doc_id
      LEFT JOIN nodecanon nc ON nc.node = d.doc_id
      WHERE d.lang = 'en'
        AND q.quality_score >= CAST(0.5 AS DOUBLE)
        AND NOT rep.is_repetitive
        AND flu.mean_logprob >= CAST({_V2_FLUENCY_MIN!r} AS DOUBLE)
        AND (nc.node IS NULL OR nc.canonical = d.doc_id)
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY dig ORDER BY doc_id) AS rn
        FROM kept)
      WHERE rn = 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           FLOOR(SUM(CAST(FLOOR(quality_score * 10000.0 + 0.5) AS BIGINT))
                 / COUNT(*) + 0.5) / 10000.0 AS avg_quality
    FROM deduped
    GROUP BY source
    ORDER BY source
    """


_BOILER_SEG_WORDS = 5
_BOILER_SUPPORT = 2


_DUP_NGRAM_K = 5
_DUP_NGRAM_MIN_DOCS = 2


def _containment_oracle() -> str:
    bands = " , ".join(
        f"mh{2*b}::VARCHAR || '#' || mh{2*b+1}::VARCHAR AS b{b}" for b in range(4)
    )
    cond = " OR ".join(f"l.b{b} = r.b{b}" for b in range(4))
    return f"""
    WITH {_SHINGLE_ROWS},
    sigs AS (
      SELECT doc_id, {_minhash_cols_sql()}
      FROM sh GROUP BY doc_id
    ),
    banded AS (SELECT doc_id, {bands} FROM sigs),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM banded l JOIN banded r ON l.doc_id < r.doc_id AND ({cond})
    ),
    shsets AS (SELECT doc_id, list(DISTINCT shingle) AS shset FROM sh GROUP BY doc_id)
    SELECT doc_a, doc_b,
           CAST(len(sa.shset) AS BIGINT) AS n_sh_a,
           CAST(len(sb.shset) AS BIGINT) AS n_sh_b,
           ROUND(len(list_intersect(sa.shset, sb.shset))
                 / GREATEST(LEAST(len(sa.shset), len(sb.shset)), 1), 4)
             AS containment
    FROM cand
    JOIN shsets sa ON sa.doc_id = doc_a
    JOIN shsets sb ON sb.doc_id = doc_b
    ORDER BY doc_a, doc_b
    """


@register(
    "dedup_containment",
    _containment_oracle(),
    doc="Shingle CONTAINMENT over MinHash-LSH candidates — the asymmetric "
    "complement to Jaccard: |A∩B| / min(|A|,|B|) is ~1 when a short "
    "document is quoted inside a long one even though their Jaccard is "
    "low (large union). The signal for quote/boilerplate-inclusion and "
    "subset duplication in a training corpus. Identical scale shape to "
    "dedup_minhash_lsh (band-key equi-join, one shared shingle pass, "
    "slim band table through the self-join); only the verify metric "
    "differs, so the 100 TB candidate-bounding story carries over "
    "unchanged.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: checkpoints the shingle sets (same rationale as
    # dedup_minhash_lsh; A/B 1.29s vs 2.10s median at sf0.1)
    docs = _t(spark, sf_dir, "documents", rebalance=True)
    return D.minhash_lsh_containment_pairs(docs, "text", "doc_id", 3, 2).orderBy(
        "doc_a", "doc_b"
    )


_MEDIA_CHUNK_BYTES = 64
_MEDIA_MIN_SHARED = 2


_PHASH_SEGMENTS = 32
_PHASH_MAX_HAMMING = 3  # <= bands-1, so banding has GUARANTEED recall


_RP_DIMS = 8


def _rp_oracle() -> str:
    signs = S.random_projection_signs(_RP_DIMS, _DIM)
    values = ", ".join(
        f"({j}, {i + 1}, {signs[j][i]})"
        for j in range(_RP_DIMS)
        for i in range(_DIM)
    )
    return f"""
    WITH qrows AS (
      SELECT vec_id, i,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {S.RP_SCALE} + 0.5)
                  AS BIGINT) AS qv
      FROM embeddings
      CROSS JOIN (SELECT unnest(generate_series(1, {_DIM})) AS i) d
    ),
    signs AS (SELECT * FROM (VALUES {values}) AS v(j, i, s)),
    proj AS (
      SELECT vec_id, j, CAST(SUM(qv * s) AS BIGINT) AS p
      FROM qrows JOIN signs USING (i) GROUP BY 1, 2
    ),
    d AS (
      SELECT qa.vec_id AS query_id, pb.vec_id AS match_id,
             CAST(SUM((qa.p - pb.p) * (qa.p - pb.p)) AS BIGINT) AS pdist
      FROM proj qa JOIN proj pb ON qa.j = pb.j AND pb.vec_id != qa.vec_id
      WHERE qa.vec_id < 10
      GROUP BY 1, 2
    )
    SELECT query_id, match_id, pdist, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY pdist, match_id) AS rnk
      FROM d
    ) WHERE rnk <= 5
    ORDER BY query_id, rnk
    """


@register(
    "sim_random_projection_topk",
    _rp_oracle(),
    doc="Johnson-Lindenstrauss random-projection top-k — the dimensionality"
    "-reduction serving path: embeddings quantize to integer micro-units "
    f"and project through a deterministic ±1 matrix ({_RP_DIMS}×{_DIM}, "
    "md5-parity entries, Achlioptas 2003 — no stored model, any engine "
    "rebuilds it) to 8 integer coordinates; neighbours are scored by "
    "integer squared L2 in projected space. Projection is map-side only "
    "(matrix baked into the plan as literals — nothing broadcast, "
    "nothing shuffled); scoring is the brute-force broadcast-query shape "
    f"but each comparison is {_RP_DIMS} integer ops instead of {_DIM} "
    "float ops — an 8× flop cut per pair, and the projected corpus "
    "(8 longs/row) is what a downstream ANN index would ingest. Integer-"
    "exact end to end: quantize → ±1 sums → squared diffs all in long "
    "arithmetic, so the driver hash compare is exact cross-engine.",
)
def sim_random_projection_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: like brute force, the per-row projection + scoring fuses
    # onto the scan with no exchange below the window top-k.
    emb = _t(spark, sf_dir, "embeddings", rebalance=True)
    queries = emb.where(F.col("vec_id") < 10)
    return S.random_projection_topk(emb, queries, _RP_DIMS, 5, _DIM).orderBy(
        "query_id", "rnk"
    )


def _recall_eval_oracle() -> str:
    """Nests the brute-force and random-projection oracles as subqueries
    (trailing ORDER BY stripped — a subquery's order is meaningless)."""
    bf = QUERIES["sim_topk_bruteforce"].oracle.rsplit("ORDER BY", 1)[0]
    rp = QUERIES["sim_random_projection_topk"].oracle.rsplit("ORDER BY", 1)[0]
    return f"""
    WITH bf AS (
      SELECT query_id, match_id FROM (
        {bf}
      )
    ),
    rp AS (
      SELECT query_id, match_id FROM (
        {rp}
      )
    ),
    hits AS (
      SELECT b.query_id, COUNT(*) AS n_hits
      FROM bf b JOIN rp r ON r.query_id = b.query_id
                         AND r.match_id = b.match_id
      GROUP BY b.query_id
    ),
    denom AS (SELECT query_id, COUNT(*) AS n_exact FROM bf GROUP BY query_id)
    SELECT d.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(d.n_exact AS BIGINT) AS n_exact,
           CAST(FLOOR(10000.0 * COALESCE(h.n_hits, 0) / d.n_exact + 0.5)
                AS BIGINT) AS recall_bp
    FROM denom d LEFT JOIN hits h USING (query_id)
    ORDER BY query_id
    """


# --- Bigram collocations (PMI-style lift) ----------------------------------

_COLL_MIN_COUNT = 5
_COLL_TOP = 20


# --- BM25 lexical retrieval (integer-exact rational variant) ----------------

_BM25_TERMS = ("hash", "join", "vector", "stream")
_BM25_TOP = 10
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


# --- Lexical diversity: type-token ratio + hapax ratio ----------------------

# --- Categorical association profile (source × language) --------------------


# --- Character-class (script) histogram --------------------------------------

# --- Lexical source classifier (lift-weighted voting) ------------------------

# --- IVF-PQ recall-vs-nprobe tuning sweep ------------------------------------

_SWEEP_NPROBES = (1, 2, 4, 8)


def _nprobe_sweep_oracle() -> str:
    """One SQL over the shared trained-index CTEs: rank every coarse cell
    per query (prnk), expand candidates per nprobe via a values join, ADC
    top-5 per (nprobe, query), recall against the exhaustive probe
    (nprobe = coarse_k, which IS the full PQ scan)."""
    np_list = ", ".join(str(p) for p in _SWEEP_NPROBES)
    return f"""
    WITH {_kmeans_ctes()},
    {_pq_ctes(p='p')},
    dq AS (
      SELECT q.vid, c.cell, SUM((q.qx - c.qc) * (q.qx - c.qc)) AS dist
      FROM q JOIN u{_KMEANS_ITER} c ON c.pos = q.pos
      WHERE q.vid < 10
      GROUP BY q.vid, c.cell
    ),
    probes AS (
      SELECT vid AS query_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vid
                                ORDER BY dist, cell) AS prnk
      FROM dq
    ),
    dt AS (
      SELECT q.vid AS query_id, q.sub, c.cell,
             SUM((q.qx - c.qc) * (q.qx - c.qc)) AS d
      FROM pq q JOIN pu{_PQ_ITER} c ON c.sub = q.sub AND c.pos = q.pos
      WHERE q.vid < 10
      GROUP BY 1, 2, 3
    ),
    cand AS (
      SELECT p.query_id, f.vid, p.prnk
      FROM probes p JOIN fa f ON f.cell = p.cell
      WHERE f.vid != p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.vid, c.prnk, SUM(dt.d) AS adc_dist
      FROM cand c
      JOIN pfa f ON f.vid = c.vid
      JOIN dt ON dt.query_id = c.query_id AND dt.sub = f.sub
             AND dt.cell = f.cell
      GROUP BY 1, 2, 3
    ),
    swe AS (
      SELECT s.*, nv.np FROM scored s,
            (SELECT unnest([{np_list}]) AS np) nv
      WHERE s.prnk <= nv.np
    ),
    top AS (
      SELECT np, query_id, vid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY np, query_id
                                     ORDER BY adc_dist, vid) AS rnk
        FROM swe)
      WHERE rnk <= 5
    ),
    base AS (SELECT query_id, vid FROM top WHERE np = {_KMEANS_K}),
    hits AS (
      SELECT t.np, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM top t JOIN base b ON b.query_id = t.query_id AND b.vid = t.vid
      GROUP BY 1
    ),
    den AS (SELECT np, CAST(COUNT(*) AS BIGINT) AS n_top FROM top GROUP BY 1)
    SELECT CAST(d.np AS BIGINT) AS nprobe,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           d.n_top,
           CAST((2*10000*COALESCE(h.n_hits, 0) + d.n_top) // (2*d.n_top)
                AS BIGINT) AS recall_bp
    FROM den d LEFT JOIN hits h ON h.np = d.np
    ORDER BY nprobe
    """


# --- Vocabulary growth (Heaps' law) ------------------------------------------


# --- Tokenizer fertility / compression per language --------------------------


# --- Round-9 continuation: text statistics, MIPS, embedding drift ------------


@register(
    "text_source_novelty",
    f"""
    WITH {_SHINGLE_ROWS.strip()},
    first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
    j AS (
      SELECT d.source, sh.doc_id,
             CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END AS novel
      FROM sh JOIN first f USING (shingle)
      JOIN documents d ON d.doc_id = sh.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(novel) AS BIGINT) AS n_novel,
           CAST((20000 * SUM(novel) + COUNT(*)) // (2 * COUNT(*))
                AS BIGINT) AS novelty_bp
    FROM j GROUP BY source ORDER BY source
    """,
    doc="N-gram novelty rolled up per SOURCE (the per-doc profile is "
    "text_ngram_novelty, parked in stable.py): what share of a source's "
    "3-token shingle occurrences appear in the corpus FIRST there, where "
    "'first' is the minimum doc_id carrying the shingle — low novelty "
    "flags sources that mostly re-serve text the corpus already has "
    "(mirror/boilerplate feeds), the cheap pre-dedup triage signal. One "
    "shingle pass (shared linear-time construction), a MIN aggregate "
    "keyed on the shingle, and a count-carrying join back; shuffles "
    "carry (shingle, doc) keys and counts, never document text.",
)
def text_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sh = D.shingle_rows(docs, "text", "doc_id", k=3).select(
        F.col("doc").alias("doc_id"), "shingle"
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    src = docs.select("doc_id", "source")
    j = (
        sh.join(first, "shingle")
        .select(
            "doc_id",
            F.when(F.col("first_doc") == F.col("doc_id"), 1)
            .otherwise(0)
            .alias("novel"),
        )
        .join(_bcast_if_small(src, sf_dir, "documents"), "doc_id")
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum("novel").cast("long").alias("n_novel"),
        )
        .select(
            "source",
            "n_shingles",
            "n_novel",
            F.expr("(20000 * n_novel + n_shingles) div (2 * n_shingles)")
            .cast("long")
            .alias("novelty_bp"),
        )
        .orderBy("source")
    )


_IMPERATIVES = (
    "'write','explain','list','describe','summarize','give',"
    "'translate','how','what','why'"
)


_FK_A, _FK_B, _FK_C = 0.39, 11.8, 15.59  # Flesch-Kincaid grade constants


