"""Deduplication operators: exact, MinHash(+LSH banding), SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Extends the reference's identity/dedup machinery (MD5 digests,
reference kinesis-identify.js:33-44,135-137; idempotent replay D1,
test/batch.test.js:443-462) into the content-dedup operators a training-data
pipeline needs.

Scale design: every variant reduces pairwise comparison to an equi-join on a
derived key (digest / band / bucket) so Spark shuffles on that key instead of
building an O(n²) cross product; the only pairwise work left is within
candidate buckets. All hashing is md5-based column expressions — cross-engine
deterministic (same hex in DuckDB), JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators.text import shingles_from_tokens

# MinHash "permutations": universal-hash mixes h_i(x) = (a_i·x + b_i) mod P
# over ONE md5-derived 56-bit base per shingle. One md5 per shingle row
# (instead of one per permutation) is the dominant cost saving — the mixes
# are integer ops. The base is 56-bit (not 64) so that base·a_i stays under
# 2^63 and the whole pipeline runs in primitive LONG arithmetic — decimal
# (20,0) math measured ~2× slower over the shingle volume. P = 2^61 − 1
# (Mersenne prime); exactly reproducible in DuckDB via
# ((md5_number_upper(s) >> 8) · a + b) % P.
MINHASH_P = (1 << 61) - 1
MINHASH_PERMS = tuple(
    (a, b)
    for a, b in zip(
        (3, 5, 7, 11, 13, 17, 19, 23),
        (1, 7919, 104729, 1299709, 15485863, 179424673, 2038074743, 32452843),
    )
)


def exact_digest(text: Column) -> Column:
    """Exact-dup identity: md5 of the raw text (reference I1 digests)."""
    return F.md5(text.cast("binary"))


def md5_u64_le(col: Column) -> Column:
    """Little-endian uint64 of the first 8 md5 bytes, as decimal(20,0).

    Numerically identical to DuckDB's ``md5_number_upper`` so oracles
    reproduce the values exactly. The point of numeric (vs hex-string)
    minhash values: min(decimal) keeps the signature aggregation in
    HashAggregate (mutable fixed-width buffer); min(string) forces
    SortAggregate with a per-partition sort of every shingle row.
    """
    h = F.md5(col.cast("binary"))
    le_hex = F.concat(*[F.substring(h, p, 2) for p in (15, 13, 11, 9, 7, 5, 3, 1)])
    return F.conv(le_hex, 16, 10).cast("decimal(20,0)")


def md5_u56_le(col: Column) -> Column:
    """Top 56 bits of the little-endian uint64 of the first 8 md5 bytes,
    as a primitive LONG.

    Numerically identical to DuckDB's ``md5_number_upper(s) >> 8`` (the
    shift drops the lowest-order byte — the FIRST hex pair of the digest in
    little-endian order). 56 bits instead of 64 so h·a_max stays below 2^63
    and every minhash mix runs in long arithmetic: the decimal(20,0)
    pipeline this replaces measured ~2× slower over the per-shingle hash
    volume, and min(long) keeps the tightest possible HashAggregate buffer.
    """
    h = F.md5(col.cast("binary"))
    le_hex = F.concat(*[F.substring(h, p, 2) for p in (15, 13, 11, 9, 7, 5, 3)])
    return F.conv(le_hex, 16, 10).cast("long")


def md5_u40_le(col: Column) -> Column:
    """Top 40 bits of the little-endian uint64 of the first 8 md5 bytes,
    as a primitive LONG — numerically identical to DuckDB's
    ``md5_number_upper(s) >> 24``. 40 bits so a (hash, position) pair
    packs into ONE long (hash·2^20 + pos-part stays under 2^61), keeping
    argmin-with-tiebreak aggregates in HashAggregate (the winnowing
    rightmost-min rule)."""
    h = F.md5(col.cast("binary"))
    le_hex = F.concat(*[F.substring(h, p, 2) for p in (15, 13, 11, 9, 7)])
    return F.conv(le_hex, 16, 10).cast("long")


def shingle_sets(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(doc, shingles array<string>) with linear-time shingle construction.

    The two-step projection is load-bearing: materializing the token array
    as its own column keeps element_at O(1) per access (see
    text.shingles_from_tokens for why inlining tokens() is O(k·n²))."""
    from kinesis_stream_consumer_spark.operators.text import tokens

    toked = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    )
    return toked.select(
        "doc", shingles_from_tokens(F.col("toks"), k).alias("shingles")
    )


def shingle_rows(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Explode each doc into its distinct k-word shingles — (doc, shingle)
    rows. The relational shape matters: per-shingle hashing then becomes one
    md5 per row (codegen-friendly), and the tokenize→shingle two-step keeps
    shingle construction linear (see _shingles_from_toks)."""
    return shingle_sets(df, text_col, id_col, k).select(
        "doc", F.explode("shingles").alias("shingle")
    )


def minhash_signatures_from_sets(shsets: DataFrame) -> DataFrame:
    """(doc, mh0..mh7) from a (doc, shingles) frame — the explode+min
    pipeline of minhash_signatures, reusable when the shingle sets are
    already materialized (the LSH pipeline shares ONE shingle pass between
    signatures and the exact-Jaccard verify)."""
    rows = shsets.select("doc", F.explode("shingles").alias("shingle")).withColumn(
        "h", md5_u56_le(F.col("shingle"))
    )
    # Expression strings (one py4j call per aggregate) + all-long math:
    # h < 2^56 and a ≤ 23 keep h·a + b below 2^63, so pmod never leaves
    # primitive long arithmetic.
    return rows.groupBy("doc").agg(
        *[
            F.expr(f"min(pmod(h * {a}L + {b}L, {MINHASH_P}L)) as mh{i}")
            for i, (a, b) in enumerate(MINHASH_PERMS)
        ]
    )


def minhash_signatures(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(doc, mh0..mh7): per fixed salt, the min md5 over the doc's shingles.

    min() combines map-side, so the shuffle carries only (doc, 8 hashes)
    regardless of document size — the 100 TB-safe signature plan."""
    return minhash_signatures_from_sets(shingle_sets(df, text_col, id_col, k))


def minhash_band_rows(signatures: DataFrame, rows_per_band: int = 2) -> DataFrame:
    """LSH banding over a signatures DataFrame (doc, mh0..mh7) →
    (doc, band, band_key) rows; docs sharing any (band, band_key) are
    candidate pairs.

    If the signatures carry a ``_block`` column (an extra blocking key such
    as language), it is folded into every band key — only same-block docs
    can collide, without any block-sized join ever forming."""
    n = len(MINHASH_PERMS)
    assert n % rows_per_band == 0
    has_block = "_block" in signatures.columns
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "#",
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                    *([F.col("_block")] if has_block else []),
                ).alias("band_key"),
            )
            for b in range(n // rows_per_band)
        ]
    )
    return signatures.select("doc", F.explode(bands).alias("b")).select(
        "doc", F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.round(inter / F.greatest(union, F.lit(1)), 4)


def simhash32_df(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(doc, simhash): 32-bit SimHash over k-word shingles.

    Bit b of the fingerprint is the sign of sum over shingles of
    (bit b of md5(shingle) ? +1 : -1). Relational plan: one md5 per shingle
    row, hex digits → ints via conv(), 32 ±1 vote columns summed with
    map-side combine — the shuffle carries (doc, 32 longs) only.
    """
    # ONE conv per shingle row: the first 8 hex digits as a 32-bit int;
    # hex digit d (1-indexed) is (h32 >> 4·(8−d)) & 0xF, so fingerprint
    # bit b (digit b//4+1, digit-bit b%4 — same mapping as the DuckDB
    # oracle) is (h32 >> (28 − 4·(b//4) + b%4)) & 1. The former 8-digit +
    # 32-vote projection built ~100 Column-API trees through py4j and ran
    # 8 convs per row; this is one conv and 32 expr-string aggregates.
    rows = shingle_rows(df, text_col, id_col, k).withColumn(
        "h32", F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10).cast("long")
    )
    summed = rows.groupBy("doc").agg(
        *[
            F.expr(
                f"sum((shiftright(h32, {28 - 4 * (b // 4) + b % 4}) & 1) * 2 - 1) as s{b}"
            )
            for b in range(32)
        ]
    )
    fp = " + ".join(f"if(s{b} > 0, cast({2 ** b} as bigint), 0L)" for b in range(32))
    return summed.selectExpr("doc", f"{fp} as simhash")


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group exact duplicates by content digest; keep the min id as canonical.
    One hash-shuffle on the digest — no pairwise work at any scale."""
    return (
        df.select(F.col(id_col), exact_digest(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    rows_per_band: int = 2,
    block_col: str | None = None,
    threshold: float | None = None,
    measure: str = "jaccard",
) -> DataFrame:
    """Candidate near-dup pairs via MinHash-LSH banding.

    Plan shape (scale-critical): signature (map-side, no shuffle) → explode
    bands → self-equi-join on (band, band_key) → distinct pairs → verify
    with exact shingle Jaccard. The join key is the band hash, so the
    shuffle is uniform even when documents are skewed; the cross product
    only materializes within identical-band buckets.

    ``block_col`` names an extra blocking column (e.g. language) folded
    into every band key: same-block candidates only, as an additional
    band-key component rather than a block-wide join — the block never
    becomes a join bucket by itself, so a 4-language corpus does NOT
    degenerate into 4 all-pairs products. ``threshold`` keeps only pairs
    with exact metric ≥ threshold. ``measure`` selects the verify metric:
    "jaccard" (default; |A∩B|/|A∪B| as ``jaccard_sim``) or "containment"
    (|A∩B|/min(|A|,|B|) as ``containment`` plus both set sizes — the
    asymmetric quote/subset-duplication signal).
    """
    if measure not in ("jaccard", "containment"):
        raise ValueError(f"unknown measure {measure!r}")
    # ONE shingle pass for the whole pipeline: the checkpointed sets feed
    # the signature aggregate AND both sides of the exact-Jaccard verify —
    # tokenization is the dominant map cost and would otherwise run twice.
    # LAZY checkpoint (r14, engine pattern): the eager band-table
    # checkpoint just below is the materializing action — its map stage
    # computes the tokenize output and persists it as a side effect, so
    # the tokenize→signature pipeline runs fused in ONE job instead of a
    # materialize job plus a read-back pass over the serialized sets.
    # Safe from the engine's concurrent-first-touch trap: everything here
    # is sequential on the driver thread; the verify join only executes
    # after the band checkpoint has materialized these sets.
    shsets = shingle_sets(df, text_col, id_col, k).localCheckpoint(eager=False)
    # Slim band table: (doc, band, band_key) only — the heavy shingle arrays
    # must NOT ride through the self-join (they'd be shuffled once per band
    # and compared once per duplicate candidate). localCheckpoint
    # materializes the signatures ONCE; without it the self-join recomputes
    # the whole shingle→hash→min pipeline for each side.
    sigs = minhash_signatures_from_sets(shsets)
    if block_col is not None:
        sigs = sigs.join(
            df.select(F.col(id_col).alias("doc"), F.col(block_col).alias("_block")),
            "doc",
        )
    banded = minhash_band_rows(sigs, rows_per_band).localCheckpoint(eager=True)
    # Self-equi-join on the band hash → de-duplicated candidate pairs. A pair
    # colliding in multiple bands appears once thanks to the early distinct.
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )
    # Verify each unique pair exactly once with the true shingle metric,
    # reading both sides from the same checkpointed sets.
    if measure == "jaccard":
        metric_cols = [
            jaccard(F.col("sa.shingles"), F.col("sb.shingles")).alias("jaccard_sim")
        ]
        metric_name = "jaccard_sim"
    else:
        metric_cols = [
            F.size(F.col("sa.shingles")).cast("long").alias("n_sh_a"),
            F.size(F.col("sb.shingles")).cast("long").alias("n_sh_b"),
            containment(F.col("sa.shingles"), F.col("sb.shingles")).alias(
                "containment"
            ),
        ]
        metric_name = "containment"
    verified = (
        pairs.join(shsets.alias("sa"), F.col("doc_a") == F.col("sa.doc"))
        .join(shsets.alias("sb"), F.col("doc_b") == F.col("sb.doc"))
        .select("doc_a", "doc_b", *metric_cols)
    )
    if threshold is not None:
        verified = verified.where(F.col(metric_name) >= threshold)
    return verified


def containment(a: Column, b: Column) -> Column:
    """Containment of two distinct-element arrays: |A∩B| / min(|A|,|B|).

    The asymmetric complement to Jaccard: a short document quoted inside a
    long one has low Jaccard (the union is large) but containment ≈ 1 —
    the signal that catches quotes, boilerplate inclusions and
    subset/superset duplication that Jaccard misses when sizes differ.
    """
    inter = F.size(F.array_intersect(a, b))
    smaller = F.least(F.size(a), F.size(b))
    return F.round(inter / F.greatest(smaller, F.lit(1)), 4)


def minhash_lsh_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    rows_per_band: int = 2,
    block_col: str | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Candidate pairs via the same MinHash-LSH banding as
    minhash_lsh_candidate_pairs, verified with exact shingle CONTAINMENT
    instead of Jaccard — a thin wrapper over the shared pipeline
    (``measure="containment"``), so banding fixes and the block_col
    support apply to both metrics automatically.

    Candidate generation is still Jaccard-biased (MinHash collision
    probability tracks Jaccard, so an extreme needle-in-haystack quote may
    not collide); for the near-dup range LSH targets, containment re-ranks
    what banding surfaces.
    """
    return minhash_lsh_candidate_pairs(
        df, text_col, id_col, k, rows_per_band, block_col, threshold,
        measure="containment",
    )


def duplicated_shingle_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-n-gram coverage — the bounded, aggregate form
    of substring-level dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): for each document, the share of its
    distinct k-word shingles that also occur in at least ``min_docs``
    documents corpus-wide. High coverage flags documents that are largely
    assembled from text duplicated elsewhere even when no single pair
    crosses a near-dup threshold.

    Returns (doc, n_grams, n_dup, dup_bp) with dup_bp the coverage in
    integer basis points (FLOOR(x+0.5) — no ROUND-tie ambiguity).

    Scale shape: shingles materialize once and ride as DISTINCT
    (doc, gram-hash) rows — the corpus-wide document frequency is one
    count aggregate keyed on the 56-bit gram hash (slim longs, map-side
    combine), and the duplicated set joins back on the same key, so both
    shuffles are keyed on uniform hashes. No pairwise work at any scale:
    cost is O(total shingles), not O(docs²).
    """
    # shingle_rows explodes the per-doc DISTINCT shingle set, so (doc, g)
    # rows are already unique — no extra distinct shuffle needed. (A 56-bit
    # in-doc hash collision would double-count one row; the oracle hashes
    # with the same function, so the compare stays exact either way.)
    rows = shingle_rows(df, text_col, id_col, k).select(
        "doc", md5_u56_le(F.col("shingle")).alias("g")
    ).localCheckpoint(eager=True)
    dup = (
        rows.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("g")
    )
    per_doc = rows.join(dup, "g").groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_dup")
    )
    totals = rows.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        totals.join(per_doc, "doc", "left")
        .select(
            "doc",
            "n_grams",
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
            F.floor(
                10000.0 * F.coalesce("n_dup", F.lit(0)) / F.col("n_grams")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("dup_bp"),
        )
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: returns
    (node, component_id) where component_id is the SMALLEST node id
    reachable — the canonical representative. This is the transitive step
    real dedup needs: pairwise matches chain (A≈B, B≈C ⇒ {A,B,C} is one
    duplicate group even when A,C never collide), and one document per
    component survives.

    Iterative min-label propagation to the FIXPOINT: each round joins the
    (slim, checkpointed) edge list against current labels, takes the min
    over neighbours, and stops when the strictly-decreasing label sum
    stops changing — one scalar action per round, the same "only model
    scalars cross the driver" discipline as the k-means trainer. Rounds
    needed = graph diameter, and near-dup components are dense (shared
    shingles make them clique-ish), so a handful of rounds suffices at
    any corpus size; each round is one shuffle keyed on node id. The
    fixpoint (min reachable id) is engine-independent — the oracle's
    recursive CTE reaches the identical answer regardless of iteration
    schedule."""
    # Both edge orientations via ONE explode — the union-of-two-selects
    # form re-executed the whole candidate-pair subtree (LSH verify join
    # at the main call site) once per direction before the checkpoint.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("s"), F.col(b_col).alias("d")
                    ),
                    F.struct(
                        F.col(b_col).alias("s"), F.col(a_col).alias("d")
                    ),
                )
            ).alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.d").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("s").alias("node")).distinct().withColumn(
        "lab", F.col("node")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("lab")).first()[0]
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["s"] == labels["node"])
            .groupBy(F.col("d").alias("node"))
            .agg(F.min("lab").alias("nbr_lab"))
        )
        labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("nbr_lab"), F.col("lab"))
                ).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lab")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Partially-propagated labels are WRONG component ids, not an
        # approximation — refuse to return them. Min-label needs diameter
        # rounds; a chain-of-edits component longer than max_iter (rare:
        # near-dup components are clique-ish) needs a higher max_iter or a
        # pointer-doubling (large-star/small-star) variant.
        raise RuntimeError(
            f"connected_components did not reach the label fixpoint in "
            f"{max_iter} rounds (graph diameter exceeds max_iter); raise "
            f"max_iter — results would be incorrect, not approximate"
        )
    return labels.select("node", F.col("lab").alias("component_id"))


def minhash_lsh_incremental_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    new_col: str,
    k: int = 3,
    rows_per_band: int = 2,
) -> DataFrame:
    """Increment-vs-corpus LSH: near-dup candidates where at least one
    side is a NEW document — the production dedup shape, where a daily
    increment is checked against a (much larger) existing corpus without
    ever re-pairing the corpus against itself.

    ``new_col`` is a boolean column marking increment rows. Output:
    (new_doc, match_doc, match_is_new, jaccard_sim) — one row per
    candidate the new document collides with (match_doc may itself be
    new: within-increment duplicates surface symmetrically, one row per
    direction, so each new doc carries its full candidate list).

    Scale shape: identical banding to minhash_lsh_candidate_pairs, but
    the band join is INCREMENT-DRIVEN — one side of the equi-join is
    only the new docs' band rows, so join fan-out is bounded by
    increment x bucket occupancy, never corpus x corpus. In production
    the corpus side's (band, band_key) rows and shingle sets come from
    the signature store written at ingest (they are recomputed here
    because the driver corpus is synthetic); the verify stage reads only
    the matched pairs' sets — the 'fetch the candidates' lookup."""
    # Lazy: the eager band-table checkpoint below materializes the sets
    # in the same job (see minhash_lsh_candidate_pairs).
    shsets = shingle_sets(df, text_col, id_col, k).localCheckpoint(eager=False)
    flags = df.select(
        F.col(id_col).alias("doc"), F.col(new_col).alias("_is_new")
    )
    banded = (
        minhash_band_rows(minhash_signatures_from_sets(shsets), rows_per_band)
        .join(flags, "doc")
        .localCheckpoint(eager=True)  # slim (doc, band, band_key, flag)
    )
    new_bands = banded.where(F.col("_is_new"))
    pairs = (
        banded.alias("l")
        .join(
            new_bands.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc") != F.col("r.doc")),
        )
        .select(
            F.col("r.doc").alias("new_doc"),
            F.col("l.doc").alias("match_doc"),
            F.col("l._is_new").cast("int").alias("match_is_new"),
        )
        .distinct()
    )
    return (
        pairs.join(shsets.alias("sa"), F.col("new_doc") == F.col("sa.doc"))
        .join(shsets.alias("sb"), F.col("match_doc") == F.col("sb.doc"))
        .select(
            "new_doc",
            "match_doc",
            "match_is_new",
            jaccard(F.col("sa.shingles"), F.col("sb.shingles")).alias(
                "jaccard_sim"
            ),
        )
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """EXACT Jaccard similarity join via prefix filtering (AllPairs/PPJoin
    family, Bayardo et al. WWW'07; positional filter from Xiao et al.'s
    PPJoin) — the lossless counterpart of the MinHash-LSH candidate join:
    every pair with true shingle Jaccard ≥ ``threshold`` is guaranteed to
    be emitted (LSH banding can miss pairs; prefix filtering cannot).

    Plan shape (scale-critical):
      1. ONE shingle pass, checkpointed — feeds the prefix build AND the
         exact verify (same single-tokenize discipline as the LSH join).
      2. Global shingle document-frequency — COUNT() OVER (PARTITION BY
         shingle): the rows shuffle by shingle exactly once (no separate
         aggregate + join-back).
      3. Per-doc rarity order: window PARTITIONED BY doc (parallel; no
         global sort anywhere) ranks each doc's shingles by ascending
         (df, shingle). A doc of size s keeps only its first
         s - ceil(t·s) + 1 rarest shingles — its PREFIX. Correctness: two
         sets with J ≥ t must share at least one element inside both
         prefixes under any single global element order (pigeonhole on the
         ≥ t·|a∪b| shared elements), so joining prefixes loses nothing.
      4. Candidate pairs = self-equi-join of the prefix rows on shingle.
         Only df ≥ 2 prefix rows enter the join (df = 1 shingles cannot
         collide — pure input-volume win), the size-ratio filter
         (min ≥ t·max, exact rational arithmetic) prunes inside the join
         condition, and the pair aggregate applies PPJoin's POSITIONAL
         filter: for the earliest common prefix token at ranks (i, j),
         every earlier token is provably non-shared, so the overlap is
         bounded by 1 + min(s_a − i, s_b − j); pairs whose bound cannot
         reach the Jaccard-equivalent overlap t·(s_a+s_b)/(1+t) die
         before the verify — all in exact integers (threshold taken as a
         rational), so the filter can never mis-prune a true pair.
      5. Exact verify on the survivors from the checkpointed sets:
         intersection via array_intersect, union by SIZE ALGEBRA
         (s_a + s_b − inter — distinct sets, so no array_union pass).

    At 100 TB: the df window and the prefix join shuffle (doc, shingle,
    size, rank) rows only — never document text; candidates are bounded
    by rare-prefix collisions rather than n²."""
    from fractions import Fraction

    from pyspark.sql.window import Window

    frac = Fraction(str(threshold))
    tn, td = frac.numerator, frac.denominator
    # Lazy: the eager prefix checkpoint below materializes the sets in
    # the same job (see minhash_lsh_candidate_pairs).
    shsets = shingle_sets(df, text_col, id_col, k).localCheckpoint(eager=False)
    rows = shsets.select(
        "doc",
        F.size("shingles").cast("long").alias("sz"),
        F.explode("shingles").alias("shingle"),
    )
    w = Window.partitionBy("doc").orderBy("df", "shingle")
    # Document frequency as COUNT OVER (PARTITION BY shingle), not a
    # groupBy + join-back. The measured r14 win (plans/r14 dump) is the
    # removed second tokenize/Generate pass and the removed join (a
    # BroadcastHashJoin locally — the count table is small — an SMJ at
    # scale): 3 Exchanges -> 2, 2 Generates -> 1. Byte accounting is a
    # trade, not a strict win: the old shape shuffled only PARTIAL
    # per-shingle counts for its aggregate, while the window shuffles
    # every exploded (doc, sz, shingle) row by shingle — and a very hot
    # shingle's rows all buffer in ONE window task (skew bound). If this
    # path regresses at scale, suspect that hot-shingle window partition
    # before blaming the join removal (ADVICE r14). Same df values, so
    # the prefix frame is row-identical (A/B'd r14).
    # Checkpoint the slim prefix rows ONCE: both sides of the self-join
    # read the materialized frame — without it each side re-runs the df
    # window + rarity window over the full shingle volume (the same
    # reuse discipline as the LSH band table). Rank and df ride along for
    # the positional filter and the df>=2 join pruning.
    prefix = (
        rows.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .withColumn("pos", F.row_number().over(w))
        .where(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")) + 1
        )
        .select("doc", "sz", "shingle", "pos", "df")
        .localCheckpoint(eager=True)
    )
    joinable = prefix.where(F.col("df") >= 2).select(
        "doc", "sz", "shingle", "pos"
    )
    collisions = (
        joinable.alias("l")
        .join(
            joinable.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc") < F.col("r.doc"))
            & (
                F.least(F.col("l.sz"), F.col("r.sz")) * td
                >= F.greatest(F.col("l.sz"), F.col("r.sz")) * tn
            ),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            F.col("l.sz").alias("sa"),
            F.col("r.sz").alias("sb"),
            F.col("l.pos").alias("pa"),
            F.col("r.pos").alias("pb"),
        )
    )
    # Earliest common prefix token: positions are monotone in the shared
    # global (df, shingle) order, so min(pa) and min(pb) land on the SAME
    # token and everything before it in either prefix is non-shared.
    pairs = (
        collisions.groupBy("doc_a", "doc_b", "sa", "sb")
        .agg(F.min("pa").alias("mpa"), F.min("pb").alias("mpb"))
        .where(
            (
                F.lit(1)
                + F.least(
                    F.col("sa") - F.col("mpa"), F.col("sb") - F.col("mpb")
                )
            )
            * (tn + td)
            >= (F.col("sa") + F.col("sb")) * tn
        )
        .select("doc_a", "doc_b")
    )
    # Evaluate array_intersect ONCE per surviving pair: project the three
    # integers (inter, sa_n, sb_n) and fence them with a lazy checkpoint
    # before the similarity filter — without the fence, PushDownPredicate
    # re-inlines the jaccard alias into the join condition and the
    # projection re-evaluates it, so every pair pays the O(|a|+|b|)
    # intersection 2-3x (the bloom_join_prune discipline; measured ~25%
    # of the query's warm wall). Downstream only integers flow; the
    # rounded-double similarity expression is unchanged bit for bit.
    inter = F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
    sa_sz = F.size(F.col("sa.shingles"))
    sb_sz = F.size(F.col("sb.shingles"))
    verified = (
        pairs.join(shsets.alias("sa"), F.col("doc_a") == F.col("sa.doc"))
        .join(shsets.alias("sb"), F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            sa_sz.alias("sa_n"),
            sb_sz.alias("sb_n"),
        )
        .localCheckpoint(eager=False)
    )
    jac = F.round(
        F.col("inter")
        / F.greatest(
            F.col("sa_n") + F.col("sb_n") - F.col("inter"), F.lit(1)
        ),
        4,
    )
    return verified.select(
        "doc_a", "doc_b", jac.alias("jaccard_sim")
    ).where(F.col("jaccard_sim") >= threshold)
