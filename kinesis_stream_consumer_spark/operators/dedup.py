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

from kinesis_stream_consumer_spark.operators.text import word_shingles

# Fixed salts = the "permutations" of the MinHash signature. Lexicographic
# min over salted md5 hex strings is a valid min-hash family and is exactly
# reproducible in any engine with md5.
MINHASH_SALTS = tuple(f"mh{i:02d}" for i in range(8))


def exact_digest(text: Column) -> Column:
    """Exact-dup identity: md5 of the raw text (reference I1 digests)."""
    return F.md5(text.cast("binary"))


def minhash_signature(text: Column, k: int = 3) -> Column:
    """array<string> of len(MINHASH_SALTS): per salt, the min md5 over the
    doc's k-word shingles."""
    shingles = word_shingles(text, k)
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.md5(F.concat(F.lit(salt + "|"), s).cast("binary")))
            )
            for salt in MINHASH_SALTS
        ]
    )


def minhash_bands(signature: Column, rows_per_band: int = 2) -> Column:
    """LSH banding: group the signature into bands of `rows_per_band` hashes;
    docs sharing any band value are candidate pairs. Returns
    array<struct<band:int, band_key:string>> ready to explode + equi-join."""
    n = len(MINHASH_SALTS)
    assert n % rows_per_band == 0
    bands = []
    for b in range(n // rows_per_band):
        parts = [
            F.element_at(signature, b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("#", *parts).alias("band_key"),
            )
        )
    return F.array(*bands)


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.round(inter / F.greatest(union, F.lit(1)), 4)


def simhash32(text: Column, k: int = 3) -> Column:
    """32-bit SimHash over k-word shingles.

    Bit b of the fingerprint is the sign of sum over shingles of
    (bit b of md5(shingle) ? +1 : -1). Bits are extracted from the md5 hex
    digits arithmetically (strpos/shift) so the identical computation runs
    in DuckDB — no engine-specific hash.
    """
    shingles = word_shingles(text, k)
    hexdigits = "0123456789abcdef"

    def bit_sum(b: int) -> Column:
        d, shift = b // 4 + 1, b % 4
        digit_val = lambda s: (  # noqa: E731
            F.instr(F.lit(hexdigits), F.substring(F.md5(s.cast("binary")), d, 1)) - 1
        )
        bit = lambda s: F.floor(digit_val(s) / (2 ** shift)) % 2  # noqa: E731
        votes = F.transform(shingles, lambda s: bit(s) * 2 - 1)
        return F.aggregate(votes, F.lit(0).cast("long"), lambda acc, x: acc + x)

    fp = F.lit(0).cast("long")
    for b in range(32):
        fp = fp + F.when(bit_sum(b) > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return fp


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
    df: DataFrame, text_col: str, id_col: str, k: int = 3, rows_per_band: int = 2
) -> DataFrame:
    """Candidate near-dup pairs via MinHash-LSH banding.

    Plan shape (scale-critical): signature (map-side, no shuffle) → explode
    bands → self-equi-join on (band, band_key) → distinct pairs → verify
    with exact shingle Jaccard. The join key is the band hash, so the
    shuffle is uniform even when documents are skewed; the cross product
    only materializes within identical-band buckets.
    """
    sig = df.select(
        F.col(id_col).alias("doc"),
        word_shingles(F.col(text_col), k).alias("shingles"),
        minhash_signature(F.col(text_col), k).alias("sig"),
    )
    banded = sig.select(
        "doc", "shingles", F.explode(minhash_bands(F.col("sig"), rows_per_band)).alias("b")
    ).select("doc", "shingles", F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key"))
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            jaccard(F.col("l.shingles"), F.col("r.shingles")).alias("jaccard_sim"),
        )
        .distinct()
    )
    return pairs
