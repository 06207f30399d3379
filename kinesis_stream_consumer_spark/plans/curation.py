"""Corpus-curation queries: deterministic splits, stratified sampling,
per-source quotas, context-window packing, contamination checks, PII
scrubbing (SURVEY §2.3 extensions over the documents table).

Every oracle replicates the Spark computation arithmetically — the same
md5-bucket assignment (DuckDB ``md5_number_upper`` ≡ dedup.md5_u64_le), the
same window frames, the same regexes — so the driver's value-hash compare
is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import curation as C
from kinesis_stream_consumer_spark.operators import text as T
from kinesis_stream_consumer_spark.plans.llm_pipeline import _SHINGLE_ROWS
from kinesis_stream_consumer_spark.plans.queries import _t, register

# DuckDB mirror of curation.hash_bucket (md5_number_upper ≡ md5_u64_le,
# proven by the minhash parity suite).
_HB = (
    "CAST(md5_number_upper(CAST({col} AS VARCHAR))::HUGEINT"
    f" % {C.HASH_BUCKETS} AS INT)"
)

_BPE_TOKS = r"len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\w\s]'))"


# --- Bloom-filter membership probe (the membership sketch) -----------------

_BLOOM_M = 1024  # bits
_BLOOM_K = 4     # salted hash functions


_PRUNE_TAUS_BP = (2000, 4000, 6000, 8000)


# --- Deterministic round-robin source interleave (curriculum ordering) ------

_ILV_TOP = 60


# --- Token-budget mixture apportionment (largest remainder) -----------------

_BUDGET_TOKENS = 50_000


# --- Quality-filter funnel audit ---------------------------------------------

_FUNNEL_MIN_CHARS = 100
_FUNNEL_MIN_WORDS = 20
_FUNNEL_MAX_AVG_WLEN = 5  # avg word length (chars) upper bound
_EN_STOP_SQL = (
    "('the','and','of','to','in','is','that','for','with','as')"
)


_CURRICULUM_PHASES = ((1, 0, 220), (2, 220, 380), (3, 380, 1 << 30))
_CUR_BPE = r"len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\w\s]'))"


