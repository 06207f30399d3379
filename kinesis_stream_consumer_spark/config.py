"""Engine configuration — the reference's "settings API" re-expressed.

Mirrors the option surface and FATAL validation invariants of the reference
(kinesis-processing.js:275-462, default-kinesis-options.json:29-47,
tests test/kinesis-consumer-config.test.js:346-418) as a plain dataclass
validated at construction time, so bad configs fail before any stream starts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional, Sequence


class StreamType(str, Enum):
    """Reference StreamType enum (kinesis-processing.js:28, README.md:87)."""

    kinesis = "kinesis"
    dynamodb = "dynamodb"


class FatalConfigError(ValueError):
    """Raised for config invariant violations the reference treats as FATAL
    (kinesis-processing.js:359-462)."""


@dataclass
class EngineConfig:
    """Full option surface of the reference consumer (kinesis-processing.js:335-357).

    Property-name options accept compound/nested names like ``"a.b.c"``
    (reference kinesis-identify.js:85-133).
    """

    stream_name: str = "TestStream"
    function_name: str = "consumer"
    stage: str = "dev"

    stream_type: StreamType = StreamType.kinesis
    sequencing_required: bool = True
    sequencing_per_key: bool = False
    batch_keyed_on_event_id: bool = False
    kpl_encoded: bool = False
    consumer_id_suffix: Optional[str] = None
    timeout_at_percentage_of_remaining_time: float = 0.8
    max_number_of_attempts: int = 10

    id_property_names: Sequence[str] = field(default_factory=tuple)
    key_property_names: Sequence[str] = field(default_factory=tuple)
    seq_no_property_names: Sequence[str] = field(default_factory=tuple)

    # Optional per-shard HyperLogLog distinct-message sketch maintained in
    # the state table (kind='sketch', one register row per md5 bucket) and
    # max-merged at every save. Register max-merge is IDEMPOTENT, so the
    # sketch is exact-composable under the engine's at-least-once replay —
    # a bounded-memory duplicate-rate signal the reference's per-batch
    # DynamoDB item could never accumulate. Default off: costs one extra
    # register aggregate inside the save job per batch.
    track_distinct_sketch: bool = False

    # Optional per-shard Count-Min frequency sketch over message KEYS
    # (kind='cms' cumulative counters + kind='cms_delta' this-batch delta,
    # both in the state table). Counters merge by ADDITION — linear, so
    # they compose across micro-batches, but NOT idempotent like the HLL
    # max-merge: a replayed batch would double-count. The engine therefore
    # keys every batch's delta by batch_id and, when it sees its own
    # batch_id already in the saved delta rows (the F1 commit-or-replay
    # path re-runs a failed micro-batch under the SAME batch_id), subtracts
    # the stale delta before folding the fresh one in — exact under
    # checkpoint replay. Re-delivery under a NEW batch_id (upstream
    # at-least-once duplicates) overcounts by exactly that batch's
    # contribution; that bound is pinned in tests — it is the honest limit
    # of any additive counter, and the reason the distinct sketch above is
    # HLL. Default off: costs one counter aggregate inside the save job.
    track_frequency_sketch: bool = False

    # Optional per-shard log-linear QUANTILE sketch over the numeric tail
    # of the event sequence number (kind='qsk'/'qsk_delta') — the
    # seqNo-spread / hot-range distribution signal. Same additive-register
    # replay contract as track_frequency_sketch (batch_id-keyed delta
    # subtraction; see that flag's note); ≤63·K+1 registers per shard
    # regardless of volume.
    track_quantile_sketch: bool = False

    # Optional per-shard uniform message SAMPLE maintained in the state
    # table (kind='rsv': the n+1 smallest md5-priority identities — the
    # engine-native instance of the weighted-reservoir priority sampling
    # sketch, operators/sketches.py reservoir_*, with w=1). The register
    # MIN-merges at every save: idempotent like the HLL max-merge, so the
    # sample stays EXACTLY the single-pass sample under at-least-once
    # replay — no delta bookkeeping needed (contrast the additive
    # CMS/qsketch twins). This is the "show me example messages from this
    # shard" debugging/monitoring surface a 100 TB stream needs without
    # ever storing more than n+1 rows per shard. Default off: costs one
    # register-bounded window aggregate inside the save job per batch.
    track_sample_sketch: bool = False
    sample_sketch_n: int = 8

    # Opt-in latency mode for the DEFAULT discard sinks (DRQ/DMQ appends):
    # instead of completing inside the batch, the appends run on a
    # background thread and are JOINED at the start of the next
    # process_batch (or via Engine.drain_discard_sinks()). The writes read
    # only already-materialized checkpoints, so correctness of the state/
    # replay machinery is untouched; what changes is the durability
    # barrier — a discard-sink failure surfaces on the NEXT batch instead
    # of failing its own, and the final batch's appends need an explicit
    # drain before the session goes away. The reference awaits its
    # discard promises per batch (kinesis-processing.js:296-297), so this
    # stays False by default; at high sustained throughput it removes the
    # last serial sink write (~0.2-0.3 s/micro-batch measured) from the
    # batch critical path. Ignored for custom discard seams (user hooks
    # are not assumed thread-safe or deferrable).
    deferred_discard_sinks: bool = False

    batch_state_table_name: str = "StreamConsumerBatchState"
    dead_record_queue_name: str = "DeadRecordQueue"
    dead_message_queue_name: str = "DeadMessageQueue"

    # Pluggable hooks (§1.4 of SURVEY; reference kinesis-processing.js:284-299).
    # Hooks take/return DataFrames or engine objects; None = default behavior.
    pre_process_batch: Optional[Callable] = None
    pre_finalise_batch: Optional[Callable] = None
    post_finalise_batch: Optional[Callable] = None

    # Pluggable processing functions (reference kinesis-processing.js:284-299;
    # accessor surface asserted at test/settings.test.js:17-45). Each is an
    # optional seam in the declarative plan; None ⇒ the Spark-first default.
    # Signatures (DataFrame/Column in, DataFrame/Column out — a custom fn may
    # be a column expression or an Arrow-batched pandas_udf):
    #   extract_messages_from_record(records_df, config) -> flat envelope DF
    #   extract_message_from_record(data_str_col)        -> msg_json Column
    #   generate_md5s({data_str,record_json,msg_json})   -> {msg_md5,rec_md5,data_md5}
    #   resolve_event_id_and_seq_nos(flat_df, config)    -> flat DF (event_* rewritten)
    #   resolve_message_ids_and_seq_nos(config)          -> {id,key,seqNo,seq_no_parts} Columns
    #   load_batch_state(engine, shard_keys)             -> prior-state DF (identity, tasks_json)
    #   save_batch_state(states_df, engine)              -> None
    #   discard_unusable_record(unusable_df, engine)     -> None
    #   discard_rejected_message(rejected_df, engine)    -> None
    extract_messages_from_record: Optional[Callable] = None
    extract_message_from_record: Optional[Callable] = None
    generate_md5s: Optional[Callable] = None
    resolve_event_id_and_seq_nos: Optional[Callable] = None
    resolve_message_ids_and_seq_nos: Optional[Callable] = None
    load_batch_state: Optional[Callable] = None
    save_batch_state: Optional[Callable] = None
    discard_unusable_record: Optional[Callable] = None
    discard_rejected_message: Optional[Callable] = None

    def __post_init__(self) -> None:
        self.id_property_names = tuple(self.id_property_names)
        self.key_property_names = tuple(self.key_property_names)
        self.seq_no_property_names = tuple(self.seq_no_property_names)
        self.validate()

    def validate(self) -> None:
        """FATAL invariants (kinesis-processing.js:359-462;
        test/kinesis-consumer-config.test.js:346-418, test/settings.test.js:226-289)."""
        if self.sequencing_per_key:
            if not self.sequencing_required:
                raise FatalConfigError(
                    "FATAL: sequencingPerKey requires sequencingRequired"
                )
            if not self.key_property_names:
                raise FatalConfigError(
                    "FATAL: sequencingPerKey requires non-empty keyPropertyNames"
                )
        elif self.key_property_names and self.sequencing_required:
            # keyPropertyNames configured => per-key mode expected
            raise FatalConfigError(
                "FATAL: keyPropertyNames configured without sequencingPerKey"
            )
        if not 0.0 < self.timeout_at_percentage_of_remaining_time <= 1.0:
            raise FatalConfigError(
                "FATAL: timeoutAtPercentageOfRemainingTime must be in (0, 1]"
            )
        if self.max_number_of_attempts < 1:
            raise FatalConfigError("FATAL: maxNumberOfAttempts must be >= 1")

    # --- Effective processing-function accessors (reference
    # Settings.getXxxFunction, asserted test/settings.test.js:17-45:
    # each getter returns the configured override or the stream-type /
    # kplEncoded-appropriate default) ---
    def processing_functions(self) -> dict:
        # the streaming package re-exports ingest() the FUNCTION under the
        # same name as the module — fetch the module itself
        import importlib

        ig = importlib.import_module(
            "kinesis_stream_consumer_spark.streaming.ingest"
        )

        if self.stream_type == StreamType.dynamodb:
            default_extract = ig.extract_messages_from_dynamodb_record
        elif self.kpl_encoded:
            default_extract = ig.extract_messages_from_kpl_encoded_record
        else:
            default_extract = ig.extract_messages_from_kinesis_record
        return {
            "extract_messages_from_record": self.extract_messages_from_record
            or default_extract,
            "extract_message_from_record": self.extract_message_from_record
            or ig.extract_json_message_from_record,
            "generate_md5s": self.generate_md5s or ig.generate_kinesis_md5s,
            "resolve_event_id_and_seq_nos": self.resolve_event_id_and_seq_nos,
            "resolve_message_ids_and_seq_nos": self.resolve_message_ids_and_seq_nos,
            "load_batch_state": self.load_batch_state,
            "save_batch_state": self.save_batch_state,
            "discard_unusable_record": self.discard_unusable_record,
            "discard_rejected_message": self.discard_rejected_message,
            "pre_process_batch": self.pre_process_batch,
            "pre_finalise_batch": self.pre_finalise_batch,
            "post_finalise_batch": self.post_finalise_batch,
        }

    # --- Consumer identity (reference kinesis-consumer.js:82; asserted
    # test/batch.test.js:88,124) ---
    @property
    def consumer_id(self) -> str:
        base = f"{self.function_name}:{self.stage}"
        return f"{base}|{self.consumer_id_suffix}" if self.consumer_id_suffix else base

    @property
    def stream_consumer_id(self) -> str:
        """'K|<streamName>|<functionName>:<stage>' (test/batch.test.js:123-152)."""
        prefix = "K" if self.stream_type == StreamType.kinesis else "D"
        return f"{prefix}|{self.stream_name}|{self.consumer_id}"

    # --- Stage-suffixed resource names (default-kinesis-options.json:9-15;
    # asserted test/kinesis-consumer.test.js:445-452) ---
    def staged(self, name: str) -> str:
        return f"{name}_{self.stage.upper()}"

    @property
    def state_table(self) -> str:
        return self.staged(self.batch_state_table_name)

    @property
    def drq_name(self) -> str:
        return self.staged(self.dead_record_queue_name)

    @property
    def dmq_name(self) -> str:
        return self.staged(self.dead_message_queue_name)
