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

    batch_state_table_name: str = "StreamConsumerBatchState"
    dead_record_queue_name: str = "DeadRecordQueue"
    dead_message_queue_name: str = "DeadMessageQueue"

    # Pluggable hooks (§1.4 of SURVEY; reference kinesis-processing.js:284-299).
    # Hooks take/return DataFrames or engine objects; None = default behavior.
    pre_process_batch: Optional[Callable] = None
    pre_finalise_batch: Optional[Callable] = None
    post_finalise_batch: Optional[Callable] = None

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
