"""EngineConfig: the reference's FATAL validation invariants and naming
(test/kinesis-consumer-config.test.js:346-418, test/settings.test.js:226-289,
stage suffixing test/kinesis-consumer.test.js:445-455)."""

from __future__ import annotations

import pytest

from kinesis_stream_consumer_spark.config import (
    EngineConfig,
    FatalConfigError,
    StreamType,
)


def test_per_key_requires_sequencing_required():
    with pytest.raises(FatalConfigError, match="sequencingRequired"):
        EngineConfig(
            sequencing_required=False,
            sequencing_per_key=True,
            key_property_names=["k1"],
        )


def test_per_key_requires_key_properties():
    with pytest.raises(FatalConfigError, match="keyPropertyNames"):
        EngineConfig(sequencing_per_key=True, key_property_names=[])


def test_key_properties_without_per_key_is_fatal():
    with pytest.raises(FatalConfigError, match="without sequencingPerKey"):
        EngineConfig(sequencing_per_key=False, key_property_names=["k1"])


def test_timeout_percentage_bounds():
    with pytest.raises(FatalConfigError, match="timeoutAtPercentage"):
        EngineConfig(timeout_at_percentage_of_remaining_time=0.0)
    with pytest.raises(FatalConfigError, match="timeoutAtPercentage"):
        EngineConfig(timeout_at_percentage_of_remaining_time=1.5)


def test_max_attempts_bound():
    with pytest.raises(FatalConfigError, match="maxNumberOfAttempts"):
        EngineConfig(max_number_of_attempts=0)


def test_consumer_identity_and_staged_names():
    """consumerId = functionName:stage (+ suffix); table/queue names get the
    _STAGE suffix (reference TEST_StreamConsumerBatchState_DEV)."""
    cfg = EngineConfig(
        stream_name="TEST_Stream",
        function_name="fn",
        stage="dev",
        batch_state_table_name="TEST_StreamConsumerBatchState",
    )
    assert cfg.consumer_id == "fn:dev"
    assert cfg.stream_consumer_id == "K|TEST_Stream|fn:dev"
    assert cfg.state_table == "TEST_StreamConsumerBatchState_DEV"
    assert cfg.drq_name == "DeadRecordQueue_DEV"
    assert cfg.dmq_name == "DeadMessageQueue_DEV"

    with_suffix = EngineConfig(consumer_id_suffix="blue")
    assert with_suffix.consumer_id == "consumer:dev|blue"

    ddb = EngineConfig(stream_type=StreamType.dynamodb)
    assert ddb.stream_consumer_id.startswith("D|")
