"""KPL (Kinesis Producer Library) record aggregation codec — pure Python.

Implements the publicly documented KPL aggregated-record format
(https://github.com/awslabs/amazon-kinesis-producer/blob/master/aggregation-format.md):

    0xF3 0x89 0x9A 0xC2 | protobuf(AggregatedRecord) | md5(protobuf bytes)

with the protobuf messages

    AggregatedRecord { repeated string partition_key_table = 1;
                       repeated string explicit_hash_key_table = 2;
                       repeated Record records = 3; }
    Record           { required uint64 partition_key_index = 1;
                       optional uint64 explicit_hash_key_index = 2;
                       required bytes data = 3; }

hand-rolled over varints (no protobuf dependency in this container).

Reference behavior reproduced (kpl-deagg-async.js:50-186): magic-number
check (:60), checksum verify (:75-97), one UserRecord per sub-record with
``subSequenceNumber = i`` (:107-117), and non-KPL passthrough as a single
user record with no subSequenceNumber (:158-185).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

KPL_MAGIC = b"\xf3\x89\x9a\xc2"


class KplChecksumError(ValueError):
    """Aggregate's md5 trailer does not match its protobuf body."""


# --- minimal protobuf wire helpers ------------------------------------------


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _field(tag: int, wire: int, payload: bytes) -> bytes:
    return _write_varint((tag << 3) | wire) + payload


def _len_field(tag: int, data: bytes) -> bytes:
    return _field(tag, 2, _write_varint(len(data)) + data)


# --- encode (used by tests to build realistic KPL batches) ------------------


def kpl_aggregate(
    user_records: List[Tuple[str, bytes]],
    explicit_hash_keys: Optional[List[Optional[str]]] = None,
) -> bytes:
    """Aggregate (partition_key, data) pairs into one KPL blob."""
    pk_table: List[str] = []
    ehk_table: List[str] = []
    body = bytearray()
    for i, (pk, data) in enumerate(user_records):
        if pk not in pk_table:
            pk_table.append(pk)
        rec = bytearray()
        rec += _field(1, 0, _write_varint(pk_table.index(pk)))
        ehk = explicit_hash_keys[i] if explicit_hash_keys else None
        if ehk is not None:
            if ehk not in ehk_table:
                ehk_table.append(ehk)
            rec += _field(2, 0, _write_varint(ehk_table.index(ehk)))
        rec += _len_field(3, data)
        body += _len_field(3, bytes(rec))
    tables = b"".join(_len_field(1, k.encode()) for k in pk_table) + b"".join(
        _len_field(2, k.encode()) for k in ehk_table
    )
    msg = tables + bytes(body)
    return KPL_MAGIC + msg + hashlib.md5(msg).digest()


# --- decode ------------------------------------------------------------------


def is_kpl_aggregated(data: bytes) -> bool:
    return len(data) > 20 and data[:4] == KPL_MAGIC


def _parse_record(buf: bytes) -> Tuple[int, Optional[int], bytes]:
    pos, pk_idx, ehk_idx, data = 0, 0, None, b""
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        tag, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
            if tag == 1:
                pk_idx = val
            elif tag == 2:
                ehk_idx = val
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            if tag == 3:
                data = buf[pos : pos + ln]
            pos += ln
        else:  # pragma: no cover - unknown wire type
            raise ValueError(f"unsupported wire type {wire}")
    return pk_idx, ehk_idx, data


def kpl_deaggregate(
    data: bytes, verify_checksum: bool = True
) -> Optional[List[dict]]:
    """Decode a KPL aggregate into user records; None if not KPL-aggregated.

    Each user record: {partitionKey, explicitHashKey, data, subSequenceNumber}
    with subSequenceNumber = index within the aggregate
    (reference kpl-deagg-async.js:107-117). Non-KPL data → None so the caller
    passes the record through unchanged (kpl-deagg-async.js:158-185).
    """
    if not is_kpl_aggregated(data):
        return None
    msg, digest = data[4:-16], data[-16:]
    if verify_checksum and hashlib.md5(msg).digest() != digest:
        raise KplChecksumError("KPL aggregate checksum mismatch")
    pk_table: List[str] = []
    ehk_table: List[str] = []
    raw_records: List[bytes] = []
    pos = 0
    while pos < len(msg):
        key, pos = _read_varint(msg, pos)
        tag, wire = key >> 3, key & 7
        if wire != 2:  # pragma: no cover - format violation
            raise ValueError("malformed AggregatedRecord")
        ln, pos = _read_varint(msg, pos)
        chunk = msg[pos : pos + ln]
        pos += ln
        if tag == 1:
            pk_table.append(chunk.decode())
        elif tag == 2:
            ehk_table.append(chunk.decode())
        elif tag == 3:
            raw_records.append(chunk)
    out = []
    for i, raw in enumerate(raw_records):
        pk_idx, ehk_idx, payload = _parse_record(raw)
        out.append(
            {
                "partitionKey": pk_table[pk_idx] if pk_idx < len(pk_table) else None,
                "explicitHashKey": (
                    ehk_table[ehk_idx]
                    if ehk_idx is not None and ehk_idx < len(ehk_table)
                    else None
                ),
                "data": payload,
                "subSequenceNumber": i,
            }
        )
    return out
