"""Hand-encoded protobuf FileDescriptorSet for the LogEntry schema.

``from_protobuf()`` (pyspark.sql.protobuf.functions) decodes protobuf
JVM-side — the fast path for S1 ingest — but needs a compiled
descriptor set. This container has neither ``protoc`` nor the
``google.protobuf`` Python package, so we encode the descriptor set by
hand: ``FileDescriptorSet`` is itself a protobuf message (public
``google/protobuf/descriptor.proto``), and the message layout it must
describe is five fields (/root/reference/src/entry.proto:5-17) —
well within reach of the wire primitives in ``frames.py``.

The result is byte-for-byte equivalent to
``protoc --descriptor_set_out`` for the same .proto (minus
source-code-info, which Spark ignores).
"""

from __future__ import annotations

from functools import lru_cache

from logsqlite_spark.sources.frames import _write_varint

# FieldDescriptorProto.Type values (descriptor.proto enum Type)
_TYPE_INT64 = 3
_TYPE_INT32 = 5
_TYPE_BOOL = 8
_TYPE_STRING = 9
_TYPE_MESSAGE = 11
_TYPE_BYTES = 12
_LABEL_OPTIONAL = 1

MESSAGE_NAME = "docker.logentry.LogEntry"


def _field_str(out: bytearray, fieldno: int, value: str | bytes) -> None:
    data = value.encode("utf-8") if isinstance(value, str) else value
    _write_varint(out, fieldno << 3 | 2)
    _write_varint(out, len(data))
    out += data


def _field_varint(out: bytearray, fieldno: int, value: int) -> None:
    _write_varint(out, fieldno << 3 | 0)
    _write_varint(out, value)


def _field_descriptor(name: str, number: int, ftype: int,
                      type_name: str | None = None) -> bytes:
    # FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6
    out = bytearray()
    _field_str(out, 1, name)
    _field_varint(out, 3, number)
    _field_varint(out, 4, _LABEL_OPTIONAL)
    _field_varint(out, 5, ftype)
    if type_name is not None:
        _field_str(out, 6, type_name)
    return bytes(out)


def _message_descriptor(name: str, fields: list[bytes]) -> bytes:
    # DescriptorProto: name=1, field=2 (repeated)
    out = bytearray()
    _field_str(out, 1, name)
    for f in fields:
        _field_str(out, 2, f)
    return bytes(out)


@lru_cache(maxsize=1)
def log_entry_descriptor_set() -> bytes:
    """FileDescriptorSet bytes for entry.proto, for ``from_protobuf``."""
    log_entry = _message_descriptor("LogEntry", [
        _field_descriptor("source", 1, _TYPE_STRING),
        _field_descriptor("time_nano", 2, _TYPE_INT64),
        _field_descriptor("line", 3, _TYPE_BYTES),
        _field_descriptor("partial", 4, _TYPE_BOOL),
        _field_descriptor("partial_log_metadata", 5, _TYPE_MESSAGE,
                          ".docker.logentry.PartialLogEntryMetadata"),
    ])
    partial_meta = _message_descriptor("PartialLogEntryMetadata", [
        _field_descriptor("last", 1, _TYPE_BOOL),
        _field_descriptor("id", 2, _TYPE_STRING),
        _field_descriptor("ordinal", 3, _TYPE_INT32),
    ])
    # FileDescriptorProto: name=1, package=2, message_type=4, syntax=12
    file_proto = bytearray()
    _field_str(file_proto, 1, "entry.proto")
    _field_str(file_proto, 2, "docker.logentry")
    _field_str(file_proto, 4, log_entry)
    _field_str(file_proto, 4, partial_meta)
    _field_str(file_proto, 12, "proto3")
    # FileDescriptorSet: file=1 (repeated)
    out = bytearray()
    _field_str(out, 1, bytes(file_proto))
    return bytes(out)
