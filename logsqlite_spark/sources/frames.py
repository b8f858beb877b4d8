"""Length-prefixed protobuf LogEntry codec (S1-S3).

The reference reads a u32 big-endian length prefix then that many bytes
of a protobuf ``LogEntry`` from the container FIFO
(/root/reference/src/logger.rs:84-131), appends ``\\n`` to ``line``
(logger.rs:122-123), and stores the re-encoded frame verbatim so reads
can stream raw frames back to Docker (logger.rs:125-128).

This is a self-contained proto3 wire-format codec (public protobuf
spec; message layout from /root/reference/src/entry.proto:5-17):

    LogEntry: 1 source:string, 2 time_nano:int64, 3 line:bytes,
              4 partial:bool, 5 partial_log_metadata:message
    PartialLogEntryMetadata: 1 last:bool, 2 id:string, 3 ordinal:int32

No google.protobuf dependency — the container doesn't ship it, and the
message is five fields. Decoding happens *inside executors* (see
sources/spool.py), so this module must stay import-light.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterator

@dataclass
class PartialMeta:
    last: bool = False
    id: str = ""
    ordinal: int = 0

@dataclass
class LogEntry:
    source: str = ""
    time_nano: int = 0
    line: bytes = b""
    partial: bool = False
    partial_meta: PartialMeta | None = None

class FrameDecodeError(ValueError):
    """Corrupt frame (the reference's DecodeError restart path, T4)."""

# --- varint / wire primitives ---------------------------------------------

def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value &= (1 << 64) - 1  # proto int64 two's complement
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise FrameDecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift >= 70:
            raise FrameDecodeError("varint too long")
    return result, pos

def _signed64(value: int) -> int:
    value &= (1 << 64) - 1
    return value - (1 << 64) if value >= 1 << 63 else value

# --- LogEntry encode/decode -------------------------------------------------

def encode_log_entry(entry: LogEntry) -> bytes:
    out = bytearray()
    if entry.source:
        out.append(0x0A)  # field 1, wire type 2
        src = entry.source.encode("utf-8")
        _write_varint(out, len(src))
        out += src
    if entry.time_nano:
        out.append(0x10)  # field 2, varint
        _write_varint(out, entry.time_nano)
    if entry.line:
        out.append(0x1A)  # field 3, wire type 2
        _write_varint(out, len(entry.line))
        out += entry.line
    if entry.partial:
        out.append(0x20)  # field 4, varint
        _write_varint(out, 1)
    if entry.partial_meta is not None:
        m = entry.partial_meta
        sub = bytearray()
        if m.last:
            sub.append(0x08)
            _write_varint(sub, 1)
        if m.id:
            sub.append(0x12)
            mid = m.id.encode("utf-8")
            _write_varint(sub, len(mid))
            sub += mid
        if m.ordinal:
            sub.append(0x18)
            _write_varint(sub, m.ordinal)
        out.append(0x2A)  # field 5, wire type 2
        _write_varint(out, len(sub))
        out += sub
    return bytes(out)

def _decode_partial_meta(buf: bytes) -> PartialMeta:
    meta = PartialMeta()
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fieldno, wire = tag >> 3, tag & 7
        if fieldno == 1 and wire == 0:
            v, pos = _read_varint(buf, pos)
            meta.last = bool(v)
        elif fieldno == 2 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            meta.id = buf[pos:pos + ln].decode("utf-8", "replace")
            pos += ln
        elif fieldno == 3 and wire == 0:
            v, pos = _read_varint(buf, pos)
            meta.ordinal = _signed64(v)
        else:
            pos = _skip_field(buf, pos, wire)
    return meta

def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    else:
        raise FrameDecodeError(f"unsupported wire type {wire}")
    return pos

def decode_log_entry(buf: bytes) -> LogEntry:
    entry = LogEntry()
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fieldno, wire = tag >> 3, tag & 7
        if fieldno == 1 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            entry.source = buf[pos:pos + ln].decode("utf-8", "replace")
            pos += ln
        elif fieldno == 2 and wire == 0:
            v, pos = _read_varint(buf, pos)
            entry.time_nano = _signed64(v)
        elif fieldno == 3 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            entry.line = buf[pos:pos + ln]
            pos += ln
        elif fieldno == 4 and wire == 0:
            v, pos = _read_varint(buf, pos)
            entry.partial = bool(v)
        elif fieldno == 5 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            entry.partial_meta = _decode_partial_meta(buf[pos:pos + ln])
            pos += ln
        else:
            pos = _skip_field(buf, pos, wire)
    return entry

# --- framing (u32-BE length prefix) ----------------------------------------

def encode_frame(entry: LogEntry) -> bytes:
    body = encode_log_entry(entry)
    return struct.pack(">I", len(body)) + body

def decode_frames(data: bytes) -> Iterator[LogEntry]:
    """Iterate frames out of a byte blob (one spool file / FIFO burst)."""
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise FrameDecodeError("truncated length prefix")
        (ln,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if pos + ln > n:
            raise FrameDecodeError("truncated frame body")
        yield decode_log_entry(data[pos:pos + ln])
        pos += ln

def canonicalize(entry: LogEntry) -> LogEntry:
    """S2: append ``\\n`` to the line, as the reference does on ingest."""
    if not entry.line.endswith(b"\n"):
        entry.line += b"\n"
    return entry

def reencode_stored_frame(entry: LogEntry) -> bytes:
    """S3: the wire-parity ``message`` blob the reference stores."""
    return encode_frame(canonicalize(entry))
