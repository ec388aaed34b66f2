"""Kafka binary wire protocol (v0 APIs + MessageSet v1).

The real broker protocol, not a library shim: size-prefixed frames, big-
endian primitives, CRC-checked message sets — enough of the surface
(Produce, Fetch, Metadata, ListOffsets, OffsetCommit/Fetch, ApiVersions)
for a consumer with consumer-group offset commit and a producer, speaking
to any broker that supports the legacy (pre-KIP-482) protocol versions.

Reference counterpart: idk/kafka/source.go:1 consumes through librdkafka;
here the protocol layer is implemented directly (no kafka client library
exists in this environment) and an in-process broker stand-in
(kafka_broker.py) serves tests and dev rigs the way idk's docker-compose
Kafka does.
"""
from __future__ import annotations

import struct
import zlib
from typing import List, Optional, Tuple

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_OFFSET_COMMIT = 8
API_OFFSET_FETCH = 9
API_API_VERSIONS = 18


class Writer:
    def __init__(self):
        self._parts: List[bytes] = []

    def i8(self, v):
        self._parts.append(struct.pack(">b", v))
        return self

    def i16(self, v):
        self._parts.append(struct.pack(">h", v))
        return self

    def i32(self, v):
        self._parts.append(struct.pack(">i", v))
        return self

    def u32(self, v):
        self._parts.append(struct.pack(">I", v & 0xFFFFFFFF))
        return self

    def i64(self, v):
        self._parts.append(struct.pack(">q", v))
        return self

    def string(self, s: Optional[str]):
        if s is None:
            return self.i16(-1)
        b = s.encode()
        self.i16(len(b))
        self._parts.append(b)
        return self

    def bytes_(self, b: Optional[bytes]):
        if b is None:
            return self.i32(-1)
        self.i32(len(b))
        self._parts.append(b)
        return self

    def raw(self, b: bytes):
        self._parts.append(b)
        return self

    def array(self, items, encode_one):
        self.i32(len(items))
        for it in items:
            encode_one(self, it)
        return self

    def build(self) -> bytes:
        return b"".join(self._parts)


class Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("short kafka frame")
        self.pos += n
        return b

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def u32(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> Optional[str]:
        n = self.i16()
        if n < 0:
            return None
        return self._take(n).decode()

    def bytes_(self) -> Optional[bytes]:
        n = self.i32()
        if n < 0:
            return None
        return self._take(n)

    def array(self, decode_one) -> list:
        n = self.i32()
        return [decode_one(self) for _ in range(n)]

    def remaining(self) -> int:
        return len(self.data) - self.pos


# -- request/response framing ------------------------------------------------

def encode_request(api_key: int, api_version: int, correlation_id: int,
                   client_id: str, body: bytes) -> bytes:
    w = Writer()
    w.i16(api_key).i16(api_version).i32(correlation_id).string(client_id)
    w.raw(body)
    payload = w.build()
    return struct.pack(">i", len(payload)) + payload


def decode_request_header(r: Reader) -> Tuple[int, int, int, Optional[str]]:
    return r.i16(), r.i16(), r.i32(), r.string()


def encode_response(correlation_id: int, body: bytes) -> bytes:
    payload = struct.pack(">i", correlation_id) + body
    return struct.pack(">i", len(payload)) + payload


# -- MessageSet v1 (magic 1: crc, attrs, timestamp, key, value) --------------

def encode_message(offset: int, key: Optional[bytes],
                   value: Optional[bytes], timestamp: int = -1) -> bytes:
    body = Writer()
    body.i8(1).i8(0).i64(timestamp)   # magic 1, no compression
    body.bytes_(key).bytes_(value)
    inner = body.build()
    crc = zlib.crc32(inner) & 0xFFFFFFFF
    msg = struct.pack(">I", crc) + inner
    return struct.pack(">q", offset) + struct.pack(">i", len(msg)) + msg


def encode_message_set(base_offset: int,
                       msgs: List[Tuple[Optional[bytes], Optional[bytes],
                                        int]]) -> bytes:
    out = []
    for i, (key, value, ts) in enumerate(msgs):
        out.append(encode_message(base_offset + i, key, value, ts))
    return b"".join(out)


def decode_message_set(data: bytes) -> List[Tuple[int, Optional[bytes],
                                                  Optional[bytes], int]]:
    """-> [(offset, key, value, timestamp)]; tolerates a truncated tail
    (the broker may cut a message set at max_bytes, per protocol)."""
    out = []
    r = Reader(data)
    while r.remaining() >= 12:
        try:
            offset = r.i64()
            size = r.i32()
            msg = Reader(r._take(size))
            crc = msg.u32()
            rest = msg.data[msg.pos:]
            if zlib.crc32(rest) & 0xFFFFFFFF != crc:
                raise ValueError(f"bad message crc at offset {offset}")
            magic = msg.i8()
            msg.i8()  # attributes (no compression support needed)
            ts = msg.i64() if magic >= 1 else -1
            key = msg.bytes_()
            value = msg.bytes_()
            out.append((offset, key, value, ts))
        except EOFError:
            break  # truncated tail
    return out
