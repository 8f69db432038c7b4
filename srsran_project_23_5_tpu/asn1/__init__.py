"""Compact binary codec runtime for the RAN application protocols.

The reference carries ~480k LoC of generated ASN.1 PER codecs
(lib/asn1/) for RRC/NGAP/F1AP/E1AP. This framework keeps the message
*semantics* (IEs, procedures, id spaces) but serializes them with a
small self-describing tag-length-value codec: every message is a
dataclass registered with (protocol, message-id); fields are packed by
declared specs. Interop with real ASN.1 peers is out of scope — both
ends of every interface are in-framework (as in the reference's
integration tests, which join DU↔CU in-process).

Wire format: u16 msg_id | u16 body_len | body(TLV fields in order).
"""
from __future__ import annotations

import dataclasses
import struct
from typing import Any, Callable, Optional, Type

_INT = 0
_BYTES = 1
_STR = 2
_LIST = 3
_NONE = 4
_MSG = 5
_BOOL = 6


def _encode_value(v: Any) -> bytes:
    if v is None:
        return bytes([_NONE])
    if isinstance(v, bool):
        return bytes([_BOOL, 1 if v else 0])
    if isinstance(v, int):
        if v < 0:
            raise TypeError("negative integers not used by these protocols")
        raw = v.to_bytes((max(v.bit_length(), 1) + 7) // 8, "big")
        return bytes([_INT, len(raw)]) + raw
    if isinstance(v, (bytes, bytearray)):
        return bytes([_BYTES]) + struct.pack("!I", len(v)) + bytes(v)
    if isinstance(v, str):
        raw = v.encode()
        return bytes([_STR]) + struct.pack("!I", len(raw)) + raw
    if isinstance(v, (list, tuple)):
        out = bytes([_LIST]) + struct.pack("!I", len(v))
        for item in v:
            out += _encode_value(item)
        return out
    if dataclasses.is_dataclass(v):
        body = encode(v)
        return bytes([_MSG]) + struct.pack("!I", len(body)) + body
    raise TypeError(f"unsupported field type {type(v)}")


def _decode_value(data: bytes, off: int) -> tuple[Any, int]:
    tag = data[off]
    off += 1
    if tag == _NONE:
        return None, off
    if tag == _BOOL:
        return bool(data[off]), off + 1
    if tag == _INT:
        n = data[off]
        off += 1
        return int.from_bytes(data[off:off + n], "big", signed=False), off + n
    if tag == _BYTES:
        n = struct.unpack_from("!I", data, off)[0]
        off += 4
        return data[off:off + n], off + n
    if tag == _STR:
        n = struct.unpack_from("!I", data, off)[0]
        off += 4
        return data[off:off + n].decode(), off + n
    if tag == _LIST:
        n = struct.unpack_from("!I", data, off)[0]
        off += 4
        items = []
        for _ in range(n):
            item, off = _decode_value(data, off)
            items.append(item)
        return items, off
    if tag == _MSG:
        n = struct.unpack_from("!I", data, off)[0]
        off += 4
        return decode(data[off:off + n]), off + n
    raise ValueError(f"bad tag {tag}")


_REGISTRY: dict[int, Type] = {}
_IDS: dict[Type, int] = {}


def message(msg_id: int) -> Callable[[Type], Type]:
    """Class decorator registering a dataclass as a protocol message."""
    def wrap(cls: Type) -> Type:
        cls = dataclasses.dataclass(cls)
        assert msg_id not in _REGISTRY, f"duplicate msg id {msg_id}"
        _REGISTRY[msg_id] = cls
        _IDS[cls] = msg_id
        return cls
    return wrap


def encode(msg: Any) -> bytes:
    msg_id = _IDS[type(msg)]
    body = b"".join(_encode_value(getattr(msg, f.name))
                    for f in dataclasses.fields(msg))
    return struct.pack("!HI", msg_id, len(body)) + body


def decode(data: bytes) -> Any:
    msg_id, body_len = struct.unpack_from("!HI", data)
    cls = _REGISTRY[msg_id]
    off = 6
    vals = []
    for _f in dataclasses.fields(cls):
        v, off = _decode_value(data, off)
        vals.append(v)
    return cls(*vals)
