"""Dependency-free TensorBoard scalar event writer + JSONL converter.

The reference always emits TensorBoard event files
(/root/reference/src/utils/loggers.py:28-30).  Importing the torch
TensorBoard stack costs ~25s in this image, so this module implements
the on-disk format directly: TFRecord framing (length + masked CRC32C)
around hand-encoded ``tensorflow.Event`` protos carrying
``Summary.Value{tag, simple_value}`` — the complete subset the trainers
use.  Files are readable by standard TensorBoard.

Also provides the ``scalars.jsonl`` → event-file converter CLI:

    python -m medical_image_segmentation_with_visual_prompts_tpu.utils.\
tb_events <summary_dir> [...]
"""

from __future__ import annotations

import json
import os
import socket
import struct
import time
from pathlib import Path

# ----------------------------------------------------------------- crc32c
# Castagnoli CRC (reflected poly 0x82F63B78), table-driven.

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- proto encoding
# Minimal protobuf wire encoding for tensorflow.Event / Summary / Value.


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_delimited(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _double(field: int, value: float) -> bytes:
    return _varint((field << 3) | 1) + struct.pack("<d", value)


def _float(field: int, value: float) -> bytes:
    return _varint((field << 3) | 5) + struct.pack("<f", value)


def _int64(field: int, value: int) -> bytes:
    return _varint(field << 3) + _varint(value & 0xFFFFFFFFFFFFFFFF)


def scalar_event(tag: str, value: float, step: int,
                 wall_time: float) -> bytes:
    """tensorflow.Event{wall_time, step, summary{value{tag, simple_value}}}."""
    val = _len_delimited(1, tag.encode("utf-8")) + _float(2, float(value))
    summary = _len_delimited(1, val)
    return (_double(1, wall_time) + _int64(2, int(step))
            + _len_delimited(5, summary))


def file_version_event(wall_time: float) -> bytes:
    """The conventional first record: Event{file_version: "brain.Event:2"}."""
    return _double(1, wall_time) + _len_delimited(3, b"brain.Event:2")


def _record(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header)) + payload
            + struct.pack("<I", _masked_crc(payload)))


def read_records(path) -> list:
    """Parse a TFRecord file back into raw payloads (CRC-verified)."""
    data = Path(path).read_bytes()
    out, off = [], 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (hcrc,) = struct.unpack_from("<I", data, off + 8)
        if hcrc != _masked_crc(data[off:off + 8]):
            raise ValueError(f"header CRC mismatch at offset {off}")
        payload = data[off + 12:off + 12 + length]
        (pcrc,) = struct.unpack_from("<I", data, off + 12 + length)
        if pcrc != _masked_crc(payload):
            raise ValueError(f"payload CRC mismatch at offset {off}")
        out.append(payload)
        off += 16 + length
    return out


def decode_scalar_event(payload: bytes):
    """Decode an Event payload back to (tag, value, step, wall_time);
    returns None for non-scalar events (e.g. file_version)."""
    wall_time, step, tag, value = 0.0, 0, None, None
    off = 0

    def _read_varint(buf, off):
        n, shift = 0, 0
        while True:
            b = buf[off]
            n |= (b & 0x7F) << shift
            off += 1
            if not b & 0x80:
                return n, off
            shift += 7

    while off < len(payload):
        key, off = _read_varint(payload, off)
        field, wire = key >> 3, key & 7
        if wire == 1:
            (v,) = struct.unpack_from("<d", payload, off)
            off += 8
            if field == 1:
                wall_time = v
        elif wire == 0:
            v, off = _read_varint(payload, off)
            if field == 2:
                step = v
        elif wire == 2:
            ln, off = _read_varint(payload, off)
            sub = payload[off:off + ln]
            off += ln
            if field == 5:  # summary
                soff = 0
                while soff < len(sub):
                    skey, soff = _read_varint(sub, soff)
                    sln, soff = _read_varint(sub, soff)
                    vbuf = sub[soff:soff + sln]
                    soff += sln
                    if skey >> 3 == 1:  # Summary.Value
                        voff = 0
                        while voff < len(vbuf):
                            vkey, voff = _read_varint(vbuf, voff)
                            vf, vw = vkey >> 3, vkey & 7
                            if vw == 2:
                                vln, voff = _read_varint(vbuf, voff)
                                if vf == 1:
                                    tag = vbuf[voff:voff + vln].decode()
                                voff += vln
                            elif vw == 5:
                                if vf == 2:
                                    (value,) = struct.unpack_from(
                                        "<f", vbuf, voff)
                                voff += 4
                            elif vw == 1:
                                voff += 8
                            else:
                                _, voff = _read_varint(vbuf, voff)
        elif wire == 5:
            off += 4
    if tag is None:
        return None
    return tag, value, step, wall_time


class EventWriter:
    """Append-only TensorBoard scalar event file writer."""

    def __init__(self, log_dir):
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        name = (f"events.out.tfevents.{int(time.time())}."
                f"{socket.gethostname()}.{os.getpid()}.0")
        self.path = log_dir / name
        self._file = open(self.path, "ab")
        self._file.write(_record(file_version_event(time.time())))
        self._file.flush()

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: float = None) -> None:
        wt = time.time() if wall_time is None else wall_time
        self._file.write(_record(scalar_event(tag, value, step, wt)))
        self._file.flush()

    def close(self) -> None:
        self._file.close()


def convert_jsonl(summary_dir) -> Path:
    """Convert ``summary_dir/scalars.jsonl`` into a TensorBoard event
    file in the same directory; returns the event file path."""
    summary_dir = Path(summary_dir)
    src = summary_dir / "scalars.jsonl"
    if not src.exists():
        raise FileNotFoundError(src)
    writer = EventWriter(summary_dir)
    with open(src) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            writer.add_scalar(rec["tag"], rec["value"], rec["step"],
                              rec.get("wall_time"))
    writer.close()
    return writer.path


if __name__ == "__main__":
    import sys
    for d in sys.argv[1:]:
        print(convert_jsonl(d))
