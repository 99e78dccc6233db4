"""SEI messages — decoded-picture-hash (MD5) is the correctness oracle.

Capability parity with the reference's hevc_sei.c (ff_hevc_decode_nal_sei
:347) and the MD5 verification in hevcdec.c verify_md5 (:4035).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .bits import BitReader, BitWriter

SEI_TYPE_PICTURE_TIMING = 1
SEI_TYPE_USER_DATA_UNREGISTERED = 5
SEI_TYPE_ACTIVE_PARAMETER_SETS = 129
SEI_TYPE_DECODED_PICTURE_HASH = 132


@dataclass
class DecodedPictureHash:
    hash_type: int = 0  # 0 = MD5
    md5: List[bytes] = field(default_factory=list)  # per plane, 16 bytes each

    def payload(self) -> bytes:
        assert self.hash_type == 0
        return bytes([0]) + b"".join(self.md5)

    @classmethod
    def parse(cls, data: bytes, num_planes: int = 3) -> "DecodedPictureHash":
        h = cls()
        h.hash_type = data[0]
        if h.hash_type == 0:
            h.md5 = [data[1 + 16 * i:1 + 16 * (i + 1)] for i in range(num_planes)]
        return h


def plane_md5(plane: np.ndarray, bit_depth: int) -> bytes:
    """MD5 of one picture plane, matching the conformance convention:
    samples in raster order, little-endian, 1 byte if bit_depth<=8 else 2.
    (reference: libavcodec/hevcdec.c:4035-4098 verify_md5)"""
    if bit_depth <= 8:
        raw = plane.astype(np.uint8).tobytes()
    else:
        raw = plane.astype("<u2").tobytes()
    return hashlib.md5(raw).digest()


def picture_md5(planes, bit_depth: int) -> List[bytes]:
    return [plane_md5(p, bit_depth) for p in planes]


def write_sei_rbsp(messages) -> bytes:
    """messages: list of (payload_type, payload_bytes)."""
    out = bytearray()
    for ptype, payload in messages:
        t = ptype
        while t >= 255:
            out.append(255)
            t -= 255
        out.append(t)
        s = len(payload)
        while s >= 255:
            out.append(255)
            s -= 255
        out.append(s)
        out += payload
    out.append(0x80)  # rbsp_trailing_bits
    return bytes(out)


def parse_sei_rbsp(rbsp: bytes):
    """Yields (payload_type, payload_bytes) messages."""
    msgs = []
    i = 0
    n = len(rbsp)
    while i < n:
        # stop at rbsp trailing bits (0x80 possibly followed by zeros)
        if rbsp[i] == 0x80 and all(b == 0 for b in rbsp[i + 1:]):
            break
        ptype = 0
        while i < n and rbsp[i] == 255:
            ptype += 255
            i += 1
        ptype += rbsp[i]; i += 1
        size = 0
        while i < n and rbsp[i] == 255:
            size += 255
            i += 1
        size += rbsp[i]; i += 1
        msgs.append((ptype, rbsp[i:i + size]))
        i += size
    return msgs
