"""Clean-room Roaring bitmap codec — the serialization Delta Lake
deletion vectors use (public specs: the Roaring interoperable format
at https://github.com/RoaringBitmap/RoaringFormatSpec including its
64-bit extension, and the Delta protocol's Deletion Vector section in
https://github.com/delta-io/delta/blob/master/PROTOCOL.md).

A deletion vector is a set of row ordinals. The on-disk form Delta
names "RoaringBitmapArray, portable format" is:

    <magic: 4 bytes LE = 1681511377>
    <number of 32-bit buckets: 8 bytes LE>          (64-bit extension)
    per bucket, in increasing key order:
        <key = the ordinals' high 32 bits: 4 bytes LE>
        <standard 32-bit roaring serialization of the low 32 bits>

and the 32-bit standard serialization is:

    cookie 12346 (no run containers): <12346: u32 LE> <n: u32 LE>
    cookie 12347 (run containers):    <12347 | (n-1)<<16 : u32 LE>
                                      <run-flag bitset: (n+7)/8 bytes>
    descriptive header: n × (<key: u16 LE> <cardinality-1: u16 LE>)
    offset header:      n × <u32 LE>   (cookie 12346 always;
                                        cookie 12347 only when n ≥ 4)
    containers, in key order:
        array  (card ≤ 4096):  card × <u16 LE>, sorted
        bitmap (card > 4096):  8192 bytes = 1024 × <u64 LE>
        run    (flagged):      <numRuns: u16 LE> +
                               numRuns × (<start: u16> <length-1: u16>)

The ENCODER always emits cookie 12346 with array/bitmap containers —
the simplest spec-valid shape; the DECODER accepts both cookies and
all three container types, so foreign-written DVs read fine. Also here:
the Z85 (ZeroMQ base-85, 4 bytes → 5 chars) codec Delta uses for
inline DVs and for the UUID in relative DV paths.

Everything is numpy-vectorized: ordinals are uint64 arrays end to end;
a million-row DV round-trips in milliseconds.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


class RoaringFormatError(Exception):
    """Bytes that do not parse as the documented portable format."""


# ------------------------------------------------------------- 32-bit

def _serialize_rbm32(lows: np.ndarray) -> bytes:
    """Standard portable serialization of one 32-bit roaring bitmap.
    `lows` is a sorted unique uint32 array of the bucket's values."""
    keys16 = (lows >> 16).astype(np.uint32)
    vals16 = (lows & 0xFFFF).astype(np.uint16)
    uniq, starts = np.unique(keys16, return_index=True)
    n = len(uniq)
    bounds = list(starts) + [len(vals16)]
    containers: list[tuple[int, int, bytes]] = []
    for i in range(n):
        seg = vals16[bounds[i]:bounds[i + 1]]
        card = len(seg)
        if card > _ARRAY_MAX:
            bits = np.zeros(1024, dtype=np.uint64)
            np.bitwise_or.at(
                bits,
                (seg >> 6).astype(np.int64),
                np.uint64(1) << (seg.astype(np.uint64) & np.uint64(63)),
            )
            data = bits.astype("<u8").tobytes()
        else:
            data = seg.astype("<u2").tobytes()
        containers.append((int(uniq[i]), card, data))
    out = bytearray()
    out += struct.pack("<II", _COOKIE_NO_RUN, n)
    for k, card, _ in containers:
        out += struct.pack("<HH", k, card - 1)
    off = 8 + 4 * n + 4 * n  # headers precede the container area
    for _, _, data in containers:
        out += struct.pack("<I", off)
        off += len(data)
    for _, _, data in containers:
        out += data
    return bytes(out)


def _deserialize_rbm32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one 32-bit roaring bitmap starting at `pos`; returns
    (sorted uint32 values, position after the bitmap)."""
    if pos + 4 > len(buf):
        raise RoaringFormatError("truncated cookie")
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        nflag = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=nflag, offset=pos),
            bitorder="little",
        )[:n].astype(bool)
        pos += nflag
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_flags = np.zeros(n, dtype=bool)
        has_offsets = True
    else:
        raise RoaringFormatError(f"bad roaring cookie {cookie}")
    header = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=pos)
    pos += 4 * n
    keys = header[0::2].astype(np.uint32)
    cards = header[1::2].astype(np.int64) + 1
    if has_offsets:
        pos += 4 * n  # parse sequentially; offsets are redundant
    parts: list[np.ndarray] = []
    for i in range(n):
        base = keys[i] << 16
        if run_flags[i]:
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * nruns, offset=pos
            )
            pos += 4 * nruns
            segs = [
                np.arange(
                    int(runs[2 * j]),
                    int(runs[2 * j]) + int(runs[2 * j + 1]) + 1,
                    dtype=np.uint32,
                )
                for j in range(nruns)
            ]
            vals = (
                np.concatenate(segs) if segs
                else np.empty(0, dtype=np.uint32)
            )
        elif cards[i] > _ARRAY_MAX:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            vals = np.nonzero(bits)[0].astype(np.uint32)
        else:
            vals = np.frombuffer(
                buf, dtype="<u2", count=int(cards[i]), offset=pos
            ).astype(np.uint32)
            pos += 2 * int(cards[i])
        parts.append(base + vals)
    if not parts:
        return np.empty(0, dtype=np.uint32), pos
    return np.concatenate(parts), pos


# ------------------------------------------------- 64-bit (the DV form)

def serialize_roaring64(positions) -> bytes:
    """Ordinals (any iterable of non-negative ints) → the magic-prefixed
    portable 64-bit serialization Delta DVs store."""
    v = np.unique(np.asarray(list(positions), dtype=np.uint64))
    highs = (v >> np.uint64(32)).astype(np.uint32)
    lows = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    uniq, starts = np.unique(highs, return_index=True)
    bounds = list(starts) + [len(lows)]
    out = bytearray()
    out += struct.pack("<iQ", MAGIC, len(uniq))
    for i, h in enumerate(uniq):
        out += struct.pack("<I", int(h))
        out += _serialize_rbm32(lows[bounds[i]:bounds[i + 1]])
    return bytes(out)


def deserialize_roaring64(data: bytes) -> np.ndarray:
    """Magic-prefixed portable 64-bit serialization → sorted uint64
    ordinal array."""
    if len(data) < 12:
        raise RoaringFormatError("truncated 64-bit roaring header")
    magic, nbuckets = struct.unpack_from("<iQ", data, 0)
    if magic != MAGIC:
        raise RoaringFormatError(
            f"bad magic {magic} (expected {MAGIC})"
        )
    pos = 12
    parts: list[np.ndarray] = []
    for _ in range(nbuckets):
        (high,) = struct.unpack_from("<I", data, pos)
        pos += 4
        lows, pos = _deserialize_rbm32(data, pos)
        parts.append(
            (np.uint64(high) << np.uint64(32)) + lows.astype(np.uint64)
        )
    if pos != len(data):
        raise RoaringFormatError(
            f"{len(data) - pos} trailing bytes after bitmaps"
        )
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


# ------------------------------------------------------------------ Z85

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ base-85: 4 bytes → 5 chars, big-endian per group; input
    length must be a multiple of 4 (true for DV payloads and UUIDs)."""
    if len(data) % 4:
        raise ValueError("z85 input length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i:i + 5]:
            if c not in _Z85_DECODE:
                raise ValueError(f"invalid z85 character {c!r}")
            v = v * 85 + _Z85_DECODE[c]
        out += v.to_bytes(4, "big")
    return bytes(out)
