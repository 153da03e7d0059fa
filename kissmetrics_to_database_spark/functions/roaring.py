"""64-bit RoaringBitmap "portable" codec, from the PUBLIC format spec
(RoaringFormatSpec, github.com/RoaringBitmap/RoaringFormatSpec) — the
serialization Delta Lake deletion vectors carry
(delta.io PROTOCOL.md §Deletion Vector Format).

Layout (all little-endian):

- Roaring64 ("portable"): i64 count of 32-bit bitmaps, then per
  bitmap: u32 high key + a standard 32-bit RoaringBitmap.
- 32-bit RoaringBitmap: cookie u32 — either
  ``SERIAL_COOKIE_NO_RUNCONTAINER`` (12346) followed by u32 container
  count, or ``SERIAL_COOKIE`` (12347) with ``count-1`` packed in the
  high 16 bits and a run-container bitset following; then the
  descriptive header (per container: u16 key, u16 cardinality-1),
  the offset header (u32 per container — present for the 12346
  cookie always, for 12347 only when count ≥ 4), and the container
  payloads: ARRAY (sorted u16 values, cardinality ≤ 4096), BITMAP
  (8 KiB bitset), RUN (u16 n_runs, then per run u16 start +
  u16 length-1).

The encoder emits array/bitmap containers under the 12346 cookie
(the choice every writer may make — run containers are optional);
the decoder accepts all three container types, so real
Delta-written vectors decode too. Pure driver-side helper:
deletion vectors are per-FILE metadata, bounded by design.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _encode32(values: list[int]) -> bytes:
    """One 32-bit RoaringBitmap (12346 cookie, array/bitmap
    containers) from sorted distinct uint32 values."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    out = bytearray()
    out += struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    # offset header: byte position of each container from the start
    payloads = []
    for k in keys:
        lows = buckets[k]
        if len(lows) <= _ARRAY_MAX:
            payloads.append(struct.pack(f"<{len(lows)}H", *lows))
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            payloads.append(bytes(bits))
    pos = len(out) + 4 * len(keys)
    for p in payloads:
        out += struct.pack("<I", pos)
        pos += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def _decode32(buf: bytes, off: int) -> tuple[list[int], int]:
    """→ (sorted uint16-range values as ints with their low 16 bits,
    next offset). Accepts array, bitmap, and run containers."""
    (cookie,) = struct.unpack_from("<I", buf, off)
    run_bitset = b""
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        off += 4
        nbytes = (n + 7) // 8
        run_bitset = buf[off : off + nbytes]
        off += nbytes
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (n,) = struct.unpack_from("<I", buf, off + 4)
        off += 8
    else:
        raise ValueError(f"roaring: bad cookie {cookie}")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, off)
        headers.append((key, card_m1 + 1))
        off += 4
    has_offsets = cookie == SERIAL_COOKIE_NO_RUNCONTAINER or (
        n >= NO_OFFSET_THRESHOLD
    )
    if has_offsets:
        off += 4 * n  # offsets are redundant for sequential decode
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        is_run = bool(run_bitset) and bool(
            run_bitset[i // 8] & (1 << (i % 8))
        )
        base = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(n_runs):
                start, len_m1 = struct.unpack_from("<HH", buf, off)
                off += 4
                values.extend(base | v for v in range(start, start + len_m1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, off)
            off += 2 * card
            values.extend(base | v for v in vals)
        else:  # bitmap container
            bits = buf[off : off + 8192]
            off += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & (-b)
                    values.append(base | (byte_i << 3) | low.bit_length() - 1)
                    b ^= low
    return values, off


def serialize64(values: list[int]) -> bytes:
    """Sorted distinct uint64 row indexes → Roaring64 portable bytes."""
    values = sorted(set(int(v) for v in values))
    if any(v < 0 for v in values):
        raise ValueError("roaring: negative value")
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += _encode32(buckets[high])
    return bytes(out)


def deserialize64(buf: bytes) -> list[int]:
    """Roaring64 portable bytes → sorted uint64 values."""
    (n_maps,) = struct.unpack_from("<q", buf, 0)
    off = 8
    values: list[int] = []
    for _ in range(n_maps):
        (high,) = struct.unpack_from("<I", buf, off)
        off += 4
        lows, off = _decode32(buf, off)
        values.extend((high << 32) | v for v in lows)
    return values


# ---------------------------------------------------------------------------
# Z85 (ZeroMQ Base85) — the variant Delta uses to encode DV UUIDs and
# inline vectors (delta.io PROTOCOL.md; rfc.zeromq.org/spec/32)
# ---------------------------------------------------------------------------

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[word % 85])
            word //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            word = word * 85 + _Z85_INV[c]
        out += struct.pack(">I", word)
    return bytes(out)
