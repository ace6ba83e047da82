"""Pure-Python fallback codecs for scheme codes 2, 3 and 6-11.

The reference reaches lz4/snappy/blosc through optional C bindings
(recode_compressors.py:7-37) and simply errors when they are absent.  These
fallbacks keep every scheme code *executable* in dependency-free
environments:

* **LZ4 frame** (scheme 2) — full block-format encoder (greedy 4-byte hash
  matcher) and decoder, wrapped in an RFC-conformant frame (xxh32 header
  checksum, independent blocks, no content size — matching the reference's
  ``store_size=False``).  Output is readable by the real lz4 library and
  vice versa.
* **Snappy** (scheme 3) — encoder emitting literal + 2-byte-offset copy
  elements, full decoder for all four element types.
* **Blosc v1** (schemes 6-11) — header-conformant *memcpy-mode* streams
  (flags bit 1), which any real blosc decodes; the decoder accepts only
  memcpy-mode streams and raises for internally-compressed ones, which is
  the documented limit of the fallback.

These are correctness/capability fallbacks, not performance paths: the
default TPU pipeline uses scheme 0 with the device/native deflate.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------- xxh32

_PRIME1 = 2654435761
_PRIME2 = 2246822519
_PRIME3 = 3266489917
_PRIME4 = 668265263
_PRIME5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (needed for the LZ4 frame header checksum)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _PRIME1 + _PRIME2) & _M32
        v2 = (seed + _PRIME2) & _M32
        v3 = seed
        v4 = (seed - _PRIME1) & _M32
        while i <= n - 16:
            lanes = struct.unpack_from("<4I", data, i)
            v1 = (_rotl((v1 + lanes[0] * _PRIME2) & _M32, 13) * _PRIME1) & _M32
            v2 = (_rotl((v2 + lanes[1] * _PRIME2) & _M32, 13) * _PRIME1) & _M32
            v3 = (_rotl((v3 + lanes[2] * _PRIME2) & _M32, 13) * _PRIME1) & _M32
            v4 = (_rotl((v4 + lanes[3] * _PRIME2) & _M32, 13) * _PRIME1) & _M32
            i += 16
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        acc = (seed + _PRIME5) & _M32
    acc = (acc + n) & _M32
    while i <= n - 4:
        acc = (acc + struct.unpack_from("<I", data, i)[0] * _PRIME3) & _M32
        acc = (_rotl(acc, 17) * _PRIME4) & _M32
        i += 4
    while i < n:
        acc = (acc + data[i] * _PRIME5) & _M32
        acc = (_rotl(acc, 11) * _PRIME1) & _M32
        i += 1
    acc ^= acc >> 15
    acc = (acc * _PRIME2) & _M32
    acc ^= acc >> 13
    acc = (acc * _PRIME3) & _M32
    acc ^= acc >> 16
    return acc


# ----------------------------------------------------------------- LZ4 block


def _lz4_emit(out: bytearray, literals: bytes, offset: int, mlen: int) -> None:
    lit = len(literals)
    token = (min(lit, 15) << 4) | (min(mlen - 4, 15) if mlen else 0)
    out.append(token)
    if lit >= 15:
        rest = lit - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out.extend(literals)
    if mlen:
        out.extend(struct.pack("<H", offset))
        if mlen - 4 >= 15:
            rest = mlen - 4 - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)


def lz4_compress_block(src: bytes) -> bytes:
    """LZ4 block format, greedy 4-byte hash matcher."""
    n = len(src)
    if n == 0:
        return b"\x00"  # empty literal run
    out = bytearray()
    table: dict = {}
    i = 0
    anchor = 0
    limit = n - 12  # spec: last match must start >= 12 bytes from block end
    while i <= limit:
        key = src[i:i + 4]
        j = table.get(key, -1)
        table[key] = i
        if 0 <= j and i - j <= 0xFFFF and src[j:j + 4] == key:
            m, k = i + 4, j + 4
            maxm = n - 5  # spec: last 5 bytes are literals
            while m < maxm and src[m] == src[k]:
                m += 1
                k += 1
            _lz4_emit(out, src[anchor:i], i - j, m - i)
            anchor = i = m
        else:
            i += 1
    _lz4_emit(out, src[anchor:], 0, 0)
    return bytes(out)


def lz4_decompress_block(src: bytes, max_size: int = 1 << 31) -> bytes:
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while src[i] == 255:
                lit += 255
                i += 1
            lit += src[i]
            i += 1
        out.extend(src[i:i + lit])
        i += lit
        if i >= n:
            break  # last sequence: literals only
        offset = struct.unpack_from("<H", src, i)[0]
        i += 2
        mlen = (token & 15) + 4
        if (token & 15) == 15:
            while src[i] == 255:
                mlen += 255
                i += 1
            mlen += src[i]
            i += 1
        start = len(out) - offset
        for k in range(mlen):  # may self-overlap: byte-by-byte
            out.append(out[start + k])
        if len(out) > max_size:
            raise ValueError("LZ4 output exceeds limit")
    return bytes(out)


def lz4_frame_compress(data: bytes, level: int = 1) -> bytes:
    """Minimal LZ4 frame: v1, independent blocks, no content size/checksum
    (the reference's ``store_size=False`` profile)."""
    del level
    flg = 0x60  # version 01, block independence
    bd = 0x70   # 4 MB max block size
    hdr = bytes([flg, bd])
    hc = (xxh32(hdr) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", 0x184D2204) + hdr + bytes([hc]))
    pos = 0
    while pos < len(data) or pos == 0:
        chunk = data[pos:pos + (4 << 20)]
        pos += len(chunk)
        comp = lz4_compress_block(chunk)
        if len(comp) < len(chunk):
            out.extend(struct.pack("<I", len(comp)))
            out.extend(comp)
        else:
            out.extend(struct.pack("<I", len(chunk) | 0x80000000))
            out.extend(chunk)
        if pos >= len(data):
            break
    out.extend(struct.pack("<I", 0))  # end mark
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    magic = struct.unpack_from("<I", data, 0)[0]
    if magic != 0x184D2204:
        raise ValueError("not an LZ4 frame")
    flg = data[4]
    i = 6
    has_content_size = bool(flg & 0x08)
    has_content_checksum = bool(flg & 0x04)
    has_dict_id = bool(flg & 0x01)
    block_checksum = bool(flg & 0x10)
    if has_content_size:
        i += 8
    if has_dict_id:
        i += 4
    i += 1  # HC byte
    out = bytearray()
    while True:
        size = struct.unpack_from("<I", data, i)[0]
        i += 4
        if size == 0:
            break
        raw = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        blk = data[i:i + size]
        i += size
        if block_checksum:
            i += 4
        out.extend(blk if raw else lz4_decompress_block(blk))
    del has_content_checksum
    return bytes(out)


# -------------------------------------------------------------------- snappy


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def snappy_compress(src: bytes) -> bytes:
    n = len(src)
    out = bytearray(_uvarint(n))

    def emit_literal(lit: bytes) -> None:
        m = len(lit)
        while m > 0:
            take = min(m, 65536)
            if take <= 60:
                out.append((take - 1) << 2)
            elif take <= 256:
                out.append(60 << 2)
                out.append(take - 1)
            else:
                out.append(61 << 2)
                out.extend(struct.pack("<H", take - 1))
            out.extend(lit[:take])
            lit = lit[take:]
            m -= take

    table: dict = {}
    i = 0
    anchor = 0
    while i + 4 <= n:
        key = src[i:i + 4]
        j = table.get(key, -1)
        table[key] = i
        if 0 <= j and i - j <= 0xFFFF and src[j:j + 4] == key:
            m, k = i + 4, j + 4
            while m < n and src[m] == src[k]:
                m += 1
                k += 1
            emit_literal(src[anchor:i])
            offset = i - j
            mlen = m - i
            while mlen > 0:
                take = min(mlen, 64)
                if mlen - take in (1, 2, 3) and take > 4:
                    take -= 4  # keep the tail emittable (copies need len>=4)
                out.append(((take - 1) << 2) | 2)  # copy, 2-byte offset
                out.extend(struct.pack("<H", offset))
                mlen -= take
            anchor = i = m
        else:
            i += 1
    emit_literal(src[anchor:])
    return bytes(out)


def snappy_decompress(src: bytes) -> bytes:
    total = 0
    shift = 0
    i = 0
    while True:
        b = src[i]
        i += 1
        total |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
    out = bytearray()
    n = len(src)
    while i < n:
        tag = src[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                nb = length - 60
                length = int.from_bytes(src[i:i + nb], "little") + 1
                i += nb
            out.extend(src[i:i + length])
            i += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | src[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<H", src, i)[0]
            i += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = struct.unpack_from("<I", src, i)[0]
            i += 4
        start = len(out) - offset
        for k in range(length):
            out.append(out[start + k])
    if len(out) != total:
        raise ValueError(f"snappy: expected {total} bytes, got {len(out)}")
    return bytes(out)


# --------------------------------------------------------------------- blosc

_BLOSC_CODEC_IDS = {"blosclz": 0, "lz4": 1, "lz4hc": 1, "snappy": 2,
                    "zlib": 3, "zstd": 4}
_BLOSC_VERSION_FORMAT = 2
_BLOSC_MEMCPYED = 0x2


def blosc_compress(data: bytes, cname: str = "zlib", typesize: int = 1) -> bytes:
    """Header-conformant blosc v1 stream in memcpy mode (readable by real
    blosc; zero compression by design — this is a capability fallback)."""
    n = len(data)
    flags = _BLOSC_MEMCPYED | (_BLOSC_CODEC_IDS[cname] << 5)
    header = struct.pack("<BBBBIII", _BLOSC_VERSION_FORMAT, 1, flags,
                         typesize, n, n, n + 16)
    return header + data


def blosc_decompress(data: bytes) -> bytes:
    if len(data) < 16:
        raise ValueError("truncated blosc stream")
    _, _, flags, _, nbytes, _, cbytes = struct.unpack_from("<BBBBIII", data, 0)
    if not flags & _BLOSC_MEMCPYED:
        raise NotImplementedError(
            "pure-python blosc fallback reads only memcpy-mode streams; "
            "install blosc for internally-compressed ones")
    if cbytes != nbytes + 16:
        raise ValueError("inconsistent blosc memcpy stream")
    return bytes(data[16:16 + nbytes])
