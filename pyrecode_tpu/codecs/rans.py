"""TPU-rANS: interleaved range-ANS entropy codec (scheme 12).

The zstd-class member of the entropy matrix (SURVEY.md §7 step 5: "TPU-native
LZ+Huffman/ANS kernels for the deflate/zstd class").  Where the deflate
backend (scheme 0 path, codecs/dyndeflate.py) emits byte-exact zlib with a
bit-serial-hostile Huffman stage that device-encodes but must host-decode,
rANS is symmetric: W interleaved decoder states advance in lockstep, so BOTH
encode and decode vectorize over VPU lanes.  This module is the numpy
reference implementation (the oracle for the Pallas kernels in
ops/pallas_rans.py) plus the container glue.

Format (little-endian), scheme code 12 — a pyrecode-tpu extension; the
reference's scheme table stops at 11 (recode_compressors.py:103-118) and its
reader rejects unknown codes, exactly as it does for any codec library it
lacks:

    u8   magic   0xA5
    u8   version 1
    u8   log2_nways         (W = 1 << log2_nways interleaved states)
    u8   flags              bit0: stored (raw bytes follow, no coding)
                            bit1: SYMBOL mode — the payload is a bit-packed
                            stream of sym_bits-wide values coded directly
                            as symbols (no LZ layer, no extra bits); the
                            header then carries [u8 sym_bits, u8 pad,
                            u16 n_used, n_used x u16 symbol ids,
                            n_used x u16 freqs] instead of the byte-mode
                            used-bitmap + freq table
                            bit2 (with bit1): GAP transform — the decoded
                            symbols are not the payload itself but the runs
                            of clear bits of an LSB-first BITMAP of n_bytes
                            bytes: symbol s < 4095 advances the cursor by s
                            and sets one bit; s == 4095 advances 4095 and
                            sets nothing (escape).  Same size as byte-mode
                            coding of the bitmap (the entropy is identical)
                            but ~1/occupancy fewer symbols through the
                            serial rANS chain — 12.5x at the 1% operating
                            point, which is pure throughput on both encode
                            and decode.  sym_bits is always 12.
    u32  n_bytes            original length
    u32  n_tokens           LZ token count m
    u32  body_bytes         rANS byte-stream length
    u32  xbits_bytes        extra-bits stream length
    u8   used[36]           bitmap of used symbols (LSB-first)
    u16  freq[n_used]       12-bit quantized frequencies of used symbols
    u32  state[W]           final encoder states (decoder initial states)
    body                    rANS bytes in EMIT order (the encoder appends
                            forward; the decoder reads from the END
                            backward) — lets the device encoder use the
                            same forward window-append as every other
                            kernel here
    xbits                   bit-packed extra bits, LSB-first, token order
    u32  adler32            of the original bytes (big-endian, zlib-style)

LZ layer: the SAME per-byte run tokenizer as the deflate path
(codecs/dyndeflate.tokenize_bytes_np and its Pallas twin) — symbols 0..255
literals, 256..284 length codes with 0..5 extra bits, all matches at
distance 1, so no distance field is coded at all (deflate spends >=1 bit on
it).  Token i belongs to interleave lane i % W; the encoder walks tokens
last-to-first emitting renormalization bytes backward (descending lane order
within a step), the decoder walks first-to-last consuming them forward —
the classic interleaved rANS construction (Duda 2013; Giesen's ryg_rans).

rANS parameters: M = 4096 (12-bit quantization), byte renormalization,
state in [2^23, 2^31).
"""

from __future__ import annotations

import zlib
from typing import List, Tuple

import numpy as np

from .dyndeflate import LEN_BASE, LEN_EXTRA, NO_TOKEN, tokenize_bytes_np

MAGIC = 0xA5
VERSION = 1
SCHEME_CODE = 12
PROB_BITS = 12
M = 1 << PROB_BITS
RANS_L = 1 << 23              # state lower bound
NWAYS_DEFAULT = 512
N_SYM = 286                   # 0..255 literals, 256 unused (EOB slot kept
#                               for table parity with deflate), 257..284 len
GAP_BITS = 12                 # gap-mode symbol width (alphabet 4096)
GAP_ESCAPE = (1 << GAP_BITS) - 1   # 4095: advance 4095 positions, no bit

_HDR_FIXED = 4 + 4 * 4        # magic..xbits_bytes


def quantize_freqs(counts: np.ndarray, total: int = M) -> np.ndarray:
    """Quantize symbol counts to sum exactly ``total``, every used symbol
    >= 1 (deterministic: largest-remainder with stable ordering, then steal
    from the largest entries).

    Operates on the nonzero support only — with 4096-bin gap alphabets the
    full-size lexsort cost 0.15 ms per call and this runs twice per frame
    in the device scheme-12 host stage.  Identical output to the full-size
    formulation (zero-count symbols keep q=0 and sorted after all nonzero
    remainders, exactly as the old ``rema[counts == 0] = -1`` ordering)."""
    counts = np.asarray(counts, dtype=np.int64)
    n = counts.sum()
    if n == 0:
        q = np.zeros(counts.size, np.int64)
        q[0] = total
        return q.astype(np.uint16)
    sup = np.flatnonzero(counts)
    cs = counts[sup]
    ideal = cs * total / n
    qs = np.floor(ideal).astype(np.int64)
    qs[qs == 0] = 1
    diff = total - qs.sum()
    if diff > 0:
        rema = ideal - np.floor(ideal)
        order = np.lexsort((np.arange(sup.size), -rema))
        qs[order[:diff]] += 1
    elif diff < 0:
        for _ in range(-diff):
            cand = np.where(qs > 1, qs, -1)
            qs[int(cand.argmax())] -= 1
    q = np.zeros(counts.size, np.int64)
    q[sup] = qs
    assert q.sum() == total and (qs >= 1).all()
    return q.astype(np.uint16)


def _token_syms_and_extras(lut_idx: np.ndarray):
    """Token stream -> (symbols, extra_values, extra_bit_counts)."""
    tok = lut_idx[lut_idx != NO_TOKEN]
    is_lit = tok < 256
    take = np.where(is_lit, 0, tok - 256 + 3)
    c = (np.searchsorted(LEN_BASE, take, side="right") - 1).astype(np.int64)
    syms = np.where(is_lit, tok, 257 + c)
    eb = np.where(is_lit, 0, LEN_EXTRA[np.clip(c, 0, 28)])
    ev = np.where(is_lit, 0, take - LEN_BASE[np.clip(c, 0, 28)])
    return syms.astype(np.int64), ev.astype(np.int64), eb.astype(np.int64)


def _pack_bits(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """LSB-first variable-width bit packing (token order)."""
    total = int(nbits.sum())
    if total == 0:
        return b""
    out = np.zeros((total + 7) // 8, np.uint8)
    offs = np.concatenate([[0], np.cumsum(nbits)[:-1]]) if nbits.size else \
        np.zeros(0, np.int64)
    sv = values.astype(np.uint64) << (offs % 8).astype(np.uint64)
    tgt = offs // 8
    for k in range(3):
        contrib = ((sv >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
        t = np.minimum(tgt + k, max(out.size - 1, 0))
        np.add.at(out, t, contrib)
    return out.tobytes()


def _unpack_bits(blob: bytes, nbits: np.ndarray) -> np.ndarray:
    data = np.frombuffer(blob, np.uint8)
    out = np.zeros(nbits.size, np.int64)
    if data.size == 0:
        return out
    offs = np.concatenate([[0], np.cumsum(nbits)[:-1]]) if nbits.size else \
        np.zeros(0, np.int64)
    for k in range(3):
        idx = np.minimum(offs // 8 + k, max(data.size - 1, 0))
        out |= data[idx].astype(np.int64) << (8 * k)
    out >>= offs % 8
    return out & ((1 << nbits) - 1)


def rans_encode_interleaved(syms: np.ndarray, freq: np.ndarray,
                            nways: int) -> Tuple[bytes, np.ndarray]:
    """Interleaved rANS encode (numpy reference).

    Token i belongs to lane i % nways.  Tokens are processed last-to-first;
    within one position, renormalization bytes are emitted in DESCENDING
    lane order.  Returns (body bytes in EMIT order — the decoder walks them
    backward — and final states u32[nways] = the decoder's initial states).
    """
    freq = np.asarray(freq, np.int64)
    cum = np.zeros(freq.size + 1, np.int64)
    cum[1:] = np.cumsum(freq)
    m = syms.size
    x = np.full(nways, RANS_L, np.int64)
    chunks: List[bytes] = []
    # process whole interleave rows from the last; lanes within a row step
    # together (vectorized over lanes, like the device kernel); bytes within
    # a row in descending lane order, low byte first per lane.  Each lane
    # emits at most 2 bytes per symbol (x < 2^31, threshold f << 19).
    x_max_mul = (RANS_L >> PROB_BITS) << 8   # per unit freq
    start = (m - 1) - ((m - 1) % nways) if m else 0
    rev = np.arange(nways - 1, -1, -1)
    for row in range(start, -1, -nways):
        w = min(nways, m - row)
        s = syms[row: row + w]
        f = freq[s]
        c = cum[s]
        xr = x[:w]
        xm = x_max_mul * f
        e0 = xr >= xm
        b0 = xr & 0xFF
        x1 = np.where(e0, xr >> 8, xr)
        e1 = e0 & (x1 >= xm)
        b1 = x1 & 0xFF
        x2 = np.where(e1, x1 >> 8, x1)
        if e0.any():
            # (lane desc, low byte first): interleave per-lane (b0, b1)
            pairs = np.empty((w, 2), np.uint8)
            pairs[:, 0] = b0
            pairs[:, 1] = b1
            keep = np.empty((w, 2), bool)
            keep[:, 0] = e0
            keep[:, 1] = e1
            r = rev[nways - w:] if w != nways else rev
            chunks.append(pairs[r][keep[r]].tobytes())
        x[:w] = ((x2 // f) << PROB_BITS) + (x2 % f) + c
    return b"".join(chunks), x.astype(np.uint32)


def rans_decode_interleaved(body: bytes, states: np.ndarray, m: int,
                            freq: np.ndarray, nways: int) -> np.ndarray:
    """Inverse of :func:`rans_encode_interleaved` -> symbols i64[m]."""
    freq = np.asarray(freq, np.int64)
    cum = np.zeros(freq.size + 1, np.int64)
    cum[1:] = np.cumsum(freq)
    slot2sym = np.repeat(np.arange(freq.size), freq).astype(np.int64)
    # body is in emit order: reverse once, then read forward (vectorized
    # over lanes per row, the same structure as the device kernel; each
    # lane consumes 0..2 bytes per symbol, decidable from the state alone)
    drev = np.frombuffer(body, np.uint8)[::-1].astype(np.int64)
    x = np.asarray(states, np.int64).copy()
    c = 0
    out = np.zeros(m, np.int64)
    for row in range(0, m, nways):
        w = min(nways, m - row)
        xr = x[:w]
        slot = xr & (M - 1)
        s = slot2sym[slot]
        out[row: row + w] = s
        xp = freq[s] * (xr >> PROB_BITS) + slot - cum[s]
        nb = (xp < RANS_L).astype(np.int64) + (xp < (RANS_L >> 8))
        total = int(nb.sum())
        if c + total > drev.size:
            raise ValueError("TPU-rANS stream corrupt (body underflow)")
        pos = c + np.cumsum(nb) - nb
        safe1 = np.minimum(pos, drev.size - 1) if drev.size else pos * 0
        safe2 = np.minimum(pos + 1, drev.size - 1) if drev.size else pos * 0
        b1 = drev[safe1] if drev.size else np.zeros(w, np.int64)
        b2 = drev[safe2] if drev.size else np.zeros(w, np.int64)
        x1 = np.where(nb >= 1, (xp << 8) | b1, xp)
        x2 = np.where(nb == 2, (x1 << 8) | b2, x1)
        x[:w] = x2
        c += total
    return out


def _syms_to_tokens(syms: np.ndarray, extras: np.ndarray) -> np.ndarray:
    """(symbol, extra value) -> byte-stream reconstruction tokens
    (value, run_take): literals (v, 1); matches (copy-prev, take)."""
    is_lit = syms < 256
    c = np.where(is_lit, 0, syms - 257)
    take = np.where(is_lit, 1, LEN_BASE[np.clip(c, 0, 28)] + extras)
    return take.astype(np.int64)


def _finish_stream(n, m, nways, freq, states, body, xbits, adler) -> bytes:
    """Assemble a coded scheme-12 stream from its parts (shared by the
    numpy and device encoders)."""
    hdr = bytearray()
    hdr += bytes([MAGIC, VERSION, int(np.log2(nways)), 0])
    hdr += int(n).to_bytes(4, "little")
    hdr += int(m).to_bytes(4, "little")
    hdr += len(body).to_bytes(4, "little")
    hdr += len(xbits).to_bytes(4, "little")
    freq = np.asarray(freq)
    used = freq > 0
    hdr += np.packbits(used, bitorder="little").tobytes()
    hdr += freq[used].astype("<u2").tobytes()
    hdr += np.asarray(states).astype("<u4").tobytes()
    return bytes(hdr) + body + xbits + int(adler).to_bytes(4, "big")


def _finish_stream_symbols(n, m, nways, sym_bits, freq_sparse_syms,
                           freq_sparse_vals, states, body, adler,
                           gap: bool = False) -> bytes:
    """Assemble a SYMBOL-MODE (flags bit1) scheme-12 stream.

    Symbol mode codes the pixel-value stream directly over ``sym_bits``-wide
    symbols instead of bytes of the packed stream — real detector residuals
    are peaked near zero (Datta et al. 2021), and byte-granular models lose
    ~1 bit/value to the 12-bit pack phase misalignment; direct symbols
    recover it (measured: ideal 12-bit model is 25-80% smaller than
    byte-deflate on exponential residuals).  The frequency table is sparse
    (u16 symbol ids + u16 freqs), since peaked data uses few of the 2^b
    symbols."""
    hdr = bytearray()
    hdr += bytes([MAGIC, VERSION, int(np.log2(nways)), 6 if gap else 2])
    hdr += int(n).to_bytes(4, "little")
    hdr += int(m).to_bytes(4, "little")
    hdr += len(body).to_bytes(4, "little")
    hdr += (0).to_bytes(4, "little")          # no extra-bits stream
    hdr += bytes([int(sym_bits), 0])
    hdr += int(len(freq_sparse_syms)).to_bytes(2, "little")
    hdr += np.asarray(freq_sparse_syms).astype("<u2").tobytes()
    hdr += np.asarray(freq_sparse_vals).astype("<u2").tobytes()
    hdr += np.asarray(states).astype("<u4").tobytes()
    return bytes(hdr) + body + int(adler).to_bytes(4, "big")


def _stored_stream(raw: bytes, adler: int) -> bytes:
    """Stored-block fallback stream (flags bit0): header + raw + adler."""
    n = len(raw)
    hdr = bytes([MAGIC, VERSION, 0, 1]) + n.to_bytes(4, "little") \
        + (0).to_bytes(4, "little") + n.to_bytes(4, "little") \
        + (0).to_bytes(4, "little")
    return hdr + raw + int(adler).to_bytes(4, "big")


# a stored stream is n + _STORED_OVERHEAD bytes; the coded stream wins only
# if strictly smaller
_STORED_OVERHEAD = _HDR_FIXED + 4


def _parse_header(stream: bytes) -> dict:
    """Validated parse of a scheme-12 stream into its fields.

    Every length is checked against the buffer before use and the frequency
    table must sum to exactly M — corrupt or truncated input raises
    ValueError instead of reading out of bounds (the native C++ decoder
    applies the same checks)."""
    if len(stream) < _HDR_FIXED or stream[0] != MAGIC:
        raise ValueError("not a TPU-rANS stream")
    if stream[1] != VERSION:
        raise ValueError(f"unsupported TPU-rANS version {stream[1]}")
    if stream[2] > 16:
        raise ValueError("TPU-rANS stream corrupt (lane count)")
    nways = 1 << stream[2]
    flags = stream[3]
    n = int.from_bytes(stream[4:8], "little")
    m = int.from_bytes(stream[8:12], "little")
    body_bytes = int.from_bytes(stream[12:16], "little")
    xbits_bytes = int.from_bytes(stream[16:20], "little")
    p = _HDR_FIXED
    if flags & 1:
        if p + n + 4 > len(stream):
            raise ValueError("TPU-rANS stream truncated")
        raw = stream[p: p + n]
        adler = int.from_bytes(stream[p + n: p + n + 4], "big")
        if zlib.adler32(raw) != adler:
            raise ValueError("TPU-rANS stream corrupt (adler mismatch)")
        return {"stored": raw}
    if flags & 2:  # symbol mode: sparse frequency table over 2^sym_bits
        if p + 4 > len(stream):
            raise ValueError("TPU-rANS stream truncated")
        sym_bits = stream[p]
        if not 8 <= sym_bits <= 16:
            raise ValueError("TPU-rANS stream corrupt (symbol width)")
        if (flags & 4) and sym_bits != GAP_BITS:
            raise ValueError("TPU-rANS stream corrupt (gap symbol width)")
        n_used = int.from_bytes(stream[p + 2: p + 4], "little")
        p += 4
        if n_used == 0 or n_used > (1 << sym_bits) or \
                p + 4 * n_used + 4 * nways + body_bytes + 4 > len(stream):
            raise ValueError("TPU-rANS stream truncated")
        sp_syms = np.frombuffer(stream[p: p + 2 * n_used], "<u2").astype(np.int64)
        p += 2 * n_used
        sp_vals = np.frombuffer(stream[p: p + 2 * n_used], "<u2").astype(np.int64)
        p += 2 * n_used
        if (sp_syms >= (1 << sym_bits)).any() or \
                (np.diff(sp_syms) <= 0).any() or sp_vals.sum() != M:
            raise ValueError("TPU-rANS stream corrupt (frequency table)")
        freq = np.zeros(1 << sym_bits, np.int64)
        freq[sp_syms] = sp_vals
        states = np.frombuffer(stream[p: p + 4 * nways], "<u4")
        p += 4 * nways
        body = stream[p: p + body_bytes]
        p += body_bytes
        adler = int.from_bytes(stream[p: p + 4], "big")
        return {"nways": nways, "n": n, "m": m, "freq": freq,
                "states": states, "body": body, "adler": adler,
                "sym_bits": sym_bits, "gap": bool(flags & 4)}
    bm_len = (N_SYM + 7) // 8
    if p + bm_len > len(stream):
        raise ValueError("TPU-rANS stream truncated")
    used = np.unpackbits(
        np.frombuffer(stream[p: p + bm_len], np.uint8),
        bitorder="little")[:N_SYM].astype(bool)
    p += bm_len
    n_used = int(used.sum())
    if p + 2 * n_used + 4 * nways + body_bytes + xbits_bytes + 4 > len(stream):
        raise ValueError("TPU-rANS stream truncated")
    freq = np.zeros(N_SYM, np.int64)
    freq[used] = np.frombuffer(stream[p: p + 2 * n_used], "<u2")
    p += 2 * n_used
    if freq.sum() != M:
        raise ValueError("TPU-rANS stream corrupt (frequency table)")
    states = np.frombuffer(stream[p: p + 4 * nways], "<u4")
    p += 4 * nways
    body = stream[p: p + body_bytes]
    p += body_bytes
    xbits = stream[p: p + xbits_bytes]
    p += xbits_bytes
    adler = int.from_bytes(stream[p: p + 4], "big")
    return {"nways": nways, "n": n, "m": m, "freq": freq, "states": states,
            "body": body, "xbits": xbits, "adler": adler}


def _reconstruct_bytes(syms: np.ndarray, xbits: bytes, n: int,
                       adler: int) -> bytes:
    """Symbols + extra-bit stream -> original bytes, adler-verified.

    A literal emits its byte; a match copies the previous byte ``take``
    times (all matches are distance 1).  Match tokens replicate the byte
    before their start: the tokenizer guarantees a run's leading literal
    precedes its matches, so filling forward over match spans reproduces
    the bytes exactly."""
    from .. import native

    raw = None
    try:
        raw = native.rans_reconstruct(syms, xbits, n)  # memcpy-class C loop
    except ValueError:
        raise ValueError("TPU-rANS stream corrupt (length mismatch)")
    if raw is None:
        # numpy fallback: every op runs at TOKEN granularity (4-5x fewer
        # elements than bytes); the single per-byte pass is the np.repeat
        # expansion.  A match copies the last literal at or before it in
        # token order, which equals the run's leading literal (distance-1
        # matches; see docstring).
        eb = np.where(syms < 256, 0,
                      LEN_EXTRA[np.clip(syms - 257, 0, 28)]).astype(np.int64)
        ev = _unpack_bits(xbits, eb)
        takes = _syms_to_tokens(syms, ev)
        if (takes.sum() if takes.size else 0) != n:
            raise ValueError("TPU-rANS stream corrupt (length mismatch)")
        is_lit = syms < 256
        m = syms.size
        last_idx = np.maximum.accumulate(np.where(is_lit, np.arange(m), -1))
        vals = np.where(last_idx >= 0, syms[np.maximum(last_idx, 0)],
                        0).astype(np.uint8)   # corrupt leading match -> 0
        raw = np.repeat(vals, takes).tobytes()
    if zlib.adler32(raw) != adler:
        raise ValueError("TPU-rANS stream corrupt (adler mismatch)")
    return raw


def _host_decompress(stream: bytes) -> bytes:
    """Fast host decode: the native C++ decoder when available, else the
    numpy reference (whose rANS loop is per-token Python — slow)."""
    from .. import native

    if native.available():
        return native.rans_decompress(stream)
    return decompress(stream)



def compress(data: bytes, nways: int = NWAYS_DEFAULT) -> bytes:
    """Compress ``data`` into a TPU-rANS stream (numpy reference path)."""
    raw = np.frombuffer(bytes(data), np.uint8)
    n = raw.size
    lut_idx, _ = tokenize_bytes_np(raw)
    syms, ev, eb = _token_syms_and_extras(lut_idx)
    m = syms.size
    # small streams: fewer interleave lanes (4 B of final state per lane)
    while nways > 8 and nways > m:
        nways //= 2
    counts = np.bincount(syms, minlength=N_SYM)
    freq = quantize_freqs(counts)
    body, states = rans_encode_interleaved(syms, freq, nways)
    xbits = _pack_bits(ev, eb)
    adler = zlib.adler32(bytes(data))

    stream = _finish_stream(n, m, nways, freq, states, body, xbits, adler)
    if len(stream) > n + _STORED_OVERHEAD:
        return _stored_stream(bytes(data), adler)
    return stream


def compress_symbols(data: bytes, sym_bits: int,
                     nways: int = NWAYS_DEFAULT) -> bytes:
    """Compress a bit-packed value stream over ``sym_bits``-wide symbols.

    ``data`` is an LSB-first packed stream of ``sym_bits``-bit values (the
    container's packed-pixval wire format, oracle.bit_pack); symbols are
    coded directly, skipping the byte-granularity model.  Falls back to the
    byte-mode coder or a stored stream when those are smaller (many distinct
    symbols, tiny streams).  Requires 8 <= sym_bits <= 16."""
    if not 8 <= sym_bits <= 16:
        raise ValueError("symbol mode supports 8..16-bit symbols")
    data = bytes(data)
    n = len(data)
    m = n * 8 // sym_bits
    # 4*nways bytes of final state are pure header overhead: cap lanes so
    # states stay ~1.5% of the symbol count (64 symbols/lane amortizes them),
    # floor 8 so tiny streams still interleave
    eff = min(nways, max(8, 1 << int(np.log2(max(m // 64, 1)))))

    from .. import native

    if native.available():
        # the C encoder is byte-identical to the numpy path below (parity
        # test in test_native.py) and ~1000x faster on big streams
        stream = native.rans_compress_symbols_native(data, sym_bits, eff)
        if stream is None:   # pad bits nonzero / alphabet too wide
            return native.rans_compress(data, nways)
        alt = native.rans_compress(data, nways)
        if len(alt) < len(stream):
            return alt
        if len(stream) > n + _STORED_OVERHEAD:
            return _stored_stream(data, zlib.adler32(data))
        return stream

    adler = zlib.adler32(data)
    from .. import oracle

    vals = oracle.bit_unpack(data, sym_bits, m,
                             dtype=np.uint32).astype(np.int64)
    # trailing pad bits must be zero or re-packing won't reproduce the bytes
    repack = oracle.bit_pack(vals.astype(np.uint64), sym_bits)
    if repack.tobytes() != data:
        return compress(data, nways)
    counts = np.bincount(vals, minlength=1 << sym_bits)
    used = counts > 0
    n_used = int(used.sum())
    if n_used > M:            # every used symbol needs freq >= 1 out of M
        return compress(data, nways)
    freq = quantize_freqs(counts).astype(np.int64)
    body, states = rans_encode_interleaved(vals, freq, eff)
    sp = np.flatnonzero(used)
    stream = _finish_stream_symbols(n, m, eff, sym_bits, sp, freq[sp],
                                    states, body, adler)
    alt = compress(data, nways)
    if len(alt) < len(stream):
        return alt
    if len(stream) > n + _STORED_OVERHEAD:
        return _stored_stream(data, adler)
    return stream


def bitmap_to_gaps(bitmap: np.ndarray) -> np.ndarray:
    """LSB-first bitmap bytes -> gap-mode symbol stream (int64).

    For each set bit at linear position ``p`` (previous set position
    ``prev``, starting at -1), the run of clear bits ``g = p - prev - 1`` is
    emitted as ``g // 4095`` escape symbols (4095) followed by the literal
    ``g % 4095``.  Trailing clear bits after the last set bit are implied by
    the bitmap length (the stream header's ``n_bytes``)."""
    bits = np.unpackbits(np.ascontiguousarray(bitmap, dtype=np.uint8),
                         bitorder="little")
    pos = np.flatnonzero(bits).astype(np.int64)
    if pos.size == 0:
        return np.zeros(0, np.int64)
    gaps = np.diff(pos, prepend=np.int64(-1)) - 1
    esc = gaps // GAP_ESCAPE
    m = int(esc.sum()) + gaps.size
    syms = np.full(m, GAP_ESCAPE, np.int64)
    syms[np.cumsum(esc + 1) - 1] = gaps % GAP_ESCAPE
    return syms


def gaps_to_bitmap(syms: np.ndarray, n_bytes: int) -> bytes:
    """Inverse of :func:`bitmap_to_gaps` (raises ValueError on overrun)."""
    syms = np.asarray(syms, np.int64)
    is_lit = syms != GAP_ESCAPE
    adv = np.where(is_lit, syms + 1, np.int64(GAP_ESCAPE))
    ends = np.cumsum(adv)
    pos = ends[is_lit] - 1
    if pos.size and int(pos[-1]) >= n_bytes * 8:
        raise ValueError("TPU-rANS stream corrupt (gap overrun)")
    bits = np.zeros(n_bytes * 8, np.uint8)
    bits[pos] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def compress_gaps(bitmap: bytes, nways: int = NWAYS_DEFAULT) -> bytes:
    """Compress an LSB-first BITMAP via the gap transform (flags 2|4).

    Size-equivalent to byte-symbol coding of the same bitmap (identical
    entropy) but with one symbol per SET BIT instead of one per byte —
    ~1/occupancy fewer trips through the serial rANS chain.  Falls back to
    byte-symbol mode when the transform cannot win (empty or dense bitmaps,
    where set bits outnumber bytes)."""
    bitmap = bytes(bitmap)
    n = len(bitmap)
    syms = bitmap_to_gaps(np.frombuffer(bitmap, np.uint8))
    m = syms.size
    if m == 0 or m > n:
        return compress_symbols(bitmap, 8, nways)
    adler = zlib.adler32(bitmap)
    eff = min(nways, max(8, 1 << int(np.log2(max(m // 64, 1)))))

    from .. import native

    if native.available():
        stream = native.rans_compress_gaps_native(bitmap, eff)
    else:
        counts = np.bincount(syms, minlength=1 << GAP_BITS)
        freq = quantize_freqs(counts).astype(np.int64)
        body, states = rans_encode_interleaved(syms, freq, eff)
        sp = np.flatnonzero(counts > 0)
        stream = _finish_stream_symbols(n, m, eff, GAP_BITS, sp, freq[sp],
                                        states, body, adler, gap=True)
    if stream is None:
        return compress_symbols(bitmap, 8, nways)
    # the sparse gap table (4 bytes/used symbol, up to 4096 entries) can
    # outweigh the transform at very low occupancy — keep whichever wins
    alt = compress_symbols(bitmap, 8, nways)
    if len(alt) < len(stream):
        return alt
    if len(stream) > n + _STORED_OVERHEAD:
        return _stored_stream(bitmap, adler)
    return stream


def decompress(stream: bytes) -> bytes:
    """Decompress a TPU-rANS stream (numpy reference path)."""
    h = _parse_header(stream)
    if "stored" in h:
        return h["stored"]
    syms = rans_decode_interleaved(h["body"], h["states"], h["m"], h["freq"],
                                   h["nways"])
    if "sym_bits" in h:
        if h.get("gap"):
            raw = gaps_to_bitmap(syms, h["n"])
            if zlib.adler32(raw) != h["adler"]:
                raise ValueError("TPU-rANS stream corrupt (adler mismatch)")
            return raw
        from .. import oracle

        raw = oracle.bit_pack(syms.astype(np.uint64), h["sym_bits"]).tobytes()
        raw = raw[: h["n"]] + b"\x00" * (h["n"] - len(raw))
        if zlib.adler32(raw) != h["adler"]:
            raise ValueError("TPU-rANS stream corrupt (adler mismatch)")
        return raw
    return _reconstruct_bytes(syms, h["xbits"], h["n"], h["adler"])


# ------------------------------------------------------- device pipelines


def rans_batch_device(streams, lengths, raw_cb=None, interpret=None):
    """Device scheme-12 encode of a batch of byte streams.

    Tokenization/histogram/adler (shared pass A), token compaction, the
    interleaved-rANS coding AND the extra-bits packing all run on device;
    the host contributes only O(alphabet) frequency quantization and
    header assembly.  Output is byte-identical to ``codecs.rans.compress``
    / ``native.rans_compress`` at nways = W_LANES (streams small enough
    that those pick fewer lanes still DECODE identically here — the format
    records nways — but this encoder always uses W_LANES).

    ``streams`` (B, NPAD) u8, NPAD % CH_A == 0; ``lengths`` (B,) i32.
    Returns a list of B scheme-12 streams.
    """
    import jax.numpy as jnp

    from ..ops import pallas_deflate as pdk
    from ..ops import pallas_rans as prk

    streams = jnp.asarray(streams, dtype=jnp.uint8)
    B, npad = streams.shape
    lengths = np.asarray(lengths, dtype=np.int32)

    tok, hist, adler = pdk.tokenize_pallas(streams, jnp.asarray(lengths),
                                           interpret=interpret)
    hist_np = np.asarray(hist)
    adler_np = np.asarray(adler)
    tok_counts = hist_np[:, :286].sum(axis=1).astype(np.int64)
    tok_max = int(tok_counts.max()) if B else 0
    # the rANS kernel consumes DENSE tokens (slot i = token i), so the
    # compaction pass is mandatory here — unlike the deflate assemble,
    # which tolerates interspersed no-token slots
    tok_bound = max(prk.CH_R, 1 << int(np.ceil(np.log2(max(tok_max, 1)))))
    tok_bound = min(tok_bound, -(-npad // prk.CH_R) * prk.CH_R)
    from ..ops.pallas_encode import CAPACITY_BUCKETS

    density = tok_max / max(int(lengths.max()), 1)
    bucket = pdk.compact_bucket_for(density)
    while True:
        dense, _, covf = pdk.compact_tokens(tok, tok_bound, bucket=bucket,
                                            interpret=interpret)
        if not bool(np.asarray(covf).any()) or \
                bucket >= len(CAPACITY_BUCKETS) - 1:
            break
        bucket += 1

    # host O(alphabet): quantized tables + the two radix LUTs
    freqs = np.zeros((B, N_SYM), np.uint16)
    eluts = np.zeros((B, 96, 32), np.float32)
    xluts = np.zeros((B, 48, 32), np.float32)
    for i in range(B):
        freqs[i] = quantize_freqs(hist_np[i, :286].astype(np.int64))
        from ..ops.pallas_rans import encode_luts_radix

        full = encode_luts_radix(freqs[i])
        eluts[i] = full
        # xbits LUT for assemble_pallas: values = ev(idx), bits = eb(idx)
        xluts[i, 0:24] = full[72:96]     # ev
        xluts[i, 24:48] = full[48:72]    # eb

    # rANS body bound: <= 2 bytes/token + per-lane flush margin
    out_bound = min(2 * npad, 2 * tok_bound) + 4096
    body, states, cnts = prk.rans_encode_pallas(
        dense, jnp.asarray(eluts), tok_counts.astype(np.int32), out_bound,
        interpret=interpret)

    # extra-bits stream: the deflate assemble kernel with the (ev, eb) LUT
    xb_bound = (5 * tok_bound + 7) // 8 + 256
    zeros = jnp.zeros((B,), jnp.int32)
    xbody, xbits_tot, xovf = pdk.assemble_pallas(
        dense, jnp.asarray(xluts), zeros, zeros, xb_bound,
        nw=pdk.window_rows_for(5 * pdk.CH_B + 8), interpret=interpret)
    assert not bool(np.asarray(xovf).any())

    body_np_cnt = np.asarray(cnts)
    xbits_np = np.asarray(xbits_tot)
    states_np = np.asarray(states)
    results = []
    for i in range(B):
        n = int(lengths[i])
        bc = int(body_np_cnt[i])
        body_i = np.asarray(body[i, :bc]).astype(np.uint8).tobytes()
        xb = int(xbits_np[i])
        xbits_i = np.asarray(
            xbody[i, : (xb + 7) // 8]).astype(np.uint8).tobytes()
        stream = _finish_stream(n, int(tok_counts[i]), prk.W_LANES,
                                freqs[i], states_np[i], body_i, xbits_i,
                                int(adler_np[i]))
        if len(stream) > n + _STORED_OVERHEAD:
            raw = raw_cb(i) if raw_cb is not None else \
                np.asarray(streams[i, :n]).tobytes()
            stream = _stored_stream(raw, int(adler_np[i]))
        results.append(stream)
    return results


def _adler32_device_chunks(packed, plens):
    """adler32 of per-row byte streams computed ON DEVICE in chunked form.

    Returns host ints.  The device does one masked pass over the bytes
    (per-2048-byte partial sums mod 65521 — products stay < 2^31); the host
    combines the (B, n_chunks) partials with exact integer arithmetic.
    """
    import jax.numpy as jnp

    B, NB = packed.shape
    CH = 2048
    pad = (-NB) % CH
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
        NB += pad
    nch = NB // CH
    d = packed.reshape(B, nch, CH).astype(jnp.int32)
    gidx = (jnp.arange(nch)[:, None] * CH + jnp.arange(CH)[None, :])
    lens = jnp.asarray(plens, jnp.int32)[:, None, None]
    d = jnp.where(gidx[None] < lens, d, 0)
    jloc = jnp.arange(CH, dtype=jnp.int32)[None, None, :]
    s1 = jnp.sum(d, axis=2) % 65521                    # (B, nch)
    s2 = jnp.sum(d * jloc, axis=2) % 65521             # (B, nch)
    s1_np = np.asarray(s1).astype(np.int64)
    s2_np = np.asarray(s2).astype(np.int64)
    plens = np.asarray(plens, np.int64)
    # B = n + sum_i (n - i) * d_i = n + sum_c [(n - base_c)*s1_c - s2_c];
    # vectorized: the per-chunk python loop cost 0.55 ms/frame at 4096^2,
    # half the scheme-12 host stage.  Products < 2^38, sums < 2^49: int64.
    base = np.arange(nch, dtype=np.int64) * CH
    a_all = (1 + s1_np.sum(axis=1)) % 65521
    bacc_all = (plens
                + ((plens[:, None] - base[None, :]) * s1_np - s2_np).sum(axis=1))
    return [int(((bacc_all[i] % 65521) << 16) | a_all[i]) for i in range(B)]


def rans_symbols_batch_device(packed, plens, sym_bits, raw_cb=None,
                              interpret=None):
    """Device scheme-12 SYMBOL-MODE encode of bit-packed value streams.

    ``packed`` (B, NB) u8 device array of LSB-first ``sym_bits``-bit values
    (the packed-pixval wire format); ``plens`` (B,) true byte lengths.  The
    unpack, 4096-bin histogram, and interleaved-rANS coding run on device
    (ops/pallas_rans.py); the host does O(alphabet) frequency quantization
    and header assembly.  Streams where symbol coding cannot win (pad bits
    nonzero is impossible by construction; n_used > M never happens for
    12-bit) fall back to stored blocks.  Returns a list of B scheme-12
    streams (flags bit1), decodable by :func:`decompress` and the device
    bulk reader path.
    """
    import jax.numpy as jnp

    from ..ops import bitpack, pallas_rans as prk

    if not 8 <= sym_bits <= 12:
        raise ValueError("device symbol mode supports 8..12-bit symbols")
    packed = jnp.asarray(packed, jnp.uint8)
    B, NB = packed.shape
    plens = np.asarray(plens, np.int64)
    ms = (plens * 8 // sym_bits).astype(np.int64)

    _, g_bytes = bitpack.packed_group_shape(sym_bits)
    padb = (-NB) % (g_bytes * 1024)
    if padb:
        packed = jnp.pad(packed, ((0, 0), (0, padb)))
    values = bitpack.bitunpack_values(packed, sym_bits,
                                      out_dtype=jnp.int32)
    npad = -(-values.shape[1] // prk.CH_R) * prk.CH_R
    if npad != values.shape[1]:
        values = jnp.pad(values, ((0, 0), (0, npad - values.shape[1])))

    hist = prk.hist_symbols_pallas(values, ms.astype(np.int32),
                                   interpret=interpret)
    hist_np = np.asarray(hist).astype(np.int64)
    adlers = _adler32_device_chunks(packed, plens)

    freqs = np.zeros((B, 1 << sym_bits), np.int64)
    # 8-bit alphabets take the compact (8, 64) radix LUT — the kernel's hi
    # one-hot and bilinear-fetch intermediate shrink 16x per grid step
    lut_fn = prk.encode_luts_symbols8 if sym_bits == 8 \
        else prk.encode_luts_symbols
    eluts = np.zeros((B,) + lut_fn(np.ones(2, np.int64)).shape, np.float32)
    for i in range(B):
        freqs[i] = quantize_freqs(hist_np[i, : 1 << sym_bits]).astype(np.int64)
        eluts[i] = lut_fn(freqs[i])

    # interleave width: 8 independent state rows (W = 8192) break the
    # kernel's serial row chain (it is latency-bound at W = 1024), but cost
    # 4*W bytes of header; use them only when every device-coded stream
    # amortizes 32 KB of states to < ~3% (m >= 2^21 symbols)
    dev_ms = ms[ms >= 65536]
    groups = prk.ROWS_R if dev_ms.size and int(dev_ms.min()) >= (1 << 21) \
        else 1
    out_bound = 2 * npad + 4096
    body, states, cnts = prk.rans_encode_symbols_pallas(
        values, jnp.asarray(eluts), ms.astype(np.int32), out_bound,
        interpret=interpret, groups=groups)

    cnts_np = np.asarray(cnts)
    states_np = np.asarray(states)
    results = []
    for i in range(B):
        n = int(plens[i])
        if ms[i] < 65536:
            # the kernel's fixed interleave lanes cost 4*W bytes of final
            # state — pure header overhead that swamps small streams; the
            # host symbol coder (adaptive lane count) wins there and its
            # O(m) cost is negligible at this size
            raw = raw_cb(i) if raw_cb is not None else \
                np.asarray(packed[i, :n]).tobytes()
            results.append(compress_symbols(raw, sym_bits))
            continue
        bc = int(cnts_np[i])
        body_i = np.asarray(body[i, :bc]).astype(np.uint8).tobytes()
        used = freqs[i] > 0
        sp = np.flatnonzero(used)
        stream = _finish_stream_symbols(
            n, int(ms[i]), groups * prk.W_LANES, sym_bits, sp, freqs[i][sp],
            states_np[i].astype(np.int64) & 0xFFFFFFFF, body_i, adlers[i])
        if len(stream) > n + _STORED_OVERHEAD:
            raw = raw_cb(i) if raw_cb is not None else \
                np.asarray(packed[i, :n]).tobytes()
            stream = _stored_stream(raw, adlers[i])
        results.append(stream)
    return results


def rans_gaps_batch_device(bitmaps, blens, raw_cb=None, out_bound=None,
                           interpret=None, positions=None, pos_counts=None):
    """Device GAP-mode (flags 2|4) scheme-12 encode of a bitmap batch.

    ``bitmaps`` (B, NB) u8 device array of LSB-first bitmaps; ``blens``
    (B,) true byte lengths (padding bytes must be zero).  The set-bit
    position extraction (ops/pallas_gaps.py), first-order gaps, 4096-bin
    histogram and interleaved-rANS coding all run on device; the host does
    O(alphabet) table work and header assembly.  Frames where gap coding
    cannot win (set bits outnumber bytes, small streams, or a >= 4095-bit
    run needing escape symbols — impossible at the occupancies where the
    device path engages) fall back to the host coder via ``raw_cb``.
    Returns a list of B scheme-12 streams, decodable by :func:`decompress`
    and the device batch path.

    ``positions``/``pos_counts``: precomputed sorted set-bit positions
    (e.g. the L1 encode kernel's fused ``with_positions`` output, whose
    incremental cost is ~40% of the standalone bitmap->positions kernel).
    When given, the extraction kernel is skipped entirely.
    """
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_gaps as pgk, pallas_rans as prk

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    bitmaps = jnp.asarray(bitmaps, jnp.uint8)
    B, NB = bitmaps.shape
    blens = np.asarray(blens, np.int64)
    padb = (-NB) % pgk.CHUNK_BYTES
    if padb:
        bitmaps = jnp.pad(bitmaps, ((0, 0), (0, padb)))

    def _raw(i):
        return raw_cb(i) if raw_cb is not None else \
            np.asarray(bitmaps[i, : int(blens[i])]).tobytes()

    if out_bound is None:
        out_bound = NB * 2                 # one position per 4 bits
    out_bound = -(-out_bound // prk.CH_R) * prk.CH_R
    if positions is not None:
        pos = jnp.asarray(positions, jnp.int32)
        cnt = jnp.asarray(pos_counts, jnp.int32)
        if pos.shape[1] < out_bound:
            pos = jnp.pad(pos, ((0, 0), (0, out_bound - pos.shape[1])))
        elif pos.shape[1] > out_bound:
            out_bound = -(-pos.shape[1] // prk.CH_R) * prk.CH_R
            pos = jnp.pad(pos, ((0, 0), (0, out_bound - pos.shape[1])))
    else:
        pos = cnt = None
        for bucket in range(len(_CAP_BUCKETS_GAPS())):
            pos, cnt, ovf = pgk.bitmap_positions_pallas(
                bitmaps, out_bound, bucket=bucket, interpret=bool(interpret))
            if not bool(jnp.any(ovf)):
                break
        else:
            return [compress_gaps(_raw(i)) for i in range(B)]

    # first-order gaps on the compacted stream (m-scale XLA work)
    io = jnp.arange(pos.shape[1], dtype=jnp.int32)[None, :]
    valid = io < cnt[:, None]
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), pos[:, :-1]], axis=1)
    syms = jnp.where(valid, pos - prev - 1, 0)
    ms = np.asarray(cnt).astype(np.int64)

    # escapes (a run of >= 4095 clear bits between set bits) cannot be
    # expanded on device without data-dependent insertion; they are
    # vanishingly rare at device-path occupancies — fall back per frame
    needs_escape = np.asarray(
        jnp.any(jnp.where(valid, syms, 0) >= GAP_ESCAPE, axis=1))
    # escape frames take the host fallback and their kernel outputs are
    # discarded — but clamp their symbols anyway so the encode kernel never
    # sees an out-of-alphabet symbol (freq-0 LUT fetch -> in-kernel division
    # by zero -> backend-dependent garbage)
    syms = jnp.minimum(syms, GAP_ESCAPE - 1)

    hist = prk.hist_symbols_pallas(syms, ms.astype(np.int32),
                                   interpret=interpret)
    hist_np = np.asarray(hist).astype(np.int64)
    adlers = _adler32_device_chunks(bitmaps, blens)

    freqs = np.zeros((B, 1 << GAP_BITS), np.int64)
    eluts = np.zeros((B,) + prk.encode_luts_symbols(
        np.ones(2, np.int64)).shape, np.float32)
    for i in range(B):
        freqs[i] = quantize_freqs(hist_np[i, : 1 << GAP_BITS]
                                  ).astype(np.int64)
        eluts[i] = prk.encode_luts_symbols(freqs[i])

    dev_ms = ms[ms >= 65536]
    groups = prk.ROWS_R if dev_ms.size and int(dev_ms.min()) >= (1 << 21) \
        else 1
    ob = 2 * out_bound + 4096
    body, states, cnts = prk.rans_encode_symbols_pallas(
        syms, jnp.asarray(eluts), ms.astype(np.int32), ob,
        interpret=interpret, groups=groups)

    cnts_np = np.asarray(cnts)
    states_np = np.asarray(states)
    results = []
    for i in range(B):
        n = int(blens[i])
        m = int(ms[i])
        if needs_escape[i] or m < 65536 or m > n:
            # host coder: adaptive lanes for small streams, escape
            # expansion, and the gap-vs-byte size comparison
            results.append(compress_gaps(_raw(i)))
            continue
        bc = int(cnts_np[i])
        body_i = np.asarray(body[i, :bc]).astype(np.uint8).tobytes()
        sp = np.flatnonzero(freqs[i] > 0)
        stream = _finish_stream_symbols(
            n, m, groups * prk.W_LANES, GAP_BITS, sp, freqs[i][sp],
            states_np[i].astype(np.int64) & 0xFFFFFFFF, body_i, adlers[i],
            gap=True)
        if len(stream) > n + _STORED_OVERHEAD:
            stream = _stored_stream(_raw(i), adlers[i])
        results.append(stream)
    return results


def _CAP_BUCKETS_GAPS():
    from ..ops.pallas_encode import CAPACITY_BUCKETS

    return CAPACITY_BUCKETS


def rans_decompress_device(stream: bytes, interpret=None) -> bytes:
    """Decode one scheme-12 stream with the device symbol kernel.

    The per-symbol rANS math runs on device (ops/pallas_rans.py); the host
    does header parsing, extra-bit unpacking and the final literal/run byte
    reconstruction (memset-class).
    """
    import jax.numpy as jnp

    from ..ops import pallas_rans as prk

    h = _parse_header(stream)
    if "stored" in h:
        return h["stored"]
    if h["nways"] not in (prk.W_LANES, prk.ROWS_R * prk.W_LANES):
        # a lane count the kernel isn't built for: fast host decode
        return _host_decompress(stream)
    groups = h["nways"] // prk.W_LANES
    m = h["m"]
    body_rev = np.frombuffer(h["body"], np.uint8)[::-1].copy()
    bw = -(-max(body_rev.size, 4) // 512) * 512
    body_pad = np.zeros((1, bw), np.uint8)
    body_pad[0, : body_rev.size] = body_rev
    npad = -(-max(m, 1) // prk.CH_R) * prk.CH_R
    tab = prk.decode_tables_radix(h["freq"])[None]
    syms = np.asarray(prk.rans_decode_pallas(
        jnp.asarray(body_pad),
        jnp.asarray(h["states"].astype(np.int64).astype(np.int32))[None],
        np.array([m], np.int32), npad, tab, interpret=interpret,
        groups=groups))[0, :m]
    if "sym_bits" in h:
        if h.get("gap"):
            raw = gaps_to_bitmap(syms, h["n"])
            if zlib.adler32(raw) != h["adler"]:
                raise ValueError("TPU-rANS stream corrupt (adler mismatch)")
            return raw
        from .. import oracle

        raw = oracle.bit_pack(syms.astype(np.uint64),
                              h["sym_bits"]).tobytes()
        raw = raw[: h["n"]] + b"\x00" * (h["n"] - len(raw))
        if zlib.adler32(raw) != h["adler"]:
            raise ValueError("TPU-rANS stream corrupt (adler mismatch)")
        return raw
    return _reconstruct_bytes(syms, h["xbits"], h["n"], h["adler"])


def rans_decompress_device_batch(streams_in, interpret=None):
    """Batched device symbol decode of scheme-12 streams (the reader's bulk
    path): one kernel invocation decodes every frame's stream, padded to the
    batch maxima.  Stored-block or non-W_LANES streams fall back per stream
    to the fast host decoder.  Returns a list of byte payloads."""
    import jax.numpy as jnp

    from ..ops import pallas_rans as prk

    kernel_ways = (prk.W_LANES, prk.ROWS_R * prk.W_LANES)
    metas = []
    outs: list = [None] * len(streams_in)
    for i, st in enumerate(streams_in):
        h = _parse_header(st)
        if "stored" in h:
            outs[i] = h["stored"]
            metas.append(None)
        elif h["nways"] not in kernel_ways:
            outs[i] = _host_decompress(st)
            metas.append(None)
        else:
            metas.append(h)

    for nways in kernel_ways:
        idxs = [i for i, mt in enumerate(metas)
                if mt is not None and mt["nways"] == nways]
        if not idxs:
            continue
        groups = nways // prk.W_LANES
        B = len(idxs)
        m_max = max(metas[i]["m"] for i in idxs)
        npad = -(-max(m_max, 1) // prk.CH_R) * prk.CH_R
        bw = -(-max(max(len(metas[i]["body"]) for i in idxs), 4) // 512) * 512
        bodies = np.zeros((B, bw), np.uint8)
        states = np.zeros((B, nways), np.int64)
        tabs = np.zeros((B, 96, 128), np.float32)
        ms = np.zeros(B, np.int32)
        for k, i in enumerate(idxs):
            h = metas[i]
            rev = np.frombuffer(h["body"], np.uint8)[::-1]
            bodies[k, : rev.size] = rev
            states[k] = h["states"].astype(np.int64)
            tabs[k] = prk.decode_tables_radix(h["freq"])
            ms[k] = h["m"]
        syms_all = np.asarray(prk.rans_decode_pallas(
            jnp.asarray(bodies), jnp.asarray(states.astype(np.int32)),
            ms, npad, jnp.asarray(tabs), interpret=interpret,
            groups=groups))
        for k, i in enumerate(idxs):
            h = metas[i]
            if "sym_bits" in h and h.get("gap"):
                raw = gaps_to_bitmap(syms_all[k, : h["m"]], h["n"])
                if zlib.adler32(raw) != h["adler"]:
                    raise ValueError(
                        "TPU-rANS stream corrupt (adler mismatch)")
                outs[i] = raw
            elif "sym_bits" in h:  # symbol mode: re-pack, no LZ layer
                from .. import oracle

                raw = oracle.bit_pack(
                    syms_all[k, : h["m"]].astype(np.uint64),
                    h["sym_bits"]).tobytes()
                raw = raw[: h["n"]] + b"\x00" * (h["n"] - len(raw))
                if zlib.adler32(raw) != h["adler"]:
                    raise ValueError(
                        "TPU-rANS stream corrupt (adler mismatch)")
                outs[i] = raw
            else:
                outs[i] = _reconstruct_bytes(syms_all[k, : h["m"]],
                                             h["xbits"], h["n"], h["adler"])
    return outs


def gap_chain_inputs(streams, kind):
    """Host-side prep (O(tables)) for the fully-device gap read chain.

    ``streams`` — per-frame scheme-12 byte streams, all of the SAME kind:
    kind="gap" (bitmap as clear-run gaps, flags 2|4), kind="sym" (12-bit
    pixel values, flags 2) or kind="bm8" (bitmap BYTES as 8-bit symbols,
    flags 2 — the dense-data flavor).  Returns the padded device arrays
    for the jitted chain cores, or None when any stream is stored /
    host-coded / uses a non-kernel lane count (caller falls back to
    :func:`rans_decompress_device_batch` + bitmap decode).
    """
    import jax.numpy as jnp

    from ..ops import pallas_rans as prk

    kernel_ways = (prk.W_LANES, prk.ROWS_R * prk.W_LANES)
    metas = []
    for st in streams:
        h = _parse_header(st)
        if "stored" in h or "sym_bits" not in h:
            return None
        if kind == "gap" and not h.get("gap"):
            return None
        if kind == "sym" and (h.get("gap") or h["sym_bits"] != 12):
            return None
        if kind == "bm8" and (h.get("gap") or h["sym_bits"] != 8):
            return None
        if h["nways"] not in kernel_ways or h["nways"] != streams_nways(
                metas, h):
            return None
        metas.append(h)
    B = len(metas)
    nways = metas[0]["nways"]
    m_max = max(h["m"] for h in metas)
    npad = -(-max(m_max, 1) // prk.CH_R) * prk.CH_R
    bw = -(-max(max(len(h["body"]) for h in metas), 4) // 512) * 512
    bodies = np.zeros((B, bw), np.uint8)
    states = np.zeros((B, nways), np.int64)
    tabs = np.zeros((B, 96, 128), np.float32)
    ms = np.zeros(B, np.int32)
    ns = np.zeros(B, np.int64)
    for k, h in enumerate(metas):
        rev = np.frombuffer(h["body"], np.uint8)[::-1]
        bodies[k, : rev.size] = rev
        states[k] = h["states"].astype(np.int64)
        tabs[k] = prk.decode_tables_radix(h["freq"])
        ms[k] = h["m"]
        ns[k] = h["n"]
    return (jnp.asarray(bodies), jnp.asarray(states.astype(np.int32)),
            jnp.asarray(tabs), ms, npad, nways // prk.W_LANES, ns)


def streams_nways(metas, h):
    """All streams of a batch must share one lane count (kernel batch)."""
    return metas[0]["nways"] if metas else h["nways"]


def gap_chain_dense(bm_in, pk_in, height, width, bucket=0, interpret=False):
    """Jitted core of the fully-device scheme-12 gap read chain.

    gaps -> positions (device cumsum), values -> rank-aligned ints, then
    the positions-driven Pallas decode — the BITMAP NEVER MATERIALIZES
    (compare the reference's per-bit C loop, reader.h:10-68, and our own
    byte-mode path which reconstructs bitmap bytes on host).  Returns
    (dense (B, H, W) u16 device array, overflow flags (B,) bool).
    """
    import functools as _ft

    import jax
    import jax.numpy as jnp

    from ..ops import pallas_decode, pallas_rans as prk

    bod_bm, st_bm, tab_bm, m_bm, npad_bm, grp_bm, _ = bm_in
    bod_pk, st_pk, tab_pk, m_pk, npad_pk, grp_pk, _ = pk_in

    @_ft.partial(jax.jit, static_argnames=("npad_b", "npad_p", "grp_b",
                                           "grp_p", "H", "W", "bucket",
                                           "interpret"))
    def chain(b_bm, s_bm, t_bm, mb, b_pk, s_pk, t_pk, mp, npad_b, npad_p,
              grp_b, grp_p, H, W, bucket, interpret):
        gaps = prk.rans_decode_pallas(b_bm, s_bm, jnp.asarray(mb), npad_b,
                                      t_bm, interpret=interpret, groups=grp_b)
        vals = prk.rans_decode_pallas(b_pk, s_pk, jnp.asarray(mp), npad_p,
                                      t_pk, interpret=interpret, groups=grp_p)
        mbj = jnp.asarray(mb)[:, None]
        io_b = jnp.arange(gaps.shape[1], dtype=jnp.int32)[None, :]
        adv = jnp.where(io_b < mbj, gaps + 1, 0)
        pos = jnp.cumsum(adv, axis=1, dtype=jnp.int32) - 1
        OUT = -(-max(gaps.shape[1], vals.shape[1]) // 128) * 128
        pos = jnp.pad(pos, ((0, 0), (0, OUT - pos.shape[1])))
        valsp = jnp.pad(vals.astype(jnp.int32),
                        ((0, 0), (0, OUT - vals.shape[1])))
        return pallas_decode.decode_l1_from_positions(
            pos, valsp, jnp.asarray(mb), H, W, bucket=bucket,
            interpret=interpret)

    return chain(bod_bm, st_bm, tab_bm, m_bm, bod_pk, st_pk, tab_pk, m_pk,
                 npad_bm, npad_pk, grp_bm, grp_pk, height, width, bucket,
                 bool(interpret))


def decode_l1_gap_device(bm_streams, pk_streams, height, width,
                         interpret=None, verify=False):
    """Fully-device scheme-12 L1 read chain (gap bitmap + symbol pixvals).

    Returns dense (B, H, W) uint16 numpy frames, or None when the stream
    mix is not kernel-decodable (stored blocks, host lane counts, byte
    mode — caller falls back to the byte-reconstruction path).  Capacity
    overflow escalates through the posdecode bucket ladder.

    Integrity note: this chain never materializes the bitmap bytes, so the
    stream's adler32 (computed over bytes) is NOT checked here — on-disk
    corruption decodes to garbage where the byte path would raise.  Pass
    ``verify=True`` to opt into integrity checking: the function returns
    None and the caller's fallback (byte-mode reconstruction) verifies
    every stream's adler32.  Kernel-vs-oracle byte identity of the chain
    itself is enforced by tools/verify_hw.py.
    """
    import jax

    if verify:
        return None
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if len(bm_streams) != len(pk_streams) or not bm_streams:
        return None
    # posdecode kernel geometry: SUB must be a power of two and chunk-
    # relative positions must fit 15 bits (pairs pack value << 15).  Shapes
    # outside that (e.g. W=384, or W>4096 where RPC bottoms out at 8) are
    # legal scheme-12 gap streams — decode them via the byte path instead
    # of tripping kernel asserts (ADVICE r4).
    from ..ops import pallas_decode as _pd, pallas_encode as _pe

    sub = _pe._choose_sub(width)
    rpc = _pd._choose_rpc_decode(height, width)
    if sub & (sub - 1) or rpc * width > (1 << 15) or height % rpc:
        return None
    bm_in = gap_chain_inputs(bm_streams, "gap")
    pk_in = gap_chain_inputs(pk_streams, "sym")
    if bm_in is None or pk_in is None:
        return None
    # gap symbol counts = set-bit counts; the value count must match.  This
    # also catches ESCAPE symbols (a >= 4095-bit clear run codes one extra
    # gap symbol with no value symbol, making m_bm > m_pk) — the chain's
    # cumsum would misplace every later position, so such frames fall back
    # to the byte-reconstruction path.
    if not np.array_equal(bm_in[3], pk_in[3]):
        return None
    from ..ops import pallas_encode

    for bucket in range(len(pallas_encode.CAPACITY_BUCKETS)):
        dense, ovf = gap_chain_dense(bm_in, pk_in, height, width,
                                     bucket=bucket,
                                     interpret=bool(interpret))
        if not bool(np.asarray(ovf).any()):
            return np.asarray(dense).astype(np.uint16)
    return None


def symbol_chain_dense(bm_in, pk_in, height, width, bucket=0,
                       interpret=False):
    """Jitted core of the fully-device scheme-12 SYMBOL read chain.

    Bitmap BYTES decode as 8-bit rANS symbols straight into the
    bitmap-driven Pallas dense decode (values arrive rank-aligned from
    the 12-bit symbol stream — no bit-pack round trip, no host bytes).
    The dense-data complement of :func:`gap_chain_dense`; the fused
    8-group decode kernel carries both.
    """
    import functools as _ft

    import jax
    import jax.numpy as jnp

    from ..ops import pallas_decode, pallas_rans as prk

    bod_bm, st_bm, tab_bm, m_bm, npad_bm, grp_bm, ns_bm = bm_in
    bod_pk, st_pk, tab_pk, m_pk, npad_pk, grp_pk, _ = pk_in
    n_bytes = int(ns_bm[0])

    @_ft.partial(jax.jit, static_argnames=("npad_b", "npad_p", "grp_b",
                                           "grp_p", "H", "W", "nb",
                                           "bucket", "interpret"))
    def chain(b_bm, s_bm, t_bm, mb, b_pk, s_pk, t_pk, mp, npad_b, npad_p,
              grp_b, grp_p, H, W, nb, bucket, interpret):
        bmsym = prk.rans_decode_pallas(b_bm, s_bm, jnp.asarray(mb), npad_b,
                                       t_bm, interpret=interpret,
                                       groups=grp_b)
        vals = prk.rans_decode_pallas(b_pk, s_pk, jnp.asarray(mp), npad_p,
                                      t_pk, interpret=interpret,
                                      groups=grp_p)
        bitmap = bmsym[:, :nb].astype(jnp.uint8)
        OUT = -(-max(vals.shape[1], 128) // 128) * 128
        valsp = jnp.pad(vals.astype(jnp.int32),
                        ((0, 0), (0, OUT - vals.shape[1])))
        return pallas_decode._decode_call(bitmap, valsp, H, W, 12, bucket,
                                          interpret)

    return chain(bod_bm, st_bm, tab_bm, m_bm, bod_pk, st_pk, tab_pk, m_pk,
                 npad_bm, npad_pk, grp_bm, grp_pk, height, width, n_bytes,
                 bucket, bool(interpret))


def decode_l1_symbol_device(bm_streams, pk_streams, height, width,
                            interpret=None, verify=False):
    """Fully-device scheme-12 L1 read chain for SYMBOL-mode bitmaps.

    The companion of :func:`decode_l1_gap_device` for containers whose
    bitmap streams code bytes as 8-bit symbols (the size-comparison
    winner on dense frames).  Same contract: dense (B, H, W) uint16
    frames, or None when the stream mix is not kernel-decodable /
    ``verify=True`` (the byte path checks adler32).
    """
    import jax

    if verify:
        return None
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if len(bm_streams) != len(pk_streams) or not bm_streams:
        return None
    bm_in = gap_chain_inputs(bm_streams, "bm8")
    pk_in = gap_chain_inputs(pk_streams, "sym")
    if bm_in is None or pk_in is None:
        return None
    if any(int(n) != height * width // 8 for n in bm_in[6]):
        return None
    # value count must equal the bitmap's set-bit count; bit counts are
    # not in the header, so trust the decode-side capacity escalation and
    # the m bookkeeping (vals beyond the bitmap's population are ignored;
    # a short value stream would leave zeros, caught by verify paths)
    from ..ops import pallas_encode

    for bucket in range(len(pallas_encode.CAPACITY_BUCKETS)):
        dense, ovf = symbol_chain_dense(bm_in, pk_in, height, width,
                                        bucket=bucket,
                                        interpret=bool(interpret))
        if not bool(np.asarray(ovf).any()):
            return np.asarray(dense).astype(np.uint16)
    return None
