"""Vectorized polynomial rolling hashes mod 2^61-1 (numpy, exact).

The fingerprinting and featurization operators need per-token/per-char
polynomial hashes over whole Arrow batches. A per-character Python loop
is O(chars) interpreter work per row (the round-1 hot spot); here the
same recurrences run as segmented numpy prefix sums:

    h_i = (h_{i-1} · B + v_i) mod M      (within each segment)
        = B^{p_i} · Σ_{j≤i} v_j · B^{-p_j}   with p = position in segment

so a batch of segments (tokens within docs, bytes within tokens) needs
one modular multiply per element plus two plain ``cumsum`` calls. All
mod-M arithmetic (M = 2^61-1, a Mersenne prime) is done in uint64 limbs
— ``_mulmod`` splits operands 32/32 and uses 2^64 ≡ 8, 2^32-rotations
for exactness; cumsums stay exact because 32-bit limb sums of ≤ ~2^30
elements fit uint64.
"""

from __future__ import annotations

import numpy as np

M = (1 << 61) - 1
B = 1_000_003
INV_B = pow(B, M - 2, M)

_M64 = np.uint64(M)
_MASK32 = np.uint64(0xFFFFFFFF)
_MASK29 = np.uint64((1 << 29) - 1)


def _modr(v: np.ndarray) -> np.ndarray:
    """Reduce uint64 values (< 2^64) mod M = 2^61-1."""
    v = (v >> np.uint64(61)) + (v & _M64)
    return np.where(v >= _M64, v - _M64, v)


def _rot32(v: np.ndarray) -> np.ndarray:
    """(v · 2^32) mod M for v < M, via 2^61 ≡ 1."""
    q = v >> np.uint64(29)
    r = v & _MASK29
    return _modr(q + (r << np.uint64(32)))


def _mulmod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a · b) mod M for a, b < M — 32/32 limb split, all uint64-safe."""
    a = a.astype(np.uint64, copy=False)
    b = b.astype(np.uint64, copy=False)
    a_hi, a_lo = a >> np.uint64(32), a & _MASK32
    b_hi, b_lo = b >> np.uint64(32), b & _MASK32
    # a·b = a_hi·b_hi·2^64 + (a_hi·b_lo + a_lo·b_hi)·2^32 + a_lo·b_lo
    hi = _modr(_modr(a_hi * b_hi) * np.uint64(8))        # 2^64 ≡ 8 (mod M)
    cross = _rot32(_modr(a_hi * b_lo + a_lo * b_hi))
    lo = _modr(a_lo * b_lo)
    return _modr(hi + cross + lo)


def _pow_table(base: int, n: int) -> np.ndarray:
    """[base^0, …, base^(n-1)] mod M as uint64 (exact, python ints)."""
    out = np.empty(max(n, 1), dtype=np.uint64)
    x = 1
    for k in range(max(n, 1)):
        out[k] = x
        x = (x * base) % M
    return out


_CHUNK = 32_768  # keep temporaries cache-resident (slow-memory VMs: 2-5×)


def _seg_prefix_hash_chunk(v, seg_lens, ipw, pw) -> np.ndarray:
    n = int(seg_lens.sum())
    ends = np.cumsum(seg_lens)
    starts_per_el = np.repeat(ends - seg_lens, seg_lens)
    pos = np.arange(n, dtype=np.int64) - starts_per_el
    c = _mulmod(v, ipw[pos])
    c_hi, c_lo = c >> np.uint64(32), c & _MASK32
    s_hi, s_lo = np.cumsum(c_hi), np.cumsum(c_lo)
    base_hi = np.where(starts_per_el > 0, s_hi[starts_per_el - 1], np.uint64(0))
    base_lo = np.where(starts_per_el > 0, s_lo[starts_per_el - 1], np.uint64(0))
    d = _modr(_rot32(_modr(s_hi - base_hi)) + _modr(s_lo - base_lo))
    return _mulmod(d, pw[pos])


def seg_prefix_hash(v: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Per-position rolling polynomial hash, restarting at each segment.

    ``v``: uint64 values < M, concatenated segments; ``seg_lens``:
    length of each segment (zeros allowed). Returns ``h`` with
    ``h[i] = (h[i-1]·B + v[i]) mod M`` within each segment. Processes
    segment-aligned chunks internally so every temporary stays
    cache-resident.
    """
    seg_lens = np.asarray(seg_lens, dtype=np.int64)
    n = int(seg_lens.sum())
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    assert n < (1 << 30), "batch too large for exact limb cumsum"
    v = np.asarray(v, dtype=np.uint64)
    max_len = int(seg_lens.max())
    ipw = _pow_table(INV_B, max_len)
    pw = _pow_table(B, max_len)
    if n <= _CHUNK:
        return _seg_prefix_hash_chunk(v, seg_lens, ipw, pw)
    out = np.empty(n, dtype=np.uint64)
    ends = np.cumsum(seg_lens)
    s0 = 0  # first segment of chunk
    base = 0
    while s0 < len(seg_lens):
        s1 = max(
            int(np.searchsorted(ends, base + _CHUNK, side="right")), s0 + 1
        )
        hi = ends[s1 - 1]
        out[base:hi] = _seg_prefix_hash_chunk(
            v[base:hi], seg_lens[s0:s1], ipw, pw
        )
        base = hi
        s0 = s1
    return out


def seg_end_hash(v: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Polynomial hash of each whole segment (h at its last element);
    empty segments hash to 0."""
    seg_lens = np.asarray(seg_lens, dtype=np.int64)
    h = seg_prefix_hash(v, seg_lens)
    out = np.zeros(len(seg_lens), dtype=np.uint64)
    nz = seg_lens > 0
    out[nz] = h[np.cumsum(seg_lens)[nz] - 1]
    return out


_BU = np.uint64(B)


def _mul_b(h: np.ndarray) -> np.ndarray:
    """(h · B) mod M for h < M — B fits 21 bits, so two limb products.
    hi·B < 2^49 feeds _rot32 directly; lo·B < 2^52 adds without overflow
    (result < 2^61 + 2^52, caller reduces)."""
    return _rot32((h >> np.uint64(32)) * _BU) + (h & _MASK32) * _BU


def token_hashes(tok_bytes: list[bytes], long_cutoff: int = 256) -> np.ndarray:
    """Polynomial hash of each byte string: h = (h·B + byte) mod M.

    Vectorized as a fixed-width (n_tokens × max_len) uint8 matrix with
    one masked column step per byte position — natural-language tokens
    are short, so this is a handful of cache-resident passes. Tokens
    longer than ``long_cutoff`` (rare: URLs, minified blobs) are hashed
    individually so one pathological token can't blow the matrix up.
    """
    n = len(tok_bytes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in tok_bytes), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=np.uint64)
    long_idx = np.flatnonzero(lens > long_cutoff)
    if len(long_idx):
        for i in long_idx:
            h = 0
            for ch in tok_bytes[i]:
                h = (h * B + ch) % M
            out[i] = h
        short_mask = lens <= long_cutoff
        short = [tok_bytes[i] for i in np.flatnonzero(short_mask)]
        if short:
            out[short_mask] = token_hashes(short, long_cutoff=max(len(b) for b in short))
        return out
    arr = np.array(tok_bytes, dtype=np.bytes_)  # 'S<w>' padded with NULs
    w = arr.dtype.itemsize
    mat_t = np.frombuffer(arr.tobytes(), dtype=np.uint8).reshape(n, w).T
    h = np.zeros(n, dtype=np.uint64)
    for c0 in range(0, n, _CHUNK):
        c1 = min(c0 + _CHUNK, n)
        hc = h[c0:c1]
        lc = lens[c0:c1]
        for j in range(w):
            step = _mul_b(hc) + mat_t[j, c0:c1].astype(np.uint64)  # lazy mod
            np.copyto(hc, step, where=j < lc)
        np.copyto(hc, _modr(hc))
    return h


def token_hashes_from_buffer(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray, long_cutoff: int = 256
) -> np.ndarray:
    """Polynomial hash of ``buf[starts[i] : starts[i]+lens[i]]`` per
    token, zero Python objects: per 32k-token chunk, gather a
    (chunk × local_max_len) byte matrix by fancy indexing and run the
    masked column recurrence. Over-long tokens hash individually."""
    n = len(starts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    for c0 in range(0, n, _CHUNK):
        c1 = min(c0 + _CHUNK, n)
        st, ln = starts[c0:c1], lens[c0:c1]
        w = int(ln.max()) if len(ln) else 0
        if w == 0:
            continue
        if w > long_cutoff:
            longs = np.flatnonzero(ln > long_cutoff)
            for i in longs:
                h = 0
                for ch in memoryview(buf[st[i]:st[i] + ln[i]]):
                    h = (h * B + ch) % M
                out[c0 + i] = h
            w = int(ln[ln <= long_cutoff].max()) if (ln <= long_cutoff).any() else 0
            if w == 0:
                continue
        idx = st[:, None] + np.arange(w)
        np.clip(idx, 0, len(buf) - 1, out=idx)
        mat_t = buf[idx].T
        h = np.zeros(c1 - c0, dtype=np.uint64)
        for j in range(w):
            # lazy reduction: _mul_b keeps values < 2^61 + 2^52, which the
            # next round's limb split still handles — one _modr at the end
            step = _mul_b(h) + mat_t[j].astype(np.uint64)
            np.copyto(h, step, where=(j < ln) & (ln <= long_cutoff))
        np.copyto(out[c0:c1], _modr(h), where=ln <= long_cutoff)
    return out
