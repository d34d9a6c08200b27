"""Mergeable cardinality sketches for corpus-scale statistics.

KMV (k-minimum-values) approximate count-distinct: every value hashes to
a 60-bit integer (first 15 hex chars of md5 — chosen so the identical
hash is expressible in DuckDB as ``('0x' || substr(md5(v), 1, 15))``
without HUGEINT overflow) and the sketch keeps the k smallest DISTINCT
hash values seen. The estimator is the classic Bar-Yossef et al. (2002)
bottom-k form

    D-hat = (k_eff - 1) / frac(h_k)   with frac(h) = h / 2**60

— deterministic end-to-end (no RNG, no timing dependence), so the Ray
dataflow and the SQL oracle agree to the bit and the result is invariant
to block layout: per-block partials each emit their k smallest distinct
hashes, a groupby("hv") dedupes across blocks, and a sort+limit keeps
the global bottom-k. Memory is O(k) per task; the shuffle moves at most
k rows per input block regardless of corpus size, which is what makes
the sketch the right cardinality tool at 10^12 rows (exact
count-distinct = full shuffle of every distinct value).

Relative error is ~1/sqrt(k) (k=256 -> ~6%); pytest pins an empirical
error bound against the exact count on the fixture tables.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

K_KMV = 256
_HASH_BITS = 60
_HASH_SPACE = 2.0 ** _HASH_BITS


def _h60(v) -> int:
    """60-bit hash: first 15 hex chars of md5(str(v)) — mirrors DuckDB's
    ('0x' || substr(md5(cast(v as varchar)), 1, 15))::ubigint."""
    return int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:15], 16)


def kmv_partial_batch(batch: pa.Table, col: str, k: int = K_KMV) -> pa.Table:
    """Per-block KMV partial: the <=k smallest distinct 60-bit hashes of
    this block's values (nulls skipped). Output is at most k rows however
    large the block — the combiner that keeps the downstream shuffle
    sketch-sized."""
    hs = {
        _h60(v)
        for v in batch[col].to_pylist()
        if v is not None
    }
    return pa.table({"hv": pa.array(sorted(hs)[:k], pa.int64())})


def kmv_estimate_batch(batch: pa.Table, k: int = K_KMV) -> pa.Table:
    """Final KMV reduce over the (already deduped, globally bottom-k)
    hash rows: one row with the sketch size actually filled (k_eff =
    min(k, true distinct)), the k-th minimum hash, and the cardinality
    estimate rounded to 6 dp (hash-parity with the SQL oracle)."""
    hv = sorted(set(batch["hv"].to_pylist()))[:k]
    k_eff = len(hv)
    if k_eff == 0:
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "kth_h": pa.array([], pa.int64()),
                "est_distinct": pa.array([], pa.float64()),
            }
        )
    kth = hv[-1]
    est = round((k_eff - 1) * _HASH_SPACE / kth, 6) if kth > 0 else 0.0
    return pa.table(
        {
            "k": pa.array([k_eff], pa.int64()),
            "kth_h": pa.array([kth], pa.int64()),
            "est_distinct": pa.array([est], pa.float64()),
        }
    )


# --- Count-Min Sketch (heavy hitters) ---------------------------------
#
# The count-state companion to KMV: a depth x width grid of counters
# where every word increments one cell per row (cell chosen by the same
# DuckDB-expressible 60-bit md5 idiom as above, mod width) and a point
# query reads the MIN over rows — an overestimate with error <=
# 2T/width at probability 1 - 2^-depth (Cormode & Muthukrishnan 2005).
# Mergeability is elementwise addition, so per-block partials emit
# sparse (row, pos, count) cells — at most depth*width rows per block
# REGARDLESS of block size or vocabulary — and one bounded groupby sums
# them into the corpus sketch. That is the 100 TB story: exact top-K
# partials carry a block's whole vocabulary into the shuffle; the CMS
# shuffle is capped at depth*width cells per block forever.

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_pos(word: str, j: int) -> int:
    """Row-j cell index: first 15 hex chars of md5("word:j") mod width —
    mirrors DuckDB's ('0x' || substr(md5(w || ':' || j::varchar), 1,
    15))::ubigint % width (same idiom as the Bloom filter oracle)."""
    return (
        int(hashlib.md5(f"{word}:{j}".encode("utf-8")).hexdigest()[:15], 16)
        % CMS_WIDTH
    )


def cms_partial_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Per-block CMS partial over the repo's tokenization (single-space
    split, empties dropped): local word counts fold into a sparse cell
    map emitted as (j, pos, v) rows — bounded by depth*width however
    large the block."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch[col].to_pylist():
        c.update(w for w in (t or "").split(" ") if w)
    cells: Counter = Counter()
    for w, n in c.items():
        for j in range(CMS_DEPTH):
            cells[(j, _cms_pos(w, j))] += n
    ks = list(cells.keys())
    return pa.table(
        {
            "j": pa.array([a for a, _ in ks], pa.int64()),
            "pos": pa.array([b for _, b in ks], pa.int64()),
            "v": pa.array(list(cells.values()), pa.int64()),
        }
    )


class CmsEstimate:
    """Point-query stage: the merged sketch (depth*width ints, ~64 KiB)
    ships once per actor as a plain constructor value (restart-safe,
    ray#53727). Emits (word, est) for words whose min-over-rows estimate
    clears the threshold; est is an overestimate by construction, never
    an undercount, so no true heavy hitter is missed."""

    def __init__(self, cms_flat: list, thresh: int):
        self.cms = cms_flat
        self.thresh = int(thresh)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cms = self.cms
        w_out: list[str] = []
        e_out: list[int] = []
        for w in batch["word"].to_pylist():
            e = min(
                cms[j * CMS_WIDTH + _cms_pos(w, j)]
                for j in range(CMS_DEPTH)
            )
            if e >= self.thresh:
                w_out.append(w)
                e_out.append(e)
        return pa.table(
            {
                "word": pa.array(w_out, pa.string()),
                "est": pa.array(e_out, pa.int64()),
            }
        )


# --- HyperLogLog (cardinality, register-merge form) --------------------
#
# The register-based companion to KMV (Flajolet et al. 2007): every
# value's 60-bit hash splits into a register index (top HLL_B bits) and
# a 54-bit suffix whose leading-zero rank feeds a per-register MAX.
# Where KMV's sketch is the k smallest hashes (k rows shuffled per
# block), HLL's is m = 2^HLL_B single-byte registers — merge is
# elementwise max, so per-block partials emit <= m rows and the whole
# corpus sketch is m rows after one bounded groupby. Relative error
# ~1.04/sqrt(m). Integer-exact estimator: sum(2^-M_j) is computed as
# the EXACT integer S = sum(2^(55 - M_j)) (<= m * 2^55 < 2^63), and the
# estimate alpha*m^2*2^55 / S is one double division of two exactly
# known operands — bit-identical in numpy and DuckDB, which is what
# makes this approximate operator value-verifiable by an exact oracle.

HLL_B = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_B
_HLL_SUFFIX_BITS = _HASH_BITS - HLL_B          # 54
_HLL_ALPHA = 0.709             # alpha_64 (Flajolet et al., m = 64)
# exact-integer scaling: S = sum(2^(55 - M_j)); estimate = NUM / S
HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * 2.0 ** (_HLL_SUFFIX_BITS + 1)


def hll_rank(w: int) -> int:
    """Leading-zero rank of the 54-bit suffix: 55 - bit_length(w)
    (w = 0 -> 55). Range 1..55, fits the exact-integer estimator."""
    return (_HLL_SUFFIX_BITS + 1) - w.bit_length()


def hll_partial_batch(batch: pa.Table, col: str) -> pa.Table:
    """Per-block HLL partial: max rank per register over this block's
    values (nulls skipped). Output <= HLL_M rows however large the
    block; downstream merge is groupby(j).max(rank)."""
    regs: dict[int, int] = {}
    for v in batch[col].to_pylist():
        if v is None:
            continue
        hv = _h60(v)
        j = hv >> _HLL_SUFFIX_BITS
        r = hll_rank(hv & ((1 << _HLL_SUFFIX_BITS) - 1))
        if r > regs.get(j, 0):
            regs[j] = r
    ks = sorted(regs)
    return pa.table(
        {
            "j": pa.array(ks, pa.int64()),
            "rank": pa.array([regs[k] for k in ks], pa.int64()),
        }
    )


def hll_estimate_batch(batch: pa.Table) -> pa.Table:
    """Final HLL reduce over the merged (j, max rank) rows: fills the
    absent registers with rank 0, computes the exact integer
    S = sum(2^(55 - M_j)), and emits one row with the raw estimate
    (or the linear-counting small-range correction m*ln(m/V) when
    E <= 2.5 m and empty registers remain — Flajolet et al. §4)."""
    import math

    m_j = [0] * HLL_M
    for j, r in zip(batch["j"].to_pylist(), batch["rank"].to_pylist()):
        m_j[j] = max(m_j[j], r)
    s_int = sum(1 << (_HLL_SUFFIX_BITS + 1 - r) for r in m_j)
    v_zero = sum(1 for r in m_j if r == 0)
    est = HLL_NUM / s_int
    if est <= 2.5 * HLL_M and v_zero > 0:
        est = HLL_M * math.log(HLL_M / v_zero)
    return pa.table(
        {
            "m": pa.array([HLL_M], pa.int64()),
            "v_zero": pa.array([v_zero], pa.int64()),
            "s_scaled": pa.array([s_int], pa.int64()),
            "est_distinct": pa.array([round(est, 6)], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# AMS second-moment (F2) sketch — Alon, Matias & Szegedy (STOC'96)
# ---------------------------------------------------------------------------
# F2 = sum over distinct keys of count^2 is the SELF-JOIN SIZE: the exact
# cost of any equi-join/groupby keyed on the column, and the canonical
# skew statistic (uniform keys minimize it, one hot key maximizes it).
# Exact F2 needs a full shuffle of every distinct key; the AMS sketch is
# AMS_K signed counters updated per row — mergeable by plain addition,
# so per-block partials + one tiny groupby reproduce the single-pass
# sketch exactly. Each estimator X_j = (sum_i sign_j(key_i))^2 is
# unbiased for F2 but chi^2-skewed (median alone would sit at ~0.455 F2),
# hence the classic MEDIAN-OF-MEANS reduce: AMS_GROUPS groups of
# AMS_K/AMS_GROUPS estimators, mean per group, median across groups.
# With 64 counters the relative error is a few tens of percent — the
# right tool for "is this key column skewed enough to salt?" at 10^12
# rows, not for exact accounting. Signs are md5-derived (60-bit hash
# parity), so the dataflow and the DuckDB oracle agree to the bit; the
# group means stay exact in float64 while every s^2 <= 2^53.

AMS_K = 64
AMS_GROUPS = 4


def ams_sign(v, j: int) -> int:
    """Deterministic ±1 for (value, estimator j) — the parity of the
    60-bit md5 hash of 'value|j' (same expression the oracle uses)."""
    return 2 * (_h60(f"{v}|{j}") & 1) - 1


def ams_partial_batch(batch: pa.Table, col: str, k: int = AMS_K) -> pa.Table:
    """Per-block AMS partial: k signed counters over this block's rows,
    emitted as k (j, s) rows however large the block. Hashes are
    computed once per DISTINCT value in the block and scaled by its
    multiplicity — the combiner trick that keeps the md5 cost at
    O(distinct x k), not O(rows x k)."""
    from collections import Counter

    cnt = Counter(v for v in batch[col].to_pylist() if v is not None)
    sums = [0] * k
    for v, c in cnt.items():
        for j in range(k):
            sums[j] += ams_sign(v, j) * c
    return pa.table(
        {
            "j": pa.array(list(range(k)), pa.int64()),
            "s": pa.array(sums, pa.int64()),
        }
    )


def ams_estimate(s_by_j: dict[int, int], k: int = AMS_K,
                 groups: int = AMS_GROUPS) -> float:
    """Median-of-means over the merged counters: mean of s^2 within each
    of ``groups`` consecutive-j groups, median across groups (even group
    count -> average of the middle two, matching DuckDB's median)."""
    import numpy as np

    per = k // groups
    sq = [float(s_by_j.get(j, 0)) ** 2 for j in range(k)]
    means = [float(np.mean(sq[g * per:(g + 1) * per]))
             for g in range(groups)]
    return float(np.median(means))
