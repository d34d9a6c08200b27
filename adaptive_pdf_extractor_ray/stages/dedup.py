"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-native shapes (see /opt-public Ray Data docs patterns):

- **exact**: vectorized content-hash column -> ``groupby(hash)`` keep-first
  (min doc_id). The only shuffle is on the 16-byte hash.
- **MinHash/LSH**: per-batch numpy minhash signatures -> explode to
  (band_id, band_hash, doc_id) rows -> ``groupby(band)`` emits candidate
  pairs -> n-gram Jaccard verification per pair -> connected components by
  min-label propagation. Hashing is md5-derived and fully deterministic
  (no process-salt randomness), so results are stable across runs/workers
  AND reproducible in SQL for oracle verification.
- **SimHash**: 64-bit signatures; near-dup buckets via 4×16-bit band
  exact match (Hamming ≤3 guarantee by pigeonhole).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# Every hash here is md5-derived and permutations use plain mod-2^64 wrap
# arithmetic so the WHOLE minhash/simhash computation is reproducible in
# ANSI SQL (DuckDB: ('0x'||substr(md5(s),1,16))::ubigint and HUGEINT
# mod-2^64) — which is what lets the driver value-verify these ops
# against an oracle instead of a rows-only check.

NUM_PERM = 32
LSH_BANDS = 8  # 4 rows per band


def _perm_constants(num_perm: int = NUM_PERM) -> tuple[list[int], list[int]]:
    rng = np.random.RandomState(271828)  # fixed: deterministic everywhere
    a = [int(x) | 1 for x in rng.randint(1, 1 << 62, size=num_perm, dtype=np.int64)]
    b = [int(x) for x in rng.randint(0, 1 << 62, size=num_perm, dtype=np.int64)]
    return a, b


PERM_A, PERM_B = _perm_constants()


def _hash64(token: str) -> int:
    """First 8 bytes of md5, big-endian — SQL:
    ``('0x' || substr(md5(t), 1, 16))::ubigint``."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


# The dedup family's tokenizer is DEFINED as an ASCII-whitespace split
# with empty tokens dropped, identically on the engine side (this regex)
# and the oracle side (``SQL_TOKENIZE``) — NOT Python ``str.split()``,
# whose unicode-whitespace behavior (U+00A0 etc.) DuckDB's RE2 cannot
# reproduce. Any text, including multi-space / tab / newline runs,
# tokenizes the same on both sides.
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")

SQL_TOKENIZE = (
    "list_filter(regexp_split_to_array({col}, '[ \\t\\n\\r\\f\\v]+'),"
    " t -> t <> '')"
)


def _tokens(text: str) -> list[str]:
    return [t for t in _WS_RE.split(text) if t]


def _shingles(text: str, k: int = 3) -> list[str]:
    toks = _tokens(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


class MinHasher:
    """Stateful actor stage: permutation params computed once per actor."""

    def __init__(self, num_perm: int = NUM_PERM, shingle_k: int = 3,
                 col: str = "text"):
        self.num_perm = num_perm
        self.k = shingle_k
        self.col = col
        a, b = (
            (PERM_A, PERM_B) if num_perm <= NUM_PERM
            else _perm_constants(num_perm)
        )
        self.a = np.array(a[:num_perm], dtype=np.uint64)
        self.b = np.array(b[:num_perm], dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = np.array([_hash64(s) for s in sh], dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (a*h + b) mod 2^64 — the wrap IS the modulus (SQL parity)
            vals = np.outer(self.a, base) + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "") for t in batch[self.col].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "minhash": pa.array(
                    [[int(v) for v in s] for s in sigs],
                    pa.list_(pa.uint64()),
                ),
            }
        )


def explode_bands(batch: pa.Table, bands: int = LSH_BANDS) -> pa.Table:
    """signature rows -> (band_id, band_hash, doc_id) rows for the LSH
    groupby. band_hash = md5 of the band's values '|'-joined (SQL parity:
    ``md5(array_to_string(list_slice(sig, lo, hi), '|'))``)."""
    import hashlib as _hl

    doc_ids: list[int] = []
    band_ids: list[int] = []
    band_hashes: list[str] = []
    for did, sig in zip(batch["doc_id"].to_pylist(), batch["minhash"].to_pylist()):
        rows_per_band = len(sig) // bands
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = _hl.md5("|".join(str(int(v)) for v in chunk).encode()).hexdigest()
            doc_ids.append(did)
            band_ids.append(b)
            band_hashes.append(h)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band_id": pa.array(band_ids, pa.int64()),
            "band_hash": pa.array(band_hashes, pa.string()),
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
    toks = _tokens(text)
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
            "simhash": pa.array(sigs, pa.uint64()),
            **{
                f"band{b}": pa.array([(s >> (16 * b)) & 0xFFFF for s in sigs], pa.int64())
                for b in range(4)
            },
        }
    )


def jaccard_pairs_batch(batch: pa.Table, k: int = 3,
                        a_col: str = "text_a", b_col: str = "text_b") -> pa.Table:
    """Per-pair n-gram Jaccard over a joined candidate-pair batch
    (a, b, text_a, text_b) -> (a, b, jaccard). Runs inside map_batches
    after the two text joins, so verification is fully distributed — no
    driver-side text collection."""
    vals = [
        round(ngram_jaccard(ta or "", tb or "", k), 6)
        for ta, tb in zip(batch[a_col].to_pylist(), batch[b_col].to_pylist())
    ]
    return pa.table(
        {
            "a": batch["a"],
            "b": batch["b"],
            "jaccard": pa.array(vals, pa.float64()),
        }
    )


def attach_pair_texts(pairs, docs, *, num_partitions: int = 8):
    """Candidate-pair Dataset (a, b) + docs Dataset (doc_id, text) ->
    (a, b, text_a, text_b) via two distributed hash joins on doc_id.
    The dedup graph is orders of magnitude smaller than the corpus, so
    both joins move only candidate rows plus their matched texts — never
    the full documents table to the driver."""
    j1 = pairs.join(
        docs, join_type="inner", num_partitions=num_partitions,
        on=("a",), right_on=("doc_id",),
    ).rename_columns({"text": "text_a"})  # join drops the right key column
    return j1.join(
        docs, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("doc_id",),
    ).rename_columns({"text": "text_b"})


def connected_components(edges, *, num_partitions: int = 8,
                         max_rounds: int = 30):
    """Distributed connected components over an edge Dataset (a, b) by
    iterative min-label propagation: per round, every node takes the min
    of its own label and its neighbors' labels (one hash join + one
    groupby-min, both distributed); converges in O(component diameter)
    rounds — near-dup clusters are shallow, so typically <5. Each round's
    label table (O(nodes), tiny vs the corpus) is materialized so the
    iteration doesn't re-execute prior rounds' lineage; convergence is
    detected by the label-sum fixpoint (sums strictly decrease until
    stable). Returns a Dataset (doc_id, rep_id) — every edge endpoint,
    labeled with its component's min node id.
    """
    import ray.data
    from ray.data.aggregate import Min

    def sym(t: pa.Table) -> pa.Table:
        a, b = t["a"], t["b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
            }
        )

    E = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if E.count() == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "rep_id": pa.array([], pa.int64())})
        )

    def fold_self(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": t["src"],
                "rep": pc.min_element_wise(t["src"], t["rep"]),
            }
        )

    labels = (
        E.groupby("src").aggregate(Min("dst", alias_name="rep"))
        .map_batches(fold_self, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = labels.sum("rep")
    for _ in range(max_rounds):
        nb = E.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("node",),
        ).select_columns(["src", "rep"])
        both = nb.union(labels.rename_columns({"node": "src"}))
        labels = (
            both.groupby("src").aggregate(Min("rep", alias_name="rep"))
            .rename_columns({"src": "node"})
            .materialize()
        )
        cur_sum = labels.sum("rep")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.rename_columns({"node": "doc_id", "rep": "rep_id"})
