"""PII scan / redact / gate over the injected fixture (session 19).

Split from the former monolithic queries.py (round-4 VERDICT item 2); the
public surface is re-exported unchanged by pipelines/queries.py.
"""

from __future__ import annotations
import hashlib
import json
import functools
import math
import os
import re
from collections import Counter
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ..functions.rules import Rule
from ..functions.textnorm import normalize_sql, normalize_text_array
from ..stages import dedup as dd
from ..stages import joins as sj
from ..stages import similarity as sim
from ..stages import text as tx
from ..stages.media import MediaDecoder

from .qhelpers import (  # noqa: F401
    _apool, _read, _table_rows,
)
from .qdedup import (  # noqa: F401
    q_setsim_join,
)
from .qsimilarity import (  # noqa: F401
    KNNG_QBLOCK,
)
from .qtraining import (  # noqa: F401
    q_split_assign,
)




# RE2 patterns shared verbatim by the Arrow kernels and the DuckDB
# oracles (both engines are RE2, so semantics are identical — the
# textnorm RE2-vectorized precedent). The four classes are mutually
# non-overlapping by construction: distinct digit-group shapes
# (3-3-4 phone vs 3-2-4 ssn), dotted-vs-dashed separators, and the
# mandatory alpha TLD in email.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"


def pii_corpus() -> str:
    """Lazily write the deterministic PII fixture (sf-independent fixed
    path); both the Ray queries and the oracle composers call this, so
    either side can run first."""
    import tempfile

    from ..sources.synthetic import write_pii_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_pii_400")
    return write_pii_corpus(root, n=400, seed=1)


def q_pii_scan(sf_dir: str):
    """Per-document PII inventory — the compliance pass every
    training-data pipeline runs before release (emails, phone numbers,
    IPv4 addresses, SSN-like ids). One embarrassingly-parallel
    map_batches over the text column; counts via Arrow's RE2
    ``count_substring_regex`` kernels (vectorized, zero Python per
    row), no shuffle. At 10^12 docs this is a pure streaming scan whose
    output is 5 ints/doc."""
    ds = rd.read_parquet(pii_corpus())

    def f(t: pa.Table) -> pa.Table:
        txt = t["text"]
        ne = pc.count_substring_regex(txt, pattern=PII_EMAIL_RE)
        np_ = pc.count_substring_regex(txt, pattern=PII_PHONE_RE)
        ni = pc.count_substring_regex(txt, pattern=PII_IPV4_RE)
        ns = pc.count_substring_regex(txt, pattern=PII_SSN_RE)
        tot = pc.add(pc.add(ne, np_), pc.add(ni, ns))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_email": pc.cast(ne, pa.int64()),
                "n_phone": pc.cast(np_, pa.int64()),
                "n_ipv4": pc.cast(ni, pa.int64()),
                "n_ssn": pc.cast(ns, pa.int64()),
                "n_pii": pc.cast(tot, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_pii_scrub(sf_dir: str):
    """PII redaction: every match replaced by a typed placeholder
    ([EMAIL]/[SSN]/[PHONE]/[IP]) in a FIXED class order (placeholders
    contain no digits, so later passes can never re-match earlier
    replacements). Vectorized RE2 ``replace_substring_regex`` chain,
    stateless, no shuffle — the release-time sibling of q_pii_scan."""
    ds = rd.read_parquet(pii_corpus())

    def f(t: pa.Table) -> pa.Table:
        txt = t["text"]
        txt = pc.replace_substring_regex(
            txt, pattern=PII_EMAIL_RE, replacement="[EMAIL]"
        )
        txt = pc.replace_substring_regex(
            txt, pattern=PII_SSN_RE, replacement="[SSN]"
        )
        txt = pc.replace_substring_regex(
            txt, pattern=PII_PHONE_RE, replacement="[PHONE]"
        )
        txt = pc.replace_substring_regex(
            txt, pattern=PII_IPV4_RE, replacement="[IP]"
        )
        return pa.table({"doc_id": t["doc_id"], "text_redacted": txt})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_pii_gate(sf_dir: str):
    """Strict PII gate: only documents with ZERO matches in every class
    survive (the conservative release policy; redaction is the lossy
    alternative). Single stateless filter pass — the mask is the
    conjunction of four vectorized RE2 ``match_substring_regex``
    kernels, cheaper than counting."""
    ds = rd.read_parquet(pii_corpus())

    def f(t: pa.Table) -> pa.Table:
        txt = t["text"]
        dirty = pc.or_(
            pc.or_(
                pc.match_substring_regex(txt, pattern=PII_EMAIL_RE),
                pc.match_substring_regex(txt, pattern=PII_PHONE_RE),
            ),
            pc.or_(
                pc.match_substring_regex(txt, pattern=PII_IPV4_RE),
                pc.match_substring_regex(txt, pattern=PII_SSN_RE),
            ),
        )
        return t.filter(pc.invert(dirty))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


BITEXT_K = 4  # neighborhood size for the margin denominator


def _bitext_blocks(sf_dir: str, parity: int) -> list:
    """Stream one side of the embedding table into bounded plasma
    blocks (ids, pre-normalized matrix) — the knn_graph round-4 memory
    shape: the driver holds one block at a time, never the table."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    refs = []
    for qb in ds.iter_batches(
        batch_size=KNNG_QBLOCK, batch_format="pyarrow"
    ):
        lab = np.asarray(qb["label"].to_pylist(), dtype=np.int64)
        keep = lab % 2 == parity
        if not keep.any():
            continue
        ids = np.asarray(qb["vec_id"].to_pylist(), dtype=np.int64)[keep]
        M = np.asarray(
            qb["embedding"].to_pylist(), dtype=np.float64
        )[keep]
        M = M / np.maximum(
            np.linalg.norm(M, axis=1, keepdims=True), 1e-12
        )
        refs.append(ray.put((ids, M)))
    return refs


def _sim4(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Cosine sims of pre-normalized rows, rounded 4 dp, as int e4 —
    the integer currency every comparison below uses."""
    return np.rint(np.round(X @ Y.T, 4) * 10_000).astype(np.int64)


def _merge_topk(
    sims_blocks: list, ids_blocks: list, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Row-wise global top-k by (sim desc, id asc) across per-block
    score matrices. Returns (vals, ids) of shape (rows, k)."""
    allv = np.concatenate(sims_blocks, axis=1)
    alli = np.concatenate(ids_blocks)
    order = np.argsort(alli, kind="stable")
    allv = allv[:, order]
    alli = alli[order]
    top = np.argsort(-allv, axis=1, kind="stable")[:, :k]
    rows = np.arange(allv.shape[0])[:, None]
    return allv[rows, top], alli[top]


def q_bitext_mine(sf_dir: str):
    """Margin-based bitext mining, RATIO criterion with BOTH-side
    neighborhoods (Artetxe & Schwenk, ACL'19 eq. 4 — the CCMatrix
    recipe; `q_xlang_mine` is the simpler forward-difference variant
    against a bounded target side): side A = even-label vectors, side
    B = odd-label (the two-"language" split of the fixture); for each
    x in A, among its BITEXT_K cosine-nearest candidates y in B, pick
    the one maximizing margin(x,y) = cos(x,y) / ((mean_k cos(x,
    NN_B(x)) + mean_k cos(y, NN_A(y)))/2), keep pairs with margin > 1
    — the published recipe's candidate restriction.
    ENTIRELY integer-exact once cosines are rounded at 4 dp (the
    knn_brute precedent): sims become int e4, denominators are top-k
    SUMS (no float means), the per-x argmax and the >1 filter are
    integer cross-multiplies — identical to the SQL replay by
    construction.

    Memory shape: both sides stream into bounded plasma blocks
    (no driver table read — the knn_graph round-4 fix); actors loop
    zero-copy over B blocks per batch. The B-side denominator table
    (one int per B vector) is built once per actor from the block
    refs; at 10^12 vectors that table and the exact scans are replaced
    by the IVF route (q_knn_ivf's bucketed index) feeding the same
    margin arithmetic — the margin math is the operator, neighbor
    retrieval is pluggable."""
    a_refs = _bitext_blocks(sf_dir, 0)
    b_refs = _bitext_blocks(sf_dir, 1)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    class Miner:
        def __init__(self, a_refs, b_refs, k: int):
            self.b_refs = list(b_refs)
            self.k = k
            # B-side denominators: per y, sum of top-k sims vs A
            # (selected (sim desc, A-id asc)) — one int per B vector,
            # built by a bounded block x block loop (zero-copy gets)
            self.mysum: dict[int, int] = {}
            for bref in self.b_refs:
                b_ids, B = ray.get(bref)
                sims_blocks, ids_blocks = [], []
                for aref in a_refs:
                    a_ids, A = ray.get(aref)
                    sims_blocks.append(_sim4(B, A))
                    ids_blocks.append(a_ids)
                vals, _ = _merge_topk(sims_blocks, ids_blocks, k)
                for yi, y in enumerate(b_ids):
                    self.mysum[int(y)] = int(vals[yi].sum())

        def __call__(self, batch: pa.Table) -> pa.Table:
            lab = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
            keep = lab % 2 == 0
            empty = pa.table(
                {
                    "src_id": pa.array([], pa.int64()),
                    "dst_id": pa.array([], pa.int64()),
                    "sim_e4": pa.array([], pa.int64()),
                    "den_e4": pa.array([], pa.int64()),
                }
            )
            if not keep.any() or not self.b_refs:
                return empty
            x_ids = np.asarray(
                batch["vec_id"].to_pylist(), dtype=np.int64
            )[keep]
            X = np.asarray(
                batch["embedding"].to_pylist(), dtype=np.float64
            )[keep]
            X = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12
            )
            sims_blocks, ids_blocks = [], []
            for bref in self.b_refs:
                b_ids, B = ray.get(bref)  # zero-copy plasma view
                sims_blocks.append(_sim4(X, B))
                ids_blocks.append(b_ids)
            vals, cids = _merge_topk(
                sims_blocks, ids_blocks, self.k
            )  # (x, k) candidate sims + B ids
            mxsum = vals.sum(axis=1)
            src, dst, s4, d4 = [], [], [], []
            for xi in range(vals.shape[0]):
                best = None
                for j in range(vals.shape[1]):
                    num = int(vals[xi, j])
                    den = int(mxsum[xi]) + self.mysum[int(cids[xi, j])]
                    if best is None:
                        best = (num, den, int(cids[xi, j]))
                        continue
                    lhs = num * best[1]
                    rhs = best[0] * den
                    if lhs > rhs or (
                        lhs == rhs and int(cids[xi, j]) < best[2]
                    ):
                        best = (num, den, int(cids[xi, j]))
                # margin > 1  <=>  2k * num > den (integers)
                if best and 2 * self.k * best[0] > best[1]:
                    src.append(int(x_ids[xi]))
                    dst.append(best[2])
                    s4.append(best[0])
                    d4.append(best[1])
            return pa.table(
                {
                    "src_id": pa.array(src, pa.int64()),
                    "dst_id": pa.array(dst, pa.int64()),
                    "sim_e4": pa.array(s4, pa.int64()),
                    "den_e4": pa.array(d4, pa.int64()),
                }
            )

    return ds.map_batches(
        Miner, fn_constructor_args=(a_refs, b_refs, BITEXT_K),
        batch_format="pyarrow", concurrency=_apool(), max_restarts=0,
    )


BITEXT_ORACLE_SQL = f"""
with a as (select vec_id, embedding from embeddings where label % 2 = 0),
b as (select vec_id, embedding from embeddings where label % 2 = 1),
s as (select a.vec_id as xa, b.vec_id as yb,
             cast(round(round(list_cosine_similarity(
                    a.embedding::double[], b.embedding::double[]), 4)
                  * 10000) as bigint) as sim4
      from a cross join b),
mx as (select xa, sum(sim4)::bigint as mxsum from (
         select xa, sim4, row_number() over
             (partition by xa order by sim4 desc, yb asc) as rn
         from s) where rn <= {BITEXT_K} group by xa),
my as (select yb, sum(sim4)::bigint as mysum from (
         select yb, sim4, row_number() over
             (partition by yb order by sim4 desc, xa asc) as rn
         from s) where rn <= {BITEXT_K} group by yb),
cand as (select xa, yb, sim4 from (
           select xa, yb, sim4, row_number() over
               (partition by xa order by sim4 desc, yb asc) as rn
           from s) where rn <= {BITEXT_K}),
j as (select c.xa, c.yb, c.sim4,
             (mx.mxsum + my.mysum)::bigint as den4
      from cand c join mx using (xa) join my using (yb)),
best as (select j.xa, j.yb, j.sim4, j.den4 from j
         where not exists (
           select 1 from j j2 where j2.xa = j.xa and
             (j2.sim4 * j.den4 > j.sim4 * j2.den4 or
              (j2.sim4 * j.den4 = j.sim4 * j2.den4
               and j2.yb < j.yb))))
select xa as src_id, yb as dst_id, sim4 as sim_e4, den4 as den_e4
from best where 2 * {BITEXT_K} * sim4 > den4
"""


def q_leakage_free_split(sf_dir: str):
    """Leakage-free train/test split: the deterministic md5 split
    (`split_assign`) hardened by NEAR-DUP leakage removal — any
    non-test document that is an exact-verified near-duplicate
    (`setsim_join`, complete at threshold by the prefix-filter
    guarantee) of a test document is re-labeled 'dropped', because
    training on a near-copy of an eval item is contamination that
    id-level splitting cannot see. The published eval-hygiene step
    (GPT-3 appendix C / PaLM dedup-against-eval discipline) as one
    dataflow: split pass (stateless) -> verified pair edges (both
    directions) -> hash-join edges against the test side -> distinct
    flagged neighbors (per-batch Arrow unique + grouped count, never a
    per-node Python group) -> one semi-join to mark, one anti-join to
    keep. Everything keyed by doc_id — well-spread at 10^12 docs."""
    nparts = dd.adaptive_partitions(_table_rows(sf_dir, "documents"))
    split = q_split_assign(sf_dir).select_columns(
        ["doc_id", "split"]
    ).materialize()
    pairs = q_setsim_join(sf_dir).select_columns(["a", "b"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        pc.cast(t["a"], pa.int64()).combine_chunks(),
                        pc.cast(t["b"], pa.int64()).combine_chunks(),
                    ]
                ),
                "v": pa.concat_arrays(
                    [
                        pc.cast(t["b"], pa.int64()).combine_chunks(),
                        pc.cast(t["a"], pa.int64()).combine_chunks(),
                    ]
                ),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    test_side = split.filter(expr="split == 'test'").map_batches(
        lambda t: pa.table({"v": t["doc_id"]}),
        batch_format="pyarrow",
    )
    flagged = (
        sj.safe_join(edges, test_side, join_type="inner",
                     num_partitions=nparts, on=("v",))
        .map_batches(
            lambda t: pa.table(
                {"doc_id": pc.unique(t["u"].combine_chunks())}
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(ray.data.aggregate.Count(alias_name="n_adj"))
        .select_columns(["doc_id"])
    )
    dropped = (
        sj.safe_join(
            split.filter(expr="split != 'test'"),
            flagged, join_type="inner",
            num_partitions=nparts, on=("doc_id",))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "split": pa.array(
                        ["dropped"] * t.num_rows, pa.string()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    kept = sj.safe_join(
        split, dropped.select_columns(["doc_id"]), join_type="left_anti",
        num_partitions=nparts, on=("doc_id",),
    )
    return kept.union(dropped)



SNAPSHOT_ASOF_TS = "2024-01-02 12:00:00"  # between revision 0 and 1
