"""Similarity search over embedding columns.

- :class:`BruteKnn` — exact cosine top-k: the query matrix (small) is
  broadcast via ``ray.put`` once; every batch does one numpy matmul
  against it. This is the baseline the scale path is measured against.
- :class:`IvfIndexKnn` — IVF-style scale path: k-means-lite centroids
  (deterministic seeding), batches route each query to the ``nprobe``
  nearest centroid buckets only. At cluster scale the index build is a
  sampled pass and buckets shard across actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embeddings_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    return np.asarray(batch[col].to_pylist(), dtype=np.float64)


class BruteKnn:
    """Actor stage: per-batch cosine scores vs a broadcast query matrix.

    Emits (query_id, neighbor_id, sim) partial top-k per batch; a final
    small groupby-per-query keeps global top-k (partial+final pattern —
    no batch ships full score matrices).
    """

    def __init__(self, queries_ref, k: int = 5, col: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        self.Q = _normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.k = k
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        M = _normalize(embeddings_matrix(batch, self.col))
        sims = np.round(self.Q @ M.T, 4)  # (nq, batch); 4 dp = rank precision
        k = min(self.k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # partial top-k by (sim desc, neighbor_id asc) — deterministic
            order = sorted(range(sims.shape[1]), key=lambda j: (-sims[qi, j], ids[j]))
            for j in order[:k]:
                out_q.append(int(self.query_ids[qi]))
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


class BlockedKnnGraph:
    """Actor stage for the EXACT kNN graph without any corpus-sized
    allocation: the query side is a list of bounded plasma blocks
    (ids, pre-normalized matrix) put by bounded driver streaming —
    never the whole table on the driver, never the whole matrix in an
    actor heap. Per data batch the actor loops over the block refs;
    ``ray.get`` of a numpy block is plasma zero-copy, so per-loop heap
    cost is one (block x batch) score matrix. Compute stays O(n^2) —
    inherent to exact kNN-graph; q_knn_lsh / q_knn_ivf are the
    approximate scale path measured against this via q_ann_recall."""

    def __init__(self, block_refs, k: int = 5, col: str = "embedding"):
        self.refs = list(block_refs)
        self.k = k
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        M = _normalize(embeddings_matrix(batch, self.col))
        k = min(self.k, M.shape[0])
        out_q: list[int] = []
        out_n: list[int] = []
        out_s: list[float] = []
        # vectorized partial top-k by (sim desc, neighbor_id asc):
        # columns pre-ordered by id asc, then stable argsort on -sim
        # keeps the id tie-break without a per-query Python sort
        id_order = np.argsort(ids, kind="stable")
        for ref in self.refs:
            q_ids, Qn = ray.get(ref)  # zero-copy plasma view
            sims = np.round(Qn @ M.T, 4)
            sims_o = sims[:, id_order]
            top = np.argsort(-sims_o, axis=1, kind="stable")[:, :k]
            for qi in range(sims_o.shape[0]):
                cols = top[qi]
                out_q.extend([int(q_ids[qi])] * len(cols))
                out_n.extend(int(ids[id_order[j]]) for j in cols)
                out_s.extend(float(sims_o[qi, j]) for j in cols)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def topk_per_query(group: pa.Table, k: int = 5) -> pa.Table:
    """Final reduce: keep k best (sim desc, neighbor_id asc) per query."""
    rows = sorted(
        zip(
            group["query_id"].to_pylist(),
            group["neighbor_id"].to_pylist(),
            group["sim"].to_pylist(),
        ),
        key=lambda r: (-r[2], r[1]),
    )[:k]
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
            "sim": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def kmeans_lite(
    X: np.ndarray, n_clusters: int, iters: int = 5
) -> np.ndarray:
    """Deterministic k-means (first-n init) for the IVF index."""
    C = X[:n_clusters].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_clusters):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


class IvfIndexKnn:
    """IVF-bucketed ANN: probe only the nearest ``nprobe`` centroid buckets.

    The centroid matrix (built from a driver-side sample) is broadcast;
    each batch computes exact cosine only for vectors whose centroid
    assignment falls in a probed bucket — the standard IVF recall/cost
    trade documented for ANN at corpus scale.
    """

    def __init__(self, queries_ref, centroids_ref, nprobe: int = 2,
                 k: int = 5, col: str = "embedding"):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        C = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        self.Q = _normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.C = np.asarray(C, dtype=np.float64)
        qd = ((self.Q[:, None, :] - self.C[None, :, :]) ** 2).sum(axis=2)
        self.probes = np.argsort(qd, axis=1)[:, :nprobe]  # (nq, nprobe)
        self.k = k
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        X = embeddings_matrix(batch, self.col)
        d = ((X[:, None, :] - self.C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # bucket per vector
        Xn = _normalize(X)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(self.query_ids)):
            mask = np.isin(assign, self.probes[qi])
            if not mask.any():
                continue
            sims = np.round(Xn[mask] @ self.Q[qi], 6)
            sub_ids = ids[mask]
            k = min(self.k, len(sims))
            # deterministic partial selection on the ROUNDED sim with
            # neighbor-id tie-break: the survivor set is independent of
            # block layout (argpartition at a tie boundary would not be)
            top = sorted(range(len(sims)),
                         key=lambda j: (-sims[j], sub_ids[j]))[:k]
            for j in top:
                out_q.append(int(self.query_ids[qi]))
                out_n.append(int(sub_ids[j]))
                out_s.append(float(sims[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def embedding_neardup_pairs(batch_ids: np.ndarray, M: np.ndarray,
                            threshold: float = 0.35) -> pa.Table:
    """Within-bucket exact cosine near-dup pairs (used after LSH bucketing).

    The threshold applies to the 4-dp-rounded similarity so distributed
    float noise can't flip boundary pairs vs the SQL oracle.
    """
    Mn = _normalize(M)
    sims = np.round(Mn @ Mn.T, 4)
    a_out, b_out = [], []
    n = len(batch_ids)
    iu, ju = np.triu_indices(n, k=1)
    hit = sims[iu, ju] >= threshold
    for i, j in zip(iu[hit], ju[hit]):
        x, y = int(batch_ids[i]), int(batch_ids[j])
        a_out.append(min(x, y))
        b_out.append(max(x, y))
    return pa.table(
        {
            "a": pa.array(a_out, pa.int64()),
            "b": pa.array(b_out, pa.int64()),
        }
    )


def lsh_planes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic random-hyperplane matrix for sign-LSH (data-
    independent: depends only on the embedding dimension and a fixed
    seed, so the SQL oracle can embed the same floats as literals)."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_planes, dim))


def lsh_buckets(X: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-LSH bucket id per row of ``X``: bit i = (round(X·hᵢ, 6) >= 0),
    bucket = Σ bitᵢ·2ⁱ. The 6-dp round before the sign test makes the
    bit engine-independent at the 0 boundary (numpy matmul vs the
    oracle's sequential list_inner_product differ by ~1 ulp)."""
    dots = np.round(X @ planes.T, 6)  # (n, p)
    bits = (dots >= 0).astype(np.int64)
    return (bits << np.arange(planes.shape[0], dtype=np.int64)).sum(axis=1)


def lsh_tables(dim: int, n_tables: int = 2, n_planes: int = 6,
               seed: int = 7) -> list[np.ndarray]:
    """The classic multi-table sign-LSH index: ``n_tables`` independent
    plane matrices (seeds ``seed..seed+n_tables-1``). Candidates are the
    UNION over tables — each table's bucket is a high-precision/low-
    recall filter; independent tables recover the recall."""
    return [lsh_planes(dim, n_planes, seed + t) for t in range(n_tables)]


class SignLshKnn:
    """Multi-table sign-LSH ANN — the hyperplane-hash counterpart of
    :class:`IvfIndexKnn` (recall < 1 by design vs brute force, but the
    computation itself is deterministic and value-verified against a
    full DuckDB replication with plane literals).

    Index build is free (planes are data-independent — no sampling pass,
    unlike IVF's k-means), so this is the scale path when even one
    centroid pass over a 10^12-row corpus is unwanted. Each query probes,
    in every table, its own bucket plus every 1-bit flip (multiprobe);
    candidates are the union over tables; exact cosine, partial top-k
    per batch, final per-query reduce — identical dataflow shape to
    BruteKnn/IvfIndexKnn. At 6 tables x 8 planes (re-tuned with the
    in-engine q_ann_recall evaluator) this scans ~22% of the corpus for
    recall@5 ≈ 0.74 on the fixture embeddings — same scan fraction the
    old 2x6 config paid for 0.58 (vs IVF's 25% scan at recall ≈ 0.5)."""

    def __init__(self, queries, tables, k: int = 5, col: str = "embedding"):
        self.query_ids = np.asarray(queries["ids"], dtype=np.int64)
        Qraw = np.asarray(queries["vecs"], dtype=np.float64)
        self.Q = _normalize(Qraw)
        self.tables = [np.asarray(P, dtype=np.float64) for P in tables]
        # per table: query bucket + 1-bit multiprobe set
        self.probes: list[list[np.ndarray]] = []
        for P in self.tables:
            n_planes = P.shape[0]
            qb = lsh_buckets(Qraw, P)
            self.probes.append([
                np.asarray(
                    sorted({int(b)} | {int(b) ^ (1 << i)
                                       for i in range(n_planes)}),
                    dtype=np.int64,
                )
                for b in qb
            ])
        self.k = k
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        X = embeddings_matrix(batch, self.col)
        buckets = [lsh_buckets(X, P) for P in self.tables]
        Xn = _normalize(X)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(self.query_ids)):
            mask = np.zeros(len(ids), dtype=bool)
            for ti in range(len(self.tables)):
                mask |= np.isin(buckets[ti], self.probes[ti][qi])
            if not mask.any():
                continue
            sims = np.round(Xn[mask] @ self.Q[qi], 6)
            sub_ids = ids[mask]
            k = min(self.k, len(sims))
            # deterministic partial selection on the ROUNDED sim with
            # neighbor-id tie-break (block-layout independent)
            top = sorted(range(len(sims)),
                         key=lambda j: (-sims[j], sub_ids[j]))[:k]
            for j in top:
                out_q.append(int(self.query_ids[qi]))
                out_n.append(int(sub_ids[j]))
                out_s.append(float(sims[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


class CentroidAssign:
    """Assign each embedding to its nearest centroid (argmin squared L2,
    first-centroid tie-break — the same rule as IvfIndexKnn, so the
    SemDeDup oracle can reuse the IVF centroid-literal replication).
    Centroids ship as plain constructor values."""

    def __init__(self, centroids, col: str = "embedding"):
        self.C = np.asarray(centroids, dtype=np.float64)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = embeddings_matrix(batch, self.col)
        d = ((X[:, None, :] - self.C[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                "vec_id": pc.cast(batch["vec_id"], pa.int64()),
                "cluster": pa.array(d.argmin(axis=1), pa.int64()),
                "embedding": batch[self.col],
            }
        )


SEM_MAX_CLUSTER = 2048  # per-cluster bound on the exact all-pairs rule
_SEM_LSH_SEED = 0x53444C  # deterministic sub-bucket hyperplanes ("SDL")


def _sem_drop_mask(ids: np.ndarray, Xn: np.ndarray, tau: float) -> np.ndarray:
    """Exact rule over one candidate set: drop v when some u in the set
    has round(cos(u, v), 6) >= tau and u.vec_id < v.vec_id."""
    sims = np.round(Xn @ Xn.T, 6)
    smaller = ids[None, :] < ids[:, None]  # [i, j] = id_j < id_i
    return ((sims >= tau) & smaller).any(axis=1)


def _semdedup_overflow(
    ids: np.ndarray, Xn: np.ndarray, tau: float, max_cluster: int
) -> np.ndarray:
    """Runaway-cluster escape hatch (the ``dedup.bucket_pairs`` analog
    for embedding space) -> kept row indices, sorted.

    1. Collapse 6-dp-identical normalized vectors to their min-id
       representative. Lossless w.r.t. the rule: an identical pair has
       round(cos, 6) = 1.0 >= tau, so every non-representative is a
       guaranteed drop, and anything that would drop a representative
       drops its members too.
    2. If the distinct representatives still exceed ``max_cluster``,
       sign-LSH them into 2^p deterministic sub-buckets and run the
       exact rule within each sub-bucket only. Cross-sub-bucket
       near-duplicates are the accepted approximation (near-identical
       vectors agree on every sign bit, so true duplicate sets stay
       co-bucketed); a sub-bucket still over the cap compares against
       its ``max_cluster`` smallest-id members only. Both reductions
       are logged — no silent caps.
    """
    import logging

    log = logging.getLogger(__name__)
    n = len(ids)
    order = np.argsort(ids, kind="stable")  # id-ascending: first = min-id
    keys = np.ascontiguousarray(np.round(Xn, 6)[order])
    view = keys.view([("", keys.dtype)] * keys.shape[1]).ravel()
    _, first = np.unique(view, return_index=True)
    reps = order[first]  # min-id representative of each distinct vector
    m = len(reps)
    if m <= max_cluster:
        log.info(
            "semdedup overflow cluster: n=%d collapsed to %d distinct "
            "vectors (exact rule on representatives)", n, m,
        )
        drop = _sem_drop_mask(ids[reps], Xn[reps], tau)
        return np.sort(reps[~drop])
    p = min(16, max(1, int(np.ceil(np.log2(m / max_cluster))) + 1))
    rng = np.random.default_rng(_SEM_LSH_SEED)
    planes = rng.standard_normal((Xn.shape[1], p))
    codes = (Xn[reps] @ planes >= 0.0) @ (1 << np.arange(p, dtype=np.int64))
    kept: list[np.ndarray] = []
    truncated = 0
    for code in np.unique(codes):
        sub = reps[codes == code]
        if len(sub) > max_cluster:
            # still skewed: rule each vector against the max_cluster
            # smallest-id members only (min-id anchor is always present,
            # so a flood of mutual near-dups still collapses to one)
            anchors = sub[np.argsort(ids[sub], kind="stable")[:max_cluster]]
            truncated += len(sub) - max_cluster
            sims = np.round(Xn[sub] @ Xn[anchors].T, 6)
            smaller = ids[anchors][None, :] < ids[sub][:, None]
            drop = ((sims >= tau) & smaller).any(axis=1)
        else:
            drop = _sem_drop_mask(ids[sub], Xn[sub], tau)
        kept.append(sub[~drop])
    log.warning(
        "semdedup overflow cluster: n=%d -> %d distinct vectors > cap %d; "
        "sign-LSH into %d sub-buckets (%d planes) — cross-sub-bucket "
        "near-duplicates are not compared%s",
        n, m, max_cluster, len(np.unique(codes)), p,
        f"; {truncated} rows ruled against anchors only" if truncated else "",
    )
    return np.sort(np.concatenate(kept)) if kept else np.empty(0, np.int64)


def semdedup_group(
    group: pa.Table, tau: float, max_cluster: int = SEM_MAX_CLUSTER
) -> pa.Table:
    """Within-cluster SemDeDup rule (Abbas et al. 2023, simplified to a
    deterministic order): drop v when some u in the SAME cluster has
    round(cos(u, v), 6) >= tau and u.vec_id < v.vec_id — i.e. each
    semantic-duplicate set keeps its min-id representative. O(c²) in the
    cluster size: the scale contract is that the centroid count grows
    with the corpus (k ≈ N / target_cluster_size), which is what bounds
    c. A cluster over ``max_cluster`` rows (skewed assignment — e.g. a
    boilerplate embedding flood) routes through ``_semdedup_overflow``:
    identical-vector collapse, then sign-LSH sub-buckets, exact rule
    within each — bounded work, logged approximation."""
    ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
    Xn = _normalize(embeddings_matrix(group))
    if tau > 1.0:  # nothing can qualify (round(cos) <= 1.0): keep all
        keep_idx = np.arange(len(ids))
    elif len(ids) <= max_cluster:
        keep_idx = np.flatnonzero(~_sem_drop_mask(ids, Xn, tau))
    else:
        keep_idx = _semdedup_overflow(ids, Xn, tau, max_cluster)
    return pa.table(
        {
            "vec_id": pa.array(ids[keep_idx], pa.int64()),
            "cluster": group["cluster"].take(pa.array(keep_idx, pa.int64())),
        }
    )
