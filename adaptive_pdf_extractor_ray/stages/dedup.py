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
        # per-actor shingle-hash memo: web corpora repeat boilerplate
        # shingles massively across documents, and md5-per-shingle is the
        # signature's hot loop. Exact-semantics cache (pure function);
        # bounded, dropped wholesale when full.
        self._shingle_memo: dict[str, int] = {}

    _MEMO_MAX = 1 << 20  # ~16M heap per actor at ~16 B/entry

    def signature(self, text: str) -> np.ndarray:
        # min over a multiset == min over its set: dedup shingles first
        sh = list(dict.fromkeys(_shingles(text, self.k)))
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        memo = self._shingle_memo
        if len(memo) > self._MEMO_MAX:
            memo.clear()
        vals_it = []
        for s in sh:
            h = memo.get(s)
            if h is None:
                h = _hash64(s)
                memo[s] = h
            vals_it.append(h)
        base = np.array(vals_it, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (a*h + b) mod 2^64 — the wrap IS the modulus (SQL parity)
            vals = np.outer(self.a, base) + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.col].to_pylist()
        # one signature per DISTINCT content: web corpora repeat
        # boilerplate massively, and the signature is a pure function of
        # the text — the md5 key also rides along so over-cap LSH buckets
        # can collapse byte-identical docs before pairing (skew guard)
        hashes = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts
        ]
        sig_cache: dict[str, list[int]] = {}
        sigs: list[list[int]] = []
        for t, h in zip(texts, hashes):
            s = sig_cache.get(h)
            if s is None:
                s = [int(v) for v in self.signature(t or "")]
                sig_cache[h] = s
            sigs.append(s)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "minhash": pa.array(sigs, pa.list_(pa.uint64())),
                "content_md5": pa.array(hashes, pa.string()),
            }
        )


def explode_bands(batch: pa.Table, bands: int = LSH_BANDS) -> pa.Table:
    """signature rows -> (band_id, band_hash, doc_id) rows for the LSH
    groupby. band_hash = md5 of the band's values '|'-joined (SQL parity:
    ``md5(array_to_string(list_slice(sig, lo, hi), '|'))``)."""
    import hashlib as _hl

    have_content = "content_md5" in batch.column_names
    content = batch["content_md5"].to_pylist() if have_content else None
    doc_ids: list[int] = []
    band_ids: list[int] = []
    band_hashes: list[str] = []
    contents: list[str] = []
    for row_i, (did, sig) in enumerate(
        zip(batch["doc_id"].to_pylist(), batch["minhash"].to_pylist())
    ):
        rows_per_band = len(sig) // bands
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = _hl.md5("|".join(str(int(v)) for v in chunk).encode()).hexdigest()
            doc_ids.append(did)
            band_ids.append(b)
            band_hashes.append(h)
            if have_content:
                contents.append(content[row_i])
    cols = {
        "doc_id": pa.array(doc_ids, pa.int64()),
        "band_id": pa.array(band_ids, pa.int64()),
        "band_hash": pa.array(band_hashes, pa.string()),
    }
    if have_content:
        cols["content_md5"] = pa.array(contents, pa.string())
    return pa.table(cols)


def bucket_pairs(group: pa.Table, max_bucket: int = 1000,
                 rep_neighbors: int = 8) -> pa.Table:
    """One LSH bucket -> candidate pairs (a < b), skew-proof.

    Buckets up to ``max_bucket`` docs emit all C(n,2) pairs — the exact
    LSH semantics (and what the SQL oracle replicates; fixture buckets
    never exceed the cap). Real web corpora DO produce giant buckets:
    boilerplate/empty pages share every band (``MinHasher.signature``
    maps shingle-less text to a constant all-max signature), and a naive
    all-pairs there is O(n²) rows from ONE task. Over-cap buckets instead:

    1. collapse byte-identical documents (same ``content_md5``) to their
       min-doc_id representative, pairing the members to it in a star —
       O(members) pairs, guaranteed Jaccard 1.0, keeps the component
       connected;
    2. all-pairs over the representatives while they fit ``max_bucket``;
       beyond that each (sorted) representative pairs with its next
       ``rep_neighbors`` — bounded O(reps × k), and mutually-similar
       bucket members stay transitively connected for the components
       pass. Dropped pair volume is logged (no silent caps).
    """
    ids = group["doc_id"].to_pylist()
    n = len(ids)
    if n <= max_bucket:
        ids = sorted(ids)
        a_out, b_out = [], []
        for i in range(n):
            for j in range(i + 1, n):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())}
        )

    import logging

    if "content_md5" in group.column_names:
        hashes = group["content_md5"].to_pylist()
    else:  # no content column: every doc is its own representative
        hashes = [str(i) for i in ids]
    by_content: dict[str, list[int]] = {}
    for did, ch in zip(ids, hashes):
        by_content.setdefault(ch, []).append(did)
    a_out, b_out = [], []
    reps: list[int] = []
    for members in by_content.values():
        members.sort()
        reps.append(members[0])
        for m in members[1:]:  # identical-content star
            a_out.append(members[0])
            b_out.append(m)
    reps.sort()
    if len(reps) <= max_bucket:
        for i in range(len(reps)):
            for j in range(i + 1, len(reps)):
                a_out.append(reps[i])
                b_out.append(reps[j])
    else:
        for i in range(len(reps)):
            for j in range(i + 1, min(i + 1 + rep_neighbors, len(reps))):
                a_out.append(reps[i])
                b_out.append(reps[j])
    logging.getLogger(__name__).warning(
        "LSH skew guard: bucket of %d docs (%d distinct contents) emitted "
        "%d candidate pairs instead of all-pairs %d "
        "(identical-content star + %s)",
        n, len(reps), len(a_out), n * (n - 1) // 2,
        "rep all-pairs" if len(reps) <= max_bucket
        else f"{rep_neighbors}-neighbor rep adjacency",
    )
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
    driver-side text collection. Shingle sets are memoized per batch
    keyed by doc id: a doc in a dense dup cluster appears in hundreds of
    candidate pairs, and rebuilding its set per pair dominated the
    verify stage (10s -> ~2s on 300k candidates over 5k docs)."""
    memo: dict[int, set] = {}

    def sset(did: int, txt) -> set:
        s = memo.get(did)
        if s is None:
            s = set(_shingles(txt or "", k))
            memo[did] = s
        return s

    a_ids = batch["a"].to_pylist()
    b_ids = batch["b"].to_pylist()
    vals = []
    for aid, bid, ta, tb in zip(a_ids, b_ids,
                                batch[a_col].to_pylist(),
                                batch[b_col].to_pylist()):
        s1, s2 = sset(aid, ta), sset(bid, tb)
        if not s1 and not s2:  # ngram_jaccard parity: both empty -> 1.0
            vals.append(1.0)
        elif not s1 or not s2:
            vals.append(0.0)
        else:
            inter = len(s1 & s2)
            vals.append(round(inter / (len(s1) + len(s2) - inter), 6))
    return pa.table(
        {
            "a": batch["a"],
            "b": batch["b"],
            "jaccard": pa.array(vals, pa.float64()),
        }
    )


def ngram_containment(t1: str, t2: str, k: int = 3) -> tuple[float, float]:
    """Asymmetric n-gram containment (Broder 1997's second resemblance
    measure): (|S1∩S2|/|S1|, |S1∩S2|/|S2|). High containment with low
    Jaccard is the quote-expansion case — a page that embeds another doc
    plus its own chrome — which symmetric Jaccard under-scores (the
    union is inflated by the host page). Empty shingle sets are
    vacuously contained (1.0)."""
    s1, s2 = set(_shingles(t1, k)), set(_shingles(t2, k))
    inter = len(s1 & s2)
    c1 = 1.0 if not s1 else inter / len(s1)
    c2 = 1.0 if not s2 else inter / len(s2)
    return c1, c2


def containment_pairs_batch(batch: pa.Table, k: int = 3,
                            a_col: str = "text_a",
                            b_col: str = "text_b") -> pa.Table:
    """Per-pair directional containment over a joined candidate-pair
    batch (a, b, text_a, text_b) -> (a, b, cont_a_in_b, cont_b_in_a).
    Same fully-distributed shape (and per-batch shingle-set memo) as
    ``jaccard_pairs_batch``."""
    memo: dict[int, set] = {}

    def sset(did: int, txt) -> set:
        s = memo.get(did)
        if s is None:
            s = set(_shingles(txt or "", k))
            memo[did] = s
        return s

    ab_out: list[float] = []
    ba_out: list[float] = []
    for aid, bid, ta, tb in zip(batch["a"].to_pylist(),
                                batch["b"].to_pylist(),
                                batch[a_col].to_pylist(),
                                batch[b_col].to_pylist()):
        s1, s2 = sset(aid, ta), sset(bid, tb)
        inter = len(s1 & s2)
        ab_out.append(round(1.0 if not s1 else inter / len(s1), 6))
        ba_out.append(round(1.0 if not s2 else inter / len(s2), 6))
    return pa.table(
        {
            "a": batch["a"],
            "b": batch["b"],
            "cont_a_in_b": pa.array(ab_out, pa.float64()),
            "cont_b_in_a": pa.array(ba_out, pa.float64()),
        }
    )


def adaptive_partitions(n_rows: int, *, rows_per_part: int = 100_000,
                        cap: int | None = None) -> int:
    """Hash-shuffle partition count scaled to the DATA, clamped to the
    cluster: every ``num_partitions`` costs a shuffle-aggregator actor
    per operation, so sizing a 25-row pair join to the cluster's 24
    cores spends minutes of actor spinup to move kilobytes (the
    iterative components loop pays it per round). Rows dominate below
    the cluster clamp; the clamp keeps giant inputs from oversubscribing
    a small session."""
    import ray

    if cap is None:
        n_cpu = int(ray.cluster_resources().get("CPU", 4))
        cap = max(2, (n_cpu * 3) // 4)
    return max(2, min(cap, n_rows // rows_per_part + 2))


# below this many candidate pairs, attach_pair_texts broadcasts the pair
# list instead of hash-joining: a ray.put'd doc->pairs index is read once
# per worker, docs stream past it emitting ONLY candidate texts, and a
# bounded (a, b) groupby (<=2 rows per group) assembles the pair. Above
# it, the join route's adaptive partitions hold >=100k rows each, so the
# schemaless-empty-partition hazard (pyarrow join rejects an empty left
# partition: "No match for FieldRef") cannot arise.
PAIR_BROADCAST_MAX = 50_000


def attach_pair_texts(pairs, docs, *, num_partitions: int | None = None):
    """Candidate-pair Dataset (a, b) + docs Dataset (doc_id, text) ->
    (a, b, text_a, text_b), size-routed.

    Small pair sets (<= PAIR_BROADCAST_MAX, the common case — the dedup
    graph is orders of magnitude smaller than the corpus): broadcast a
    doc_id -> [(a, b, side)] index via ray.put, stream the docs once
    emitting only participating texts, and combine the two sides with a
    bounded groupby. Only candidate texts ever move — the full documents
    table is neither shuffled (the old join route moved it through the
    hash aggregators) nor collected. Also immune to the empty-partition
    join hazard that a rare-pair chain can trigger.

    Large pair sets: two distributed hash joins on doc_id with
    data-adaptive partition counts (>=100k rows per partition)."""
    if num_partitions is None:
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        if n_pairs <= PAIR_BROADCAST_MAX:
            return _attach_pair_texts_broadcast(pairs, docs)
        num_partitions = adaptive_partitions(n_pairs)
    from .joins import safe_join

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    j1 = safe_join(
        pairs, docs, join_type="inner", num_partitions=num_partitions,
        on=("a",), right_on=("doc_id",), left_schema=pair_schema,
    ).rename_columns({"text": "text_a"})  # join drops the right key column
    return safe_join(
        j1, docs, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("doc_id",),
    ).rename_columns({"text": "text_b"})


def _attach_pair_texts_broadcast(pairs, docs):
    """Broadcast route of attach_pair_texts (pairs already materialized
    and small): doc->pairs index shipped once via ray.put, docs stream
    past it, per-pair groupby (exactly the two sides) reassembles."""
    import ray
    import ray.data as rd

    pt = pa.concat_tables(
        [pa.table({"a": b["a"], "b": b["b"]})
         for b in pairs.iter_batches(batch_format="pyarrow")]
        or [pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})]
    )
    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "text_a": pa.array([], pa.string()),
            "text_b": pa.array([], pa.string()),
        }
    )
    if pt.num_rows == 0:
        return rd.from_arrow(empty)
    by_doc: dict[int, list[tuple[int, int, int]]] = {}
    for aa, bb in zip(pt["a"].to_pylist(), pt["b"].to_pylist()):
        by_doc.setdefault(aa, []).append((aa, bb, 0))
        by_doc.setdefault(bb, []).append((aa, bb, 1))
    idx_ref = ray.put(by_doc)

    def expand(t: pa.Table) -> pa.Table:
        idx = ray.get(idx_ref)
        a_o: list[int] = []
        b_o: list[int] = []
        side_o: list[int] = []
        txt_o: list[str] = []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            for aa, bb, s in idx.get(did, ()):
                a_o.append(aa)
                b_o.append(bb)
                side_o.append(s)
                txt_o.append(text)
        return pa.table(
            {
                "a": pa.array(a_o, pa.int64()),
                "b": pa.array(b_o, pa.int64()),
                "side": pa.array(side_o, pa.int64()),
                "text": pa.array(txt_o, pa.string()),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        sides = g["side"].to_pylist()
        try:
            ia, ib = sides.index(0), sides.index(1)
        except ValueError:  # a side's doc missing: inner-join parity
            return empty
        return pa.table(
            {
                "a": g["a"].slice(ia, 1),
                "b": g["b"].slice(ia, 1),
                "text_a": g["text"].slice(ia, 1).cast(pa.string()),
                "text_b": g["text"].slice(ib, 1).cast(pa.string()),
            }
        )

    return (
        docs.map_batches(expand, batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(combine, batch_format="pyarrow")
    )


# size-routing threshold for connected_components: below this many edges
# the whole graph fits one worker comfortably (8M symmetrized int64 pairs
# ≈ 128 MB Arrow + a node-id dict a few hundred MB of Python heap) and a
# single union-find task beats ~5 shuffle ops per propagation round;
# above it the iterative label-propagation dataflow takes over. Same
# routing idea as queries.BROADCAST_MAX_ROWS.
SMALL_EDGE_LIMIT = 4_000_000


def _safe_join_lazy(left, right, **kw):
    """joins.safe_join via deferred import (joins imports this module
    for adaptive_partitions — a module-level import would be a cycle)."""
    from .joins import safe_join

    return safe_join(left, right, **kw)


def _grouped_min(ds, key: str, val: str, out: str, n_parts: int):
    """groupby(key).min(val) via salt-partition + Arrow C++ ``group_by``
    — ``Dataset.groupby().aggregate(Min)`` combines rows at Python speed
    and dominates the label-propagation rounds at millions of edges. The
    salt is a deterministic mix of the key, so all rows of a key land in
    one partition: exact."""

    def salt(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            p = (k * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_parts)
        return t.append_column("p", pa.array(p.astype(np.int64)))

    def mn(g: pa.Table) -> pa.Table:
        r = g.select([key, val]).group_by(key).aggregate([(val, "min")])
        return r.rename_columns([key, out])

    return (
        ds.map_batches(salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p")
        .map_groups(mn, batch_format="pyarrow")
    )


def _union_find_batch(t: pa.Table) -> pa.Table:
    """Union-find over one (symmetrized) edge batch -> (doc_id, rep_id)
    with rep_id = min node id of the component — byte-identical to the
    min-label-propagation fixpoint, computed in one pass."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    src = t["src"].to_pylist()
    dst = t["dst"].to_pylist()
    for a, b in zip(src, dst):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min id keeps the min-label invariant
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    nodes = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "rep_id": pa.array([find(n) for n in nodes], pa.int64()),
        }
    )


def connected_components(edges, *, num_partitions: int | None = None,
                         max_rounds: int = 30,
                         stats: dict | None = None,
                         small_limit: int | None = None):
    """Distributed connected components over an edge Dataset (a, b),
    size-routed on the (materialized, counted) edge set:

    - ``<= small_limit`` edges (default ``SMALL_EDGE_LIMIT``): one
      union-find task over the whole graph inside the object store —
      the dedup graph is orders of magnitude smaller than the corpus,
      so this is the common case even at large corpus scale.
    - beyond: iterative min-label propagation — per round, every node
      takes the min of its own label and its neighbors' labels (one
      hash join + one groupby-min, both distributed); converges in
      O(component diameter) rounds — near-dup clusters are shallow, so
      typically <5. Each round's label table (O(nodes), tiny vs the
      corpus) is materialized so the iteration doesn't re-execute prior
      rounds' lineage; convergence is detected by the label-sum fixpoint
      (sums strictly decrease until stable).

    Both paths return the same Dataset (doc_id, rep_id) — every edge
    endpoint, labeled with its component's MIN node id (equivalence
    asserted in tests). ``stats`` gains ``cc_path`` plus round/node
    counts for observability."""
    import ray.data

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
    n_edges = E.count()
    if num_partitions is None:
        # per-round joins/groupbys pay a shuffle-aggregator actor per
        # partition: size to the (already-materialized) edge count
        num_partitions = adaptive_partitions(n_edges)
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "rep_id": pa.array([], pa.int64())})
        )
    limit = SMALL_EDGE_LIMIT if small_limit is None else small_limit
    if n_edges <= limit:
        # size-routed small path (the join_revenue pattern): one
        # union-find task replaces ~5 shuffle ops PER ROUND of label
        # propagation — same result, none of the iterative machinery.
        # The edges stay in the object store; the driver never holds them.
        if stats is not None:
            stats["cc_path"] = "union_find_task"
            stats["cc_rounds"] = 0  # closed-form, no propagation rounds
        out = (
            E.repartition(1)
            .map_batches(
                _union_find_batch, batch_format="pyarrow",
                batch_size=max(2 * n_edges, 1),  # whole graph, one batch
            )
        )
        if stats is not None:
            out = out.materialize()
            stats["cc_nodes"] = out.count()
        return out
    if stats is not None:
        stats["cc_path"] = "label_propagation"

    def fold_self(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": t["src"],
                "rep": pc.min_element_wise(t["src"], t["rep"]),
            }
        )

    labels = (
        _grouped_min(E, "src", "dst", "rep", num_partitions)
        .map_batches(fold_self, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = labels.sum("rep")
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        nb = _safe_join_lazy(
            E, labels, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("node",),
        ).select_columns(["src", "rep"])
        both = nb.union(labels.rename_columns({"node": "src"}))
        labels = (
            _grouped_min(both, "src", "rep", "rep", num_partitions)
            .rename_columns({"src": "node"})
            .materialize()
        )
        cur_sum = labels.sum("rep")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    if stats is not None:  # observability: bench reports round counts
        stats["cc_rounds"] = rounds
        stats["cc_nodes"] = labels.count()
    return labels.rename_columns({"node": "doc_id", "rep": "rep_id"})


# ---------------------------------------------------------------------------
# SimHash Hamming-distance near-dup pairs (Manku, Jain & Das Sarma,
# "Detecting Near-Duplicates for Web Crawling", WWW 2007). simhash_batch
# already emits 4×16-bit band keys; by pigeonhole, any pair within
# Hamming distance 3 of each other agrees EXACTLY on at least one band,
# so band-equality blocking finds every qualifying pair and the popcount
# verify inside the bucket discards the false positives.

SIMHASH_BANDS = 4
SIMHASH_MAX_HAM = 3


def explode_simhash_bands(batch: pa.Table) -> pa.Table:
    """simhash_batch output -> long form (doc_id, simhash, band_id,
    band_val), one row per band: the blocking key for the band groupby."""
    n = batch.num_rows
    doc = batch["doc_id"].to_numpy(zero_copy_only=False)
    sig = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    band_id = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n)
    sig_rep = np.repeat(sig, SIMHASH_BANDS)
    band_val = (
        (sig_rep >> (band_id.astype(np.uint64) * np.uint64(16)))
        & np.uint64(0xFFFF)
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc, SIMHASH_BANDS), pa.int64()),
            "simhash": pa.array(sig_rep, pa.uint64()),
            "band_id": pa.array(band_id, pa.int64()),
            "band_val": pa.array(band_val, pa.int64()),
        }
    )


def _hamming_matrix(x: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances over a uint64 signature vector —
    xor outer product, popcount via unpackbits (vectorized; n is
    bounded by the bucket cap so the n×n×8 byte view stays small)."""
    xor = x[:, None] ^ x[None, :]
    n = len(x)
    return np.unpackbits(
        xor.view(np.uint8).reshape(n, n, 8), axis=2
    ).sum(axis=2, dtype=np.int64)


def simhash_bucket_pairs(
    group: pa.Table,
    max_ham: int = SIMHASH_MAX_HAM,
    max_bucket: int = 1000,
    rep_neighbors: int = 8,
) -> pa.Table:
    """One simhash band bucket -> verified near-dup pairs
    (a, b, hamming), skew-proof.

    Under ``max_bucket`` docs the semantics are exact (what the SQL
    oracle replicates; fixture buckets never exceed the cap): all C(n,2)
    popcounts, keep Hamming <= ``max_ham``. Real web corpora produce
    giant buckets — every empty/boilerplate page simhashes to the same
    constant, so one band value can hold millions of docs. Over-cap
    buckets degrade the same way ``bucket_pairs`` does:

    1. collapse identical signatures to their min-doc_id representative,
       pairing members to it in a star (Hamming 0 by construction) —
       O(members) pairs;
    2. exact all-pairs over the representatives while they fit the cap;
       beyond that each signature-sorted representative pairs with its
       next ``rep_neighbors`` (sorted uint64 neighbors share high bits,
       so near-Hamming pairs cluster under the sort). Dropped volume is
       logged — no silent caps.
    """
    ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sims = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(ids)
    ids, sims = ids[order], sims[order]
    n = len(ids)

    def _emit(ia: np.ndarray, ib: np.ndarray, ham: np.ndarray) -> pa.Table:
        a, b = ids[ia], ids[ib]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table(
            {
                "a": pa.array(a2, pa.int64()),
                "b": pa.array(b2, pa.int64()),
                "hamming": pa.array(ham, pa.int64()),
            }
        )

    if n <= max_bucket:
        ham = _hamming_matrix(sims)
        iu, ju = np.triu_indices(n, k=1)
        keep = ham[iu, ju] <= max_ham
        return _emit(iu[keep], ju[keep], ham[iu, ju][keep])

    import logging

    # star over identical signatures (exact: Hamming 0 <= max_ham)
    a_idx: list[int] = []
    b_idx: list[int] = []
    h_out: list[int] = []
    by_sig: dict[int, list[int]] = {}
    for i in range(n):
        by_sig.setdefault(int(sims[i]), []).append(i)
    reps: list[int] = []
    for members in by_sig.values():  # members already id-sorted
        reps.append(members[0])
        for m in members[1:]:
            a_idx.append(members[0])
            b_idx.append(m)
            h_out.append(0)
    reps_np = np.asarray(reps, dtype=np.int64)
    rs = reps_np[np.argsort(sims[reps_np], kind="stable")]
    if len(rs) <= max_bucket:
        ham = _hamming_matrix(sims[rs])
        iu, ju = np.triu_indices(len(rs), k=1)
        keep = ham[iu, ju] <= max_ham
        extra = _emit(rs[iu[keep]], rs[ju[keep]], ham[iu, ju][keep])
    else:
        ia_l: list[int] = []
        ib_l: list[int] = []
        for off in range(1, rep_neighbors + 1):
            ia_l.extend(rs[:-off])
            ib_l.extend(rs[off:])
        ia = np.asarray(ia_l, dtype=np.int64)
        ib = np.asarray(ib_l, dtype=np.int64)
        x = sims[ia] ^ sims[ib]
        ham = np.unpackbits(
            x.view(np.uint8).reshape(len(x), 8), axis=1
        ).sum(axis=1, dtype=np.int64)
        keep = ham <= max_ham
        extra = _emit(ia[keep], ib[keep], ham[keep])
        dropped = len(rs) * (len(rs) - 1) // 2 - len(ia)
        logging.getLogger(__name__).warning(
            "simhash_bucket_pairs: bucket of %d reps over cap %d — "
            "sorted-neighbor chain kept %d candidates, ~%d exact pairs "
            "not examined", len(rs), max_bucket, len(ia), dropped,
        )
    head = pa.table(
        {
            "a": pa.array(ids[np.asarray(a_idx, dtype=np.int64)], pa.int64())
            if a_idx else pa.array([], pa.int64()),
            "b": pa.array(ids[np.asarray(b_idx, dtype=np.int64)], pa.int64())
            if b_idx else pa.array([], pa.int64()),
            "hamming": pa.array(h_out, pa.int64()),
        }
    )
    return pa.concat_tables([head, extra])


def cross_bucket_pairs(
    group: pa.Table,
    split_mod: int = 3,
    max_side: int = 1000,
    fan_k: int = 8,
) -> pa.Table:
    """One LSH band bucket -> cross-corpus candidate pairs (a=new doc,
    b=base doc) for INCREMENTAL dedup: only new×base pairs are emitted —
    never new×new or base×base — so a monthly crawl increment is checked
    against the accumulated corpus without re-pairing the corpus with
    itself. ``split_mod`` defines the deterministic fixture split
    (doc_id % mod == 0 -> new crawl, else base corpus).

    Under ``max_side`` docs per side the semantics are exact (the SQL
    oracle's cross join). Over-cap buckets (boilerplate collisions) pair
    each new doc with ``fan_k`` evenly-strided base docs instead of all
    of them — bounded O(new × k), dropped volume logged.
    """
    ids = np.sort(group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
    new = ids[ids % split_mod == 0]
    base = ids[ids % split_mod != 0]
    if len(new) == 0 or len(base) == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    if len(new) <= max_side and len(base) <= max_side:
        a = np.repeat(new, len(base))
        b = np.tile(base, len(new))
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )
    import logging

    k = min(fan_k, len(base))
    stride = max(1, len(base) // k)
    picks = base[::stride][:k]
    a = np.repeat(new, len(picks))
    b = np.tile(picks, len(new))
    logging.getLogger(__name__).warning(
        "cross_bucket_pairs: bucket %d new × %d base over cap %d — "
        "strided fan-out kept %d candidates, %d dropped",
        len(new), len(base), max_side, len(a),
        len(new) * len(base) - len(a),
    )
    return pa.table(
        {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
    )


class DomainMinHasher:
    """Actor stage for domain-level mergeable MinHash: per batch, the
    elementwise min of each source's doc signatures (= the signature of
    the union of their shingle sets, so per-block partials compose by a
    further min). Docs with no shingles are SKIPPED — their all-max
    sentinel is the min-identity, and skipping matches the SQL oracle
    (no shingle rows ⇒ no contribution). The emitted ``mh`` carries the
    ORDER-PRESERVING bias shift x − 2⁶³ into int64 (x ↦ x − 2⁶³ is
    monotone from [0, 2⁶⁴) onto [−2⁶³, 2⁶³)), because Ray's groupby-min
    block build converts through int64 and a genuine uint64 hash from a
    1-shingle doc exceeds int64 max about half the time; the consumer
    adds 2⁶³ back."""

    BIAS = 1 << 63

    def __init__(self, num_perm: int = NUM_PERM, shingle_k: int = 3,
                 col: str = "text", key: str = "source"):
        self._mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k, col=col)
        self.num_perm = num_perm
        self.col = col
        self.key = key

    def __call__(self, t: pa.Table) -> pa.Table:
        acc: dict[str, np.ndarray] = {}
        for src, txt in zip(
            t[self.key].to_pylist(), t[self.col].to_pylist()
        ):
            if not _tokens(txt or ""):
                continue  # empty shingle set: min-identity, skip
            sig = self._mh.signature(txt or "")
            cur = acc.get(src)
            acc[src] = sig if cur is None else np.minimum(cur, sig)
        srcs, pidx, mhs = [], [], []
        for src, sig in acc.items():
            srcs.extend([src] * self.num_perm)
            pidx.extend(range(self.num_perm))
            mhs.extend(int(v) - self.BIAS for v in sig)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "p_idx": pa.array(pidx, pa.int64()),
                "mh": pa.array(mhs, pa.int64()),
            }
        )
