"""Link graph: outlinks, in-degree, PageRank/HITS/trustrank, k-core, BFS distance, components.

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
    _pq, _read, _table_rows,
)
from .qdedup import (  # noqa: F401
    _grouped_count,
)
from .qquality import (  # noqa: F401
    LINK_HREF_RE, LINK_N, PR_ITERS,
)

# Fixed-point PageRank: ranks live in integer 1e-9 units and damping is
# the exact rational 85/100, so every route (driver dict loop,
# distributed join+groupby, SQL oracle) does the SAME integer floor
# divisions and order-independent integer sums — bit-equality with no
# float-summation-order or round-half-mode hazards anywhere. The <=1e-9
# mass floored away per edge per round is deterministic and irrelevant
# to ranking.
PR_SCALE = 10 ** 9
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def link_corpus(n: int = LINK_N) -> str:
    """Lazily write the deterministic hyperlinked corpus (sf-independent
    fixed path, like flagship_corpus); both the Ray queries and the
    oracle composer call this, so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_link_corpus

    root = os.path.join(tempfile.gettempdir(), f"aper_links_{n}")
    return write_link_corpus(root, n=n, seed=1)


def _outlinks_ds(pages_dir: str):
    """(src, dst) edge list: every href occurrence in every page's HTML
    (multigraph — duplicates kept, exactly what regexp_extract_all
    yields on the oracle side). The per-row finditer is inherent parse
    work over an opaque binary column, same shape as the PDF/HTML
    parsers; the regex is compiled once at module import."""

    def f(t: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for m in LINK_HREF_RE.finditer(h.decode("utf-8")):
                srcs.append(u)
                dsts.append(m.group(1))
        return pa.table(
            {
                "src": pa.array(srcs, pa.string()),
                "dst": pa.array(dsts, pa.string()),
            }
        )

    return rd.read_parquet(pages_dir, columns=["url", "html"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_outlinks(sf_dir: str):
    """Outlink extraction from raw HTML — the URL-frontier feed of a
    crawl/curation pipeline. Embarrassingly parallel; no shuffle."""
    return _outlinks_ds(link_corpus())


def q_link_indegree(sf_dir: str):
    """In-degree per target url (link-popularity rollup): one groupby
    over the edge list; shuffle moves (dst, partial count) only."""
    return (
        _outlinks_ds(link_corpus())
        .groupby("dst")
        .aggregate(ray.data.aggregate.Count(alias_name="in_degree"))
        .map_batches(
            lambda t: pa.table(
                {
                    "url": t["dst"],
                    "in_degree": pc.cast(t["in_degree"], pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def q_external_link_ratio(sf_dir: str):
    """External-link ratio per page (the link-spam / SEO-farm signal:
    pages whose outlinks mostly leave the site). Host extraction uses
    split_part semantics shared verbatim with the oracle; the ratio is
    emitted in integer PARTS-PER-MILLION via floor division — no float
    rounding anywhere, so both engines agree bit-for-bit. Per-batch
    (src, n, n_ext) partials make the one groupby(src) shuffle move
    counters, never urls."""

    def _host(u: str) -> str:
        parts = u.split("://", 1)
        rest = parts[1] if len(parts) == 2 else ""
        return rest.split("/", 1)[0]

    def partials(t: pa.Table) -> pa.Table:
        agg: dict[str, list[int]] = {}
        for s, d in zip(t["src"].to_pylist(), t["dst"].to_pylist()):
            c = agg.setdefault(s, [0, 0])
            c[0] += 1
            if _host(d) != _host(s):
                c[1] += 1
        return pa.table(
            {
                "src": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array([v[0] for v in agg.values()], pa.int64()),
                "n_ext": pa.array([v[1] for v in agg.values()], pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        n = t["sum(n)"]
        n_ext = t["sum(n_ext)"]
        ppm = pc.divide(
            pc.multiply(n_ext, pa.scalar(1_000_000, pa.int64())), n
        )
        return pa.table(
            {
                "url": t["src"],
                "n_links": n,
                "n_external": n_ext,
                "ext_ppm": ppm,
            }
        )

    return (
        _outlinks_ds(link_corpus())
        .map_batches(partials, batch_format="pyarrow")
        .groupby("src")
        .sum(["n", "n_ext"])
        .map_batches(finish, batch_format="pyarrow")
    )


PR_DRIVER_EDGE_LIMIT = 1_000_000


def _grouped_sum_str(ds, key: str, val: str, out: str, n_parts: int):
    """groupby(key).sum(val) for a STRING key via salt-partition + Arrow
    C++ ``group_by`` — the string twin of ``dedup._grouped_min`` (the
    label-propagation fast path): ``Dataset.groupby().aggregate(Sum)``
    combines rows at Python speed and dominates iterative rounds. The
    salt is a deterministic crc32 of the key, so all rows of a key land
    in one partition: exact."""
    import zlib

    def salt(t: pa.Table) -> pa.Table:
        p = pa.array(
            [zlib.crc32(s.encode("utf-8")) % n_parts
             for s in t[key].to_pylist()],
            pa.int64(),
        )
        return t.append_column("p", p)

    def sm(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # empty salt partition: keep the schema typed
            return pa.table(
                {key: pa.array([], pa.string()),
                 out: pa.array([], pa.int64())}
            )
        r = g.select([key, val]).group_by(key).aggregate([(val, "sum")])
        return r.rename_columns([key, out])

    return (
        ds.map_batches(salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p")
        .map_groups(sm, batch_format="pyarrow")
        # the sort-shuffle emits one output partition per INPUT block,
        # so partitions beyond the n_parts salt values are EMPTY 0-column
        # blocks that poison downstream schema unification ("new schema:
        # ." warnings). repartition() concat-merges them away — the
        # output is O(distinct keys) rows, so this pass is cheap.
        .repartition(n_parts)
    )


def _pagerank_distributed(pages_dir: str, n: int, iters: int = PR_ITERS,
                          seed_fn=None, out_col: str = "pagerank"):
    """PageRank as iterative join + groupby dataflow — the same
    per-round shape as the label-propagation connected components: each
    round joins the edge list to the current rank vector on src (hash
    join), emits per-edge contributions r/outdeg, and groupby(dst)-sums
    them. Zero-in-link nodes are kept alive by a ghost 0-weight row per
    node (a union, not a driver fixup), so no left-outer join is needed.
    Partitioning: edges shuffle on src (join) then dst (sum); ranks are
    O(nodes) rows per round, materialized to cut lineage growth.

    ``seed_fn`` generalizes to PERSONALIZED PageRank (TrustRank): the
    teleport mass goes only to urls where seed_fn(url) is true. The
    seed indicator is a pure function of the url string, so each round
    recomputes it in-batch — no seed-table join. seed_fn=None keeps the
    uniform teleport (bit-identical to the original recurrence)."""
    edges_raw = _outlinks_ds(pages_dir)
    outdeg = edges_raw.groupby("src").aggregate(
        ray.data.aggregate.Count(alias_name="od")
    )
    nparts = dd.adaptive_partitions(n * 4)
    edges = sj.safe_join(
        edges_raw, outdeg, join_type="inner", num_partitions=nparts,
        on=("src",),
    ).materialize()
    nodes = rd.read_parquet(pages_dir, columns=["url"])
    if seed_fn is None:
        ns = n
        _is_seed = None
    else:
        _is_seed = seed_fn
        ns = int(
            nodes.map_batches(
                lambda t: pa.table(
                    {"c": pa.array(
                        [sum(1 for u in t["url"].to_pylist()
                             if seed_fn(u))], pa.int64())}
                ),
                batch_format="pyarrow", zero_copy_batch=True,
            ).sum("c")
        )
    r0 = PR_SCALE // ns
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * ns)

    def init_ranks(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        r = [r0 if (_is_seed is None or _is_seed(u)) else 0 for u in urls]
        return pa.table(
            {"url": t["url"], "r": pa.array(r, pa.int64())}
        )

    ranks = nodes.map_batches(
        init_ranks, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    ghost = nodes.map_batches(
        lambda t: pa.table(
            {"dst": t["url"],
             "w": pa.array([0] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def contrib(t: pa.Table) -> pa.Table:
        # int64 // int64: nonnegative, so Arrow's truncation == floor
        w = pc.divide(t["r"], pc.cast(t["od"], pa.int64()))
        # per-batch combiner: integer sums are exactly associative, so
        # pre-summing by dst inside the batch cuts the groupby shuffle
        # from O(edges) to O(distinct dsts per batch) rows
        part = pa.table({"dst": t["dst"], "w": w}).group_by("dst").aggregate(
            [("w", "sum")]
        )
        return pa.table(
            {"dst": part["dst"], "w": pc.cast(part["w_sum"], pa.int64())}
        )

    def renorm(t: pa.Table) -> pa.Table:
        prop = pc.divide(
            pc.multiply(
                pa.scalar(PR_DAMP_NUM, pa.int64()),
                pc.cast(t["w_sum"], pa.int64()),
            ),
            pa.scalar(PR_DAMP_DEN, pa.int64()),
        )
        if _is_seed is None:
            b = pa.scalar(base, pa.int64())
        else:
            b = pa.array(
                [base if _is_seed(u) else 0
                 for u in t["dst"].to_pylist()],
                pa.int64(),
            )
        return pa.table({"url": t["dst"], "r": pc.add(b, prop)})

    for _ in range(iters):
        contribs = (
            sj.safe_join(edges, ranks, join_type="inner",
                         num_partitions=nparts,
                         on=("src",), right_on=("url",))
            .map_batches(contrib, batch_format="pyarrow",
                         zero_copy_batch=True)
            .union(ghost)
        )
        # salted Arrow C++ group_by: Dataset.groupby().aggregate(Sum)
        # combines at Python speed and dominated each round (~8s of a
        # ~17s round at 190k edges); integer sums are exactly
        # associative, so the fast path is value-identical
        sums = _grouped_sum_str(contribs, "dst", "w", "w_sum", nparts)
        ranks = sums.map_batches(
            renorm, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                # exact int -> one IEEE division: bit-identical everywhere
                out_col: pc.divide(
                    pc.cast(t["r"], pa.float64()),
                    pa.scalar(float(PR_SCALE)),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _pagerank_driver(pages_dir: str, n: int, iters: int = PR_ITERS,
                     seed_fn=None, out_col: str = "pagerank"):
    """Small-graph route: edge list fits the driver (<= 1M edges), so
    the 5 rounds run as in-process dict arithmetic instead of paying 2
    shuffles of actor spinup per round. Bit-identical to the distributed
    route BY CONSTRUCTION: the same integer fixed-point recurrence
    (floor divisions + exact integer sums) — no float path at all until
    the single final division (equivalence pytest-pinned). ``seed_fn``
    restricts the teleport mass to seed urls (TrustRank)."""
    edges = _outlinks_ds(pages_dir)
    od: dict[str, int] = {}
    pairs: list[tuple[str, str]] = []
    for b in edges.iter_batches(batch_format="pyarrow"):
        for a, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            od[a] = od.get(a, 0) + 1
            pairs.append((a, d))
    nodes = [
        u
        for b in rd.read_parquet(pages_dir, columns=["url"]).iter_batches(
            batch_format="pyarrow"
        )
        for u in b["url"].to_pylist()
    ]
    seed = {u: (seed_fn is None or seed_fn(u)) for u in nodes}
    ns = sum(seed.values())
    r = {u: (PR_SCALE // ns if seed[u] else 0) for u in nodes}
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * ns)
    for _ in range(iters):
        s = {u: 0 for u in nodes}
        for a, d in pairs:
            s[d] += r[a] // od[a]
        r = {
            u: (base if seed[u] else 0)
            + (PR_DAMP_NUM * s[u]) // PR_DAMP_DEN
            for u in nodes
        }
    return pa.table(
        {
            "url": pa.array(nodes, pa.string()),
            out_col: pa.array(
                [r[u] / float(PR_SCALE) for u in nodes], pa.float64()
            ),
        }
    )


def q_pagerank(sf_dir: str):
    """PageRank (damping 85/100, 5 synchronous iterations), size-routed
    like the fit wave / lm_score: graphs whose edge list exceeds
    PR_DRIVER_EDGE_LIMIT run the distributed join+groupby rounds
    (``_pagerank_distributed`` — the 10^12-edge shape); smaller graphs
    iterate on the driver with the SAME integer fixed-point arithmetic
    (see PR_SCALE above), so driver / distributed / SQL oracle are
    bit-identical. Assumes no dangling nodes (every fixture page has
    outlinks — write_link_corpus guarantees it)."""
    pages_dir = link_corpus()
    # page count from parquet metadata; edges/page is bounded (<=6) in
    # the fixture, so route on pages — a real corpus would route on a
    # metadata edge estimate the same way
    if LINK_N * 6 <= PR_DRIVER_EDGE_LIMIT:
        return _pagerank_driver(pages_dir, LINK_N)
    return _pagerank_distributed(pages_dir, LINK_N)


TRUST_MOD = 7  # page-number % 7 == 0 -> trusted seed (deterministic)
_TRUST_PAGE_RE = re.compile(r"p(\d+)$")


def _trust_seed(url: str) -> bool:
    m = _TRUST_PAGE_RE.search(url)
    return bool(m) and int(m.group(1)) % TRUST_MOD == 0


def q_trustrank(sf_dir: str):
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): the
    link-spam demotion pass of a web-corpus curation pipeline —
    PageRank with the teleport mass restricted to a trusted seed set,
    so trust flows outward from seeds and isolated spam farms starve.
    Seeds here are the deterministic page-number % TRUST_MOD urls (a
    real run plugs in a human-audited list). Same integer fixed-point
    recurrence and size-routing as q_pagerank (driver / distributed /
    SQL oracle bit-identical); the seed indicator is a pure function of
    the url, so the distributed route recomputes it in-batch instead of
    joining a seed table."""
    pages_dir = link_corpus()
    if LINK_N * 6 <= PR_DRIVER_EDGE_LIMIT:
        return _pagerank_driver(
            pages_dir, LINK_N, seed_fn=_trust_seed, out_col="trustrank"
        )
    return _pagerank_distributed(
        pages_dir, LINK_N, seed_fn=_trust_seed, out_col="trustrank"
    )


def q_char_entropy(sf_dir: str):
    """Shannon entropy of the character distribution per document — the
    keyboard-mash / wrong-encoding / binary-spill quality signal
    (near-zero entropy = one repeated char; English text ~4.1 bits).
    Embarrassingly parallel; numpy-vectorized per row over the byte
    counts. Empty docs are dropped (the oracle's length>0 gate). Rounded
    to 6 dp: libm log2 last-ulp differences between numpy and DuckDB are
    ~1e-16 per term, far below the rounding grain."""
    import collections

    def f(t: pa.Table) -> pa.Table:
        ids_out, n_out, e_out = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if not s:
                continue
            counts = np.fromiter(
                collections.Counter(s).values(), dtype=np.float64
            )
            p = counts / counts.sum()
            ent = float(-(p * np.log2(p)).sum())
            ids_out.append(did)
            n_out.append(len(counts))
            e_out.append(round(ent, 6))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_distinct_chars": pa.array(n_out, pa.int64()),
                "char_entropy": pa.array(e_out, pa.float64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_reciprocal_links(sf_dir: str):
    """Reciprocal-link detection over the link graph — the classic
    link-farm / spam signal (A->B and B->A). Distinct directed edges,
    then a self-join of the canonically-ordered halves: edges with
    src<dst join edges with src>dst reversed, so each reciprocal pair
    surfaces exactly once as (a, b), a < b. Self-loops are excluded.
    Shuffle keys: the pair itself — never the corpus."""
    edges = _outlinks_ds(link_corpus())

    def canon(t: pa.Table) -> pa.Table:
        lt = pc.less(t["src"], t["dst"])
        fwd = t.filter(lt)
        rev = t.filter(pc.greater(t["src"], t["dst"]))
        return pa.table(
            {
                "a": pa.concat_arrays(
                    [fwd["src"].combine_chunks(),
                     rev["dst"].combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [fwd["dst"].combine_chunks(),
                     rev["src"].combine_chunks()]
                ),
                "dir": pa.concat_arrays(
                    [pa.array(["f"] * len(fwd), pa.string()),
                     pa.array(["r"] * len(rev), pa.string())]
                ),
            }
        )

    halves = edges.map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    )
    # a pair is reciprocal iff BOTH directions appear; duplicate hrefs
    # make raw counts unreliable, so test distinct directions instead:
    # min(dir) != max(dir) <=> {'f','r'} both present
    dirs = halves.groupby(["a", "b"]).aggregate(
        ray.data.aggregate.Min("dir", alias_name="dmin"),
        ray.data.aggregate.Max("dir", alias_name="dmax"),
    )
    return dirs.filter(expr="dmin != dmax").select_columns(["a", "b"])


# k-core: keep peeling nodes of degree < K until fixpoint. K=7 on the
# fixture graph leaves a non-trivial core (190 of 200 pages, 2 peel
# rounds); the oracle unrolls KCORE_ROUNDS rounds — peeling is monotone,
# so rounds past the fixpoint are no-ops and any unroll >= the true peel
# depth replays the engine exactly (pytest asserts depth < KCORE_ROUNDS).
KCORE_K = 7
KCORE_ROUNDS = 8
KCORE_DRIVER_EDGE_LIMIT = 1_000_000


def _und_edges_ds(pages_dir: str):
    """Distinct undirected simple edges (a < b) of the link multigraph:
    per-batch Arrow group_by collapses duplicates BEFORE the shuffle,
    one groupby dedups globally."""

    def orient(t: pa.Table) -> pa.Table:
        src, dst = t["src"], t["dst"]
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        return (
            pa.table(
                {
                    "a": pc.min_element_wise(src, dst),
                    "b": pc.max_element_wise(src, dst),
                }
            )
            .group_by(["a", "b"])
            .aggregate([])
        )

    return (
        _outlinks_ds(pages_dir)
        .map_batches(orient, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(ray.data.aggregate.Count(alias_name="_n"))
        .select_columns(["a", "b"])
    )


def _kcore_peel_batch(t: pa.Table) -> pa.Table:
    """Whole-graph peel in one task (the union-find-task idiom): the
    dedup'd edge list is orders of magnitude smaller than the corpus,
    so at fixture scale it lives in one object-store batch."""
    adj: dict[str, set[str]] = {}
    for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {u for u in alive
                if sum(1 for v in adj[u] if v in alive) < KCORE_K}
        if not drop:
            break
        alive -= drop
    urls = sorted(alive)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "degree": pa.array(
                [sum(1 for v in adj[u] if v in alive) for u in urls],
                pa.int64(),
            ),
        }
    )


def _kcore_distributed(und, nparts: int):
    """Iterative distributed peel: per round one groupby-count (degree)
    and two hash semi-joins (drop edges touching a dead endpoint). The
    label table is O(alive nodes) and each round's edge set shrinks
    monotonically; rounds are bounded by the peel depth (the graph's
    degeneracy ordering length), small on web graphs. Each round
    materializes the shrunken edge set so iteration doesn't replay
    prior rounds' lineage (the connected_components pattern,
    stages/dedup.py)."""
    sym = und.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "v": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_nodes = None
    for _ in range(KCORE_ROUNDS):
        deg = sym.groupby("u").aggregate(
            ray.data.aggregate.Count(alias_name="deg")
        )
        alive = deg.filter(
            expr=f"deg >= {KCORE_K}"
        ).select_columns(["u"]).materialize()
        n_alive = alive.count()
        if n_alive == n_nodes:
            break
        n_nodes = n_alive
        sym = (
            sj.safe_join(
                sj.safe_join(sym, alive, join_type="inner",
                             num_partitions=nparts, on=("u",)),
                alive.map_batches(
                    lambda t: pa.table({"v": t["u"]}),
                    batch_format="pyarrow"),
                join_type="inner", num_partitions=nparts, on=("v",))
            .materialize()
        )
    return sym.groupby("u").aggregate(
        ray.data.aggregate.Count(alias_name="degree")
    ).map_batches(
        lambda t: pa.table(
            {"url": t["u"], "degree": pc.cast(t["degree"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def q_link_kcore(sf_dir: str):
    """K-core of the undirected simple link graph (K=7): the classic
    dense-subgraph gate — link farms and genuine navigational cores
    survive, sparsely-linked leaf pages peel away. Size-routed like
    q_pagerank: small graphs peel in ONE task over the dedup'd edge
    list (the union-find-task idiom); beyond KCORE_DRIVER_EDGE_LIMIT
    the iterative distributed peel runs (round = groupby-count + two
    semi-joins over a monotonically shrinking edge set). Both routes
    emit (url, degree-within-core) and are equivalence-tested."""
    pages_dir = link_corpus()
    und = _und_edges_ds(pages_dir)
    if LINK_N * 6 <= KCORE_DRIVER_EDGE_LIMIT:
        n = und.materialize().count()
        return und.repartition(1).map_batches(
            _kcore_peel_batch, batch_format="pyarrow",
            batch_size=max(2 * n, 1),
        )
    return _kcore_distributed(und, dd.adaptive_partitions(LINK_N))


# multi-source BFS from the trust seed set (page-number % TRUST_MOD),
# capped at LINKDIST_MAX hops: "how many clicks from a trusted page" —
# the crawl-depth / spam-distance signal TrustRank thresholds harden.
LINKDIST_MAX = 6
LINKDIST_DRIVER_EDGE_LIMIT = 1_000_000


def _dir_edges_ds(pages_dir: str):
    """Distinct directed simple edges of the link graph."""

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["src"], t["dst"])
        return (
            pa.table({"src": t["src"].filter(keep),
                      "dst": t["dst"].filter(keep)})
            .group_by(["src", "dst"])
            .aggregate([])
        )

    return (
        _outlinks_ds(pages_dir)
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(ray.data.aggregate.Count(alias_name="_n"))
        .select_columns(["src", "dst"])
    )


def _linkdist_bfs_batch(t: pa.Table) -> pa.Table:
    """Whole-graph BFS in one task (small route). Seeds are a pure
    function of the url (the TrustRank indicator), so no seed table
    ships — recomputed in-task, exactly like _pagerank_distributed's
    in-batch seed recompute."""
    out: dict[str, set[str]] = {}
    nodes: set[str] = set()
    for s, d in zip(t["src"].to_pylist(), t["dst"].to_pylist()):
        out.setdefault(s, set()).add(d)
        nodes.add(s)
        nodes.add(d)
    dist = {u: 0 for u in nodes if _trust_seed(u)}
    frontier = set(dist)
    for k in range(1, LINKDIST_MAX + 1):
        nxt: set[str] = set()
        for u in frontier:
            nxt |= out.get(u, set())
        frontier = {v for v in nxt if v not in dist}
        if not frontier:
            break
        for v in frontier:
            dist[v] = k
    urls = sorted(dist)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "dist": pa.array([dist[u] for u in urls], pa.int64()),
        }
    )


def _linkdist_distributed(edges, pages, nparts: int):
    """Pruned frontier BFS: per round one hash join (frontier -> next
    hop), one distinct, one left_anti against the visited set. The
    frontier and visited tables are O(nodes) — tiny vs the corpus —
    and every join is keyed on src, the same partitioning key each
    round. Identical output to the walk-expansion oracle because a
    node at distance d first appears at level d either way."""

    def seed(t: pa.Table) -> pa.Table:
        keep = [u for u in t["url"].to_pylist() if _trust_seed(u)]
        return pa.table(
            {
                "url": pa.array(keep, pa.string()),
                "dist": pa.array([0] * len(keep), pa.int64()),
            }
        )

    known = pages.map_batches(
        seed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    frontier = known.select_columns(["url"]).materialize()
    for k in range(1, LINKDIST_MAX + 1):
        hop = (
            sj.safe_join(edges, frontier, join_type="inner",
                         num_partitions=nparts, on=("src",),
                         right_on=("url",))
            .select_columns(["dst"])
            .groupby("dst")
            .aggregate(ray.data.aggregate.Count(alias_name="_n"))
            .select_columns(["dst"])
        )
        new = sj.safe_join(
            hop, known.select_columns(["url"]), join_type="left_anti",
            num_partitions=nparts, on=("dst",), right_on=("url",),
            left_schema=pa.schema([("dst", pa.string())]),
        ).map_batches(
            lambda t, _k=k: pa.table(
                {
                    "url": t["dst"],
                    "dist": pa.array([_k] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if new.count() == 0:
            break
        known = known.union(new).materialize()
        frontier = new.select_columns(["url"]).materialize()
    return known


def q_link_distance(sf_dir: str):
    """Hop distance from the trusted seed set over directed links,
    capped at LINKDIST_MAX — the crawl-scheduling / spam-demotion
    companion to q_trustrank (pages many clicks from any trusted hub
    are crawl-frontier losers). Size-routed: one-task BFS under
    LINKDIST_DRIVER_EDGE_LIMIT edges, else pruned distributed frontier
    BFS (join + distinct + left_anti per round, frontier tables
    O(nodes)). Routes are equivalence-tested."""
    pages_dir = link_corpus()
    edges = _dir_edges_ds(pages_dir)
    if LINK_N * 6 <= LINKDIST_DRIVER_EDGE_LIMIT:
        n = edges.materialize().count()
        return edges.repartition(1).map_batches(
            _linkdist_bfs_batch, batch_format="pyarrow",
            batch_size=max(2 * n, 1),
        )
    pages = rd.read_parquet(pages_dir, columns=["url"])
    return _linkdist_distributed(
        edges, pages, dd.adaptive_partitions(LINK_N)
    )


LINK_ANCHOR_RE = re.compile(r'<a href="([^"]*)">([^<]*)</a>')


def q_anchor_text(sf_dir: str):
    """Anchor-text aggregation per target url — the classic web-corpus
    signal (anchor words pointing AT a page describe it better than the
    page itself; used for retrieval labels and spam detection). Shape:
    parse (dst, anchor) pairs from raw HTML, per-batch Arrow combiner
    collapses duplicate pairs BEFORE the shuffle, one groupby on the
    (dst, anchor) pair, then a per-dst rollup whose group size is the
    number of DISTINCT anchors of a page — bounded even for a hub with
    10^9 in-links, because the duplicate mass was pre-summed."""

    def pairs(t: pa.Table) -> pa.Table:
        dsts: list[str] = []
        anchors: list[str] = []
        for h in t["html"].to_pylist():
            for m in LINK_ANCHOR_RE.finditer(h.decode("utf-8")):
                dsts.append(m.group(1))
                anchors.append(m.group(2))
        part = (
            pa.table(
                {
                    "dst": pa.array(dsts, pa.string()),
                    "anchor": pa.array(anchors, pa.string()),
                }
            )
            .group_by(["dst", "anchor"])
            .aggregate([([], "count_all")])
        )
        return part.rename_columns(["dst", "anchor", "n"])

    def rollup(g: pa.Table) -> pa.Table:
        n = pc.sum(g["n"]).as_py() or 0
        return pa.table(
            {
                "url": pa.array([g["dst"][0].as_py()], pa.string()),
                "n_anchors": pa.array([int(n)], pa.int64()),
                "n_distinct_anchors": pa.array(
                    [g.num_rows], pa.int64()
                ),
                "top_anchor": pa.array(
                    [pc.min(g["anchor"]).as_py()], pa.string()
                ),
            }
        )

    return (
        rd.read_parquet(link_corpus(), columns=["html"])
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["dst", "anchor"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .groupby("dst")
        .map_groups(rollup, batch_format="pyarrow")
    )


HTML_TITLE_RE = re.compile(r"<title>([^<]*)</title>")
HTML_FIRST_P_RE = re.compile(r"<p>([^<]*)</p>")


def q_html_meta(sf_dir: str):
    """Page-metadata extraction from raw HTML (title, first-paragraph
    snippet, outlink count) — the head-of-pipeline enrichment every
    Common-Crawl curation run does before quality gating. One
    embarrassingly-parallel pass over the binary column; compiled
    regexes at module scope; no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        titles: list[str | None] = []
        paras: list[str | None] = []
        nlinks: list[int] = []
        for h in t["html"].to_pylist():
            s = h.decode("utf-8")
            # "" -> null on both sides: DuckDB regexp_extract returns
            # '' for no-match, so the oracle wraps in nullif(.., '')
            m = HTML_TITLE_RE.search(s)
            titles.append((m.group(1) or None) if m else None)
            m = HTML_FIRST_P_RE.search(s)
            paras.append((m.group(1) or None) if m else None)
            nlinks.append(len(LINK_HREF_RE.findall(s)))
        return pa.table(
            {
                "url": t["url"],
                "title": pa.array(titles, pa.string()),
                "first_para": pa.array(paras, pa.string()),
                "n_links": pa.array(nlinks, pa.int64()),
            }
        )

    return rd.read_parquet(
        link_corpus(), columns=["url", "html"]
    ).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def recrawl_corpus() -> str:
    """Lazily write the deterministic re-crawl corpus (sf-independent
    fixed path); both the Ray query and the oracle composer call this,
    so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_recrawl_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_recrawl_150")
    return write_recrawl_corpus(root, n_urls=150, seed=1)


def q_temporal_novelty(sf_dir: str):
    """Per-snapshot content novelty over the re-crawl corpus: a
    3-token shingle is NOVEL in the snapshot where it first appears
    (global min warc_ts — unique per capture in this corpus, asserted
    by the fixture), and each capture reports its distinct-shingle
    count, novel count and integer novelty_ppm — the crawl-scheduling
    signal (a site whose captures stop producing novel shingles gets
    demoted). One pass explodes distinct md5-hashed shingles (8-byte
    shuffle keys, never the strings), groupby(shingle) Min finds the
    owner capture, a count-by-owner and a tiny hash join on the capture
    timestamp attach novel counts to per-capture totals. Shuffles scale
    with distinct shingles, not corpus bytes."""
    pages = rd.read_parquet(
        recrawl_corpus(), columns=["url", "warc_ts", "text"]
    )

    def totals(t: pa.Table) -> pa.Table:
        n = [
            len(set(dd._shingles(txt)))
            for txt in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "url": t["url"],
                "us": pc.cast(t["warc_ts"], pa.int64()),
                "n_shingles": pa.array(n, pa.int64()),
            }
        )

    def explode(t: pa.Table) -> pa.Table:
        us = pc.cast(t["warc_ts"], pa.int64()).to_pylist()
        hs, uss = [], []
        for txt, u in zip(t["text"].to_pylist(), us):
            for s in set(dd._shingles(txt)):
                hs.append(dd._hash64(s) - 2 ** 63)
                uss.append(u)
        return pa.table(
            {
                "sh": pa.array(hs, pa.int64()),
                "us": pa.array(uss, pa.int64()),
            }
        )

    tot = pages.map_batches(totals, batch_format="pyarrow",
                            zero_copy_batch=True)
    n_parts = dd.adaptive_partitions(450)  # captures in the fixture
    nov = (
        pages.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("sh")
        .aggregate(ray.data.aggregate.Min("us", alias_name="us"))
        .map_batches(
            lambda t: pa.table(
                {"us": t["us"],
                 "one": pa.array([1] * len(t), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("us")
        .aggregate(ray.data.aggregate.Sum("one", alias_name="n_novel"))
    )
    joined = sj.safe_join(tot, nov, join_type="left_outer", on=("us",),
                          num_partitions=n_parts)

    def finish(t: pa.Table) -> pa.Table:
        ns = np.asarray(t["n_shingles"].to_pylist(), dtype=np.int64)
        nv = np.asarray(
            [0 if v is None else v for v in t["n_novel"].to_pylist()],
            dtype=np.int64,
        )
        ppm = np.where(ns > 0, (nv * 10 ** 6) // np.maximum(ns, 1), 0)
        return pa.table(
            {
                "url": t["url"],
                "ts_us": t["us"],
                "n_shingles": pa.array(ns, pa.int64()),
                "n_novel": pa.array(nv, pa.int64()),
                "novelty_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def q_snapshot_latest(sf_dir: str):
    """Re-crawl snapshot dedup: the same url appears in many WARC
    segments; keep only the FRESHEST capture (max warc_ts) plus the
    snapshot count. One groupby(url) whose group is a url's revision
    history — bounded by crawl frequency (tens), never corpus-sized,
    so map_groups is safe at 10^12 pages. The fixture guarantees
    per-url-unique timestamps, so "latest" is unambiguous; real WARC
    data should tie-break on a digest column (documented here)."""

    def latest(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("warc_ts", "descending")]
        )
        top = g.take(idx.slice(0, 1))
        return pa.table(
            {
                "url": top["url"],
                "warc_ts": top["warc_ts"],
                "n_snapshots": pa.array([g.num_rows], pa.int64()),
                "text": top["text"],
            }
        )

    return (
        rd.read_parquet(
            recrawl_corpus(), columns=["url", "warc_ts", "text"]
        )
        .groupby("url")
        .map_groups(latest, batch_format="pyarrow")
    )


def crawl_diff_corpus() -> tuple[str, str]:
    """Lazily write the deterministic two-crawl fixture (sf-independent
    fixed path); both the Ray query and the oracle composer call this,
    so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_crawl_diff_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_crawldiff_200")
    return write_crawl_diff_corpus(root, n_urls=200, seed=1)


def q_snapshot_diff(sf_dir: str):
    """Crawl-over-crawl diff (the Common-Crawl monthly-snapshot
    comparison): classify every url across two full crawls as
    new / gone / changed / unchanged. Union the two snapshots tagged by
    side, then ONE groupby(url) whose group is at most one row per crawl
    — bounded at 2 rows regardless of corpus size, so map_groups is safe
    at 10^12 urls; the only shuffle is keyed by url (at real scale, by
    its 16-byte md5 with the identical plan shape). Text equality is
    decided inside the group — no full-corpus join materializes."""
    a_dir, b_dir = crawl_diff_corpus()

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array([side] * t.num_rows, pa.int32())
            )

        return f

    a = rd.read_parquet(a_dir, columns=["url", "text"]).map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    )
    b = rd.read_parquet(b_dir, columns=["url", "text"]).map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True
    )

    def classify(g: pa.Table) -> pa.Table:
        sides = dict(
            zip(g["side"].to_pylist(), g["text"].to_pylist())
        )
        if 0 in sides and 1 in sides:
            status = "unchanged" if sides[0] == sides[1] else "changed"
        elif 0 in sides:
            status = "gone"
        else:
            status = "new"
        return pa.table(
            {
                "url": g["url"].slice(0, 1),
                "status": pa.array([status], pa.string()),
            }
        )

    return (
        a.union(b).groupby("url").map_groups(classify, batch_format="pyarrow")
    )


DOMAIN_REP_MIN_STOP = 0.08  # pooled stopword density below this = low-rep


def q_domain_reputation(sf_dir: str):
    """Domain-reputation filter (the UT1/RefinedWeb idea that quality is
    a property of the SITE, not just the page): pool per-doc stopword /
    token counts into one per-domain density — sums, not mean-of-means,
    so the score is exact and order-free — then hash-join the verdict
    back onto every page of the domain. Two shuffles total: a tiny
    groupby(source) of integer partials and the docs ⋈ domains join
    (broadcastable when the domain table fits; the join route shown here
    is the 10^8-domain shape)."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partials(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_tok = pc.cast(
            pc.count_substring_regex(text, pattern=tx.TOKEN_PATTERN),
            pa.int64(),
        )
        n_stop = None
        for w in tx.STOPWORDS:
            c = pc.count_substring_regex(text, pattern=rf"\b{w}\b")
            n_stop = c if n_stop is None else pc.add(n_stop, c)
        return pa.table(
            {
                "source": t["source"],
                "stop": pc.cast(n_stop, pa.int64()),
                "tok": n_tok,
            }
        )

    domains = (
        docs.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("source")
        .aggregate(
            ray.data.aggregate.Sum("stop", alias_name="stop_sum"),
            ray.data.aggregate.Sum("tok", alias_name="tok_sum"),
        )
    )

    def score(t: pa.Table) -> pa.Table:
        dens = pc.round(
            pc.divide(
                pc.cast(t["stop_sum"], pa.float64()),
                pc.cast(
                    pc.max_element_wise(
                        t["tok_sum"], pa.scalar(1, pa.int64())
                    ),
                    pa.float64(),
                ),
            ),
            ndigits=6,
        )
        return pa.table(
            {
                "source": t["source"],
                "domain_score": dens,
                "keep": pc.greater_equal(
                    dens, pa.scalar(DOMAIN_REP_MIN_STOP)
                ),
            }
        )

    verdict = domains.map_batches(score, batch_format="pyarrow")
    return sj.safe_join(
        docs.select_columns(["doc_id", "source"]), verdict,
        join_type="inner",
        num_partitions=dd.adaptive_partitions(
            _table_rows(sf_dir, "documents")
        ),
        on=("source",),
    )


BAD_URL_WORDS = ["casino", "xxx", "pills", "torrent"]


def _filter_url(doc_id: int) -> str:
    """Deterministic fixture URL with blocklist words injected on fixed
    residues (host on %23, path on %19, query on %29) so every rule has
    positive and negative rows; the oracle rebuilds it with CASE."""
    host = ("adult-xxx-" if doc_id % 23 == 0 else "") + f"site{doc_id % 13}"
    path = ("casino/" if doc_id % 19 == 0 else "") + f"page{doc_id}"
    q = "?promo=cheap-pills-online" if doc_id % 29 == 0 else ""
    return f"https://{host}.example/{path}{q}"


def q_url_filter(sf_dir: str):
    """URL keyword blocklist (the RefinedWeb/UT1 URL-filtering stage):
    score each page's url by how many blocklist words it contains
    (vectorized ``match_substring`` per word — RE2-free substring scan)
    and flag pages for removal. Embarrassingly parallel, no shuffle;
    the word list ships once per task as a closure constant."""
    docs = _read(sf_dir, "documents", ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        urls = pa.array(
            [_filter_url(i) for i in t["doc_id"].to_pylist()], pa.string()
        )
        n_bad = None
        for w in BAD_URL_WORDS:
            c = pc.cast(pc.match_substring(urls, w), pa.int64())
            n_bad = c if n_bad is None else pc.add(n_bad, c)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": urls,
                "n_bad": n_bad,
                "keep": pc.equal(n_bad, pa.scalar(0, pa.int64())),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


LANG_WORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}
LANG_MIN_DENSITY_PCT = 5  # greatest hit count must be >= 5% of tokens


def q_lang_id_multi(sf_dir: str):
    """Multi-language n-gram/stopword language ID (the CCNet fastText
    analog at heuristic scale): derive pages with language-marker words
    injected by ``doc_id % 4`` and ``1 + doc_id % 3`` repetitions, count
    each language's marker words with vectorized RE2 kernels, and pick
    the argmax with a fixed preference order (en>de>fr>es) — integer
    cross-multiplied density gate (count*100 >= PCT*tokens), no float
    threshold. Stateless single pass, no shuffle."""
    langs = list(LANG_WORDS)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        pages = [
            (txt or "")
            + (" " + " ".join(LANG_WORDS[langs[i % 4]])) * (1 + i % 3)
            for i, txt in zip(ids, t["text"].to_pylist())
        ]
        arr = pa.array(pages, pa.string())
        n_tok = pc.cast(
            pc.count_substring_regex(arr, pattern=tx.TOKEN_PATTERN),
            pa.int64(),
        )
        counts = {}
        for lang, words in LANG_WORDS.items():
            c = None
            for w in words:
                k = pc.count_substring_regex(arr, pattern=rf"\b{w}\b")
                c = k if c is None else pc.add(c, k)
            counts[lang] = pc.cast(c, pa.int64()).to_numpy()
        C = np.stack([counts[lg] for lg in langs])  # (4, n)
        best = np.argmax(C, axis=0)  # first max wins = preference order
        best_count = C[best, np.arange(C.shape[1])]
        toks = n_tok.to_numpy()
        pred = np.where(
            best_count * 100 >= LANG_MIN_DENSITY_PCT * np.maximum(toks, 1),
            np.array(langs)[best],
            "und",
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n_tok,
                "pred_lang": pa.array(pred.tolist(), pa.string()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_snapshot_incremental(sf_dir: str):
    """Incremental re-processing set (the crawl-over-crawl follow-on to
    `snapshot_diff`): only urls that are NEW or CHANGED in crawl B need
    to re-enter the extraction/curation pipeline — unchanged and gone
    pages are skipped entirely. The diff's (url, status) rows hash-join
    back to crawl B's pages; both shuffles are keyed by url, so at scale
    the diff groupby and this join share one partitioning."""
    _, b_dir = crawl_diff_corpus()

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(
                t["status"], value_set=pa.array(["new", "changed"])
            )
        )

    todo = q_snapshot_diff(sf_dir).map_batches(
        keep, batch_format="pyarrow"
    )
    b = rd.read_parquet(b_dir, columns=["url", "text"])
    return sj.safe_join(
        todo, b,
        join_type="inner",
        num_partitions=dd.adaptive_partitions(200),
        on=("url",),
    )


PHASH_BITS = 60  # 4 bands x 15 bits (fits a signed bigint on both sides)
PHASH_BANDS = 4
PHASH_HAM_T = 6  # pairs at/below this Hamming distance are near-dups
PHASH_BUCKET_CAP = 10_000  # skew guard: cap candidates from one bucket


def _phash(doc_id: int) -> int:
    """Deterministic 60-bit perceptual-hash stand-in: docs in the same
    group of 5 share an md5-derived base pattern and differ only by 1-2
    noise bits — the similar-image-small-Hamming-distance structure a
    real pHash produces. In a real pipeline this value comes from the
    media-decode actor stage (stages/media.py); the arithmetic here IS
    the honest stub boundary, replayed bit-exactly by the SQL oracle."""
    base = int(hashlib.md5(f"g{doc_id // 5}".encode()).hexdigest()[:15], 16)
    noise = 0
    if doc_id % 5 != 0:
        noise |= 1 << ((doc_id * 7) % PHASH_BITS)
    if doc_id % 5 >= 3:
        noise |= 1 << ((doc_id * 13) % PHASH_BITS)
    return base ^ noise


def q_media_phash_pairs(sf_dir: str):
    """Perceptual-hash near-dup pairs (image dedup via pHash + banded
    LSH): 60-bit hashes band into 4 x 15-bit buckets, candidates share
    at least one exact band, survivors pass a Hamming <= PHASH_HAM_T
    verify. Same plan shape as MinHash-LSH: band groupby -> within-
    bucket pairing (cap-guarded against skew) -> pair-dedup groupby with
    the verify computed from carried hashes — no join back to the
    corpus, and the shuffles move only (band, 8-byte hash) rows. At
    10^12 images the band key is the partitioner; the decode->phash
    stage is the actor pool in stages/media.py."""
    import logging

    def bands(t: pa.Table) -> pa.Table:
        ids, ks, bvs, phs = [], [], [], []
        for did in t["doc_id"].to_pylist():
            ph = _phash(did)
            for k in range(PHASH_BANDS):
                ids.append(did)
                ks.append(k)
                bvs.append((ph >> (15 * k)) & 0x7FFF)
                phs.append(ph)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k": pa.array(ks, pa.int32()),
                "bv": pa.array(bvs, pa.int64()),
                "phash": pa.array(phs, pa.int64()),
            }
        )

    def pair_bucket(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_pylist()
        phs = g["phash"].to_pylist()
        a_out, b_out, pa_out, pb_out = [], [], [], []
        n = len(ids)
        emitted = 0
        for i in range(n):
            for j in range(i + 1, n):
                if emitted >= PHASH_BUCKET_CAP:
                    logging.getLogger(__name__).warning(
                        "media_phash_pairs: bucket capped at %d pairs "
                        "(%d members)", PHASH_BUCKET_CAP, n
                    )
                    break
                x, y = ids[i], ids[j]
                if x > y:
                    x, y = y, x
                    px, py = phs[j], phs[i]
                else:
                    px, py = phs[i], phs[j]
                a_out.append(x)
                b_out.append(y)
                pa_out.append(px)
                pb_out.append(py)
                emitted += 1
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "ph_a": pa.array(pa_out, pa.int64()),
                "ph_b": pa.array(pb_out, pa.int64()),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        ham = int(g["ph_a"][0].as_py() ^ g["ph_b"][0].as_py()).bit_count()
        if ham > PHASH_HAM_T:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "a": g["a"].slice(0, 1),
                "b": g["b"].slice(0, 1),
                "hamming": pa.array([ham], pa.int64()),
            }
        )

    cand = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["k", "bv"])
        .map_groups(pair_bucket, batch_format="pyarrow")
    )
    return cand.groupby(["a", "b"]).map_groups(
        verify, batch_format="pyarrow"
    )


def jsonl_corpus() -> str:
    """Lazily write the deterministic JSONL fixture (the WET/WAT-style
    newline-delimited-JSON source a crawl pipeline ingests alongside
    parquet); idempotent, arithmetic-only."""
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "aper_jsonl_300")
    path = os.path.join(root, "docs.jsonl")
    marker = os.path.join(root, "_manifest.json")
    want = {"kind": "jsonl", "n": 300, "v": 1}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return path
    os.makedirs(root, exist_ok=True)
    with open(path, "w") as f:
        for i in range(300):
            f.write(
                json.dumps(
                    {
                        "url": f"https://j{i % 7}.example/{i}",
                        "lang": ["en", "de", "fr"][i % 3],
                        "score": (i * 3) % 11,
                        "text": f"json doc {i} body words here",
                    }
                )
                + "\n"
            )
    with open(marker, "w") as f:
        json.dump(want, f)
    return path


def q_jsonl_roundtrip(sf_dir: str):
    """Newline-delimited JSON source (WET/WAT-shaped sidecar ingest):
    ``ray.data.read_json`` streams the file in blocks like any other
    source; one vectorized map derives token counts. Shows the non-
    parquet ingestion path end-to-end against a DuckDB read_json_auto
    oracle."""
    ds = rd.read_json(jsonl_corpus())

    def f(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(t["text"], pattern=tx.TOKEN_PATTERN),
            pa.int64(),
        )
        return pa.table(
            {
                "url": t["url"],
                "lang": t["lang"],
                "score": pc.cast(t["score"], pa.int64()),
                "n_tokens": n_tok,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# robots.txt-style per-domain disallow rules: (host-class, path-prefix).
# Deterministic rule synthesis — every host disallows /casino/; every
# third host additionally blocks the /page1 prefix class.
def _robots_rules(host_idx: int) -> list[str]:
    rules = ["/casino/"]
    if host_idx % 3 == 0:
        rules.append("/page1")
    return rules


def q_robots_filter(sf_dir: str):
    """Robots/disallow-rule compliance filter (the crawl-politeness gate
    every fetch pipeline runs BEFORE processing a url): a per-domain
    prefix-rule table — tiny by construction, one entry per (host, rule)
    — is broadcast to a stateless vectorized pass that marks urls whose
    path starts with any disallowed prefix. No shuffle; at 10^8 domains
    the rule table hash-joins on host instead (same output, one extra
    shuffle), which is the documented scale route."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    rules = {
        f"site{k}": _robots_rules(k) for k in range(13)
    }  # hosts come from _filter_url's doc_id % 13 derivation

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        urls, blocked = [], []
        for i in ids:
            u = _filter_url(i)
            host = f"site{i % 13}"
            path = "/" + u.split(".example/", 1)[1]
            urls.append(u)
            blocked.append(
                any(path.startswith(r) for r in rules.get(host, []))
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(urls, pa.string()),
                "blocked": pa.array(blocked, pa.bool_()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


TFIDF_COS_DF_CAP = 50  # terms above this df are too common to pair on
TFIDF_COS_TAU = 0.2  # rounded-cosine threshold for a similar-doc pair


def q_tfidf_cosine_pairs(sf_dir: str):
    """Sparse TF-IDF cosine similar-doc pairs (the inverted-index
    similarity search that complements the dense-embedding family): the
    vector space is the df <= TFIDF_COS_DF_CAP vocabulary (ubiquitous
    terms carry ~no idf and would explode the per-term pairing — the cap
    is the skew guard and is part of the metric's definition, mirrored
    by the oracle); each doc's norm is computed once and CARRIED ON THE
    POSTINGS, so the pipeline is explode -> df groupby -> fused
    score+norm pass -> per-term pairing (group size <= cap) -> pair-sum
    groupby, with no corpus-sized join anywhere. Cosine is rounded to 4
    dp before the threshold so float noise can't flip boundary pairs."""
    import math

    import pyarrow.parquet as pq_

    n_docs = float(
        pq_.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
    )
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        d_out, t_out, c_out = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            counts: dict[str, int] = {}
            for w in (s or "").split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
            for w, c in counts.items():
                d_out.append(did)
                t_out.append(w)
                c_out.append(c)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "term": pa.array(t_out, pa.string()),
                "tf": pa.array(c_out, pa.int64()),
            }
        )

    tfs = docs.map_batches(explode, batch_format="pyarrow")
    df = _grouped_count(tfs, "term", "df").materialize()
    lookup: dict[str, int] = {}
    for b in df.iter_batches(batch_format="pyarrow"):
        lookup.update(zip(b["term"].to_pylist(), b["df"].to_pylist()))
    dref = ray.put(lookup)

    def postings(t: pa.Table) -> pa.Table:
        m = ray.get(dref)
        d_out, t_out, w_out, n_out = [], [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            counts: dict[str, int] = {}
            for w in (s or "").split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
            ws = {
                w: c * math.log(n_docs / m[w])
                for w, c in counts.items()
                if m[w] <= TFIDF_COS_DF_CAP
            }
            if not ws:
                continue
            nrm = math.sqrt(sum(v * v for v in ws.values()))
            for w, v in ws.items():
                if m[w] >= 2:  # df-1 terms can't co-occur
                    d_out.append(did)
                    t_out.append(w)
                    w_out.append(v)
                    n_out.append(nrm)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "term": pa.array(t_out, pa.string()),
                "w": pa.array(w_out, pa.float64()),
                "nrm": pa.array(n_out, pa.float64()),
            }
        )

    def pair_term(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_pylist()
        ws = g["w"].to_pylist()
        ns = g["nrm"].to_pylist()
        a_o, b_o, p_o, na_o, nb_o = [], [], [], [], []
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                a_o.append(ids[i])
                b_o.append(ids[j])
                p_o.append(ws[i] * ws[j])
                na_o.append(ns[i])
                nb_o.append(ns[j])
        return pa.table(
            {
                "a": pa.array(a_o, pa.int64()),
                "b": pa.array(b_o, pa.int64()),
                "p": pa.array(p_o, pa.float64()),
                "na": pa.array(na_o, pa.float64()),
                "nb": pa.array(nb_o, pa.float64()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        dot = sum(g["p"].to_pylist())
        cos = round(dot / (g["na"][0].as_py() * g["nb"][0].as_py()), 4)
        if cos < TFIDF_COS_TAU:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "a": g["a"].slice(0, 1),
                "b": g["b"].slice(0, 1),
                "cos": pa.array([cos], pa.float64()),
            }
        )

    post = docs.map_batches(postings, batch_format="pyarrow")
    pairs = post.groupby("term").map_groups(
        pair_term, batch_format="pyarrow"
    )
    out = pairs.groupby(["a", "b"]).map_groups(
        finish, batch_format="pyarrow"
    )
    # when every group scores under TAU (true at sf0.1) the map_groups
    # result is all empty blocks and the unified schema collapses to
    # zero columns — and Ray's to_pandas() drops block schemas entirely
    # on zero-row datasets, so an empty result must leave as a TYPED
    # Arrow table, not a Dataset
    schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())]
    )
    out = sj.schema_guard(out, schema)
    if out.count() == 0:
        return schema.empty_table()
    return out


QUANTILE_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def q_length_quantiles(sf_dir: str):
    """Exact corpus-level quantiles of ``n_chars`` via a distributed
    histogram: one groupby(n_chars).count() shuffle produces a table
    bounded by the number of DISTINCT lengths (never corpus-sized), the
    driver cumsums it and picks the value at row ceil(q*N) per quantile.
    Both sides share that explicit formula (the SQL oracle replays it
    with row_number + ceiling on the same IEEE doubles), so the result
    is deterministic and engine-independent — no reliance on any
    engine's quantile interpolation mode."""
    import math

    hist = (
        _read(sf_dir, "documents", ["n_chars"])
        .groupby("n_chars")
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
    )
    rows = sorted(hist.take_all(), key=lambda r: r["n_chars"])
    total = sum(r["n"] for r in rows)
    out_q: list[float] = []
    out_v: list[int] = []
    for q in QUANTILE_QS:
        target = math.ceil(q * total)
        cum = 0
        val = rows[-1]["n_chars"] if rows else 0
        for r in rows:
            cum += r["n"]
            if cum >= target:
                val = r["n_chars"]
                break
        out_q.append(q)
        out_v.append(int(val))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )


# docs per (n_chars, id-bucket) rank group — any single group is bounded
# by construction, so a hot length (millions of docs sharing one n_chars
# at web scale) can never overflow a worker
RANK_BUCKET = 65_536


def q_global_rank(sf_dir: str):
    """Global dense ordering rank(doc) = row_number over
    (order by n_chars, doc_id), computed WITHOUT a global sort: count per
    (n_chars, doc_id-bucket) group (one small shuffle; the bucket key
    bounds every group), driver cumsums the bounded group table into base
    offsets (buckets ≪ rows), broadcasts them, and each group enumerates
    its members by doc_id on top of its base. The same decomposition the
    bucketed sessionize/asof trio uses for per-key state at 100 TB."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64()))
        return t.append_column("bucket", pc.cast(b, pa.int64()))

    with_bucket = docs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        with_bucket.groupby(["n_chars", "bucket"])
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )
    base: dict[tuple[int, int], int] = {}
    cum = 0
    for r in sorted(counts, key=lambda r: (r["n_chars"], r["bucket"])):
        base[(r["n_chars"], r["bucket"])] = cum
        cum += r["n"]
    bref = ray.put(base)

    def rank_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        k = (g["n_chars"][0].as_py(), g["bucket"][0].as_py())
        start = offsets[k]
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_chars": g["n_chars"],
                "rnk": pa.array(
                    range(start + 1, start + 1 + len(g)), pa.int64()
                ),
            }
        )

    return with_bucket.groupby(["n_chars", "bucket"]).map_groups(
        rank_group, batch_format="pyarrow"
    )


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (the class-prototype build of an
    embedding-space pipeline) in long form (label, pos, value): the
    canonical combiner shape — each batch pre-aggregates to one partial
    (label, vector-sum, count) row set with numpy, so the groupby
    shuffles O(labels × read-parallelism) partial rows, never the
    corpus; the final per-label reduce sums a handful of partials.
    ``pos`` is 1-based to match SQL ``generate_subscripts``."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        labels = np.asarray(t["label"].to_pylist())
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_l.append(int(lab))
            out_s.append(X[m].sum(axis=0).tolist())
            out_n.append(int(m.sum()))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int32()),
                "vsum": pa.array(out_s, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def reduce_group(g: pa.Table) -> pa.Table:
        S = np.asarray(g["vsum"].to_pylist(), dtype=np.float64).sum(axis=0)
        n = int(pc.sum(g["n"]).as_py())
        vals = np.round(S / n, 6)
        lab = g["label"][0].as_py()
        return pa.table(
            {
                "label": pa.array([lab] * len(vals), pa.int32()),
                "pos": pa.array(range(1, len(vals) + 1), pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .map_groups(reduce_group, batch_format="pyarrow")
    )
