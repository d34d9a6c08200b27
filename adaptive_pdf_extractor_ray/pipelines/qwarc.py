"""WARC ingest, Bloom incremental dedup, CCNet buckets, BPE pairs.

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
from .qcuration import (  # noqa: F401
    q_lm_score,
)
from .qtraining import (  # noqa: F401
    warc_corpus,
)



def q_warc_roundtrip(sf_dir: str):
    """WARC ingest roundtrip — parse Common Crawl's native container
    format from raw bytes into page rows. The WARC FILE is the unit of
    parallelism (``read_binary_files`` -> one row per shard ->
    ``parse_warc_records`` inside ``map_batches``), exactly how CC
    distributes work (one ~1 GiB warc per task); record framing honors
    Content-Length (the fixture plants CRLFCRLF inside bodies to punish
    separator-scanning parsers) and skips warcinfo/request noise
    records. No shuffle anywhere; the oracle reads only the
    independently-written truth parquet, the Ray side only the bytes."""
    from ..sources.warc import parse_warc_records

    warc_dir, _ = warc_corpus()
    ds = rd.read_binary_files(warc_dir, file_extensions=["warc"])

    def parse(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "url": [], "warc_date": [], "status": [], "n_bytes": [],
            "title": [],
        }
        for data in t["bytes"].to_pylist():
            for rec in parse_warc_records(data):
                cols["url"].append(rec["url"])
                cols["warc_date"].append(rec["warc_date"])
                cols["status"].append(rec["status"])
                cols["n_bytes"].append(rec["n_bytes"])
                m = re.search(r"<title>(.*?)</title>", rec["text"], re.S)
                cols["title"].append(m.group(1) if m else "")
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "warc_date": pa.array(cols["warc_date"], pa.string()),
                "status": pa.array(cols["status"], pa.int64()),
                "n_bytes": pa.array(cols["n_bytes"], pa.int64()),
                "title": pa.array(cols["title"], pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def q_cdx_index(sf_dir: str):
    """CDX capture-index generation — the random-access lookup table CC
    consumers use to fetch ONE record out of a petabyte of WARC without
    scanning: per response record emit (urlkey SURT, compact timestamp,
    url, payload digest, warc_file, rec_offset, rec_length). Offsets
    come from the parser's forward-only Content-Length arithmetic (the
    fixture's ground truth records the writer's actual byte positions,
    so the hash check proves the parser's coordinates are byte-exact —
    a wrong offset means a broken random read later). Same no-shuffle
    per-file plan as warc_roundtrip; a production CDX additionally
    SORTS by urlkey, which at scale is the one all-to-all exchange
    (range-partitioned writes), deliberately left to the consumer here.
    Digest is md5 (DuckDB-replayable) where real CC uses sha1 — the
    framing, not the hash family, is what's under test.

    Ingest goes through ``WarcDatasource`` — the STREAMING source that
    frames records chunk-by-chunk and emits bounded blocks, so a warc
    file larger than the object-store block target never materializes
    whole (``warc_roundtrip`` keeps the whole-file ``read_binary_files``
    path covered; this query is the driver-gate proof of the streaming
    one — same byte-exact offsets against the writer's ground truth)."""
    from ..sources.warc import WarcDatasource, surt_key

    warc_dir, _ = warc_corpus()
    ds = rd.read_datasource(WarcDatasource(warc_dir, records_per_block=64))

    def index(t: pa.Table) -> pa.Table:
        urlkeys = [surt_key(u) for u in t["url"].to_pylist()]
        ts = [
            re.sub(r"[^0-9]", "", d) for d in t["warc_date"].to_pylist()
        ]
        digests = [
            hashlib.md5(x.encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "urlkey": pa.array(urlkeys, pa.string()),
                "ts": pa.array(ts, pa.string()),
                "url": t["url"],
                "digest": pa.array(digests, pa.string()),
                "warc_file": t["warc_file"],
                "rec_offset": t["rec_offset"],
                "rec_length": t["rec_length"],
            }
        )

    return ds.map_batches(
        index, batch_format="pyarrow", zero_copy_batch=True
    )


WARC_FETCH_MOD = 11  # page-number % this == 0 selects the fetch set


def q_warc_fetch(sf_dir: str):
    """Index-driven random access — the OTHER half of the CDX story:
    given an index and a url subset (every 11th page here), fetch ONLY
    those records by seeking to their byte coordinates, never scanning
    the archive. Lookups group by warc_file (ONE small shuffle of index
    rows — bytes never shuffle) so each task opens its file once and
    reads its offsets in ascending order (sequential-ish I/O); at CC
    scale the same plan issues ranged GETs against object storage. The
    oracle answers from the writer's independent ground truth, so a
    single wrong offset/length surfaces as a digest/text mismatch."""
    from ..sources.warc import parse_warc_records

    warc_dir, _ = warc_corpus()
    cdx = q_cdx_index(sf_dir)

    def want(t: pa.Table) -> pa.Table:
        mask = [
            int(u.rsplit("page", 1)[1]) % WARC_FETCH_MOD == 0
            for u in t["url"].to_pylist()
        ]
        return t.filter(pa.array(mask, pa.bool_())).select(
            ["url", "warc_file", "rec_offset", "rec_length"]
        )

    targets = cdx.map_batches(
        want, batch_format="pyarrow", zero_copy_batch=True
    )

    def fetch(g: pa.Table) -> pa.Table:
        path = os.path.join(warc_dir, g["warc_file"][0].as_py())
        g = g.take(pc.sort_indices(g["rec_offset"]))
        urls, status, nb, digest = [], [], [], []
        with open(path, "rb") as f:
            for u, off, ln in zip(
                g["url"].to_pylist(),
                g["rec_offset"].to_pylist(),
                g["rec_length"].to_pylist(),
            ):
                f.seek(off)
                recs = parse_warc_records(f.read(ln) + b"\r\n\r\n")
                assert len(recs) == 1 and recs[0]["url"] == u
                urls.append(u)
                status.append(recs[0]["status"])
                nb.append(recs[0]["n_bytes"])
                digest.append(
                    hashlib.md5(recs[0]["text"].encode()).hexdigest()
                )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array(status, pa.int64()),
                "n_bytes": pa.array(nb, pa.int64()),
                "digest": pa.array(digest, pa.string()),
            }
        )

    return targets.groupby("warc_file").map_groups(
        fetch, batch_format="pyarrow"
    )


BLOOM_BITS = 1 << 17  # filter width (16 KiB as a bit array)
BLOOM_K = 4  # hash functions


def _bloom_pos(h: str, j: int) -> int:
    return int(
        hashlib.md5(f"{h}:{j}".encode()).hexdigest()[:15], 16
    ) % BLOOM_BITS


def q_bloom_dedup(sf_dir: str):
    """Bloom-filter incremental dedup — the membership gate a crawl
    pipeline runs against the ALREADY-INGESTED corpus before paying for
    full processing of a new snapshot (here the 'prior corpus' is the
    deterministic doc_id%3!=0 two-thirds). Build: per-batch partial
    bit-position sets -> one bounded groupby (<= BLOOM_BITS rows — the
    filter, not the corpus, bounds the shuffle) -> a 128 KiB numpy bit
    array broadcast in the probe map's closure (restart-safe plain
    value; size independent of corpus size, same contract as the DSIR
    model). Probe: stateless vectorized-ish pass marking maybe_dup iff
    all BLOOM_K positions are set. False positives are REPORTED, not
    hidden (``false_pos`` column) — the honest-approximation stance; at
    these parameters (m=2^17, k=4, n~2/3 corpus) FP rate is negligible
    for the fixtures and tunable by the module constants. The oracle
    replays the exact md5 position arithmetic in SQL, so the hash check
    covers the filter's approximate semantics bit-for-bit."""
    import numpy as _np

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def prior_positions(t: pa.Table) -> pa.Table:
        pos: set[int] = set()
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did % 3 == 0:
                continue  # not in the prior corpus
            h = hashlib.md5((txt or "").encode()).hexdigest()
            for j in range(BLOOM_K):
                pos.add(_bloom_pos(h, j))
        return pa.table({"pos": pa.array(sorted(pos), pa.int64())})

    pos_rows = (
        docs.map_batches(
            prior_positions, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pos")
        .count()
        .take_all()  # <= BLOOM_BITS rows by construction
    )
    bits = _np.zeros(BLOOM_BITS, dtype=bool)
    bits[[r["pos"] for r in pos_rows]] = True

    def probe(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        maybe, prior = [], []
        for did, txt in zip(ids, t["text"].to_pylist()):
            h = hashlib.md5((txt or "").encode()).hexdigest()
            maybe.append(
                all(bits[_bloom_pos(h, j)] for j in range(BLOOM_K))
            )
            prior.append(did % 3 != 0)
        m = _np.asarray(maybe)
        p = _np.asarray(prior)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "is_prior": pa.array(p, pa.bool_()),
                "maybe_dup": pa.array(m, pa.bool_()),
                "false_pos": pa.array(m & ~p, pa.bool_()),
            }
        )

    return docs.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )


BLOOM_DEDUP_SQL = f"""
with k as (
  select doc_id, md5(text) as h, (doc_id % 3 <> 0) as is_prior
  from documents),
ppos as (
  select distinct
    (('0x' || substr(md5(h || ':' || j::varchar), 1, 15))::ubigint
     % {BLOOM_BITS})::bigint as pos
  from k, generate_series(0, {BLOOM_K - 1}) t(j)
  where is_prior),
q as (
  select doc_id, is_prior,
    (('0x' || substr(md5(h || ':' || j::varchar), 1, 15))::ubigint
     % {BLOOM_BITS})::bigint as pos
  from k, generate_series(0, {BLOOM_K - 1}) t(j)),
m as (
  select doc_id, is_prior, bool_and(p.pos is not null) as maybe_dup
  from q left join ppos p using (pos)
  group by doc_id, is_prior)
select doc_id, is_prior, maybe_dup,
       (maybe_dup and not is_prior) as false_pos
from m
"""


CCNET_HIST_DP = 2  # histogram quantization (decimal places) for cutoffs


def q_ccnet_buckets(sf_dir: str):
    """CCNet-style per-language perplexity tertiles (head / middle /
    tail — the bucketing Common Crawl curation uses to grade pages by
    LM quality before sampling). Reuses the ``lm_score`` dataflow for
    per-doc bits, joins lang on doc_id (one hash join), then finds the
    per-lang tertile cutoffs from a QUANTIZED histogram: per-batch
    (lang, floor(bits*100)/100, n) partials -> a bounded groupby
    (#langs x #distinct-centibit values — thousands of rows at any
    corpus size, never O(docs)) -> driver cumsum -> two cutoff scalars
    per lang broadcast to a stateless assign pass. No global sort, no
    per-lang giant group. Determinism: lm_bits is 6-dp-rounded
    identically in both engines (the green lm_score oracle is exactly
    that statement), and floor(x*100) on bit-identical doubles is
    bit-identical, so bucket assignment cannot straddle engines."""
    bits = q_lm_score(sf_dir)
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])
    joined = sj.safe_join(
        bits, langs, join_type="inner", on=("doc_id",),
        num_partitions=dd.adaptive_partitions(
            _table_rows(sf_dir, "documents")
        ),
    )

    def hist(t: pa.Table) -> pa.Table:
        agg: dict[tuple[str, float], int] = {}
        bq = np.floor(
            np.asarray(t["lm_bits"].to_pylist(), dtype=np.float64) * 100.0
        ) / 100.0
        for lang, b in zip(t["lang"].to_pylist(), bq):
            k = (lang, float(b))
            agg[k] = agg.get(k, 0) + 1
        return pa.table(
            {
                "lang": pa.array([k[0] for k in agg], pa.string()),
                "bq": pa.array([k[1] for k in agg], pa.float64()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    rows = (
        joined.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "bq"])
        .sum("n")
        .take_all()  # bounded: #langs x #centibit values
    )
    by_lang: dict[str, list[tuple[float, int]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["bq"], r["sum(n)"]))
    cuts: dict[str, tuple[float, float]] = {}
    for lang, hs in by_lang.items():
        hs.sort()
        tot = sum(n for _, n in hs)
        t1 = -(-tot // 3)  # ceil(tot/3)
        t2 = -(-2 * tot // 3)
        cum, c1, c2 = 0, None, None
        for b, n in hs:
            cum += n
            if c1 is None and cum >= t1:
                c1 = b
            if c2 is None and cum >= t2:
                c2 = b
        cuts[lang] = (c1, c2)

    def assign(t: pa.Table) -> pa.Table:
        bq = np.floor(
            np.asarray(t["lm_bits"].to_pylist(), dtype=np.float64) * 100.0
        ) / 100.0
        buckets = []
        for lang, b in zip(t["lang"].to_pylist(), bq):
            c1, c2 = cuts[lang]
            buckets.append(
                "head" if b <= c1 else "middle" if b <= c2 else "tail"
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "lm_bits": t["lm_bits"],
                "bucket": pa.array(buckets, pa.string()),
            }
        )

    return joined.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


# q_lm_score emits (doc_id, n_tokens, lm_bits); the ccnet join keeps
# n_tokens out of the output, so the oracle's bits subquery matches.


BPE_TOPK = 50  # merge candidates reported


def q_bpe_pairs(sf_dir: str):
    """BPE merge statistics — the adjacent-symbol pair frequencies that
    drive the first merge step of byte-pair-encoding tokenizer training
    (Sennrich et al. 2016): each word contributes its within-word
    character pairs plus a (last-char, '</w>') end-of-word pair, counted
    across the corpus. Per-batch dict combiners bound the shuffle to
    (pair, partial n) rows — the alphabet², never the corpus; integer
    counts are order-free; ranking is the repo's partial+final top-K
    (O(K x blocks) network rows, no global sort). Ties at the K
    boundary break by pair ascending in both engines."""
    docs = _read(sf_dir, "documents", ["text"])

    def partials(t: pa.Table) -> pa.Table:
        agg: dict[str, int] = {}
        for txt in t["text"].to_pylist():
            for w in (txt or "").split(" "):
                if not w:
                    continue
                syms = list(w)
                syms.append("</w>")
                for a, b in zip(syms, syms[1:]):
                    k = a + b
                    agg[k] = agg.get(k, 0) + 1
        return pa.table(
            {
                "pair": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    counts = (
        docs.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pair")
        .sum("n")
        .map_batches(
            lambda t: pa.table({"pair": t["pair"], "n": t["sum(n)"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    from ..stages.topk import dataset_topk

    return dataset_topk(
        counts, [("n", "descending"), ("pair", "ascending")], BPE_TOPK
    )


BPE_PAIRS_SQL = f"""
with tok as (
  select w
  from (select unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
sym as (select w, unnest(generate_series(1, length(w))) as i from tok),
p as (
  select case when i < length(w) then substr(w, i, 2)
              else substr(w, i, 1) || '</w>' end as pair
  from sym)
select pair, count(*)::bigint as n
from p group by pair
order by n desc, pair
limit {BPE_TOPK}
"""


BPE_MERGES = 8  # learned merge rounds
# size routing for the merge-learning loop: a distinct-WORD table at or
# under this row count runs the 8 rounds on the driver (the table is the
# vocabulary, not the corpus — pure Ray-op overhead dominates 8 tiny
# shuffles otherwise: 148 s -> ~4 s at sf0.1); above it, the distributed
# per-round groupby loop below handles open-web vocabularies
BPE_DRIVER_VOCAB_CAP = 200_000


def _bpe_learn_driver(
    words: list[tuple[str, int]]
) -> list[tuple[int, str, str, int]]:
    """Driver-route merge learning over the (distinct word, count)
    table: the IDENTICAL recurrence as the distributed loop — pair
    counts weighted by word frequency, max by (n desc, pair asc),
    left-to-right non-overlapping merge application — equivalence-tested
    against the distributed route in tests/test_webtext_session16.py."""
    wt = [(list(w) + ["</w>"], n) for w, n in words]
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, BPE_MERGES + 1):
        agg: dict[tuple[str, str], int] = {}
        for s, n in wt:
            for a, b in zip(s, s[1:]):
                agg[(a, b)] = agg.get((a, b), 0) + n
        if not agg:
            break
        (left, right), best = min(
            agg.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merges.append((k, left, right, best))
        merged = left + right
        nxt = []
        for s, n in wt:
            r: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    r.append(merged)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            nxt.append((r, n))
        wt = nxt
    return merges


def _bpe_learn(sf_dir: str) -> list[tuple[int, str, str, int]]:
    """The BPE merge-learning loop shared by q_bpe_train (which emits
    the merge table) and q_bpe_encode (which applies the merges):
    returns [(merge_idx, left, right, count)]. Memoized per
    (path, mtime) like _gate_centroids — one gate/bench run calls it
    from both the train and encode queries."""
    path = _pq(sf_dir, "documents")
    return _bpe_learn_cached(sf_dir, path, os.path.getmtime(path))


@functools.lru_cache(maxsize=8)
def _bpe_learn_cached(
    sf_dir: str, _path: str, _mtime: float
) -> list[tuple[int, str, str, int]]:
    docs = _read(sf_dir, "documents", ["text"])

    def word_partials(t: pa.Table) -> pa.Table:
        agg: dict[str, int] = {}
        for txt in t["text"].to_pylist():
            for w in (txt or "").split(" "):
                if w and w.isascii() and w.isalpha() and w.islower():
                    agg[w] = agg.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    def to_syms(t: pa.Table) -> pa.Table:
        syms = [
            " ".join(list(w) + ["</w>"]) for w in t["word"].to_pylist()
        ]
        return pa.table(
            {"syms": pa.array(syms, pa.string()), "n": t["sum(n)"]}
        )

    counts_ds = (
        docs.map_batches(
            word_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("word")
        .sum("n")
        .materialize()
    )
    if counts_ds.count() <= BPE_DRIVER_VOCAB_CAP:
        # the distinct-word table IS the working set of all 8 rounds:
        # under the cap, run them on the driver (same recurrence, same
        # tie-break) instead of paying 8 tiny shuffles of fixed overhead
        rows = counts_ds.take_all()
        return _bpe_learn_driver(
            [(r["word"], int(r["sum(n)"])) for r in rows]
        )

    wt = counts_ds.map_batches(to_syms, batch_format="pyarrow").materialize()

    from ..stages.topk import dataset_topk

    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, BPE_MERGES + 1):

        def pair_partials(t: pa.Table) -> pa.Table:
            agg: dict[str, int] = {}
            for syms, n in zip(
                t["syms"].to_pylist(), t["n"].to_pylist()
            ):
                s = syms.split(" ")
                for a, b in zip(s, s[1:]):
                    key = a + " " + b
                    agg[key] = agg.get(key, 0) + n
            return pa.table(
                {
                    "pair": pa.array(list(agg.keys()), pa.string()),
                    "n": pa.array(list(agg.values()), pa.int64()),
                }
            )

        counts = (
            wt.map_batches(
                pair_partials, batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("pair")
            .sum("n")
            .map_batches(
                lambda t: pa.table({"pair": t["pair"], "n": t["sum(n)"]}),
                batch_format="pyarrow",
            )
        )
        top = dataset_topk(
            counts, [("n", "descending"), ("pair", "ascending")], 1
        ).take_all()
        if not top:
            break
        left, right = top[0]["pair"].split(" ")
        merges.append((k, left, right, int(top[0]["n"])))
        merged = left + right

        def apply_merge(
            t: pa.Table, a: str = left, b: str = right, m: str = merged
        ) -> pa.Table:
            out = []
            for syms in t["syms"].to_pylist():
                s = syms.split(" ")
                r: list[str] = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        r.append(m)
                        i += 2
                    else:
                        r.append(s[i])
                        i += 1
                out.append(" ".join(r))
            return pa.table(
                {"syms": pa.array(out, pa.string()), "n": t["n"]}
            )

        wt = wt.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()

    return merges


def q_bpe_train(sf_dir: str):
    """BPE tokenizer TRAINING (Sennrich et al. 2016) — the iterative
    merge loop on top of ``bpe_pairs``'s statistics: learn the first
    ``BPE_MERGES`` merges over the corpus. Scale shape: pass 1 collapses
    the corpus to the word-frequency table (per-batch dict combiners,
    one groupby — bounded by VOCABULARY, never corpus size; this is why
    classic BPE training scales); each merge round is then pair-count
    partials + groupby + a top-1 partial/final reduce over that word
    table, and a stateless merge-apply map. Only the single winning pair
    per round (O(1)) ever reaches the driver. Ties break by (count desc,
    pair asc) in both engines; merge application is the standard
    left-to-right non-overlapping scan, replayed in SQL via a
    wrapped-symbol string replace (``(a)(b) -> (ab)`` — per-symbol
    wrappers make leftmost non-overlapping replace identical to the
    scan). Restricted to ``^[a-z]+$`` words like the published BPE
    demos; ``</w>`` is the end-of-word symbol."""
    merges = _bpe_learn(sf_dir)
    return rd.from_arrow(
        pa.table(
            {
                "merge_idx": pa.array([m[0] for m in merges], pa.int64()),
                "left_sym": pa.array([m[1] for m in merges], pa.string()),
                "right_sym": pa.array([m[2] for m in merges], pa.string()),
                "merged": pa.array(
                    [m[1] + m[2] for m in merges], pa.string()
                ),
                "n": pa.array([m[3] for m in merges], pa.int64()),
            }
        )
    )


def q_bpe_encode(sf_dir: str):
    """BPE tokenizer APPLICATION — the encode half of the train/apply
    loop (q_bpe_train learns the merges; this tokenizes the corpus with
    them and emits per-doc token counts, the number every packing /
    budget / fertility stage downstream consumes). The merge list is
    O(BPE_MERGES) driver state broadcast into a stateless map; encoding
    replays the learned merges in rank order with the same left-to-right
    non-overlapping scan as training, memoized per distinct word per
    batch (Zipf: a batch re-sees few distinct words). Words outside the
    trained ``^[a-z]+$`` class count one token each (byte-fallback
    analog). No shuffle at all — the expensive part (learning) is shared
    via _bpe_learn; the oracle replays learning AND encoding in SQL,
    carrying each word through the unrolled merge rounds."""
    merges = [(m[1], m[2]) for m in _bpe_learn(sf_dir)]

    def encode_doc_batch(t: pa.Table) -> pa.Table:
        memo: dict[str, int] = {}

        def n_sym(w: str) -> int:
            got = memo.get(w)
            if got is not None:
                return got
            s = list(w) + ["</w>"]
            for a, b in merges:
                r: list[str] = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        r.append(a + b)
                        i += 2
                    else:
                        r.append(s[i])
                        i += 1
                s = r
            memo[w] = len(s)
            return memo[w]

        ids, n_words, n_tok = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            words = [w for w in (txt or "").split(" ") if w]
            if not words:  # oracle parity: no token rows -> no output row
                continue
            total = 0
            for w in words:
                if w.isascii() and w.isalpha() and w.islower():
                    total += n_sym(w)
                else:
                    total += 1
            ids.append(did)
            n_words.append(len(words))
            n_tok.append(total)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_tok, pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        encode_doc_batch, batch_format="pyarrow", zero_copy_batch=True,
    )



RESERVOIR_K = 100
