"""Exact set-similarity join via df-ordered prefix filtering — the
AllPairs / PPJoin family (Bayardo, Ma & Srikant, WWW'07; Chaudhuri,
Ganti & Kaushik, ICDE'06; Xiao et al., WWW'08).

A different algorithmic family from MinHash-LSH (`stages/dedup.py`):
LSH is probabilistic (a true pair can miss every band), while prefix
filtering is EXACT — every pair with Jaccard >= tau is guaranteed to
surface as a candidate, so the verified output equals the brute-force
all-pairs result without ever forming the quadratic cross product.

The theorem (AllPairs, lemma 1): fix any global total order over the
token universe and sort every set by it. If |A ∩ B| >= alpha, then the
first |A| - alpha + 1 tokens of A share at least one token with the
first |B| - alpha + 1 tokens of B (otherwise all alpha shared tokens
lie in both suffixes of length alpha - 1 — impossible). For Jaccard
J(A,B) >= tau we have |A ∩ B| >= tau * |A ∪ B| >= ceil(tau * |A|), so a
prefix of length

    p(n) = n - ceil(tau * n) + 1

per set is sufficient on both sides. The global order is free; choosing
ascending DOCUMENT FREQUENCY (rarest token first — the PPJoin heuristic)
makes the candidate buckets as small as possible, because prefixes are
then made of the corpus's rarest tokens.

Dataflow shape (all Dataset ops, nothing driver-side):

    docs -> map_batches(explode_shingle_sets)      per-doc DISTINCT shingles
         -> groupby(sh).count                      df per shingle (salted C++)
         -> join df back on sh                     tokens learn their rarity
         -> groupby(doc_id).map_groups(prefix)     bounded group = ONE doc's
                                                   shingle rows (~tokens/doc)
         -> groupby(sh).map_groups(bucket_pairs)   candidates; bucket size is
                                                   bounded by df of a PREFIX
                                                   token (rare by construction)
         -> distinct pairs -> text join -> exact Jaccard verify >= tau

Partitioning assumptions at 10^12 docs: the (doc_id, shingle) explode is
the big relation (~100 rows/doc) and is shuffled twice, keyed by shingle
(df join) and by doc_id (prefix selection) — both well-distributed keys.
The df side of the join is vocabulary-sized. A prefix bucket's size is
the df of its key token; adversarial corpora (everyone shares the same
rare template sentence) are bounded by ``bucket_pairs``'s skew guard
(star + neighbor adjacency over caps, dropped volume logged).

Reference parity note: the reference engine has no similarity join at
all (single-threaded regex loop, GustavoZiel/adaptive-PDF-extractor
src/main.py); this operator is part of the LLM-training-data family the
100 TB engine adds on top.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _shingles

# Exact-join verification threshold (word-3-gram Jaccard).
SETSIM_TAU = 0.6

# Candidate buckets are keyed by a df-minimal (rare) token, so they stay
# tiny on natural corpora; the cap only engages on adversarial skew —
# thousands of byte-identical boilerplate copies whose "rarest" shingle
# still has df = copy count. There `bucket_pairs` collapses the bucket
# by content_md5 (identical docs star to one representative, J = 1.0 by
# construction) and all-pairs the representatives; completeness degrades
# ONLY for over-cap buckets (a non-rep identical member is linked to its
# rep, not to every cross-family partner — the components pass restores
# the cluster), and the dropped volume is logged. Under the cap the join
# is exact (what the driver oracle verifies).
SETSIM_MAX_BUCKET = 1_000


def explode_shingle_sets(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> one row per DISTINCT word-3-gram shingle:
    (doc_id, sh, content_md5). The distinct-within-doc is what makes the
    later groupby(sh).count a document frequency; content_md5 (hashed
    once per doc) rides along so the candidate stage can star-collapse
    byte-identical docs inside an over-cap bucket."""
    import hashlib

    ids, shs, chs = [], [], []
    for did, txt in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
        ch = hashlib.md5((txt or "").encode("utf-8")).hexdigest()
        for s in set(_shingles(txt or "")):
            ids.append(did)
            shs.append(s)
            chs.append(ch)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "sh": pa.array(shs, pa.string()),
            "content_md5": pa.array(chs, pa.string()),
        }
    )


def prefix_length(n: int, tau: float) -> int:
    """AllPairs sufficient prefix for Jaccard >= tau over a set of size
    ``n``: n - ceil(tau*n) + 1 (>= 1 for any 0 < tau <= 1)."""
    return n - math.ceil(tau * n) + 1


def prefix_select_broadcast(batch: pa.Table, df: dict[str, int],
                            tau: float = SETSIM_TAU) -> pa.Table:
    """Fused broadcast-route prefix selection: (doc_id, text) rows +
    the broadcast df dict -> prefix rows (doc_id, sh, content_md5),
    identical to the distributed join + ``prefix_select`` route (same
    (df, sh) total order, same prefix length) without shuffling the
    exploded tokens. Used while the shingle vocabulary fits the
    broadcast budget; equivalence-tested against the join route."""
    import hashlib

    ids, shs, chs = [], [], []
    for did, txt in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
        s = sorted(set(_shingles(txt or "")))
        if not s:
            continue
        s.sort(key=lambda x: (df[x], x))
        ch = hashlib.md5((txt or "").encode("utf-8")).hexdigest()
        for sh in s[: prefix_length(len(s), tau)]:
            ids.append(did)
            shs.append(sh)
            chs.append(ch)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "sh": pa.array(shs, pa.string()),
            "content_md5": pa.array(chs, pa.string()),
        }
    )


class BroadcastPrefixer:
    """Actor-pool wrapper for the broadcast prefix route: the df dict is
    ray.get-deserialized ONCE per actor in ``__init__`` (a multi-million
    entry dict costs seconds to unpickle — paying it per batch dominated
    the whole join at 100k docs), then every ``__call__`` is a pure
    in-memory prefix selection."""

    def __init__(self, df_ref, tau: float = SETSIM_TAU):
        import ray

        self.df = ray.get(df_ref)
        self.tau = tau

    def __call__(self, batch: pa.Table) -> pa.Table:
        return prefix_select_broadcast(batch, self.df, self.tau)


def prefix_select(group: pa.Table, tau: float = SETSIM_TAU) -> pa.Table:
    """One doc's (doc_id, sh, df, content_md5) rows -> its prefix rows
    (doc_id, sh, content_md5), rarest-first under the deterministic
    total order (df, sh). The group is one document's distinct shingles
    — bounded by document length, never corpus-sized (same contract as
    sessionize)."""
    n = group.num_rows
    p = prefix_length(n, tau)
    idx = pc.sort_indices(
        group, sort_keys=[("df", "ascending"), ("sh", "ascending")]
    )
    return group.take(idx.slice(0, p)).select(
        ["doc_id", "sh", "content_md5"]
    )
