"""Template anchors, layout fingerprints, and the span-extraction oracle.

The reference keys its rule caches by a per-record ``label`` supplied in
the data (``/root/reference/src/main.py:151-198``). Web-scale input has no
labels, so the rebuild computes a **layout fingerprint**: the set of
anchor labels (rendered field names, ``field.replace("_"," ").title()`` —
``/root/reference/scripts/generate_fake_data.py:242``) found in the
normalized text. Same label set => same template => same rules.

``span_extract`` is the deterministic per-row extraction semantics: the
value of a field is the text between its anchor label and the next anchor
(or end of text), stripped; empty => NULL. On the reference's synthetic
corpus protocol this reproduces ``expected_answer`` exactly (fields are
emitted as ``label sep value`` chunks, ``generate_sample`` at
``scripts/generate_fake_data.py:204-288``), and it doubles as the pure
oracle the pipeline's learned rules are validated against.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Registered template families (field vocabularies).  New families need only
# a field list — labels, fingerprints and rules all derive from it.
# ---------------------------------------------------------------------------

CARTEIRA_OAB_FIELDS = [
    "nome",
    "inscricao",
    "seccional",
    "subsecao",
    "categoria",
    "endereco_profissional",
    "telefone_profissional",
    "situacao",
]

TELA_SISTEMA_FIELDS = [
    "data_base",
    "data_vencimento",
    "quantidade_parcelas",
    "produto",
    "sistema",
    "tipo_de_operacao",
    "tipo_de_sistema",
]

TEMPLATE_FIELDS: dict[str, list[str]] = {
    "carteira_oab": CARTEIRA_OAB_FIELDS,
    "tela_sistema": TELA_SISTEMA_FIELDS,
}


def field_label(field: str) -> str:
    """Render a field name as its in-document anchor label."""
    return field.replace("_", " ").title()


def label_to_field(label: str) -> str:
    """Inverse of :func:`field_label`."""
    return label.replace(" ", "_").lower()


def default_vocab() -> list[str]:
    """All anchor labels from registered templates, longest first."""
    labels = {field_label(f) for fields in TEMPLATE_FIELDS.values() for f in fields}
    return sorted(labels, key=lambda s: (-len(s), s))


@dataclass(frozen=True)
class Anchor:
    label: str
    start: int
    end: int


def _vocab_regex(vocab: list[str]) -> re.Pattern:
    # Longest-first alternation.  Boundaries are ASCII-alnum-based, not
    # space-based: normalization splits ASCII letter/digit and camel-case
    # adjacency (src/data.py:73-81) but NOT accented-lowercase→Upper or
    # label→punctuation adjacency (e.g. "CearáCategoria",
    # "Profissional(95)"), so an anchor may legitimately touch a non-ASCII
    # letter or punctuation on either side — the same contamination shape
    # the reference's learned lookaheads tolerate (see the committed cache,
    # data/fake/caches/fake_dataset_1000samples_seed_1_cache.json).
    alts = "|".join(re.escape(v) for v in sorted(vocab, key=lambda s: (-len(s), s)))
    return re.compile(rf"(?<![A-Za-z0-9])({alts})(?![A-Za-z0-9])")


_VOCAB_RX_CACHE: dict[tuple[str, ...], re.Pattern] = {}


_GLUE_RX_CACHE: dict[tuple[str, ...], re.Pattern] = {}


def find_anchors(text: str, vocab: list[str]) -> list[Anchor]:
    """Non-overlapping anchor occurrences, leftmost-longest, by position.

    Labels absent from the strict boundary scan get one relaxed retry that
    permits a lowercase letter directly after the label: the reference's
    empty-separator protocol glues Title-Case labels to lowercase-leading
    values ("Subsecaoda Cruz Paulista"), which no alnum-boundary scan can
    see (observed in fake_dataset_1000samples_seed_1 records 3/202/249/…).
    The retry fires only for labels with zero strict occurrences, so data
    where every label is properly delimited is byte-identical to the
    strict scan."""
    key = tuple(sorted(vocab))
    rx = _VOCAB_RX_CACHE.get(key)
    if rx is None:
        rx = _VOCAB_RX_CACHE[key] = _vocab_regex(vocab)
    anchors = [Anchor(m.group(1), m.start(1), m.end(1)) for m in rx.finditer(text)]
    found = {a.label for a in anchors}
    # cheap C-level substring precheck: a label that does not occur in the
    # text at all (the common case — every doc "misses" the other
    # templates' labels) never reaches the relaxed regex scan
    missing = tuple(sorted(
        (v for v in vocab if v not in found and v in text),
        key=lambda s: (-len(s), s),
    ))
    if missing:
        rx2 = _GLUE_RX_CACHE.get(missing)
        if rx2 is None:
            alts = "|".join(re.escape(v) for v in missing)
            rx2 = _GLUE_RX_CACHE[missing] = re.compile(
                rf"(?<![A-Za-z0-9])({alts})(?=[a-zà-öø-ÿ])"
            )
        spans = [(a.start, a.end) for a in anchors]
        extra = []
        for m in rx2.finditer(text):
            s, e = m.start(1), m.end(1)
            if any(s < be and bs < e for bs, be in spans):
                continue
            extra.append(Anchor(m.group(1), s, e))
        if extra:
            anchors = sorted(anchors + extra, key=lambda a: a.start)
    return anchors


UNKNOWN_FINGERPRINT = "unk"


def fingerprint_of_labels(labels: list[str] | set[str]) -> str:
    """Stable template fingerprint = md5 of the sorted unique label set."""
    uniq = sorted(set(labels))
    if not uniq:
        return UNKNOWN_FINGERPRINT
    return hashlib.md5("|".join(uniq).encode("utf-8")).hexdigest()[:16]


def fingerprint_text(text: str | None, vocab: list[str]) -> str:
    if not text:
        return UNKNOWN_FINGERPRINT
    return fingerprint_of_labels([a.label for a in find_anchors(text, vocab)])


def span_extract_offsets(
    text: str, vocab: list[str]
) -> dict[str, tuple[str, int, int]]:
    """Anchor spans with character offsets: field -> (value, start, end)
    where ``text[start:end] == value`` (whitespace-stripped bounds; empty
    span => value "" with start == end). A field whose label is absent has
    no key."""
    anchors = find_anchors(text, vocab)
    out: dict[str, tuple[str, int, int]] = {}
    for i, a in enumerate(anchors):
        f = label_to_field(a.label)
        if f in out:
            continue  # first occurrence wins
        nxt = anchors[i + 1].start if i + 1 < len(anchors) else len(text)
        raw = text[a.end : nxt]
        value = raw.strip()
        lead = len(raw) - len(raw.lstrip())
        start = a.end + lead
        out[f] = (value, start, start + len(value))
    return out


def span_extract_raw(text: str, vocab: list[str]) -> dict[str, str]:
    """Anchor spans with the empty span preserved as "" (label present but
    no value); a field whose label is absent has no key at all."""
    return {f: v for f, (v, _, _) in span_extract_offsets(text, vocab).items()}


def span_extract(text: str, vocab: list[str]) -> dict[str, str | None]:
    """Deterministic anchor-span extraction (the extraction oracle).

    Field value = text between the field's first anchor occurrence and the
    next anchor start (or end of text), stripped; empty span => None.
    """
    return {f: (v if v else None) for f, v in span_extract_raw(text, vocab).items()}


def _candidate_phrases(text: str) -> set[str]:
    """Runs of 1-3 consecutive Title-Case tokens in one text."""
    token_rx = re.compile(r"[A-ZÀ-Ö][a-zà-ö]+")
    toks = [(m.group(0), m.start(), m.end()) for m in token_rx.finditer(text)]
    seen: set[str] = set()
    for i in range(len(toks)):
        for n in (3, 2, 1):
            if i + n > len(toks):
                continue
            if all(toks[j + 1][1] == toks[j][2] + 1 for j in range(i, i + n - 1)):
                seen.add(text[toks[i][1] : toks[i + n - 1][2]])
    return seen


def discover_families(
    texts: list[str],
    min_family: int = 4,
    anchor_support: float = 0.95,
) -> list[list[str]]:
    """Separate MANY unknown template families in one sample by greedy
    peeling, with a guard against recurring *value* phrases.

    The separating property: a true anchor label appears in ~every doc of
    its family (templates always render labels), while value phrases
    recur in only a fraction. Loop: take the most-supported candidate
    phrase as a family seed; its family = docs containing it; accept as
    anchors only candidates present in >= ``anchor_support`` of the
    family; drop longer-phrase-contained fragments; peel those docs and
    repeat. Returns one label list per family (possibly overlapping
    vocabularies across families).
    """
    cand_per_doc = [_candidate_phrases(t) for t in texts]

    def jacc(a: set[str], b: set[str]) -> float:
        if not a and not b:
            return 1.0
        if not a or not b:
            return 0.0
        return len(a & b) / len(a | b)

    # cluster docs by candidate-set similarity: same-family docs share
    # their family phrases (high Jaccard); cross-family docs share only
    # generic fragments like single common tokens (low Jaccard) — this is
    # what support-based peeling gets wrong when families share a token.
    def supported(members: list[int], support: float) -> set[str]:
        need = max(1, int(support * len(members)))
        counts: dict[str, int] = {}
        for i in members:
            for p in cand_per_doc[i]:
                counts[p] = counts.get(p, 0) + 1
        return {p for p, c in counts.items() if c >= need}

    # pass 1: similarity clusters (may over-split a family whose docs
    # differ by a recurring value phrase)
    pool = list(range(len(texts)))
    clusters: list[tuple[list[int], set[str]]] = []
    while len(pool) >= min_family:
        seed = pool[0]
        members = [
            i for i in pool if jacc(cand_per_doc[seed], cand_per_doc[i]) >= 0.5
        ]
        if len(members) < min_family:
            pool = pool[1:]  # residual doc: too few peers in this sample
            continue
        clusters.append((members, supported(members, anchor_support)))
        member_set = set(members)
        pool = [i for i in pool if i not in member_set]

    # pass 2: merge clusters whose supported-phrase sets overlap — the
    # with-value-phrase and without halves of one family rejoin here, and
    # re-gating over the union demotes the value phrase below support
    merged = True
    while merged:
        merged = False
        for a in range(len(clusters)):
            for b in range(a + 1, len(clusters)):
                if jacc(clusters[a][1], clusters[b][1]) >= 0.3:
                    mem = clusters[a][0] + clusters[b][0]
                    clusters[a] = (mem, supported(mem, anchor_support))
                    clusters.pop(b)
                    merged = True
                    break
            if merged:
                break

    families: list[list[str]] = []
    for members, raw in clusters:
        accepted = sorted(raw, key=lambda s: (-len(s), s))
        final: list[str] = []
        for p in accepted:
            if not any(p in a for a in final):
                final.append(p)
        if final:
            families.append(final)

    # pass 3: exclusivity filter. A parasitic "family" induced by a value
    # phrase recurring ACROSS real families matches only docs that some
    # real family also fully matches; a real family always has docs
    # matching it alone. Drop families with zero exclusive documents.
    if len(families) > 1:
        full_sets: list[set[int]] = []
        for labels in families:
            fset = set()
            for i, t in enumerate(texts):
                found = {a.label for a in find_anchors(t, labels)}
                if found >= set(labels):
                    fset.add(i)
            full_sets.append(fset)
        keep = []
        for fi, labels in enumerate(families):
            others = set().union(
                *(s for fj, s in enumerate(full_sets) if fj != fi)
            ) if len(full_sets) > 1 else set()
            if full_sets[fi] - others:
                keep.append(labels)
        if keep:
            families = keep
    return families


def discover_anchors(texts: list[str], min_support: float = 0.8) -> list[str]:
    """Induce anchor labels for an *unknown* template family.

    Candidate anchors are runs of 1-3 consecutive Title-Case tokens; those
    appearing in >= ``min_support`` of the exemplar texts are accepted
    (longest-first, overlapping shorter runs dropped). This is the
    registry-free fallback: a new template family seen at scale gets a
    vocabulary, hence a fingerprint and fitted rules, with zero code.
    """
    counts: dict[str, int] = {}
    token_rx = re.compile(r"[A-ZÀ-Ö][a-zà-ö]+")
    for text in texts:
        toks = [(m.group(0), m.start(), m.end()) for m in token_rx.finditer(text)]
        seen: set[str] = set()
        for i in range(len(toks)):
            for n in (3, 2, 1):
                if i + n > len(toks):
                    continue
                # consecutive = separated by exactly one space
                ok = all(toks[j + 1][1] == toks[j][2] + 1 for j in range(i, i + n - 1))
                if not ok:
                    continue
                phrase = text[toks[i][1] : toks[i + n - 1][2]]
                seen.add(phrase)
        for p in seen:
            counts[p] = counts.get(p, 0) + 1
    need = max(1, int(min_support * len(texts)))
    cands = sorted(
        (p for p, c in counts.items() if c >= need), key=lambda s: (-len(s), s)
    )
    # drop phrases contained in an accepted longer phrase
    accepted: list[str] = []
    for p in cands:
        if not any(p in a for a in accepted):
            accepted.append(p)
    return accepted
