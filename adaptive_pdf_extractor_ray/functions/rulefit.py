"""Deterministic rule fitting — the LLM-free analog of the reference's
generate -> check -> refine loop.

Reference: ``generate_robust_rule`` (``/root/reference/src/rule.py:107-257``)
prompts an LLM for a candidate rule, then validates it with three gates
(syntax, extraction reproduces the known value, validation_regex accepts
it) and retries with feedback up to ``max_attempts``. Here the candidate
generator is an enumerable lattice (specific value-class rules -> tempered
generic span rule -> null rule) and the same gates are applied
programmatically against exemplar rows, so fitting is bounded,
deterministic and order-free — which is what lets it run inside
``groupby(fingerprint).map_groups`` instead of a sequential driver loop.

The fitted ensemble per field is, in try-order (weight desc, idx asc):

1. *specific* rule — tight value-class capture (digits / uppercase word)
   inferred from exemplar values, e.g. ``Inscricao\\s*([0-9]{6,10})(?!\\d)``
   (shape mirrors the reference's learned cache,
   ``data/fake/caches/fake_dataset_1000samples_seed_1_cache.json``);
2. *generic* rule — tempered-dot capture up to the next anchor label,
   which reproduces ``span_extract`` semantics exactly;
3. *null* rule — ``Label\\s*()(?=NEXT|$)`` with validation ``^$``, the
   empty-capture null sentinel (``src/rule.py:86-88``).
"""

from __future__ import annotations

import re

from .rules import FieldRules, Rule
from .templates import field_label, label_to_field, find_anchors, span_extract


def _others_alt(other_labels: list[str]) -> str:
    return "|".join(re.escape(o) for o in sorted(other_labels, key=lambda s: (-len(s), s)))


# Anchor-token boundaries — must mirror ``templates._vocab_regex`` exactly
# so learned rules and the span oracle agree on where labels start/end.
_LB = r"(?<![A-Za-z0-9])"
_RB = r"(?![A-Za-z0-9])"


def label_pattern(label: str, all_labels: list[str]) -> str:
    """Regex matching ``label`` as an anchor token, not as a fragment of a
    longer label (e.g. ``Sistema`` inside ``Tipo De Sistema``) — the
    single-regex longest-first oracle gets this for free; per-field rules
    need explicit containment guards."""
    pre = "".join(
        f"(?<!{re.escape(m[: -len(label)])})"
        for m in all_labels
        if m != label and m.endswith(label)
    )
    suffixes = [m[len(label):] for m in all_labels if m != label and m.startswith(label)]
    post = (
        rf"(?!(?:{'|'.join(re.escape(s) for s in sorted(suffixes, key=len, reverse=True))}))"
        if suffixes
        else ""
    )
    return _LB + pre + re.escape(label) + post + _RB


def make_generic_rule(label: str, other_labels: list[str]) -> Rule:
    lab = label_pattern(label, [label, *other_labels])
    if other_labels:
        alt = _others_alt(other_labels)
        nxt = rf"{_LB}(?:{alt}){_RB}"
        pattern = rf"{lab}\s*((?:(?!{nxt}).)*?)\s*(?={nxt}|$)"
        validation = rf"^(?!.*{_LB}(?:{alt}){_RB}).{{1,8000}}$"
    else:
        pattern = rf"{lab}\s*(.*?)\s*$"
        validation = r"^.{1,8000}$"
    return Rule(pattern=pattern, validation_regex=validation, kind="span")


def make_null_rule(label: str, other_labels: list[str]) -> Rule:
    lab = label_pattern(label, [label, *other_labels])
    if other_labels:
        alt = _others_alt(other_labels)
        pattern = rf"{lab}\s*()(?={_LB}(?:{alt}){_RB}|$)"
    else:
        pattern = rf"{lab}\s*()$"
    return Rule(pattern=pattern, validation_regex=r"^$", kind="span_null")


def make_specific_rule(
    label: str, values: list[str], other_labels: list[str] = ()
) -> Rule | None:
    """Tight value-class candidate from observed non-null exemplar values."""
    if not values:
        return None
    lab = label_pattern(label, [label, *other_labels])
    lens = [len(v) for v in values]
    lo, hi = min(lens), max(lens)
    if all(re.fullmatch(r"[0-9]+", v) for v in values):
        return Rule(
            pattern=rf"{lab}\s*([0-9]{{{lo},{hi}}})(?![0-9])",
            validation_regex=rf"^[0-9]{{{lo},{hi}}}$",
        )
    if all(re.fullmatch(r"[A-ZÀ-Ö]+", v) for v in values):
        return Rule(
            pattern=rf"{lab}\s*([A-ZÀ-Ö]{{{lo},{hi}}})(?![A-Za-zÀ-ö0-9])",
            validation_regex=rf"^[A-ZÀ-Ö]{{{lo},{hi}}}$",
        )
    return None


def validate_no_other_keywords(
    field_value: str, other_keywords: list[str]
) -> str | None:
    """Keyword-contamination guard-rail — parity with the reference's
    ``_validate_no_other_keywords`` (``/root/reference/src/rule.py:415-467``).
    Returns an error message when the extracted value contains another
    field's keyword, else None. NOTE: the reference *defines but disables*
    this gate (call commented out at ``src/rule.py:235-241``); it is kept
    available here with the same default-off wiring — the generic rule's
    negative-lookahead validation regex subsumes it for anchor labels."""
    if field_value == "":
        return None  # null fields skip the check
    for kw in other_keywords:
        if re.search(r"\b" + re.escape(kw) + r"\b", field_value, re.IGNORECASE):
            return (
                f"value {field_value!r} contains forbidden keyword {kw!r}"
            )
    return None


def fit_field(
    field: str,
    all_labels: list[str],
    exemplars: list[tuple[str, str | None]],
) -> list[Rule]:
    """Fit the rule ensemble for one field from (text, expected_value) pairs.

    Every candidate is gated exactly like the reference's validators: the
    assembled ensemble must reproduce the expected value on *every*
    exemplar (``_validate_extraction_rule`` + ``_validate_validation_regex``
    semantics, ``src/rule.py:300-412``); a specific rule that breaks any
    exemplar is dropped.
    """
    label = field_label(field)
    others = [l for l in all_labels if l != label]
    generic = make_generic_rule(label, others)
    null_rule = make_null_rule(label, others)

    values = [v for _, v in exemplars if v is not None]
    specific = make_specific_rule(label, values, others)

    def ensemble_ok(rules: list[Rule]) -> bool:
        fr = FieldRules([
            Rule(r.pattern, r.validation_regex, weight=1, rule_idx=i, kind=r.kind)
            for i, r in enumerate(rules)
        ])
        for text, expected in exemplars:
            got, _ = fr.try_extract(text)
            want = "" if expected is None else expected
            if got != want:
                return False
        return True

    if specific is not None and ensemble_ok([specific, generic, null_rule]):
        chosen = [specific, generic, null_rule]
    else:
        chosen = [generic, null_rule]
    for i, r in enumerate(chosen):
        r.rule_idx = i
    return chosen


def fit_template(
    texts: list[str],
    vocab: list[str],
    max_exemplars: int = 8,
) -> dict[str, list[Rule]]:
    """Fit rules for one fingerprint group from exemplar texts.

    The group's field set is derived from the anchors found in the
    exemplars (all rows in a group share a fingerprint = label set).
    Caps work at ``max_exemplars`` rows so fit cost is bounded by template
    cardinality, not corpus size (skew guard — SURVEY §4).
    """
    exemplar_texts = texts[:max_exemplars]
    if not exemplar_texts:
        return {}
    labels = sorted({a.label for t in exemplar_texts for a in find_anchors(t, vocab)})
    if not labels:
        return {}
    per_field: dict[str, list[tuple[str, str | None]]] = {}
    for t in exemplar_texts:
        spans = span_extract(t, vocab)
        for lab in labels:
            f = label_to_field(lab)
            per_field.setdefault(f, []).append((t, spans.get(f)))
    return {
        f: fit_field(f, labels, exemplars) for f, exemplars in per_field.items()
    }
