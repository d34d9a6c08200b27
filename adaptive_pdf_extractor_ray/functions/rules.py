"""Extraction rules: execution, validation, weighted ordering.

Byte-identical re-implementation of the reference's rule semantics:

- ``execute_rule``  — ``/root/reference/src/rule.py:71-99``:
  ``re.search(rule, text, re.DOTALL)``; returns ``group(1).strip()``,
  the empty string ``""`` when the capture is empty (the *null sentinel*),
  ``None`` on no match / no capture group / bad pattern.
- ``Rule.validate`` — ``/root/reference/src/rule.py:52-63``:
  anchored ``re.match(validation_regex, value)``; ``None`` value -> False.
- first-match-wins in weight order, ``""`` capture => field answer NULL —
  ``/root/reference/src/pipeline.py:22-64`` and ``src/cache.py:207-247``.

The reference keeps rules in a doubly-linked "weighted LRU" that bubbles a
rule up after every hit (``src/cache.py:249-289``, order-dependent). Here
rule order is a *deterministic snapshot per wave*: rules are sorted by
``(weight desc, rule_idx asc)`` when a :class:`RuleSet` is built, hit
counts are accumulated as dataflow (grouped Sum over ``matched rule_id``)
and folded into weights at wave/checkpoint granularity. Within a wave the
try-order is fixed, so output is independent of row visit order — the
property that makes the pipeline parallelizable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Rule:
    """One extraction rule: a regex with ONE capture group + a format gate.

    ``rule_id`` is a globally unique id used for weight accounting;
    ``rule_idx`` is the creation order within (fingerprint, field), the
    deterministic tie-break for equal weights.
    """

    pattern: str
    validation_regex: str
    weight: int = 1
    rule_id: int = -1
    rule_idx: int = 0
    # execution strategy: "regex" = run the pattern as-is; "span" /
    # "span_null" = the pattern is the fitted anchor-span rule whose result
    # equals the precomputed anchor span (value / null form), so the
    # applier may substitute the span and run only the validation regex —
    # a per-doc single-scan optimization with identical semantics (the
    # equivalence is property-tested in tests/test_templates_rulefit.py).
    kind: str = "regex"
    _rx: re.Pattern | None = field(default=None, repr=False, compare=False)
    _vrx: re.Pattern | None = field(default=None, repr=False, compare=False)

    def compile(self) -> "Rule":
        """Compile both regexes once (per actor); bad patterns -> None rx."""
        if self._rx is None:
            try:
                self._rx = re.compile(self.pattern, re.DOTALL)
            except re.error:
                self._rx = None
        if self._vrx is None:
            try:
                self._vrx = re.compile(self.validation_regex)
            except re.error:
                self._vrx = None
        return self

    def apply(self, text: str | None) -> str | None:
        """Execute on text. "" = matched-but-empty (null field); None = miss."""
        return self.apply_span(text)[0]

    def apply_span(self, text: str | None) -> tuple[str | None, int, int]:
        """Like :meth:`apply`, also returning the stripped capture's
        character offsets (start == end for the null sentinel; (-1, -1)
        on a miss)."""
        if not text:
            return None, -1, -1
        self.compile()
        if self._rx is None or not self.pattern:
            return None, -1, -1
        m = self._rx.search(text)
        if m is None:
            return None, -1, -1
        try:
            raw = m.group(1)
        except IndexError:
            return None, -1, -1
        if raw is None:
            # group 1 exists but did not participate in the match (e.g.
            # 'Foo|(Bar)' matching 'Foo') — a miss, not a crash; mirrors
            # execute_rule's catch-all (reference src/rule.py:96-99) so a
            # store-supplied rule can't break row-level fault isolation
            return None, -1, -1
        captured = raw.strip()
        lead = len(raw) - len(raw.lstrip())
        start = m.start(1) + lead
        return (captured if captured else ""), start, start + len(captured)

    def validate(self, value: str | None) -> bool:
        """Anchored-at-start format check of the extracted value."""
        if value is None:
            return False
        self.compile()
        if self._vrx is None:
            return False
        return self._vrx.match(value) is not None


NULL_SENTINEL = ""  # "" capture => the field's answer is NULL


@dataclass
class FieldRules:
    """Rules for one (fingerprint, field), sorted (weight desc, rule_idx asc)."""

    rules: list[Rule]

    def __post_init__(self) -> None:
        self.rules = sorted(self.rules, key=lambda r: (-r.weight, r.rule_idx))
        for r in self.rules:
            r.compile()

    def try_extract(
        self, text: str | None, span: str | None = None,
        have_span: bool = False,
    ) -> tuple[str | None, int]:
        """First rule whose (apply, validate) passes wins.

        Returns ``(value, rule_id)``; ``value`` is "" for an explicit null
        hit, None for a total miss (rule_id -1). When ``have_span`` is
        True, ``span`` is the precomputed anchor-span value for this field
        (None = label absent or empty span) and span-kind rules use it
        instead of re-scanning the text.
        """
        span_info = None if span is None else (span, -1, -1)
        v, rid, _, _ = self.try_extract_span(text, span_info, have_span)
        return v, rid

    def try_extract_span(
        self,
        text: str | None,
        span_info: tuple[str, int, int] | None = None,
        have_span: bool = False,
    ) -> tuple[str | None, int, int, int]:
        """Like :meth:`try_extract`, also returning the winning value's
        character offsets in ``text`` (start == end for null hits;
        (-1, -1) when unknown or missed). ``span_info`` is the
        precomputed (value, start, end) anchor span for this field."""
        for r in self.rules:
            start = end = -1
            if have_span and r.kind == "span":
                if span_info and span_info[0]:
                    v, start, end = span_info
                else:
                    v = None  # empty/absent span: no value hit
            elif have_span and r.kind == "span_null":
                if span_info is not None and span_info[0] == "":
                    v, start, end = span_info
                else:
                    v = None
            else:
                v, start, end = r.apply_span(text)
            if r.validate(v):
                return v, r.rule_id, start, end
        return None, -1, -1, -1


def extract_row(
    field_rules: dict[str, FieldRules],
    text: str | None,
    all_fields: list[str],
    spans: dict[str, tuple[str, int, int]] | None = None,
) -> tuple[
    dict[str, str | None], list[str], list[str], dict[str, int],
    dict[str, tuple[int, int]],
]:
    """Fast path for one row — mirrors ``extract_with_cache``.

    Reference: ``/root/reference/src/pipeline.py:22-64``. Returns
    ``(answers, success_fields, missing_fields, hits, offsets)`` where
    ``hits`` maps field -> matched rule_id (weight accounting) and
    ``offsets`` maps field -> (start, end) character span of the value in
    ``text`` (start == end for explicit nulls). ``spans`` (precomputed
    anchor spans with offsets) enables the single-scan fast path for
    span-kind rules.
    """
    ans: dict[str, str | None] = {}
    success: list[str] = []
    missing: list[str] = []
    hits: dict[str, int] = {}
    offsets: dict[str, tuple[int, int]] = {}
    have_span = spans is not None
    for f in all_fields:
        fr = field_rules.get(f)
        if fr is None:
            missing.append(f)
            continue
        value, rid, start, end = fr.try_extract_span(
            text, spans.get(f) if have_span else None, have_span
        )
        if value is not None:
            ans[f] = None if value == NULL_SENTINEL else value
            success.append(f)
            hits[f] = rid
            offsets[f] = (start, end)
        else:
            missing.append(f)
    return ans, success, missing, hits, offsets
