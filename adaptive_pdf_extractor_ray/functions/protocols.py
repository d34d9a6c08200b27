"""Pluggable extractor protocol — the rebuild's user-extension surface.

The reference's extension point is data-driven (each record carries its
own ``extraction_schema``, ``/root/reference/src/data.py:157-168``, so new
document types need zero code). The rebuild keeps that (anchor vocabulary
+ discovery are data-driven) and adds a code-level protocol so new
template *families* with custom logic can register without touching the
engine: anything satisfying :class:`Extractor` can be handed to the fit
stage / applier in place of the default anchor-rule implementation.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from .rules import Rule


@runtime_checkable
class Extractor(Protocol):
    """fit exemplars -> rules; apply rules -> values.

    Implementations must be deterministic and order-free over exemplars
    (the parallelization contract: output independent of row visit order)
    and serializable (constructed per actor or broadcast via ``ray.put``).
    """

    def fit(self, exemplar_texts: list[str]) -> dict[str, list[Rule]]:
        """Fit per-field rule ensembles from sample rows of one template."""
        ...

    def apply(
        self, rules: dict[str, list[Rule]], text: str
    ) -> dict[str, str | None]:
        """Extract field values from one normalized document."""
        ...


class AnchorRuleExtractor:
    """Default implementation wired through the pipeline (anchor-span
    rules; see functions/rulefit.py and stages/apply.py)."""

    def __init__(self, vocab: list[str], max_exemplars: int = 8):
        self.vocab = vocab
        self.max_exemplars = max_exemplars

    def fit(self, exemplar_texts: list[str]) -> dict[str, list[Rule]]:
        from .rulefit import fit_template

        return fit_template(exemplar_texts, self.vocab, self.max_exemplars)

    def apply(
        self, rules: dict[str, list[Rule]], text: str
    ) -> dict[str, str | None]:
        from .rules import FieldRules, extract_row

        frs = {f: FieldRules(rs) for f, rs in rules.items()}
        ans, _, _, _, _ = extract_row(frs, text, list(frs))
        return ans
