"""Rule-fit stage: the wide step (groupby fingerprint -> fit -> rule rows).

The reference's slow path is an inherently sequential LLM feedback loop
per document (``extract_with_llm`` + ``generate_rules_for_fields``,
``/root/reference/src/pipeline.py:72-245``). Here it is one bounded
``groupby("fingerprint").map_groups(FitGroup)`` over the *miss* rows only:
each group samples up to ``max_exemplars`` texts (order-free — the skew
guard for head templates, SURVEY §4) and emits fitted rule rows in the
RuleStore schema. Cost scales with template cardinality, not corpus size.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.rulefit import fit_template
from ..functions.templates import discover_families, find_anchors
from ..state.rulestore import RULES_SCHEMA, rule_content_id


class FitGroup:
    """map_groups callable: one fingerprint group in, rule rows out."""

    def __init__(self, vocab: list[str], max_exemplars: int = 8,
                 discover_unknown: bool = True):
        self.vocab = vocab
        self.max_exemplars = max_exemplars
        self.discover_unknown = discover_unknown

    def __call__(self, group: pa.Table) -> pa.Table:
        fp = group["fingerprint"][0].as_py()
        all_texts = [t for t in group["text_norm"].to_pylist() if t]
        rows = {k: [] for k in RULES_SCHEMA.names}

        def emit(out_fp: str, fitted) -> None:
            for field, rules in fitted.items():
                for r in rules:
                    rows["fingerprint"].append(out_fp)
                    rows["field"].append(field)
                    rows["pattern"].append(r.pattern)
                    rows["validation_regex"].append(r.validation_regex)
                    rows["weight"].append(r.weight)
                    rows["rule_id"].append(
                        rule_content_id(out_fp, field, r.pattern,
                                        r.validation_regex)
                    )
                    rows["rule_idx"].append(r.rule_idx)
                    rows["kind"].append(r.kind)

        texts = all_texts[: self.max_exemplars]
        if (
            texts
            and self.discover_unknown
            and not find_anchors(texts[0], self.vocab)
        ):
            # Unknown template families: greedy family peeling
            # (discover_families) separates MANY families in one wave —
            # the anchor_support>=0.95 gate inside a family is what keeps
            # recurring *value* phrases from being promoted to anchors.
            # Each family fits with its own vocabulary under its refined
            # fingerprint; the applier re-fingerprints 'unk' rows with the
            # extended (store-derived) vocabulary, and subsequent runs
            # fingerprint correctly from wave 1. Families with < min_family
            # exemplars in the sample stay flagged (n_missing) for later
            # waves rather than being extracted wrongly.
            sample = all_texts[: max(self.max_exemplars * 16, 128)]
            families = discover_families(sample, min_family=4)
            if families:
                from ..functions.templates import fingerprint_text

                # assign each sample doc to the family whose anchors it
                # carries most of; fit each family with ITS vocabulary
                by_fp: dict[str, tuple[list[str], list[str]]] = {}
                for t in sample:
                    best, best_n = None, 0
                    for labels in families:
                        n = len([a for a in find_anchors(t, labels)])
                        if n > best_n:
                            best, best_n = labels, n
                    if best is None:
                        continue
                    sub_fp = fingerprint_text(t, best)
                    by_fp.setdefault(sub_fp, (best, []))[1].append(t)
                for sub_fp, (labels, sub_texts) in sorted(by_fp.items()):
                    fitted = fit_template(
                        sub_texts, labels, max_exemplars=self.max_exemplars
                    )
                    emit(sub_fp, fitted)
                return pa.table(rows, schema=RULES_SCHEMA)

        fitted = fit_template(texts, self.vocab, max_exemplars=self.max_exemplars)
        emit(fp, fitted)
        return pa.table(rows, schema=RULES_SCHEMA)
