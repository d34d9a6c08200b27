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
from ..functions.templates import discover_anchors, find_anchors
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
            # Unknown template families: induce anchors from a wider sample,
            # then SPLIT the group by the refined fingerprint so several
            # families that all hashed to 'unk' each get their own rules
            # (the applier re-fingerprints 'unk' rows with the extended
            # vocabulary; subsequent runs fingerprint correctly from the
            # start because the rule store's labels extend the vocab).
            # Known boundary: min_support=0.3 separates up to ~3 novel
            # families per wave; a corpus dropping many new families at
            # once resolves them over successive waves/runs (each wave's
            # discovered labels shrink the residual 'unk' pool), and rows
            # still unresolved stay flagged via n_missing/metrics rather
            # than being extracted wrongly.
            sample = all_texts[: max(self.max_exemplars * 8, 64)]
            induced = discover_anchors(sample, min_support=0.3)
            if induced:
                from ..functions.templates import fingerprint_text

                by_fp: dict[str, list[str]] = {}
                for t in sample:
                    by_fp.setdefault(fingerprint_text(t, induced), []).append(t)
                for sub_fp, sub_texts in sorted(by_fp.items()):
                    fitted = fit_template(
                        sub_texts, induced, max_exemplars=self.max_exemplars
                    )
                    emit(sub_fp, fitted)
                return pa.table(rows, schema=RULES_SCHEMA)

        fitted = fit_template(texts, self.vocab, max_exemplars=self.max_exemplars)
        emit(fp, fitted)
        return pa.table(rows, schema=RULES_SCHEMA)
