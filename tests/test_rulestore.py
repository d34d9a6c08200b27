"""RuleStore: persistence, content-hash dedupe, weight merge, adaptive
priority reordering across checkpoints (the distributed analog of the
reference's bubble-up, /root/reference/src/cache.py:207-289)."""

import pyarrow as pa

from adaptive_pdf_extractor_ray.functions.protocols import (
    AnchorRuleExtractor,
    Extractor,
)
from adaptive_pdf_extractor_ray.functions.rules import Rule
from adaptive_pdf_extractor_ray.state.rulestore import RuleStore, rule_content_id


def R(p, v, w=1, idx=0, kind="regex"):
    return Rule(pattern=p, validation_regex=v, weight=w, rule_idx=idx, kind=kind)


class TestStore:
    def test_roundtrip_parquet(self, tmp_path):
        s = RuleStore()
        s.add("fp1", "f", R(r"A(\d+)", r"^\d+$", w=5))
        s.add("fp1", "f", R(r"B(\d+)", r"^\d+$", w=2, idx=1))
        s.add("fp2", "g", R(r"C(\w+)", r"^\w+$", kind="span"))
        path = str(tmp_path / "rules.parquet")
        s.save(path)
        s2 = RuleStore.load(path)
        assert s2.to_table().equals(s.to_table())
        assert s2.compiled()["fp2"]["g"].rules[0].kind == "span"

    def test_content_hash_dedupes(self):
        s = RuleStore()
        a = s.add("fp", "f", R(r"X(\d)", r"^\d$", w=3))
        b = s.add("fp", "f", R(r"X(\d)", r"^\d$", w=7))
        assert a == b and len(s) == 1
        # max weight survives a duplicate add
        assert s.to_table()["weight"][0].as_py() == 7

    def test_content_id_stable(self):
        assert rule_content_id("fp", "f", "p", "v") == rule_content_id(
            "fp", "f", "p", "v"
        )

    def test_weight_fold_reorders_priority(self):
        """Hits folded at checkpoint granularity flip try-order — the
        wave-granularity bubble-up."""
        s = RuleStore()
        id_a = s.add("fp", "f", R(r"A(\d+)", r"^\d+$", w=1, idx=0))
        id_b = s.add("fp", "f", R(r"B(\d+)", r"^\d+$", w=1, idx=1))
        first = s.compiled()["fp"]["f"].rules[0].rule_id
        assert first == id_a  # tie -> creation order
        s.apply_hits({id_b: 100})
        assert s.compiled()["fp"]["f"].rules[0].rule_id == id_b

    def test_missing_rule_hit_ignored(self):
        s = RuleStore()
        s.apply_hits({12345: 7})  # no crash, no effect
        assert len(s) == 0


class TestExtractorProtocol:
    def test_default_extractor_satisfies_protocol(self):
        ex = AnchorRuleExtractor(["Nome", "Inscricao"])
        assert isinstance(ex, Extractor)

    def test_fit_apply_roundtrip(self):
        ex = AnchorRuleExtractor(["Nome", "Inscricao"])
        texts = ["Nome Ana Lima Inscricao 123456", "Nome Rui Inscricao 77777"]
        rules = ex.fit(texts)
        out = ex.apply(rules, "Nome Zeca Inscricao 99999")
        assert out == {"nome": "Zeca", "inscricao": "99999"}


class TestMergedSave:
    def test_concurrent_shards_merge_not_lastwriter(self, tmp_path):
        """Two workers sharing one store: fitted rules from both survive
        and shared-rule weights sum deltas (not last-writer-wins)."""
        path = str(tmp_path / "rules.parquet")
        base = RuleStore()
        rid = base.add("fp", "f", R(r"A(\d+)", r"^\d+$", w=1, idx=0))
        base.save(path)

        s1 = RuleStore.load(path)
        s2 = RuleStore.load(path)
        s1.add("fp1", "f1", R(r"X(\d+)", r"^\d+$", w=1, idx=0))
        s1.apply_hits({rid: 10})
        s2.add("fp2", "f2", R(r"Y(\d+)", r"^\d+$", w=1, idx=0))
        s2.apply_hits({rid: 5})
        s1.save(path, merge=True)
        s2.save(path, merge=True)

        final = RuleStore.load(path)
        assert len(final) == 3  # both shards' fitted rules survive
        shared = final._rules[rid][2]
        assert shared.weight == 1 + 10 + 5  # deltas sum, not max/overwrite

    def test_second_merged_save_folds_only_new_delta(self, tmp_path):
        path = str(tmp_path / "rules.parquet")
        s = RuleStore()
        rid = s.add("fp", "f", R(r"A(\d+)", r"^\d+$", w=1, idx=0))
        s.save(path, merge=True)
        s.apply_hits({rid: 3})
        s.save(path, merge=True)
        s.save(path, merge=True)  # no new hits: weight must not drift
        assert RuleStore.load(path)._rules[rid][2].weight == 4
