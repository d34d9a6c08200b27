"""Rule execution/validation truth tables — reference semantics from
/root/reference/src/rule.py:42-99 and src/pipeline.py:22-64."""

from adaptive_pdf_extractor_ray.functions.rules import (
    FieldRules,
    Rule,
    extract_row,
)


def R(p, v, w=1, idx=0, rid=0):
    return Rule(pattern=p, validation_regex=v, weight=w, rule_idx=idx, rule_id=rid)


class TestExecute:
    def test_basic_capture(self):
        assert R(r"Inscricao\s*(\d+)", r"^\d+$").apply("Inscricao 101943") == "101943"

    def test_capture_is_stripped(self):
        assert R(r"Nome(.*?)Fim", r".*").apply("Nome  X Y  Fim") == "X Y"

    def test_empty_capture_is_null_sentinel(self):
        # "" capture => explicit null (src/rule.py:86-88)
        assert R(r"Nome\s*()(?=Inscricao)", r"^$").apply("Nome Inscricao 1") == ""

    def test_no_match_returns_none(self):
        assert R(r"Zzz(\d+)", r".*").apply("Nome X") is None

    def test_no_capture_group_returns_none(self):
        # IndexError branch (src/rule.py:89-92)
        assert R(r"Nome \w+", r".*").apply("Nome X") is None

    def test_dotall_matches_across_newlines(self):
        assert R(r"A(.*?)B", r".*").apply("A x\ny B") == "x\ny"

    def test_bad_pattern_returns_none(self):
        assert R(r"(", r".*").apply("anything") is None

    def test_none_and_empty_text(self):
        r = R(r"(\d+)", r".*")
        assert r.apply(None) is None
        assert r.apply("") is None


class TestValidate:
    def test_anchored_at_start_only(self):
        # re.match semantics: anchored at start, not at end
        assert R(r"x", r"\d{3}").validate("123abc") is True
        assert R(r"x", r"\d{3}").validate("ab123") is False

    def test_none_value_invalid(self):
        assert R(r"x", r".*").validate(None) is False

    def test_empty_valid_iff_regex_allows(self):
        assert R(r"x", r"^$").validate("") is True
        assert R(r"x", r"^\d+$").validate("") is False

    def test_bad_validation_regex_is_false(self):
        assert R(r"x", r"(").validate("v") is False


class TestFieldRules:
    def test_weight_order_first_match_wins(self):
        fr = FieldRules(
            [
                R(r"(\d{2})", r"^\d{2}$", w=1, idx=0, rid=1),
                R(r"(\d+)", r"^\d+$", w=5, idx=1, rid=2),
            ]
        )
        # higher weight tried first despite later creation
        v, rid = fr.try_extract("abc 12345")
        assert (v, rid) == ("12345", 2)

    def test_tie_broken_by_rule_idx(self):
        fr = FieldRules(
            [
                R(r"(\d+)", r"^\d+$", w=3, idx=1, rid=2),
                R(r"(\d{2})", r"^\d{2}$", w=3, idx=0, rid=1),
            ]
        )
        v, rid = fr.try_extract("x 12")
        assert rid == 1

    def test_validation_failure_falls_through(self):
        fr = FieldRules(
            [
                R(r"v:(\w+)", r"^\d+$", w=9, idx=0, rid=1),  # validation rejects
                R(r"v:(\w+)", r"^\w+$", w=1, idx=1, rid=2),
            ]
        )
        v, rid = fr.try_extract("v:abc")
        assert (v, rid) == ("abc", 2)

    def test_total_miss(self):
        fr = FieldRules([R(r"zz(\d)", r"^\d$")])
        assert fr.try_extract("nothing here") == (None, -1)


class TestExtractRow:
    def test_null_sentinel_becomes_none_answer(self):
        # mirrors extract_with_cache (src/pipeline.py:51-57)
        field_rules = {
            "a": FieldRules([R(r"A\s*(\d+)", r"^\d+$", rid=1)]),
            "b": FieldRules([R(r"B\s*()(?=C|$)", r"^$", rid=2)]),
            "c": FieldRules([R(r"zzz(\d)", r"^\d$", rid=3)]),
        }
        ans, success, missing, hits, offsets = extract_row(
            field_rules, "A 7 B C", ["a", "b", "c"]
        )
        assert ans == {"a": "7", "b": None}
        assert success == ["a", "b"]
        assert missing == ["c"]
        assert hits == {"a": 1, "b": 2}

    def test_unknown_field_is_missing(self):
        ans, success, missing, _, _ = extract_row({}, "text", ["f"])
        assert missing == ["f"] and ans == {}
