"""Fingerprinting, span-oracle, and deterministic rule-fit tests."""

from adaptive_pdf_extractor_ray.functions.rulefit import fit_field, fit_template
from adaptive_pdf_extractor_ray.functions.rules import FieldRules, extract_row
from adaptive_pdf_extractor_ray.functions.templates import (
    default_vocab,
    discover_anchors,
    field_label,
    fingerprint_of_labels,
    fingerprint_text,
    find_anchors,
    span_extract,
    UNKNOWN_FINGERPRINT,
)
from adaptive_pdf_extractor_ray.functions.textnorm import normalize_text
from adaptive_pdf_extractor_ray.sources.synthetic import generate_record

VOCAB = default_vocab()


class TestFingerprint:
    def test_stable_and_order_insensitive(self):
        assert fingerprint_of_labels(["B", "A"]) == fingerprint_of_labels(["A", "B", "A"])

    def test_empty_is_unknown(self):
        assert fingerprint_of_labels([]) == UNKNOWN_FINGERPRINT
        assert fingerprint_text("no anchors here", VOCAB) == UNKNOWN_FINGERPRINT

    def test_same_template_same_fingerprint(self):
        texts = [
            normalize_text(generate_record(i, seed=3)["raw_text"]) for i in range(30)
        ]
        labels = [generate_record(i, seed=3)["label"] for i in range(30)]
        fps = {}
        for t, lbl in zip(texts, labels):
            fps.setdefault(lbl, set()).add(fingerprint_text(t, VOCAB))
        for lbl, s in fps.items():
            assert len(s) == 1, (lbl, s)


class TestAnchors:
    def test_longest_label_wins(self):
        t = "Tipo De Sistema Web Sistema LEGADO"
        found = [a.label for a in find_anchors(t, VOCAB)]
        assert found == ["Tipo De Sistema", "Sistema"]

    def test_accent_adjoined_label_found(self):
        # normalization can't split "CearáCategoria" (non-ASCII boundary)
        t = "Subsecao Campinas - CearáCategoria ADVOGADO"
        spans = span_extract(t, VOCAB)
        assert spans["subsecao"] == "Campinas - Ceará"
        assert spans["categoria"] == "ADVOGADO"

    def test_punctuation_adjoined_label(self):
        t = "Categoria SUPLEMENTAR Telefone Profissional(95) 99995-3753"
        spans = span_extract(t, VOCAB)
        assert spans["telefone_profissional"] == "(95) 99995-3753"

    def test_empty_span_is_null(self):
        t = "Nome Inscricao 123456"
        spans = span_extract(t, VOCAB)
        assert spans["nome"] is None
        assert spans["inscricao"] == "123456"


class TestFitField:
    def test_specific_digit_rule_fitted(self):
        exemplars = [
            ("Inscricao 123456 Nome X", "123456"),
            ("Inscricao 12345678 Nome Y", "12345678"),
        ]
        rules = fit_field("inscricao", ["Inscricao", "Nome"], exemplars)
        assert len(rules) == 3  # specific + generic + null
        assert "[0-9]{6,8}" in rules[0].pattern

    def test_null_exemplar_round_trips(self):
        exemplars = [
            ("Nome Inscricao 123456", None),
            ("Nome Ana Lima Inscricao 9999999", "Ana Lima"),
        ]
        rules = fit_field("nome", ["Inscricao", "Nome"], exemplars)
        fr = FieldRules(rules)
        assert fr.try_extract("Nome Inscricao 123456")[0] == ""
        assert fr.try_extract("Nome Ana Lima Inscricao 9999999")[0] == "Ana Lima"

    def test_bad_specific_rule_dropped(self):
        # digit rule would misfire when a value is sometimes non-numeric
        exemplars = [
            ("Inscricao 123456 Nome X", "123456"),
            ("Inscricao A-77 Nome Y", "A-77"),
        ]
        rules = fit_field("inscricao", ["Inscricao", "Nome"], exemplars)
        assert len(rules) == 2  # generic + null only


class TestEndToEndFit:
    def test_fit_then_apply_equals_expected_1000(self):
        docs = []
        for i in range(1000):
            r = generate_record(i, seed=2)
            norm = normalize_text(r["raw_text"])
            docs.append((norm, fingerprint_text(norm, VOCAB), r))
        groups: dict[str, list[str]] = {}
        for norm, fp, _ in docs:
            groups.setdefault(fp, []).append(norm)
        fitted = {fp: fit_template(texts, VOCAB) for fp, texts in groups.items()}
        frs = {
            fp: {f: FieldRules(rs) for f, rs in fm.items()}
            for fp, fm in fitted.items()
        }
        for norm, fp, r in docs:
            ans, _, missing, _, _ = extract_row(frs[fp], norm, list(frs[fp]))
            assert not missing
            want = {
                k: (normalize_text(v) if v is not None else None)
                for k, v in r["expected"].items()
            }
            assert ans == want

    def test_fit_is_deterministic(self):
        texts = [
            normalize_text(generate_record(i, seed=5)["raw_text"]) for i in range(50)
        ]
        a = fit_template(texts, VOCAB)
        b = fit_template(texts, VOCAB)
        assert {f: [(r.pattern, r.validation_regex) for r in rs] for f, rs in a.items()} == {
            f: [(r.pattern, r.validation_regex) for r in rs] for f, rs in b.items()
        }


class TestDiscoverAnchors:
    def test_unknown_template_family(self):
        texts = [
            f"Numero Serie {1000 + i} Modelo X-{i} Fabricante ACME-{i}"
            for i in range(10)
        ]
        anchors = discover_anchors(texts)
        assert "Numero Serie" in anchors
        assert "Modelo" in anchors
        assert "Fabricante" in anchors


class TestSpanFastPathEquivalence:
    """The applier's span fast path must agree with full regex execution
    for every fitted rule on every doc (rules.Rule.kind contract)."""

    def test_span_equals_regex_on_corpus(self):
        from adaptive_pdf_extractor_ray.functions.templates import span_extract_raw

        docs = []
        for i in range(300):
            r = generate_record(i, seed=13, filler_words=40 if i % 4 == 0 else 0)
            docs.append(normalize_text(r["raw_text"]))
        fitted = fit_template(docs, VOCAB, max_exemplars=8)
        labels = [f.replace("_", " ").title() for f in fitted]
        for text in docs:
            spans = span_extract_raw(text, labels)
            for f, rules in fitted.items():
                fr = FieldRules(rules)
                via_regex = fr.try_extract(text)[0]
                via_span = fr.try_extract(text, spans.get(f), True)[0]
                assert via_regex == via_span, (f, text[:80])


class TestParityHelpers:
    def test_fuzz_text_drops_only_spaces(self):
        import random

        from adaptive_pdf_extractor_ray.sources.synthetic import fuzz_text

        rng = random.Random(7)
        out = fuzz_text("a b c d e f g h i j " * 50, rng)
        assert set(out) <= {"a", "b", "c", "d", "e", "f", "g", "h", "i", "j", " "}
        assert len(out) < len("a b c d e f g h i j " * 50)  # some spaces dropped
        assert fuzz_text("", rng) == ""
        # deterministic given the rng state
        assert fuzz_text("x y z", random.Random(1)) == fuzz_text(
            "x y z", random.Random(1)
        )

    def test_keyword_guard_rail(self):
        from adaptive_pdf_extractor_ray.functions.rulefit import (
            validate_no_other_keywords,
        )

        assert validate_no_other_keywords("Ana Lima", ["Inscricao"]) is None
        assert validate_no_other_keywords("", ["Inscricao"]) is None  # null skip
        err = validate_no_other_keywords("foo inscricao bar", ["Inscricao"])
        assert err is not None and "Inscricao" in err


class TestDiscoverFamilies:
    def test_gibberish_yields_nothing(self):
        from adaptive_pdf_extractor_ray.functions.templates import discover_families

        assert discover_families(["lower case only words"] * 10) in ([], None) or \
            discover_families(["lower case only words"] * 10) == []
        assert discover_families([]) == []
        assert discover_families(["Xy"] * 2) == []  # below min_family

    def test_single_family(self):
        from adaptive_pdf_extractor_ray.functions.templates import discover_families

        texts = [f"Campo Nome V{i} Campo Valor W{i}" for i in range(10)]
        fams = discover_families(texts)
        assert len(fams) == 1
        assert "Campo Nome" in fams[0] and "Campo Valor" in fams[0]

    def test_never_crashes_on_mixed_noise(self):
        from adaptive_pdf_extractor_ray.functions.templates import discover_families

        texts = ["", "   ", "A", "Aa Bb Cc " * 50, "ZZZ 123", "ção ãé Í"] * 3
        out = discover_families(texts)
        assert isinstance(out, list)
