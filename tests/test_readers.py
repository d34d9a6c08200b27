"""Reference-format JSON ingest -> canonical pages table -> pipeline."""

import json

from adaptive_pdf_extractor_ray.sources.pdfio import build_pdf
from adaptive_pdf_extractor_ray.sources.readers import read_reference_dataset


def _write_fixture(tmp_path):
    # reference layout: label + extraction_schema + pdf_text / pdf_path
    # (+ expected_answer), per /root/reference/src/data.py:103-168
    pdf = tmp_path / "doc0.pdf"
    pdf.write_bytes(build_pdf("Nome\nZeca Dias\nInscricao 445566"))
    records = [
        {
            "label": "carteira_oab",
            "extraction_schema": {"nome": "nome", "inscricao": "num"},
            "pdf_text": "Nome Ana Lima Inscricao 123456",
            "expected_answer": {"nome": "Ana Lima", "inscricao": "123456"},
        },
        {
            "label": "carteira_oab",
            "extraction_schema": {"nome": "nome", "inscricao": "num"},
            "pdf_path": "doc0.pdf",
        },
    ]
    p = tmp_path / "dataset.json"
    p.write_text(json.dumps(records, ensure_ascii=False))
    return str(p)


def test_reader_builds_canonical_pages(tmp_path):
    path = _write_fixture(tmp_path)
    pages, meta = read_reference_dataset(path)
    assert pages.num_rows == 2
    assert pages.column_names == [
        "url", "warc_ts", "html", "text", "lang", "schema_fields"
    ]
    assert pages["schema_fields"][0].as_py() == ["inscricao", "nome"]
    assert pages["text"][0].as_py().startswith("Nome Ana")
    assert bytes(pages["html"][1].as_py())[:5] == b"%PDF-"
    assert json.loads(meta["expected_json"][0].as_py())["nome"] == "Ana Lima"
    assert meta["expected_json"][1].as_py() is None


def test_reader_rows_extract_end_to_end(tmp_path, ray_session):
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages

    path = _write_fixture(tmp_path)
    pages, _ = read_reference_dataset(path)
    res = extract_pages(
        rd.from_arrow(pages), str(tmp_path / "work"), write_answers=False
    )
    out = {r["url"]: r for r in res["answers"].take_all()}
    a0 = json.loads(out["ref://dataset/0"]["extracted_json"])
    assert a0 == {"nome": "Ana Lima", "inscricao": "123456"}
    a1 = json.loads(out["ref://dataset/1"]["extracted_json"])
    assert a1 == {"nome": "Zeca Dias", "inscricao": "445566"}


def test_json5_tolerant_ingest(tmp_path):
    """Reference datasets load with json5 (src/data.py:103-121): comments
    and trailing commas must ingest."""
    p = tmp_path / "ds.json"
    p.write_text(
        """
        // dataset with json5-isms
        [
          {
            "label": "carteira_oab", /* block comment */
            "extraction_schema": {"nome": "nome",},
            "pdf_text": "Nome Ana // not a comment inside a string",
            "expected_answer": {"nome": "Ana"},
          },
        ]
        """
    )
    pages, meta = read_reference_dataset(str(p))
    assert pages.num_rows == 1
    assert "// not a comment" in pages["text"][0].as_py()
    assert json.loads(meta["expected_json"][0].as_py()) == {"nome": "Ana"}


def test_schema_only_field_extracts(tmp_path, ray_session):
    """A record whose extraction_schema names a field absent from the
    template registry (label present in the text) must still extract —
    the schema, not the registry, defines the target set
    (reference src/data.py:157-168, prompt instruction 2 src/llm.py:40-47).
    Also: a text anchor NOT in the schema must not be extracted."""
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
    from adaptive_pdf_extractor_ray.sources.readers import schema_vocab

    records = []
    for i in range(12):
        records.append(
            {
                "label": "registro_interno",
                "extraction_schema": {
                    "matricula_interna": "registry-unknown field",
                    "nome": "name",
                },
                # 'Situacao' anchors in the text but is NOT in the schema
                "pdf_text": (
                    f"Matricula Interna {700000 + i}\n"
                    f"Nome Pessoa {chr(65 + i)} Silva\n"
                    f"Situacao Situação Regular"
                ),
                "expected_answer": {
                    "matricula_interna": str(700000 + i),
                    "nome": f"Pessoa {chr(65 + i)} Silva",
                },
            }
        )
    p = tmp_path / "ds.json"
    p.write_text(json.dumps(records, ensure_ascii=False))
    pages, meta = read_reference_dataset(str(p))
    res = extract_pages(
        rd.from_arrow(pages), str(tmp_path / "work"), write_answers=False,
        vocab=schema_vocab(meta),
    )
    rows = {r["url"]: r for r in res["answers"].take_all()}
    assert len(rows) == 12
    for i in range(12):
        got = json.loads(rows[f"ref://ds/{i}"]["extracted_json"])
        assert got.get("matricula_interna") == str(700000 + i)
        assert got.get("nome") == f"Pessoa {chr(65 + i)} Silva"
        assert "situacao" not in got  # schema restricts discovered anchors


class TestHtmlScannerParity:
    """The fast tag scanner must extract byte-identically to the stdlib
    HTMLParser path on any input (the scanner is the product; the stdlib
    path is the robustness reference)."""

    def test_built_pages_roundtrip(self):
        import random

        from adaptive_pdf_extractor_ray.sources.htmlio import (
            build_page, extract_main_text, extract_main_text_reference)

        rng = random.Random(7)
        words = ["alpha", "b&w", "<x>", 'q"t', "fin", "épsilon", "a'b"]
        for i in range(200):
            text = " ".join(rng.choices(words, k=rng.randint(1, 150)))
            page = build_page(text, title=f"t{i}")
            assert extract_main_text(page) == text
            assert extract_main_text_reference(page) == text

    def test_gnarly_html_parity(self):
        from adaptive_pdf_extractor_ray.sources.htmlio import (
            extract_main_text, extract_main_text_reference)

        cases = [
            "<div>a <b>b</b> c</div><script>var x='</div>';</script><p>t</p>",
            "<!-- comment with <div> inside --><p>hello &amp; bye</p>",
            "<p>unclosed <div>nested <a href='x>y'>link text longer</a></p>",
            "<br><br>l1<br>l2<ul><li>item &#65; one</li></ul>",
            "a < b but > c <p>real</p>",
            "<style>p{}</style><P>UPPER</P><img src='x'/><p>after</p>",
            "<td>c</td><noscript><p>hidden</p></noscript><td>c2</td>",
            "<div/>self closing<div>x</div>",
            "<p>entity &notareal; test &#x41; end</p>",
            "<script>never closed...",
            "<![CDATA[ raw <p>stuff</p> ]]><p>visible</p>",
            "",
            "plain text only",
        ]
        for c in cases:
            assert extract_main_text(c) == extract_main_text_reference(c), c

    def test_hypothesis_parity(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from adaptive_pdf_extractor_ray.sources.htmlio import (
            extract_main_text, extract_main_text_reference)

        frag = st.sampled_from([
            "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
            "<br>", "<nav>", "</nav>", "<script>", "</script>",
            "<!--c-->", "word", "two words", "&amp;", "&#65;", " ",
            "<td>", "</td>", "<article>", "</article>", "longer run of text",
        ])

        @settings(max_examples=150, deadline=None)
        @given(st.lists(frag, min_size=0, max_size=40))
        def check(parts):
            doc = "".join(parts)
            assert extract_main_text(doc) == extract_main_text_reference(doc)

        check()
