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
    assert pages.column_names == ["url", "warc_ts", "html", "text", "lang"]
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
