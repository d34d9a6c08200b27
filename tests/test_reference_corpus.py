"""The reference's own real PDF corpus (read-only) through this engine.

The north star measures parity against the reference's golden PDF corpus;
these tests assert our from-scratch content-stream parser extracts real,
readable text from every one of those PDFs and that the full pipeline
ingests the reference's dataset.json unchanged.
"""

import glob
import os

import pytest

REAL_DIR = "/root/reference/data/real"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REAL_DIR), reason="reference corpus not present"
)


class TestRealPdfs:
    def test_all_real_pdfs_parse_to_readable_text(self):
        from adaptive_pdf_extractor_ray.sources.pdfio import parse_pdf_text

        pdfs = sorted(glob.glob(f"{REAL_DIR}/*.pdf"))
        assert len(pdfs) >= 6
        for f in pdfs:
            out = parse_pdf_text(open(f, "rb").read())
            assert len(out) > 100, f
            printable = sum(c.isprintable() or c.isspace() for c in out)
            assert printable / len(out) > 0.9, f

    def test_known_content_present(self):
        from adaptive_pdf_extractor_ray.sources.pdfio import parse_pdf_text

        oab = parse_pdf_text(open(f"{REAL_DIR}/oab_3.pdf", "rb").read())
        # field labels from the reference's own schema are in the layout
        for needle in ("Seccional", "Inscrição", "Subseção"):
            assert needle in oab
        tela = parse_pdf_text(open(f"{REAL_DIR}/tela_sistema_1.pdf", "rb").read())
        assert "Consulta de Cobrança" in tela

    def test_reference_dataset_ingests_end_to_end(self, ray_session, tmp_path):
        import ray.data as rd

        from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
        from adaptive_pdf_extractor_ray.sources.readers import (
            read_reference_dataset,
        )

        pages, meta = read_reference_dataset(f"{REAL_DIR}/dataset.json")
        res = extract_pages(
            rd.from_arrow(pages), str(tmp_path / "w"), write_answers=False
        )
        rows = res["answers"].take_all()
        assert len(rows) == pages.num_rows
        # every real PDF parsed (no parser errors on the golden corpus)
        assert all(r["error"] is None for r in rows), [
            r["error"] for r in rows if r["error"]
        ]
        assert all(r["text_norm"] for r in rows)
