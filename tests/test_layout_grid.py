"""Layout-grid extraction over the reference's REAL scanned-card PDFs.

The reference has no committed ground truth for these 4 PDFs (its
`data/real/dataset.json` records have no `expected_answer`) — they are
exactly the detached-header layouts it pays an LLM for. The expected
values below are hand-audited from the PDFs' own positional text runs
(`parse_pdf_runs` output; e.g. oab_3 renders the header row
"Inscrição | Seccional | Subseção" at y≈380 with the value row
"101943 | PR | CONSELHO SECCIONAL - PARANÁ" x-aligned at y≈353).
The grid extractor recovers them deterministically — no LLM.
"""

import json
import os

import pytest

REAL = "/root/reference/data/real"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REAL), reason="reference real corpus not present"
)

OAB_LABELS = {
    "nome": "Nome", "inscricao": "Inscricao", "seccional": "Seccional",
    "subsecao": "Subsecao", "categoria": "Categoria",
    "endereco_profissional": "Endereco Profissional",
    "telefone_profissional": "Telefone Profissional", "situacao": "Situacao",
}
OAB_ENUMS = {
    "categoria": ["ADVOGADO", "ADVOGADA", "SUPLEMENTAR", "ESTAGIARIO",
                  "ESTAGIARIA"],
    "situacao": ["Situação Regular", "Situação Irregular"],
}
OAB_3_EXPECTED = {
    "nome": "SON GOKU",
    "inscricao": "101943",
    "seccional": "PR",
    "subsecao": "CONSELHO SECCIONAL - PARANÁ",
    "categoria": "SUPLEMENTAR",
    "situacao": "SITUAÇÃO REGULAR",
    "endereco_profissional": None,  # label present, no value on the card
    "telefone_profissional": None,
}


def _extract(pdf: str, labels, **kw):
    from adaptive_pdf_extractor_ray.functions.layout import grid_extract
    from adaptive_pdf_extractor_ray.sources.pdfio import parse_pdf_runs

    return grid_extract(parse_pdf_runs(open(pdf, "rb").read()), labels, **kw)


class TestOabCard:
    def test_all_eight_fields(self):
        got = _extract(f"{REAL}/oab_3.pdf", OAB_LABELS, enums=OAB_ENUMS,
                       headline_field="nome")
        assert got == OAB_3_EXPECTED


class TestTelaScreens:
    def test_tela3_detail_grid(self):
        """tela_sistema_3: the record-detail grid headers (the synthetic
        tela_sistema template's own fields) with values one line below,
        column-aligned."""
        got = _extract(
            f"{REAL}/tela_sistema_3.pdf",
            {
                "data_base": "Data Base",
                "data_vencimento": "Data Vencimento",
                "quantidade_parcelas": "Qtd. Parcelas",
                "produto": "Produto",
            },
        )
        assert got == {
            "data_base": "04/02/2021",
            "data_vencimento": "25/03/2030",
            "quantidade_parcelas": "96",
            "produto": "REFINANCIAMENTO",
        }

    def test_tela1_table_row_and_inline(self):
        """tela_sistema_1: right-aligned numeric table columns (center
        estimation) plus an inline 'Label: value' run."""
        got = _extract(
            f"{REAL}/tela_sistema_1.pdf",
            {
                "vcto_mais_antigo": "Vcto mais antigo",
                "dias_atraso_sistema": "Dias atraso Sistema",
                "saldo_vencido": "Saldo Vencido",
                "saldo_a_vencer": "Saldo a Vencer",
                "total_geral": "Total Geral",
                "data_referencia": "Data Referência",
            },
        )
        assert got["vcto_mais_antigo"] == "12/10/2025"
        assert got["saldo_vencido"] == "0,00"
        assert got["saldo_a_vencer"] == "76.871,20"
        assert got["total_geral"] == "76.871,20"
        assert got["data_referencia"] == "05/09/2025"  # inline rule


class TestGridStage:
    def test_map_batches_stage_over_real_pdfs(self, ray_session):
        import ray.data as rd

        from adaptive_pdf_extractor_ray.stages.layout_grid import GridPdfExtract

        rows = [
            {"url": "oab_3", "html": open(f"{REAL}/oab_3.pdf", "rb").read()},
            {"url": "bad", "html": b"not a pdf"},
        ]
        out = {
            r["url"]: r
            for r in rd.from_items(rows).map_batches(
                GridPdfExtract,
                fn_constructor_args=(OAB_LABELS, OAB_ENUMS, "nome"),
                batch_format="pyarrow",
                concurrency=1,
            ).take_all()
        }
        assert json.loads(out["oab_3"]["extracted_json"]) == OAB_3_EXPECTED
        assert out["bad"]["extracted_json"] is None
        assert "PdfError" in out["bad"]["error"]


class TestFoldHelper:
    def test_accent_and_colon_folding(self):
        from adaptive_pdf_extractor_ray.functions.layout import fold

        assert fold("Inscrição") == fold("Inscricao") == "inscricao"
        assert fold("Data Referência:") == fold("data referencia")


class TestGridRobustness:
    def test_random_runs_never_crash(self):
        """grid_extract over arbitrary run geometry: total function, no
        exceptions, labeled fields only ever map to run text."""
        import random

        from adaptive_pdf_extractor_ray.functions.layout import grid_extract

        rng = random.Random(13)
        labels = {"a": "Alpha", "b": "Beta Gamma"}
        words = ["Alpha", "Beta Gamma", "x", "1,00", "", "  ", "Álpha",
                 "Alpha:", "value here", "Beta Gamma: inline"]
        for _ in range(200):
            runs = [
                (rng.uniform(-100, 700), rng.uniform(0, 800),
                 rng.choice(words))
                for _ in range(rng.randint(0, 25))
            ]
            out = grid_extract(runs, labels, enums={"a": ["x"]},
                               headline_field="b")
            assert set(out) <= {"a", "b"}
            for v in out.values():
                assert v is None or isinstance(v, str)

    def test_empty_and_single_run(self):
        from adaptive_pdf_extractor_ray.functions.layout import grid_extract

        assert grid_extract([], {"a": "Alpha"}) == {}
        assert grid_extract([(10.0, 10.0, "Alpha")], {"a": "Alpha"}) == {"a": None}


class TestGridPipelineMode:
    def test_extract_pages_grid_mode_on_card_corpus(
        self, ray_session, tmp_path
    ):
        """extract_pages(pdf_layout='grid'): a corpus of detached-header
        card PDFs (labels on one line, values x-aligned a line below —
        invisible to the linear text path) extracts fully in wave 1 with
        no rule fitting, ending in the refit=0 partition."""
        import ray.data as rd

        from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
        from adaptive_pdf_extractor_ray.sources.pdfio import build_pdf_from_runs
        from adaptive_pdf_extractor_ray.sources.synthetic import PAGES_SCHEMA

        import datetime as dt

        import pyarrow as pa

        rows = []
        want = {}
        for i in range(30):
            nome = f"PESSOA {chr(65 + i % 26)}"
            insc = str(700000 + i)
            secc = ["PR", "SP", "RJ"][i % 3]
            # header row at y=700, value row at y=680, x-aligned columns;
            # 'nome' label column has NO value below on every 5th card
            runs = [
                (72, 700, "Nome"), (250, 700, "Inscricao"),
                (420, 700, "Seccional"),
                (250, 680, insc), (420, 680, secc),
            ]
            if i % 5 != 0:
                runs.append((72, 680, nome))
            rows.append({
                "url": f"card://{i}",
                "warc_ts": dt.datetime(2024, 1, 1, 0, 0, i),
                "html": build_pdf_from_runs(runs, compress=(i % 2 == 0)),
                "text": None,
                "lang": "pt",
            })
            want[f"card://{i}"] = {
                "nome": nome if i % 5 != 0 else None,
                "inscricao": insc,
                "seccional": secc,
            }
        pages = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
        res = extract_pages(
            rd.from_arrow(pages), str(tmp_path / "w"), pdf_layout="grid",
            write_answers=False,
        )
        got = {r["url"]: r for r in res["answers"].take_all()}
        assert len(got) == 30
        for url, exp in want.items():
            assert json.loads(got[url]["extracted_json"]) == exp, url
            assert got[url]["n_missing"] == 0
        # grid rows never enter the fit wave
        assert res["rules_fitted"] == 0
        import os as _os

        assert _os.path.isdir(str(tmp_path / "w" / "wave1" / "refit=0"))
        assert not _os.path.isdir(str(tmp_path / "w" / "wave2"))

    def test_linear_mode_unchanged_on_card_corpus(self, ray_session, tmp_path):
        """Sanity: the same card corpus through the DEFAULT linear mode
        does NOT produce the grid answers (the detached-header layout is
        genuinely invisible to the text path) — documenting why the mode
        exists."""
        import datetime as dt

        import pyarrow as pa
        import ray.data as rd

        from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
        from adaptive_pdf_extractor_ray.sources.pdfio import build_pdf_from_runs
        from adaptive_pdf_extractor_ray.sources.synthetic import PAGES_SCHEMA

        runs = [
            (72, 700, "Nome"), (250, 700, "Inscricao"), (420, 700, "Seccional"),
            (72, 680, "PESSOA A"), (250, 680, "700001"), (420, 680, "PR"),
        ]
        pages = pa.Table.from_pylist(
            [{
                "url": "card://x",
                "warc_ts": dt.datetime(2024, 1, 1),
                "html": build_pdf_from_runs(runs),
                "text": None,
                "lang": "pt",
            }],
            schema=PAGES_SCHEMA,
        )
        res = extract_pages(rd.from_arrow(pages), str(tmp_path / "w2"),
                            write_answers=False)
        (row,) = res["answers"].take_all()
        got = json.loads(row["extracted_json"] or "{}")
        assert got.get("inscricao") != "700001"  # linear path can't see it
