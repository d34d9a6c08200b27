"""Scale-shaped robustness: head-template skew, oversized documents,
value-length gating — the SURVEY §4 failure modes at test scale."""

import json

import pyarrow as pa

from adaptive_pdf_extractor_ray.sources.synthetic import (
    PAGES_SCHEMA,
    generate_record,
)
from adaptive_pdf_extractor_ray.functions.textnorm import normalize_text


def _pages_from_records(recs) -> pa.Table:
    return pa.table(
        {
            "url": [r["url"] for r in recs],
            "warc_ts": pa.array([r["warc_ts"] for r in recs], pa.timestamp("us")),
            "html": pa.array([None] * len(recs), pa.binary()),
            "text": [r["raw_text"] for r in recs],
            "lang": ["pt"] * len(recs),
        },
        schema=PAGES_SCHEMA,
    )


class TestHeadTemplateSkew:
    def test_one_template_dominates(self, tmp_path, ray_session):
        """95% of rows from one fingerprint must not break fit or apply —
        exemplar sampling caps the shuffle regardless of skew."""
        import ray.data as rd

        from adaptive_pdf_extractor_ray.pipelines.extract import (
            evaluate_accuracy,
            extract_pages,
        )

        recs = [
            generate_record(i, seed=21, tela_ratio=0.05) for i in range(400)
        ]
        res = extract_pages(
            rd.from_arrow(_pages_from_records(recs)),
            str(tmp_path / "w"),
            write_answers=False,
        )
        out = res["answers"].take_all()
        assert len(out) == 400
        n_miss = sum(1 for r in out if r["n_missing"] != 0)
        assert n_miss == 0
        # spot-check correctness on the dominant template
        by_url = {r["url"]: r for r in out}
        for rec in recs[:50]:
            want = {
                k: (normalize_text(v) if v is not None else None)
                for k, v in rec["expected"].items()
            }
            got = json.loads(by_url[rec["url"]]["extracted_json"])
            assert got == want


class TestOversizedDocs:
    def test_multi_mb_doc_flows_through(self, tmp_path, ray_session):
        """A multi-MB text row must not fail the task; fields whose values
        blow the validation length cap degrade to missing, other fields
        still extract (row-level isolation)."""
        import ray.data as rd

        from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages

        huge_value = "palavra " * 300_000  # ~2.4 MB inside one field value
        text = (
            f"Nome\nAna Lima\nInscricao\n123456\nEndereco Profissional\n"
            f"{huge_value}\nSituacao\nSituação Regular"
        )
        normal = generate_record(1, seed=30, tela_ratio=0.0)
        pages = pa.table(
            {
                "url": ["huge", "normal"],
                "warc_ts": pa.array([None, None], pa.timestamp("us")),
                "html": pa.array([None, None], pa.binary()),
                "text": [text, normal["raw_text"]],
                "lang": ["pt", "pt"],
            },
            schema=PAGES_SCHEMA,
        )
        res = extract_pages(
            rd.from_arrow(pages), str(tmp_path / "w"), write_answers=False
        )
        out = {r["url"]: r for r in res["answers"].take_all()}
        assert out["huge"]["error"] is None
        ans = json.loads(out["huge"]["extracted_json"] or "{}")
        assert ans.get("nome") == "Ana Lima"
        assert ans.get("inscricao") == "123456"
        # the oversized value exceeds the 8000-char validation cap:
        # degrades to missing, never to a wrong answer
        assert "endereco_profissional" not in ans or ans[
            "endereco_profissional"
        ] is None or len(ans["endereco_profissional"]) <= 8000
