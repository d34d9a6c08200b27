"""Unknown template family: no registered anchors -> fingerprint 'unk' ->
anchor discovery inside the fit stage -> rules fitted -> extraction works
with zero code/registry changes (the data-driven extension surface)."""

import json

import pyarrow as pa

from adaptive_pdf_extractor_ray.sources.synthetic import PAGES_SCHEMA


def _pages(n: int) -> pa.Table:
    rows = []
    for i in range(n):
        rows.append(
            f"Numero Serie\n{1000 + i}\nModelo\nXR-{i % 7}\nFabricante\nACME-{i % 3}"
        )
    return pa.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "warc_ts": pa.array([None] * n, pa.timestamp("us")),
            "html": pa.array([None] * n, pa.binary()),
            "text": rows,
            "lang": ["pt"] * n,
        },
        schema=PAGES_SCHEMA,
    )


def test_unknown_template_discovered_and_extracted(tmp_path, ray_session):
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages

    res = extract_pages(
        rd.from_arrow(_pages(40)), str(tmp_path / "w"), write_answers=False
    )
    out = res["answers"].take_all()
    assert len(out) == 40
    ok = 0
    for r in out:
        ans = json.loads(r["extracted_json"] or "{}")
        if (
            ans.get("numero_serie", "").isdigit()
            and ans.get("modelo", "").startswith("XR-")
            and ans.get("fabricante", "").startswith("ACME-")
        ):
            ok += 1
    # discovery-driven extraction must cover the corpus
    assert ok == 40, f"only {ok}/40 extracted: {out[0]}"
