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


def test_two_unknown_families_separate(tmp_path, ray_session):
    """Two distinct unregistered template families in one corpus must get
    their own (refined) fingerprints and rules, not a shared 'unk'."""
    import pyarrow as pa
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
    from adaptive_pdf_extractor_ray.state.rulestore import RuleStore

    rows, urls = [], []
    for i in range(30):
        rows.append(f"Numero Serie\n{1000 + i}\nModelo\nXR-{i % 7}")
        urls.append(f"a{i}")
    for i in range(30):
        rows.append(f"Placa Veiculo\nABC-{1000 + i}\nProprietario\nDONO-{i % 5}")
        urls.append(f"b{i}")
    pages = pa.table(
        {
            "url": urls,
            "warc_ts": pa.array([None] * 60, pa.timestamp("us")),
            "html": pa.array([None] * 60, pa.binary()),
            "text": rows,
            "lang": ["pt"] * 60,
        },
        schema=PAGES_SCHEMA,
    )
    res = extract_pages(
        rd.from_arrow(pages), str(tmp_path / "w2"), write_answers=False
    )
    out = {r["url"]: r for r in res["answers"].take_all()}
    store = RuleStore.load(res["store_path"])
    fps = store.fingerprints()
    assert len(fps) >= 2 and "unk" not in fps, fps
    a = json.loads(out["a0"]["extracted_json"])
    b = json.loads(out["b0"]["extracted_json"])
    assert a.get("numero_serie") == "1000" and a.get("modelo") == "XR-0"
    assert b.get("placa_veiculo") == "ABC-1000"
    assert b.get("proprietario") == "DONO-0"
    # refined fingerprints stamped on the rows themselves
    assert out["a0"]["fingerprint"] != out["b0"]["fingerprint"]
    assert out["a0"]["fingerprint"] != "unk"


def test_discovered_family_warm_start(tmp_path, ray_session):
    """Run 2 with the run-1 store must fingerprint a discovered family
    correctly from wave 1 (store labels extend the vocabulary): zero
    misses, zero new rules."""
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages

    res1 = extract_pages(
        rd.from_arrow(_pages(30)), str(tmp_path / "w1"), write_answers=False
    )
    assert res1["rules_fitted"] > 0
    # new docs of the same family, warm store
    res2 = extract_pages(
        rd.from_arrow(_pages(40)), str(tmp_path / "w2"),
        store_path=res1["store_path"], write_answers=False,
    )
    assert res2["rules_fitted"] == 0
    rows = res2["answers"].take_all()
    assert all(r["n_missing"] == 0 for r in rows)
    assert all(r["fingerprint"] != "unk" for r in rows)


def test_eight_unknown_families_one_wave(tmp_path, ray_session):
    """Greedy family peeling must separate many novel families arriving
    in a single corpus, despite recurring value phrases."""
    import random

    import pyarrow as pa
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
    from adaptive_pdf_extractor_ray.state.rulestore import RuleStore

    rng = random.Random(5)
    fams = {
        f"fam{k}": [f"Campo {chr(65+k)}{j}".replace(chr(65+k)+"0", chr(65+k)) or f"Campo{k}{j}"
                    for j in range(3)]
        for k in range(8)
    }
    # simpler deterministic label sets: 8 families × 3 distinct labels
    fams = {
        k: [f"{name} Um", f"{name} Dois", f"{name} Tres"]
        for k, name in enumerate(
            ["Alpha", "Bravo", "Carta", "Delta", "Eco", "Fox", "Golfe", "Hotel"]
        )
    }
    rows, urls, truth = [], [], []
    i = 0
    for k, labels in fams.items():
        for d in range(12):
            vals = [f"V{k}-{d}-{j}" for j in range(3)]
            # recurring value phrase in ~half the docs (the trap)
            if d % 2 == 0:
                vals[1] = "Situacao Regular Aqui"
            parts = []
            for lab, v in zip(labels, vals):
                parts.append(f"{lab}\n{v}")
            rows.append("\n".join(parts))
            urls.append(f"u{i}")
            truth.append((k, dict(zip(labels, vals))))
            i += 1
    order = list(range(len(rows)))
    rng.shuffle(order)
    pages = pa.table(
        {
            "url": [urls[j] for j in order],
            "warc_ts": pa.array([None] * len(order), pa.timestamp("us")),
            "html": pa.array([None] * len(order), pa.binary()),
            "text": [rows[j] for j in order],
            "lang": ["pt"] * len(order),
        },
        schema=PAGES_SCHEMA,
    )
    res = extract_pages(
        rd.from_arrow(pages), str(tmp_path / "w8"), write_answers=False
    )
    store = RuleStore.load(res["store_path"])
    assert len(store.fingerprints()) >= 8, store.fingerprints()
    out = {r["url"]: r for r in res["answers"].take_all()}
    full = sum(1 for r in out.values() if r["n_missing"] == 0)
    assert full >= int(0.9 * len(out)), f"{full}/{len(out)} fully extracted"
    # no value phrase promoted to an anchor: 'Situacao Regular Aqui' must
    # appear as a VALUE somewhere, not as a field name
    for r in out.values():
        ans = json.loads(r["extracted_json"] or "{}")
        assert "situacao_regular_aqui" not in ans
