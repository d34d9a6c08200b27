"""Deterministic synthetic Common-Crawl-style page corpus.

Mirrors the reference's synthetic-data protocol
(``/root/reference/scripts/generate_fake_data.py:204-288``) with a
self-contained seeded generator (no Faker): per field 70% present / 30%
omitted (label emitted, value NULL), labels rendered
``field.replace("_"," ").title()``, separators drawn from the 8:2:6:2:2
newline/nothing/space/triple-space/tab pool, 33% of rows with shuffled
field order. Unlike the reference script (one global ``random.seed``),
every row derives its own RNG from ``(seed, index)``, so generation is
order-free and shards cleanly across Ray tasks at any scale.

Each record becomes one row of the ``pages`` table mandated by
``BASELINE.json input_hint``::

    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

round-robined across the three ingest modes: pre-extracted ``text``
(reference ``pdf_text`` path), HTML bytes (boilerplate-wrapped), PDF bytes
(``%PDF-`` magic). A parallel ``expected`` table carries ground truth
(template label, per-field expected values as JSON, normalized text).
"""

from __future__ import annotations

import datetime as _dt
import json
import random

import pyarrow as pa

from ..functions.templates import TEMPLATE_FIELDS, field_label
from ..functions.textnorm import normalize_text
from .htmlio import build_page
from .pdfio import build_pdf

_FIRST = [
    "Ana", "Bruno", "Carla", "Diego", "Elisa", "Fábio", "Gabriela", "Heitor",
    "Iara", "João", "Karina", "Lucas", "Mariana", "Nelson", "Otávia", "Paulo",
    "Queila", "Rafael", "Sofia", "Tiago", "Úrsula", "Valter", "Wanda", "Xavier",
]
_SUR = [
    "Almeida", "Barbosa", "Cardoso", "Dias", "Esteves", "Ferreira", "Gomes",
    "Henriques", "Ibrahim", "Junqueira", "Kfouri", "Lima", "Moraes", "Nogueira",
    "Oliveira", "Pereira", "Queiroz", "Ribeiro", "Santos", "Teixeira",
]
_STATES = ["SP", "RJ", "MG", "BA", "PR", "RS", "PE", "CE", "PA", "SC", "GO", "DF"]
_STATE_NAMES = {
    "SP": "São Paulo", "RJ": "Rio de Janeiro", "MG": "Minas Gerais",
    "BA": "Bahia", "PR": "Paraná", "RS": "Rio Grande do Sul",
    "PE": "Pernambuco", "CE": "Ceará", "PA": "Pará", "SC": "Santa Catarina",
    "GO": "Goiás", "DF": "Distrito Federal",
}
_CITIES = [
    "Campinas", "Santos", "Niterói", "Uberlândia", "Feira de Santana",
    "Londrina", "Caxias do Sul", "Olinda", "Sobral", "Blumenau", "Anápolis",
    "Petrópolis", "Sorocaba", "Juiz de Fora", "Maringá",
]
_STREETS = ["Rua das Flores", "Avenida Brasil", "Rua XV de Novembro",
            "Alameda Santos", "Travessa da Paz", "Rua do Comércio"]
_BAIRROS = ["Centro", "Jardim América", "Vila Nova", "Boa Vista", "Santa Cecília"]
_CATEGORIES = ["ADVOGADO", "ADVOGADA", "SUPLEMENTAR", "ESTAGIARIO"]
_SITUACOES = ["Situação Regular", "Situação Irregular"]
_PRODUTOS = ["Crédito Pessoal", "Financiamento Imobiliário", "Cartão Corporativo",
             "Capital de Giro", "Consórcio Auto"]
_SISTEMAS = ["SICRED", "COBRANCA", "SIAPE", "LEGADO", "PORTAL"]
_TIPOS_OP = ["Contratação", "Renegociação", "Liquidação", "Amortização"]
_TIPOS_SIS = ["Interno", "Externo", "Mainframe", "Web"]

SEPARATORS = ["\n"] * 8 + [""] * 2 + [" "] * 6 + ["   "] * 2 + ["\t"] * 2


def fuzz_text(text: str, rng: random.Random) -> str:
    """OCR-noise simulator — ``fuzz_text`` parity
    (``/root/reference/scripts/generate_fake_data.py:159-196``): each space
    is dropped with 10% probability; the reference's char-substitution map
    exists but is unused there, so it is omitted here too. The reference
    generator defines this but feeds values through un-fuzzed
    (``fuzzed_value = value``, `:244`); callers opt in explicitly."""
    if not text:
        return text
    return "".join(
        c for c in str(text) if not (c == " " and rng.random() < 0.1)
    )

EPOCH = _dt.datetime(2024, 1, 1)

# filler vocabulary for realistic page weights (lowercase — can never be
# mistaken for a Title-Case anchor label)
_FILLER = (
    "processo registro documento conforme artigo paragrafo inciso alinea "
    "protocolo vigente emitido pela autoridade competente nos termos da "
    "legislacao aplicavel para os devidos fins de direito sem rasuras"
).split()


def _gen_carteira(rng: random.Random) -> dict[str, str]:
    nome = f"{rng.choice(_FIRST)} {rng.choice(_SUR)} {rng.choice(_SUR)}"
    st = rng.choice(_STATES)
    city = rng.choice(_CITIES)
    return {
        "nome": nome,
        "inscricao": str(rng.randint(10**5, 10**10 - 1)),
        "seccional": st,
        "subsecao": f"{city} - {_STATE_NAMES[st]}",
        "categoria": rng.choice(_CATEGORIES),
        "endereco_profissional": (
            f"{rng.choice(_STREETS)}, {rng.randint(1, 2999)}, "
            f"{rng.choice(_BAIRROS)}, {city} - {st}"
        ),
        "telefone_profissional": (
            f"({rng.randint(11, 99)}) 9{rng.randint(1000, 9999)}-{rng.randint(1000, 9999)}"
        ),
        "situacao": rng.choice(_SITUACOES),
    }


def _gen_tela(rng: random.Random) -> dict[str, str]:
    d1 = EPOCH + _dt.timedelta(days=rng.randint(0, 600))
    d2 = d1 + _dt.timedelta(days=rng.randint(30, 720))
    return {
        "data_base": d1.strftime("%d/%m/%Y"),
        "data_vencimento": d2.strftime("%d/%m/%Y"),
        "quantidade_parcelas": str(rng.randint(1, 96)),
        "produto": rng.choice(_PRODUTOS),
        "sistema": rng.choice(_SISTEMAS),
        "tipo_de_operacao": rng.choice(_TIPOS_OP),
        "tipo_de_sistema": rng.choice(_TIPOS_SIS),
    }


_CANON = {"carteira_oab": _gen_carteira, "tela_sistema": _gen_tela}


def generate_record(
    i: int, seed: int = 1, tela_ratio: float = 0.25, filler_words: int = 0
) -> dict:
    """One deterministic synthetic record (pure function of (i, seed)).

    Returns keys: url, warc_ts, html, text, lang, label, expected (dict),
    raw_text, mode. Protocol per ``generate_sample``
    (``scripts/generate_fake_data.py:204-288``): 70/30 present/omitted,
    labels always rendered, random separator pool, 33% chunk shuffle.
    """
    rng = random.Random((seed << 32) ^ (i * 2654435761 % (1 << 61)))
    label = "tela_sistema" if rng.random() < tela_ratio else "carteira_oab"
    canonical = _CANON[label](rng)
    fields = TEMPLATE_FIELDS[label]
    if filler_words:
        # pad one free-text field so page weight approximates real web pages
        pad_field = "endereco_profissional" if label == "carteira_oab" else "produto"
        pad = " ".join(rng.choices(_FILLER, k=filler_words))
        canonical[pad_field] = f"{canonical[pad_field]} {pad}"

    chunks: list[tuple[str, str | None]] = []
    expected: dict[str, str | None] = {}
    for f in fields:
        state = rng.choice(["correct"] * 7 + ["omitted"] * 3)
        if state == "omitted":
            expected[f] = None
            chunks.append((field_label(f), None))
        else:
            expected[f] = canonical[f]
            chunks.append((field_label(f), canonical[f]))
    if rng.random() < 0.33:
        rng.shuffle(chunks)

    text = ""
    for lab, value in chunks:
        text += lab
        text += rng.choice(SEPARATORS)
        if value is not None:
            text += value

    mode = ("text", "html", "pdf")[i % 3]
    url = f"https://fixture.test/{label}/{seed}/{i}"
    row: dict = {
        "url": url,
        "warc_ts": EPOCH + _dt.timedelta(seconds=i),
        "html": None,
        "text": None,
        "lang": "pt",
        "label": label,
        "expected": expected,
        "raw_text": text,
        "mode": mode,
    }
    if mode == "text":
        row["text"] = text
    elif mode == "html":
        row["html"] = build_page(text, title=f"{label} {i}")
    else:
        row["html"] = build_pdf(text, compress=(i % 6 == 5))
    return row


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

EXPECTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("label", pa.string()),
        ("expected_json", pa.string()),       # raw generator values
        ("expected_norm_json", pa.string()),  # values after normalize_text
        ("expected_text", pa.string()),       # full normalized document text
    ]
)


def build_tables(
    n: int, seed: int = 1, start: int = 0, tela_ratio: float = 0.25,
    filler_words: int = 0,
) -> tuple[pa.Table, pa.Table]:
    """Build (pages, expected) Arrow tables for rows [start, start+n)."""
    recs = [
        generate_record(i, seed, tela_ratio, filler_words)
        for i in range(start, start + n)
    ]
    pages = pa.table(
        {
            "url": [r["url"] for r in recs],
            "warc_ts": pa.array([r["warc_ts"] for r in recs], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in recs], pa.binary()),
            "text": [r["text"] for r in recs],
            "lang": [r["lang"] for r in recs],
        },
        schema=PAGES_SCHEMA,
    )
    expected = pa.table(
        {
            "url": [r["url"] for r in recs],
            "label": [r["label"] for r in recs],
            "expected_json": [
                json.dumps(r["expected"], ensure_ascii=False, sort_keys=True)
                for r in recs
            ],
            "expected_norm_json": [
                json.dumps(
                    {
                        k: (normalize_text(v) if v is not None else None)
                        for k, v in r["expected"].items()
                    },
                    ensure_ascii=False,
                    sort_keys=True,
                )
                for r in recs
            ],
            "expected_text": [normalize_text(r["raw_text"]) for r in recs],
        },
        schema=EXPECTED_SCHEMA,
    )
    return pages, expected


def _write_shard(pages_dir: str, exp_dir: str, shard: int, start: int,
                 cnt: int, seed: int, tela_ratio: float,
                 filler_words: int) -> None:
    import os

    import pyarrow.parquet as pq

    pages, expected = build_tables(cnt, seed=seed, start=start,
                                   tela_ratio=tela_ratio,
                                   filler_words=filler_words)
    pq.write_table(pages, os.path.join(pages_dir, f"part-{shard:05d}.parquet"))
    pq.write_table(expected, os.path.join(exp_dir, f"part-{shard:05d}.parquet"))


def write_corpus(
    out_dir: str, n: int, seed: int = 1, shard_rows: int = 10_000,
    tela_ratio: float = 0.25, filler_words: int = 0,
) -> tuple[str, str]:
    """Write a sharded pages+expected corpus under ``out_dir``; idempotent.

    One parquet file per ``shard_rows`` rows so reads parallelize; a
    ``_manifest.json`` records the parameters so repeat calls are no-ops.
    Generation is order-free per row, so shards build as parallel Ray
    tasks when a Ray session is available.
    """
    import os

    pages_dir = os.path.join(out_dir, "pages")
    exp_dir = os.path.join(out_dir, "expected")
    manifest = os.path.join(out_dir, "_manifest.json")
    want = {"n": n, "seed": seed, "shard_rows": shard_rows,
            "tela_ratio": tela_ratio, "filler_words": filler_words}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return pages_dir, exp_dir
    # parameter set changed (or manifest missing): clear any previous
    # corpus first — a smaller regeneration must not leave stale
    # part-*.parquet shards to be read alongside the new ones
    import shutil

    for d in (pages_dir, exp_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    if os.path.exists(manifest):
        os.remove(manifest)
    os.makedirs(pages_dir, exist_ok=True)
    os.makedirs(exp_dir, exist_ok=True)
    shards = [
        (shard, start, min(shard_rows, n - start))
        for shard, start in enumerate(range(0, n, shard_rows))
    ]
    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(shards) > 1
    except ImportError:  # pragma: no cover
        pass
    if use_ray:
        import ray

        task = ray.remote(_write_shard)
        ray.get([
            task.remote(pages_dir, exp_dir, sh, st, c, seed, tela_ratio,
                        filler_words)
            for sh, st, c in shards
        ])
    else:
        for sh, st, c in shards:
            _write_shard(pages_dir, exp_dir, sh, st, c, seed, tela_ratio,
                         filler_words)
    with open(manifest, "w") as f:
        json.dump(want, f)
    return pages_dir, exp_dir


def write_card_corpus(out_dir: str, n: int, seed: int = 1) -> tuple[str, str]:
    """Deterministic corpus of DETACHED-HEADER card PDFs (labels on one
    line, values x-aligned a line below — the real-corpus layout the
    linear text path cannot see) plus its ground-truth table. Fixture
    for the grid-extraction driver gate; idempotent like write_corpus."""
    import os

    import pyarrow.parquet as pq

    from .pdfio import build_pdf_from_runs

    pages_dir = os.path.join(out_dir, "pages")
    exp_dir = os.path.join(out_dir, "expected")
    manifest = os.path.join(out_dir, "_manifest.json")
    want = {"kind": "card", "n": n, "seed": seed}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return pages_dir, exp_dir
    import shutil

    for d in (pages_dir, exp_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    os.makedirs(pages_dir, exist_ok=True)
    os.makedirs(exp_dir, exist_ok=True)

    urls, htmls, exp_json = [], [], []
    for i in range(n):
        rng = random.Random((seed << 32) ^ (i * 2654435761 % (1 << 61)))
        nome = f"{rng.choice(_FIRST)} {rng.choice(_SUR)}"
        insc = str(rng.randint(10**5, 10**9))
        secc = rng.choice(_STATES)
        # header row / value row; every 5th card omits the nome value
        runs = [
            (72.0, 700.0, "Nome"), (250.0, 700.0, "Inscricao"),
            (420.0, 700.0, "Seccional"),
            (250.0, 680.0, insc), (420.0, 680.0, secc),
        ]
        expected = {"inscricao": insc, "nome": None, "seccional": secc}
        if i % 5 != 0:
            runs.append((72.0, 680.0, nome))
            expected["nome"] = nome
        urls.append(f"card://{seed}/{i}")
        htmls.append(build_pdf_from_runs(runs, compress=(i % 2 == 0)))
        exp_json.append(
            json.dumps(expected, ensure_ascii=False, sort_keys=True)
        )

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [EPOCH + _dt.timedelta(seconds=i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([None] * n, pa.string()),
            "lang": pa.array(["pt"] * n, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    expected_t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "expected_json": pa.array(exp_json, pa.string()),
        }
    )
    pq.write_table(pages, os.path.join(pages_dir, "part-00000.parquet"))
    pq.write_table(expected_t, os.path.join(exp_dir, "part-00000.parquet"))
    with open(manifest, "w") as f:
        json.dump(want, f)
    return pages_dir, exp_dir


def write_recrawl_corpus(out_dir: str, n_urls: int = 150, seed: int = 1) -> str:
    """Deterministic re-crawl corpus for the snapshot-dedup operator:
    each of ``n_urls`` pages is crawled 1 + (i % 3) times with strictly
    increasing, per-url-unique ``warc_ts`` and revision-stamped text —
    the Common-Crawl shape where the same url appears in many WARC
    segments and curation must keep only the freshest capture. Pure
    arithmetic on (i, r, seed): no RNG state, byte-identical across
    processes. Idempotent (manifest-keyed). Returns the pages dir."""
    import os

    import pyarrow.parquet as pq

    pages_dir = os.path.join(out_dir, "pages")
    manifest = os.path.join(out_dir, "_manifest.json")
    want = {"kind": "recrawl", "n_urls": n_urls, "seed": seed, "v": 1}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return pages_dir
    import shutil

    if os.path.isdir(pages_dir):
        shutil.rmtree(pages_dir)
    os.makedirs(pages_dir, exist_ok=True)

    urls, tss, htmls, texts = [], [], [], []
    for i in range(n_urls):
        url = f"https://crawl{i % 11}.example/doc{i}"
        for r in range(1 + i % 3):
            body = (
                f"revision {r} of document {i}: "
                + " ".join(
                    f"w{(i * 13 + r * 7 + k * seed) % 97}"
                    for k in range(12)
                )
            )
            urls.append(url)
            # hours-apart revisions, seconds-apart urls: unique per
            # (url, r) so "latest" is unambiguous for every route
            tss.append(
                EPOCH + _dt.timedelta(hours=r * 24, seconds=i)
            )
            htmls.append(
                f"<html><body><p>{body}</p></body></html>".encode()
            )
            texts.append(body)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(pages, os.path.join(pages_dir, "part-00000.parquet"))
    with open(manifest, "w") as f:
        json.dump(want, f)
    return pages_dir


def write_crawl_diff_corpus(
    out_dir: str, n_urls: int = 200, seed: int = 1
) -> tuple[str, str]:
    """Deterministic crawl-over-crawl fixture for the snapshot-diff
    operator: two full crawl snapshots A and B of the same url universe,
    30 days apart, where ``i % 4`` fixes each url's fate — 0: present in
    both with IDENTICAL text, 1: present in both with CHANGED text,
    2: A only (page gone by crawl B), 3: B only (page new in crawl B).
    Pure arithmetic on (i, seed) — byte-identical across processes;
    idempotent (manifest-keyed). Returns (crawl_a_dir, crawl_b_dir)."""
    import os

    import pyarrow.parquet as pq

    a_dir = os.path.join(out_dir, "crawl_a")
    b_dir = os.path.join(out_dir, "crawl_b")
    manifest = os.path.join(out_dir, "_manifest.json")
    want = {"kind": "crawldiff", "n_urls": n_urls, "seed": seed, "v": 1}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return a_dir, b_dir
    import shutil

    for d in (a_dir, b_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)

    def body(i: int, rev: int) -> str:
        return f"page {i} revision {rev}: " + " ".join(
            f"w{(i * 13 + rev * 7 + k * seed) % 97}" for k in range(10)
        )

    def side(which: int):
        urls, tss, texts = [], [], []
        for i in range(n_urls):
            cls = i % 4
            if (which == 0 and cls == 3) or (which == 1 and cls == 2):
                continue  # new-in-B urls absent from A and vice versa
            rev = which if cls == 1 else 0  # changed pages bump the rev
            urls.append(f"https://site{i % 17}.example/page{i}")
            tss.append(
                EPOCH + _dt.timedelta(days=30 * which, seconds=i)
            )
            texts.append(body(i, rev))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "text": pa.array(texts, pa.string()),
            }
        )

    pq.write_table(side(0), os.path.join(a_dir, "part-00000.parquet"))
    pq.write_table(side(1), os.path.join(b_dir, "part-00000.parquet"))
    with open(manifest, "w") as f:
        json.dump(want, f)
    return a_dir, b_dir


def write_link_corpus(out_dir: str, n: int = 200, seed: int = 1) -> str:
    """Deterministic hyperlinked mini-web for the link-graph operators
    (outlink extraction / in-degree / PageRank): ``n`` pages across 20
    domains, each page's <a href> targets fixed by pure arithmetic on
    (i, j, seed) — no RNG state, so any process regenerates the byte-
    identical corpus. Every page has >= 2 outlinks (no dangling nodes —
    the PageRank operator's documented assumption) and every third page
    links to page 0, giving the hub skew a web graph has. Idempotent
    like write_corpus (manifest-keyed). Returns the pages dir."""
    import os

    import pyarrow.parquet as pq

    pages_dir = os.path.join(out_dir, "pages")
    manifest = os.path.join(out_dir, "_manifest.json")
    # v2: every 25th page pair (i, i+1) links BOTH ways — the reciprocal
    # pairs the link-farm detector (q_reciprocal_links) must surface
    # v3: same-domain nav links (page i -> i-20, i.e. the previous page
    # of the same site) — real sites have internal navigation; gives the
    # intra-domain subgraph (q_link_components) 20 chain components
    # instead of near-empty. Verified to add NO reciprocal pairs to the
    # (200, seed 1) and (50, seed 3) corpora, preserving the planted
    # every-25th-pair invariant q_reciprocal_links tests pin.
    want = {"kind": "links", "n": n, "seed": seed, "v": 3}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return pages_dir
    import shutil

    if os.path.isdir(pages_dir):
        shutil.rmtree(pages_dir)
    os.makedirs(pages_dir, exist_ok=True)

    def page_url(i: int) -> str:
        return f"https://site{i % 20}.example/p{i}"

    urls, htmls = [], []
    for i in range(n):
        targets = [
            page_url((i * 31 + j * 97 + 7 * seed) % n)
            for j in range(2 + i % 4)
        ]
        if i % 3 == 0:
            targets.append(page_url(0))
        # deterministic reciprocal pairs (i, i+1) every 25 pages
        if i % 25 == 0 and i + 1 < n:
            targets.append(page_url(i + 1))
        if i % 25 == 1:
            targets.append(page_url(i - 1))
        if i >= 20:  # same-domain nav: previous page of this site
            targets.append(page_url(i - 20))
        anchors = "".join(
            f'<a href="{u}">link-{k}</a>' for k, u in enumerate(targets)
        )
        doc = (
            f"<html><head><title>p{i}</title></head><body>"
            f"<p>page {i} of the synthetic web</p>{anchors}</body></html>"
        )
        urls.append(page_url(i))
        htmls.append(doc.encode("utf-8"))

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [EPOCH + _dt.timedelta(seconds=i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([None] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(pages, os.path.join(pages_dir, "part-00000.parquet"))
    with open(manifest, "w") as f:
        json.dump(want, f)
    return pages_dir


def write_urltrap_corpus(out_dir: str, n: int = 600, seed: int = 1) -> str:
    """Deterministic crawler-trap fixture for the url-template operator:
    three url families mixed by ``i % 3`` —

    * calendar trap: ``/events/{y}/{m}/{d}?page={p}`` — a date x page
      crossproduct serving only 3 distinct (near-empty) page bodies;
    * session-id trap: ``viewtopic.php?t={t}&sid={hex}`` — per-visit
      session tokens exploding 10 real threads into hundreds of urls;
    * legit articles: ``/article/story-{i}`` — one unique body per url.

    The template miner must collapse each family to ONE template and
    flag the first two (many urls, few distinct contents) while leaving
    the articles unflagged. Pure arithmetic on (i, seed); idempotent
    (manifest-keyed). Returns the pages dir with (url, text) parquet."""
    import hashlib as _hl
    import os

    import pyarrow.parquet as pq

    pages_dir = os.path.join(out_dir, "pages")
    manifest = os.path.join(out_dir, "_manifest.json")
    want = {"kind": "urltrap", "n": n, "seed": seed, "v": 2}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return pages_dir
    import shutil

    if os.path.isdir(pages_dir):
        shutil.rmtree(pages_dir)
    os.makedirs(pages_dir, exist_ok=True)

    urls, texts = [], []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            urls.append(
                f"https://cal.example/events/{2000 + i % 5}/"
                f"{1 + i % 12}/{1 + i % 28}?page={i % 7}"
            )
            texts.append(
                f"calendar view: no events scheduled (v{(i // 3) % 3})"
            )
        elif kind == 1:
            sid = _hl.md5(f"sid-{i}-{seed}".encode()).hexdigest()[:12]
            urls.append(
                f"https://forum.example/viewtopic.php?t={i % 10}&sid={sid}"
            )
            texts.append(
                f"thread {i % 10}: "
                + " ".join(f"t{(i % 10) * 7 + k}" for k in range(10))
            )
        else:
            urls.append(f"https://news.example/article/story-{i}")
            texts.append(
                f"article {i}: "
                + " ".join(f"a{(i * 13 + k * seed) % 9973}" for k in range(20))
            )

    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(pages_dir, "part-00000.parquet"),
    )
    with open(manifest, "w") as f:
        json.dump(want, f)
    return pages_dir


def write_pii_corpus(out_dir: str, n: int = 400, seed: int = 1) -> str:
    """Deterministic PII-bearing web-text fixture for the scan/redact/
    gate operators: word-soup bodies with emails, phone numbers, IPv4
    addresses and SSN-like ids injected by residue classes of the doc
    index (``i % 3`` email, ``% 5`` phone, ``% 7`` ip, ``% 11`` ssn,
    ``% 13`` a SECOND email — multi-match coverage), so expected counts
    are pure arithmetic and a third of docs stay clean. Injected shapes
    are crafted to be non-overlapping across the four pattern classes
    (a phone can never partially match the ssn regex and vice versa).
    Pure arithmetic on (i, seed); idempotent (manifest-keyed). Returns
    the docs dir."""
    import os

    import pyarrow.parquet as pq

    docs_dir = os.path.join(out_dir, "docs")
    manifest = os.path.join(out_dir, "_manifest.json")
    want = {"kind": "pii", "n": n, "seed": seed, "v": 1}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return docs_dir
    import shutil

    if os.path.isdir(docs_dir):
        shutil.rmtree(docs_dir)
    os.makedirs(docs_dir, exist_ok=True)

    texts = []
    for i in range(n):
        parts = [
            " ".join(f"w{(i * 17 + k * seed) % 211}" for k in range(20))
        ]
        if i % 3 == 0:
            parts.append(f"contact user{i}@mail{i % 7}.example.com")
        if i % 5 == 0:
            parts.append(
                f"call {200 + i % 700:03d}-{200 + (i * 3) % 700:03d}-"
                f"{1000 + i % 9000:04d}"
            )
        if i % 7 == 0:
            parts.append(
                f"host 10.{i % 200}.{(i * 3) % 200}.{i % 250}"
            )
        if i % 11 == 0:
            parts.append(
                f"id {100 + i % 899:03d}-{10 + i % 89:02d}-"
                f"{1000 + i % 8999:04d}"
            )
        if i % 13 == 0:
            parts.append(f"cc ops{i}@corp{i % 5}.example.org")
        texts.append(" ".join(parts))

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(docs_dir, "part-00000.parquet"),
    )
    with open(manifest, "w") as f:
        json.dump(want, f)
    return docs_dir


def write_er_corpus(out_dir: str, n_entities: int = 300, seed: int = 1) -> str:
    """Deterministic noisy-records fixture for the record-linkage
    operators (``entity_resolve`` / ``snm_pairs``): ``n_entities``
    ground-truth entities, each emitted as 1-3 records (``i % 3`` picks
    the copy count) whose later copies carry typo perturbations fixed by
    pure arithmetic on ``(i, copy, seed)`` — copy 1 drops one name
    character, copy 2 swaps an adjacent pair AND bumps the last phone
    digit (so phone agreement alone cannot identify it). Perturbation
    positions are always >= 2, so the (city, 2-char-name-prefix)
    blocking key is stable by construction — blocking recall is exactly
    100% here, which is what lets the SQL oracle state the full ground
    truth; real-world first-character typos are the case the
    sorted-neighborhood operator covers instead. ASCII-only names and
    cities (drawn from the ASCII subset of the corpus pools) so
    byte-level Levenshtein == DuckDB's character ``levenshtein``.
    The entity -> name mapping is injective (mixed-radix over the three
    pools), so distinct entities never share a name. Idempotent
    (manifest-keyed). Returns the records dir."""
    import os

    import pyarrow.parquet as pq

    rec_dir = os.path.join(out_dir, "records")
    manifest = os.path.join(out_dir, "_manifest.json")
    want = {"kind": "er", "n": n_entities, "seed": seed, "v": 1}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return rec_dir
    import shutil

    if os.path.isdir(rec_dir):
        shutil.rmtree(rec_dir)
    os.makedirs(rec_dir, exist_ok=True)

    first = [
        "Ana", "Bruno", "Carla", "Diego", "Elisa", "Gabriela", "Heitor",
        "Iara", "Karina", "Lucas", "Mariana", "Nelson", "Paulo", "Queila",
        "Rafael", "Sofia", "Tiago", "Valter", "Wanda", "Xavier",
    ]
    sur = [
        "Almeida", "Barbosa", "Cardoso", "Dias", "Esteves", "Ferreira",
        "Gomes", "Henriques", "Ibrahim", "Junqueira", "Kfouri", "Lima",
        "Moraes", "Nogueira", "Oliveira", "Pereira", "Queiroz", "Ribeiro",
        "Santos", "Teixeira",
    ]
    cities = [
        "Campinas", "Santos", "Londrina", "Olinda", "Sobral", "Blumenau",
        "Sorocaba", "Maringa",
    ]

    rec_id, ent_id, names, cits, phones = [], [], [], [], []
    rid = 0
    for i in range(n_entities):
        base = (
            f"{first[(i + seed) % len(first)]} "
            f"{sur[(i // len(first)) % len(sur)]} "
            f"{sur[((i // (len(first) * len(sur))) + 7) % len(sur)]}"
        )
        city = cities[(i * 5 + seed) % len(cities)]
        phone = f"{300 + i % 600:03d}-{1000 + (i * 7) % 9000:04d}"
        n_copies = 1 + i % 3
        for c in range(n_copies):
            nm, ph = base, phone
            if c == 1:  # drop one character (never in the block prefix)
                p = 2 + (i * 13) % (len(base) - 2)
                nm = base[:p] + base[p + 1 :]
            elif c == 2:  # swap an adjacent pair + bump the phone
                q = 2 + (i * 11) % (len(base) - 3)
                nm = base[:q] + base[q + 1] + base[q] + base[q + 2 :]
                ph = phone[:-1] + str((int(phone[-1]) + 1) % 10)
            rec_id.append(rid)
            ent_id.append(i)
            names.append(nm)
            cits.append(city)
            phones.append(ph)
            rid += 1

    pq.write_table(
        pa.table(
            {
                "rec_id": pa.array(rec_id, pa.int64()),
                "entity_id": pa.array(ent_id, pa.int64()),
                "name": pa.array(names, pa.string()),
                "city": pa.array(cits, pa.string()),
                "phone": pa.array(phones, pa.string()),
            }
        ),
        os.path.join(rec_dir, "part-00000.parquet"),
    )
    with open(manifest, "w") as f:
        json.dump(want, f)
    return rec_dir


def write_struct_corpus(out_dir: str, n: int = 150, seed: int = 1) -> str:
    """Deterministic structured-HTML fixture for the document-structure
    extraction operators (``heading_outline`` / ``html_tables``): each
    page carries an <h1>, a page-dependent number of <h2>/<h3> sections
    and one <table> whose shape and cell values are pure arithmetic on
    ``(i, seed)``. Heading text never contains '<', table rows never
    nest, so the engine's linear scan and the oracle's RE2 extraction
    see the identical structure. Idempotent (manifest-keyed). Returns
    the pages dir."""
    import os

    import pyarrow.parquet as pq

    pages_dir = os.path.join(out_dir, "pages")
    manifest = os.path.join(out_dir, "_manifest.json")
    # v2: per-page "Published:" date line (format rotates iso/us/textual
    # by i % 3) and an application/ld+json metadata block — inputs for
    # the date_extract / jsonld_extract operators. Headings and tables
    # are unchanged, so the v1-pinned outline/table assertions hold.
    # v3: a <link rel="canonical"> on every page — pages where i % 5
    # != 0 declare the head page of their 5-block (i - i % 5) as
    # canonical (the duplicate-variant pattern), block heads are
    # self-canonical. Input for canonical_extract; no other element
    # changes, so all v2-pinned assertions hold.
    want = {"kind": "struct", "n": n, "seed": seed, "v": 3}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return pages_dir
    import shutil

    if os.path.isdir(pages_dir):
        shutil.rmtree(pages_dir)
    os.makedirs(pages_dir, exist_ok=True)

    months = [
        "January", "February", "March", "April", "May", "June", "July",
        "August", "September", "October", "November", "December",
    ]
    authors = [
        "Ana Santos", "Bruno Lima", "Carla Gomes", "Diego Dias",
        "Elisa Moraes", "Heitor Pereira", "Iara Ribeiro", "Lucas Cardoso",
    ]

    urls, htmls = [], []
    for i in range(n):
        d = _dt.date(2024, 1, 1) + _dt.timedelta(days=i)
        if i % 3 == 0:
            datestr = d.strftime("%Y-%m-%d")
        elif i % 3 == 1:
            datestr = d.strftime("%m/%d/%Y")
        else:
            datestr = f"{months[d.month - 1]} {d.day}, {d.year}"
        meta = (
            '{"@type":"Article",'
            f'"author":"{authors[(i * 3 + seed) % len(authors)]}",'
            f'"wordCount":{100 + (i * 13) % 900}}}'
        )
        canon_i = i - i % 5
        canon_url = f"https://struct{canon_i % 10}.example/doc{canon_i}"
        parts = [
            "<html><head>"
            f'<link rel="canonical" href="{canon_url}">'
            "</head><body>"
            f"<h1>Doc {i}</h1>",
            f"<p>Published: {datestr}</p>",
            f'<script type="application/ld+json">{meta}</script>',
        ]
        for s in range(1 + i % 3):
            parts.append(f"<h2>Section {i}-{s}</h2>")
            parts.append(f"<p>body text {i} {s} of the section</p>")
            if (i + s) % 2 == 0:
                parts.append(f"<h3>Detail {i}-{s}</h3>")
        n_rows = 2 + i % 3
        n_cols = 2 + i % 2
        parts.append("<table>")
        for r in range(n_rows):
            cells = "".join(
                f"<td>v{(i * 7 + r * 3 + c * 11 + seed) % 100}</td>"
                for c in range(n_cols)
            )
            parts.append(f"<tr>{cells}</tr>")
        parts.append("</table></body></html>")
        urls.append(f"https://struct{i % 10}.example/doc{i}")
        htmls.append("".join(parts).encode("utf-8"))

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [EPOCH + _dt.timedelta(seconds=i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([None] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    pq.write_table(pages, os.path.join(pages_dir, "part-00000.parquet"))
    with open(manifest, "w") as f:
        json.dump(want, f)
    return pages_dir
