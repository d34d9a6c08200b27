"""normalize_text truth tables — byte-identical to reference semantics
(/root/reference/src/data.py:51-95), across all three implementations."""

import duckdb
import pyarrow as pa
import pytest

from adaptive_pdf_extractor_ray.functions.textnorm import (
    normalize_sql,
    normalize_text,
    normalize_text_array,
)

GOLDEN = [
    # (input, expected) — pairs mirror the reference docstring examples
    ("Seccional101943", "Seccional 101943"),
    ("101943Seccional", "101943 Seccional"),
    ("GOKUInscrição", "GOKU Inscrição"),
    ("fooBar", "foo Bar"),
    ("ABCdef", "AB Cdef"),
    ("a  \t b", "a b"),
    ("a\n\n\nb", "a b"),
    ("  x  ", "x"),
    ("", ""),
    ("Nome\nGOKU Son123Inscrição", "Nome GOKU Son 123 Inscrição"),
    ("a1b2C3", "a 1 b 2 C 3"),
    ("Tab\there", "Tab here"),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_scalar_golden(raw, want):
    assert normalize_text(raw) == want


def test_none_passthrough():
    assert normalize_text(None) is None


def test_arrow_matches_scalar():
    raws = [r for r, _ in GOLDEN] + [None]
    got = normalize_text_array(pa.array(raws, pa.string())).to_pylist()
    assert got == [normalize_text(r) for r in raws]


def test_sql_matches_scalar():
    raws = [r for r, _ in GOLDEN]
    con = duckdb.connect()
    con.execute("create table t(s varchar)")
    con.executemany("insert into t values (?)", [(r,) for r in raws])
    got = [r[0] for r in con.execute(f"select {normalize_sql('s')} from t").fetchall()]
    assert got == [normalize_text(r) for r in raws]


def test_idempotent():
    for raw, _ in GOLDEN:
        once = normalize_text(raw)
        assert normalize_text(once) == once
