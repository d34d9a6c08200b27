"""Mirror of the driver's correctness gate for a fast query subset:
run queries() vs oracle_sql() through DuckDB at sf0.001 and require a
row-count + column + value match. (scripts/check_oracles.py covers the
full set; this keeps the gate inside `pytest -x -q`.)"""

import hashlib
import importlib.util
import sys

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# fast, shuffle-light subset — full set runs in scripts/check_oracles.py
SUBSET = [
    "normalize_text",
    "pages_roundtrip",
    "rule_extract",
    "content_fingerprint",
    "token_count",
    "quality_score",
    "lang_id",
    "dedup_exact",
    "knn_brute",
    "knn_lsh",
    "lm_score",
    "lm_bigram",
    "heavy_hitters",
    "cdc_dedup",
    "dedup_containment",
    "agg_lineitem",
    "topk_orders",
    "window_hourly",
    "sessionize",
    "tfidf_top_terms",
    "inverted_index",
    "pii_redact",
    "clean_c4",
    "url_filter",
    "lang_id_multi",
    "decontaminate_semantic",
    "jsonl_roundtrip",
    "robots_filter",
    "domain_reputation",
    "url_dedup",
    "chunk_windows",
    "pack_sequences",
    "quality_tiers",
    "domain_stats",
    "mix_rebalance",
    "sample_reservoir",
    "domain_dup_stats",
    "funnel",
    "range_join",
    "approx_distinct_hll",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_tests", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ray_entry_for_tests"] = mod
    spec.loader.exec_module(mod)
    return mod


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _vhash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    return _load_entry()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(entry_mod, con, name):
    import pyarrow as pa

    import ray.data as rd

    res = entry_mod.queries()[name](SF_DIR)
    if isinstance(res, rd.Dataset):
        mine = res.to_pandas()
    elif isinstance(res, pa.Table):
        mine = res.to_pandas()
    else:
        mine = res
    mine = _canon(mine)
    ref = _canon(con.execute(entry_mod.oracle_sql()[name]).df())
    assert len(mine) == len(ref), f"{name}: row count"
    assert list(mine.columns) == list(ref.columns), f"{name}: columns"
    assert _vhash(mine) == _vhash(ref), f"{name}: value hash"


def test_all_queries_have_callable_entries(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 14


def test_join_revenue_routes_to_hash_join_above_threshold(ray_session, monkeypatch):
    """The size router must produce identical results through the
    Dataset.join path (forced by dropping the broadcast ceiling)."""
    import pandas as pd

    from adaptive_pdf_extractor_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    via_broadcast = q.q_join_revenue(sf)
    monkeypatch.setattr(q.qrelational, "BROADCAST_MAX_ROWS", 0)
    via_join = q.q_join_revenue(sf)
    a = via_broadcast.sort_values("c_mktsegment").reset_index(drop=True)
    b = via_join.sort_values("c_mktsegment").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
