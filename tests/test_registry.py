"""Registry consistency guards: the driver's correctness gate walks
queries() x oracle_sql(), and bench.py walks BENCH_QUERIES — a name
drift in any of the three surfaces silently drops coverage, so pin
them against each other. Pure-import tests (no Ray session needed,
but the shared fixture keeps collection order simple)."""

import re

from adaptive_pdf_extractor_ray.pipelines import queries as q


def test_every_query_has_an_oracle():
    import os

    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = set(qs) - set(oracles)
    # env-conditional oracles embed fixture-derived literals; when the
    # oracle fixture dir is absent they are documented as unbuildable
    sf = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    if not os.path.isfile(os.path.join(sf, "documents.parquet")):
        missing -= q.ENV_CONDITIONAL_ORACLES
    assert sorted(missing) == [], f"queries without oracle_sql: {missing}"


def test_oracles_reference_only_registered_queries():
    import __ray_entry__ as entry

    qs = entry.queries()
    extra = sorted(set(entry.oracle_sql()) - set(qs))
    assert extra == [], f"oracles without a queries() entry: {extra}"


def test_bench_list_is_a_subset_of_the_registry():
    src = open("bench.py").read()
    m = re.search(r"BENCH_QUERIES = \[(.*?)\]", src, re.S)
    names = re.findall(r'"([a-z0-9_]+)"', m.group(1))
    assert len(names) == len(set(names)), "duplicate bench entries"
    bad = sorted(set(names) - set(q.QUERIES))
    assert bad == [], f"bench names not in QUERIES: {bad}"


def test_operators_md_in_sync():
    """OPERATORS.md is generated from the registry; a registry edit
    without `python scripts/gen_operators_md.py` fails here."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    try:
        import gen_operators_md
    finally:
        sys.path.pop(0)
    with open(os.path.join(repo, "OPERATORS.md")) as f:
        committed = f.read()
    assert committed == gen_operators_md.generate(), (
        "OPERATORS.md is stale — run: python scripts/gen_operators_md.py"
    )


def test_query_callables_are_unique():
    # two names bound to the same callable is almost always a
    # copy-paste registration slip
    seen: dict = {}
    dupes = []
    for name, fn in q.QUERIES.items():
        if fn in seen:
            dupes.append((seen[fn], name))
        seen[fn] = name
    assert dupes == [], f"duplicate callables: {dupes}"
