"""Value-verification of the IVF ANN path against DuckDB.

The driver gate keeps ``knn_ivf`` rows-only because its oracle cannot be
a static SQL string (centroids depend on the sf directory). Here pytest
composes the SQL per sf: the engine's centroid matrix is embedded as
float literals, and DuckDB independently recomputes the vector-to-bucket
assignment (argmin squared L2, first-centroid tie-break), per-query
probe set (2 nearest centroids to the NORMALIZED query), candidate
filtering, cosine ranking (round 6) and top-5 with neighbor-id
tie-break. Everything except the centroid arithmetic itself is verified
value-for-value.
"""

import os

import numpy as np
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SFS[0]), reason="testdata not present"
)


def _ivf_sql(sf_dir: str) -> str:
    from adaptive_pdf_extractor_ray.pipelines.queries import ivf_oracle_sql

    return ivf_oracle_sql(sf_dir)


@pytest.mark.parametrize("sf_dir", SFS)
def test_ivf_matches_duckdb_replication(ray_session, sf_dir):
    import duckdb
    import pandas as pd

    from adaptive_pdf_extractor_ray.pipelines.queries import q_knn_ivf

    mine = q_knn_ivf(sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    ref = con.execute(_ivf_sql(sf_dir)).df()
    a = mine.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    b = ref.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    a = a[sorted(a.columns)].astype({"sim": "float64"})
    b = b[sorted(b.columns)].astype({"sim": "float64"})
    pd.testing.assert_frame_equal(a, b)
