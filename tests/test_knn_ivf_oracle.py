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
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from adaptive_pdf_extractor_ray.stages import similarity as sim

    emb = os.path.join(sf_dir, "embeddings.parquet")
    sample = pq.read_table(emb, columns=["embedding"])
    X = np.asarray(sample["embedding"].to_pylist()[:512], dtype=np.float64)
    C = sim.kmeans_lite(X, n_clusters=min(8, len(X)))
    cent_rows = ", ".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in row)}]::double[])"
        for ci, row in enumerate(C)
    )
    t = pq.read_table(emb, columns=["vec_id"])
    qids = ", ".join(
        str(i) for i in pc.take(
            t["vec_id"], pc.sort_indices(t["vec_id"])[:10]
        ).to_pylist()
    )
    return f"""
with cent(cid, cvec) as (values {cent_rows}),
v as (select vec_id, embedding::double[] as vec from embeddings),
assign as (
  select vec_id, vec, cid from (
    select v.vec_id, v.vec, c.cid,
           row_number() over (
             partition by v.vec_id
             order by list_distance(v.vec, c.cvec), c.cid) as rn
    from v cross join cent c) where rn = 1),
q as (
  select vec_id as query_id,
         list_transform(vec, x -> x / sqrt(list_sum(
             list_transform(vec, y -> y * y)))) as qn,
         vec as qraw
  from v where vec_id in ({qids})),
probes as (
  select query_id, cid from (
    select q.query_id, c.cid,
           row_number() over (
             partition by q.query_id
             order by list_distance(q.qn, c.cvec), c.cid) as rn
    from q cross join cent c) where rn <= 2),
cand as (
  select q.query_id, a.vec_id as neighbor_id,
         round(list_cosine_similarity(a.vec, q.qraw), 6) as sim
  from q join probes p using (query_id)
  join assign a on a.cid = p.cid),
ranked as (
  select *, row_number() over (
      partition by query_id order by sim desc, neighbor_id asc) as rn
  from cand)
select query_id, neighbor_id, sim from ranked where rn <= 5
"""


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
