"""Equivalence and detection tests for the skew-aware salted join
(`stages/joins.py`): the salted plan must be bit-identical to the plain
hash join on skewed inputs, and hot-key detection must find exactly the
planted heavy keys.
"""

import pyarrow as pa
import pytest

import ray.data as rd

from adaptive_pdf_extractor_ray.stages import joins as js


def _skewed_left(n=5000, hot_key=0, hot_share=4):
    """~3/4 of rows on hot_key, the rest spread over 50 keys; row id
    doubles as the salt column."""
    ids = list(range(n))
    keys = [hot_key if i % hot_share != 0 else i % 50 for i in ids]
    vals = [(i * 13) % 1000 for i in ids]
    return pa.table(
        {
            "rid": pa.array(ids, pa.int64()),
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )


def _dim(cards=50):
    return pa.table(
        {
            "k": pa.array(range(cards), pa.int64()),
            "mult": pa.array([(k * 7) % 13 + 1 for k in range(cards)],
                             pa.int64()),
        }
    )


def _canon(df):
    return (
        df[sorted(df.columns)]
        .sort_values(by=sorted(df.columns))
        .reset_index(drop=True)
    )


class TestSaltedJoin:
    def test_identical_to_plain_join_on_skewed_input(self, ray_session):
        left_t, dim_t = _skewed_left(), _dim()
        plain = js.salted_join(
            rd.from_arrow(left_t), rd.from_arrow(dim_t),
            on="k", salt_col="rid", hot_keys=[], salt=8, num_partitions=4,
        ).to_pandas()
        salted = js.salted_join(
            rd.from_arrow(left_t), rd.from_arrow(dim_t),
            on="k", salt_col="rid", hot_keys=[0], salt=8, num_partitions=4,
        ).to_pandas()
        assert _canon(plain).equals(_canon(salted))
        # inner-join row count: every left row matches exactly one dim row
        assert len(salted) == left_t.num_rows
        assert "_salt" not in salted.columns

    def test_unmatched_keys_still_drop(self, ray_session):
        # dim covers only keys < 10: rows on other keys must vanish in
        # BOTH plans (replication must not resurrect them)
        left_t, dim_t = _skewed_left(), _dim(cards=10)
        salted = js.salted_join(
            rd.from_arrow(left_t), rd.from_arrow(dim_t),
            on="k", salt_col="rid", hot_keys=[0], salt=4, num_partitions=4,
        ).to_pandas()
        plain = js.salted_join(
            rd.from_arrow(left_t), rd.from_arrow(dim_t),
            on="k", salt_col="rid", hot_keys=[], salt=4, num_partitions=4,
        ).to_pandas()
        assert _canon(plain).equals(_canon(salted))
        assert set(salted["k"].unique()) <= set(range(10))

    def test_multiple_hot_keys(self, ray_session):
        left_t, dim_t = _skewed_left(), _dim()
        salted = js.salted_join(
            rd.from_arrow(left_t), rd.from_arrow(dim_t),
            on="k", salt_col="rid", hot_keys=[0, 1, 2], salt=8,
            num_partitions=4,
        ).to_pandas()
        plain = js.salted_join(
            rd.from_arrow(left_t), rd.from_arrow(dim_t),
            on="k", salt_col="rid", hot_keys=[], salt=8, num_partitions=4,
        ).to_pandas()
        assert _canon(plain).equals(_canon(salted))


class TestDetectHotKeys:
    def test_finds_planted_hot_key_only(self, ray_session):
        ds = rd.from_arrow(_skewed_left())
        hot = js.detect_hot_keys(ds, "k", threshold_share_ppm=100_000)
        assert hot == [0]  # ~75% share; every other key is ~0.5%

    def test_uniform_input_has_no_hot_keys(self, ray_session):
        t = pa.table(
            {
                "rid": pa.array(range(1000), pa.int64()),
                "k": pa.array([i % 100 for i in range(1000)], pa.int64()),
            }
        )
        assert js.detect_hot_keys(
            rd.from_arrow(t), "k", threshold_share_ppm=50_000
        ) == []

    def test_max_hot_caps_replication_cost(self, ray_session):
        # two heavy keys, cap at 1 -> only the heaviest survives
        keys = [0] * 400 + [1] * 300 + list(range(2, 102)) * 3
        t = pa.table(
            {
                "rid": pa.array(range(len(keys)), pa.int64()),
                "k": pa.array(keys, pa.int64()),
            }
        )
        hot = js.detect_hot_keys(
            rd.from_arrow(t), "k", threshold_share_ppm=100_000, max_hot=1
        )
        assert hot == [0]
