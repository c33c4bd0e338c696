"""Z-order clustering (operators/layout.py): the written files must
have tighter per-file min/max spans on EVERY clustered column than a
single-column sort — that is the whole point (multi-dim row-group
pruning)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from esdb_spark.operators.layout import cluster_zorder, zorder_key


@pytest.fixture(scope="module")
def grid_df(spark):
    # 100k rows over an (x, y) grid in random-ish order: clustering on
    # one column alone cannot make the other column's spans tight
    return spark.range(100_000).select(
        (F.abs(F.xxhash64("id", F.lit(1))) % 1000).alias("x"),
        (F.abs(F.xxhash64("id", F.lit(2))) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )


def _file_spans(path, col):
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append(hi - lo)
    return spans


def test_zorder_key_is_deterministic_and_bounded(spark, grid_df):
    a = zorder_key(grid_df, ["x", "y"], bits_per_col=4)
    vals = a.select("_z").distinct().collect()
    assert all(0 <= r["_z"] < (1 << 8) for r in vals)  # 2 cols x 4 bits
    b = zorder_key(grid_df, ["x", "y"], bits_per_col=4)
    assert a.exceptAll(b).count() == 0


def test_zorder_tightens_both_columns(spark, grid_df, tmp_path):
    z_dir = str(tmp_path / "zorder")
    lin_dir = str(tmp_path / "linear")
    cluster_zorder(grid_df, ["x", "y"], bits_per_col=8, num_partitions=16).write.parquet(z_dir)
    # baseline: classic single-column range sort
    grid_df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lin_dir)

    zx, zy = _file_spans(z_dir, "x"), _file_spans(z_dir, "y")
    lx, ly = _file_spans(lin_dir, "x"), _file_spans(lin_dir, "y")
    avg = lambda s: sum(s) / len(s)
    # the x-sorted baseline is tight on x but covers ~the full y domain
    assert avg(lx) < 200
    assert avg(ly) > 800
    # z-order is materially tight on BOTH dimensions
    assert avg(zx) < 500
    assert avg(zy) < 500
    assert avg(zy) < avg(ly) / 2


def test_cluster_zorder_preserves_rows(spark, grid_df, tmp_path):
    out = str(tmp_path / "roundtrip")
    cluster_zorder(grid_df, ["x", "y"], num_partitions=8).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == grid_df.count()
    assert back.columns == grid_df.columns  # _z dropped
    assert back.exceptAll(grid_df).count() == 0


def test_with_zorder_exact_variant(spark, grid_df):
    """The oracle-exact (min-max, integer-div) z-value added in r5:
    deterministic, bounded, NULL-safe, and locality-equivalent to the
    equi-depth variant on uniform data."""
    from esdb_spark.operators.layout import with_zorder

    out = with_zorder(grid_df, ["x", "y"], bits=10)
    vals = out.select("zvalue").collect()
    assert all(0 <= r["zvalue"] < (1 << 20) for r in vals)
    again = with_zorder(grid_df, ["x", "y"], bits=10)
    assert out.exceptAll(again).count() == 0
    # NULLs and constants don't break it
    df = spark.createDataFrame(
        [(0, None, 5), (1, 10, 5), (2, 20, 5)], "id int, a long, b long"
    )
    z = {r["id"]: r["zvalue"] for r in with_zorder(df, ["a", "b"], bits=4).collect()}
    assert z[0] == 0          # NULL -> min bucket; b constant -> 0 bits
    assert z[1] == 0 or z[1] < z[2]
    with pytest.raises(ValueError, match="already exists"):
        with_zorder(df.withColumn("zvalue", F.lit(1)), ["a"])
    with pytest.raises(ValueError, match="63 bits"):
        with_zorder(grid_df, ["x", "y"], bits=32)


def test_with_zorder_chunks_bound_both_dimensions(spark, grid_df):
    """Same skipping property as the clustered write, checked on the
    exact variant via contiguous chunks of the z-sorted frame."""
    from esdb_spark.operators.layout import with_zorder

    z = (
        with_zorder(grid_df.limit(20_000), ["x", "y"], bits=10)
        .orderBy("zvalue")
        .toPandas()
    )
    k = 16
    spans_x, spans_y = [], []
    for i in range(k):
        c = z.iloc[i * len(z) // k : (i + 1) * len(z) // k]
        spans_x.append(c["x"].max() - c["x"].min())
        spans_y.append(c["y"].max() - c["y"].min())
    # both dimensions materially tighter than the 0..999 domain
    assert sum(spans_x) / k < 600
    assert sum(spans_y) / k < 600


def test_with_zorder_full_range_and_name_collision(spark):
    """Review r5.2: (v - min) overflowed signed 64 for full-range
    (hash-derived) ids — the pre-shift now happens BEFORE the
    subtraction; and an input column named _zq_0 must survive."""
    from esdb_spark.operators.layout import with_zorder

    df = spark.createDataFrame(
        [(0, -(2**63), 1), (1, 0, 2), (2, 2**63 - 1, 3)],
        "id int, h long, t long",
    )
    out = {r["id"]: r["zvalue"] for r in with_zorder(df, ["h", "t"], bits=8).collect()}
    assert out[0] < out[1] < out[2]  # monotone in the wide column
    df2 = spark.createDataFrame(
        [(1, 10, "keep")], "a long, b long, _zq_0 string"
    )
    r = with_zorder(df2, ["a", "b"], bits=4).collect()[0]
    assert r["_zq_0"] == "keep" and r["zvalue"] is not None
