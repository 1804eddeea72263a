"""Z-order layout: key correctness is covered by the oracle gate
(``layout_zorder_cells``); here we verify the *writer* produces tight
Parquet row-group stats — the data-skipping property the layout exists
for (the Spark-side analogue of the reference's bbox covering metadata,
reference arrow/_to_parquet.py:99-107)."""

import glob
import os

import pyarrow.parquet as pq

from stac_geoparquet_spark.operators.layout import write_zordered


def _rowgroup_spans(path: str, col: str) -> list[int]:
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append(st.max - st.min)
    return spans


def test_zordered_write_tightens_both_dims(spark, sf_dir, tmp_path):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_partkey", "l_suppkey"
    )
    base = str(tmp_path / "plain")
    li.write.mode("overwrite").parquet(base)
    zpath = str(tmp_path / "zorder")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", num_files=8)

    # same data round-trips
    assert spark.read.parquet(zpath).count() == li.count()

    for col in ("l_partkey", "l_suppkey"):
        glob_lo = min(r[0] for r in li.select(col).collect())
        glob_hi = max(r[0] for r in li.select(col).collect())
        plain = _rowgroup_spans(base, col)
        tight = _rowgroup_spans(zpath, col)
        avg_plain = sum(plain) / len(plain)
        avg_tight = sum(tight) / len(tight)
        # unsorted row groups span ~the whole domain; z-ordered ones
        # must cover a strict fraction of it on BOTH dimensions
        assert avg_tight < avg_plain * 0.6, (col, avg_tight, avg_plain)
        assert avg_tight < (glob_hi - glob_lo) * 0.6
