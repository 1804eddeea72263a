"""Small-file compaction: rows preserved exactly, file count reduced to
the byte-budget plan, no-op guard for already-healthy directories."""

from __future__ import annotations

import glob
import os

from stac_geoparquet_spark.sinks.compact import compact_parquet, plan_compaction


def _parquet_files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    # fragment: 16 tiny files
    spark.range(10_000).repartition(16).write.parquet(path)
    assert len(_parquet_files(path)) == 16
    before_sum = spark.read.parquet(path).groupBy().sum("id").collect()[0][0]

    n_before, n_after = compact_parquet(
        spark, path, target_bytes=1 << 30, min_files_to_compact=4
    )
    assert (n_before, n_after) == (16, 1)
    files = _parquet_files(path)
    assert len(files) == 1
    df = spark.read.parquet(path)
    assert df.count() == 10_000
    assert df.groupBy().sum("id").collect()[0][0] == before_sum
    # tmp/old dirs cleaned up
    assert not os.path.exists(path + ".compact-tmp")
    assert not os.path.exists(path + ".compact-old")


def test_compact_noop_below_threshold(spark, tmp_path):
    path = str(tmp_path / "small")
    spark.range(100).repartition(2).write.parquet(path)
    n_before, n_after = compact_parquet(spark, path, min_files_to_compact=4)
    assert (n_before, n_after) == (2, 2)
    assert len(_parquet_files(path)) == 2


def test_plan_compaction_counts(spark, tmp_path):
    path = str(tmp_path / "plan")
    spark.range(1_000).repartition(8).write.parquet(path)
    n_files, total, n_out = plan_compaction(spark, path, target_bytes=1 << 30)
    assert n_files == 8
    assert total > 0
    assert n_out == 1


def test_compact_refuses_stale_backup_dir(spark, tmp_path):
    """A leftover .compact-old from an interrupted run must abort the
    compaction (Hadoop rename() returns False instead of throwing when
    the destination exists, so an unchecked swap would silently no-op
    and then delete the backup)."""
    import pytest

    path = str(tmp_path / "frag2")
    spark.range(1_000).repartition(8).write.parquet(path)
    stale = path + ".compact-old"
    os.makedirs(stale)
    with pytest.raises(RuntimeError, match="stale"):
        compact_parquet(spark, path, target_bytes=1 << 30, min_files_to_compact=4)
    # source untouched
    assert spark.read.parquet(path).count() == 1_000
    assert os.path.isdir(stale)


def test_compact_allows_equals_in_base_dir(spark, tmp_path):
    """A dataset whose BASE directory contains '=' is not
    hive-partitioned; only components below the root trip the guard."""
    path = str(tmp_path / "run=3" / "frag")
    spark.range(5_000).repartition(8).write.parquet(path)
    n_before, n_after = compact_parquet(
        spark, path, target_bytes=1 << 30, min_files_to_compact=4
    )
    assert (n_before, n_after) == (8, 1)
    assert spark.read.parquet(path).count() == 5_000


def test_compact_refuses_hive_subdirs(spark, tmp_path):
    import pytest

    path = str(tmp_path / "part")
    spark.range(1_000).selectExpr("id", "id % 3 AS k").write.partitionBy(
        "k"
    ).parquet(path)
    with pytest.raises(ValueError, match="hive-partitioned"):
        plan_compaction(spark, path)


def test_compact_refuses_mixed_footer_metadata(spark, tmp_path):
    """Files under one dataset carrying DIFFERENT custom footers must
    refuse compaction instead of silently stamping the first file's
    metadata onto every row."""
    import pytest

    from stac_geoparquet_spark.sinks.geoparquet import (
        write_parquet_with_footer,
    )

    path = str(tmp_path / "mixed")
    write_parquet_with_footer(
        spark.range(2_000).repartition(2), path, {"geo": "{\"v\": 1}"}
    )
    write_parquet_with_footer(
        spark.range(2_000).repartition(2), path, {"geo": "{\"v\": 2}"}
    )
    with pytest.raises(ValueError, match="inconsistent custom footer"):
        compact_parquet(
            spark, path, target_bytes=1 << 30, min_files_to_compact=2
        )
