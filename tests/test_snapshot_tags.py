"""Round 14: SNAPSHOT TAGS (Iceberg's named refs, tag flavor) — one
file per tag under ``_manifests/refs/``, created with the commit
protocol's atomic create-exclusive link; ``snapshot_read(tag=)``
time-travels by name; vacuum PINS tagged versions (and every file
they reference) regardless of age / keep_last / force."""

import os

import pytest
from pyspark.sql import functions as F

from cl_data_frame_spark.sources import snapshots as S


def _table(spark, tmp_path, name="tags"):
    t = str(tmp_path / name)
    S.snapshot_write(
        spark.range(10).select(F.col("id").alias("k")), t,
        num_files=1)
    S.snapshot_write(
        spark.range(10, 20).select(F.col("id").alias("k")), t,
        mode="append", num_files=1)
    S.snapshot_write(
        spark.range(20, 25).select(F.col("id").alias("k")), t,
        mode="append", num_files=1)
    return t


class TestSnapshotTags:
    def test_tag_read_untag_roundtrip(self, spark, tmp_path):
        t = _table(spark, tmp_path)
        assert S.snapshot_tag(t, "audited", version=2) == 2
        assert S.snapshot_tag(t, "head") == 3        # default latest
        assert S.snapshot_tags(t) == {"audited": 2, "head": 3}
        assert S.snapshot_read(spark, t, tag="audited").nrow == 20
        assert S.snapshot_read(spark, t, tag="head").nrow == 25
        # tags are immutable pointers: re-tag raises
        with pytest.raises(FileExistsError, match="immutable"):
            S.snapshot_tag(t, "audited", version=3)
        assert S.snapshot_untag(t, "audited") == 2
        with pytest.raises(KeyError):
            S.snapshot_tag_version(t, "audited")
        with pytest.raises(KeyError):
            S.snapshot_untag(t, "audited")

    def test_invalid_inputs(self, spark, tmp_path):
        t = _table(spark, tmp_path, "tagbad")
        with pytest.raises(FileNotFoundError):
            S.snapshot_tag(t, "x", version=99)
        for bad in ("", "a/b", ".hidden"):
            with pytest.raises(ValueError):
                S.snapshot_tag(t, bad)
        with pytest.raises(ValueError, match="exactly one"):
            S.snapshot_read(spark, t, tag="x", version=1)

    def test_vacuum_never_crosses_a_tag(self, spark, tmp_path):
        t = _table(spark, tmp_path, "tagvac")
        S.snapshot_tag(t, "keepme", version=2)
        # force + keep_last=1 would normally drop versions 1 and 2;
        # the tag bounds the horizon at 2 (suffix kept, log stays
        # contiguous) — only version 1 goes
        S.snapshot_vacuum(t, keep_last=1, force=True)
        assert not os.path.exists(S._manifest_path(t, 1))
        assert os.path.exists(S._manifest_path(t, 2))
        # the tagged version still READS: its files survived
        assert S.snapshot_read(spark, t, tag="keepme").nrow == 20
        assert S._versions(t) == [2, 3]      # contiguous
        # releasing the pin makes it vacuumable
        S.snapshot_untag(t, "keepme")
        S.snapshot_vacuum(t, keep_last=1, force=True)
        assert not os.path.exists(S._manifest_path(t, 2))
        assert S.snapshot_read(spark, t).nrow == 25

    def test_tagged_delta_commit_materializes_on_vacuum(
            self, spark, tmp_path):
        # a tagged DELTA commit whose replay base is vacuumed must
        # stay readable (the existing checkpoint-materialization
        # sweep covers pinned survivors too)
        t = _table(spark, tmp_path, "tagmat")
        S.snapshot_tag(t, "mid", version=2)
        S._STATE_CACHE.clear()
        S.snapshot_vacuum(t, keep_last=1, force=True)
        S._STATE_CACHE.clear()
        assert S.snapshot_read(spark, t, tag="mid").nrow == 20
