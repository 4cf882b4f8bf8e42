"""Iceberg snapshot reader tests: snapshot resolution, time travel,
status filtering, metadata versioning, and every refusal seam."""

from __future__ import annotations

import io
import json
import zipfile

import pytest

from flink_gmall2024_realtime_spark.operators.iceberg import (
    read_iceberg_snapshot,
    synth_iceberg_table,
)


def _n(seed, j):
    return (seed + j) % 20 + 5


def _s(seed, j):
    n = _n(seed, j)
    return n * (seed + 100 * j) + n * (n - 1) // 2


def _rebuild(payload: bytes, mutate) -> bytes:
    members = {}
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        for name in z.namelist():
            members[name] = z.read(name)
    mutate(members)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, body in members.items():
            z.writestr(name, body)
    return buf.getvalue()


def _edit_meta(members, fn, which="metadata/v2.metadata.json"):
    md = json.loads(members[which])
    fn(md)
    members[which] = json.dumps(md).encode()


class TestSnapshots:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 7])
    def test_time_travel_and_current(self, seed):
        p = synth_iceberg_table(seed)
        s1 = read_iceberg_snapshot(p, seed * 10 + 1)
        assert s1["n_files"] == 2
        assert s1["n_rows"] == _n(seed, 0) + _n(seed, 1)
        assert s1["int_sum"] == _s(seed, 0) + _s(seed, 1)
        cur = read_iceberg_snapshot(p)
        live = [0, 2] + ([3] if seed % 2 == 0 else [])
        assert cur["snapshot_id"] == seed * 10 + 2
        assert cur["n_manifests"] == 2
        assert cur["n_files"] == len(live)
        assert cur["n_rows"] == sum(_n(seed, j) for j in live)

    def test_unknown_snapshot_raises(self):
        with pytest.raises(ValueError, match="not in table metadata"):
            read_iceberg_snapshot(synth_iceberg_table(2), 424242)

    def test_version_hint_is_honored(self):
        # pointing the hint at v1 must read the ONE-snapshot metadata:
        # the current snapshot becomes s1 and s2 is unknown
        seed = 2

        def hint_v1(members):
            members["metadata/version-hint.text"] = b"1"

        p = _rebuild(synth_iceberg_table(seed), hint_v1)
        assert read_iceberg_snapshot(p)["snapshot_id"] == seed * 10 + 1
        with pytest.raises(ValueError, match="not in table metadata"):
            read_iceberg_snapshot(p, seed * 10 + 2)

    def test_latest_metadata_wins_without_hint(self):
        def drop_hint(members):
            del members["metadata/version-hint.text"]

        p = _rebuild(synth_iceberg_table(2), drop_hint)
        assert read_iceberg_snapshot(p)["snapshot_id"] == 22


class TestSeams:
    def test_manifest_length_cross_check(self):
        # rewrite snapshot 1's manifest list declaring the wrong length
        def lie(members):
            from flink_gmall2024_realtime_spark.operators.avro import _zz
            from flink_gmall2024_realtime_spark.operators.iceberg import (
                _MANIFEST_LIST_SCHEMA,
                _avro_ocf,
                _enc_str,
            )

            man = members["metadata/m-001.avro"]
            entry = (
                _enc_str("warehouse/t/metadata/m-001.avro")
                + _zz(len(man) + 1) + _zz(0) + _zz(0) + _zz(21)
            )
            members[f"metadata/snap-{21}.avro"] = _avro_ocf(
                _MANIFEST_LIST_SCHEMA, [entry], 99
            )

        with pytest.raises(ValueError, match="manifest_length"):
            read_iceberg_snapshot(_rebuild(synth_iceberg_table(2), lie), 21)

    def test_record_count_cross_check(self):
        # swap two data files of different row counts: the manifest's
        # record_count no longer matches the decoded rows
        def swap(members):
            members["data/part-00000.parquet"], members["data/part-00001.parquet"] = (
                members["data/part-00001.parquet"],
                members["data/part-00000.parquet"],
            )

        with pytest.raises(ValueError, match="record_count"):
            read_iceberg_snapshot(_rebuild(synth_iceberg_table(2), swap), 21)

    def test_missing_data_file_raises(self):
        def drop(members):
            del members["data/part-00002.parquet"]

        with pytest.raises(ValueError, match="missing from payload"):
            read_iceberg_snapshot(_rebuild(synth_iceberg_table(2), drop))

    def test_delete_manifest_is_loud(self):
        def make_delete(members):
            _edit_meta(members, lambda md: None)
            # flip the content field inside the manifest LIST entry:
            # easier spec-true route — rewrite the list with content=1
            from flink_gmall2024_realtime_spark.operators.iceberg import (
                _MANIFEST_LIST_SCHEMA,
                _avro_ocf,
                _enc_str,
            )
            from flink_gmall2024_realtime_spark.operators.avro import _zz

            man = members["metadata/m-001.avro"]
            entry = (
                _enc_str("warehouse/t/metadata/m-001.avro")
                + _zz(len(man)) + _zz(0) + _zz(1) + _zz(21)
            )
            members[f"metadata/snap-{21}.avro"] = _avro_ocf(
                _MANIFEST_LIST_SCHEMA, [entry], 99
            )

        with pytest.raises(NotImplementedError, match="DELETE manifests"):
            read_iceberg_snapshot(_rebuild(synth_iceberg_table(2), make_delete), 21)

    def test_future_format_version_is_loud(self):
        def bump(members):
            _edit_meta(members, lambda md: md.update({"format-version": 3}))

        with pytest.raises(NotImplementedError, match="format-version"):
            read_iceberg_snapshot(_rebuild(synth_iceberg_table(2), bump))

    def test_no_metadata_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("readme.txt", "not iceberg")
        with pytest.raises(ValueError, match="metadata"):
            read_iceberg_snapshot(buf.getvalue())
