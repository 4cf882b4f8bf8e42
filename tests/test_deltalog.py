"""Delta transaction-log snapshot reader tests: replay semantics, time
travel, the stats cross-check, and every documented refusal seam."""

from __future__ import annotations

import io
import json
import zipfile

import pytest

from flink_gmall2024_realtime_spark.operators.deltalog import (
    read_delta_snapshot,
    synth_delta_table,
)


def _n(seed, j):
    return (seed + j) % 20 + 5


def _s(seed, j):
    n = _n(seed, j)
    return n * (seed + 100 * j) + n * (n - 1) // 2


class TestReplay:
    def test_time_travel_versions(self):
        for seed in range(8):
            p = synth_delta_table(seed)
            v0 = read_delta_snapshot(p, version=0)
            assert v0 == {
                "version": 0, "n_files": 2,
                "n_rows": _n(seed, 0) + _n(seed, 1),
                "int_sum": _s(seed, 0) + _s(seed, 1),
            }
            v1 = read_delta_snapshot(p, version=1)
            assert v1["n_files"] == 2
            assert v1["n_rows"] == _n(seed, 0) + _n(seed, 2)
            last = read_delta_snapshot(p)
            assert last["version"] == (2 if seed % 2 == 0 else 1)

    def test_remove_tombstone_applies(self):
        # part-00001's rows are in v0 but absent from v1 on
        p = synth_delta_table(3)
        assert read_delta_snapshot(p, 0)["n_rows"] - read_delta_snapshot(p, 1)[
            "n_rows"
        ] == _n(3, 1) - _n(3, 2)

    def test_version_out_of_range(self):
        p = synth_delta_table(1)  # odd seed: latest is 1
        with pytest.raises(ValueError, match="outside log range"):
            read_delta_snapshot(p, version=2)


def _rebuild(payload: bytes, mutate) -> bytes:
    """Unzip, let ``mutate(members: dict)`` edit, re-zip."""
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


class TestSeamsAndChecks:
    def test_stats_mismatch_raises(self):
        def lie(members):
            log0 = "_delta_log/" + "0" * 20 + ".json"
            lines = members[log0].decode().splitlines()
            out = []
            for line in lines:
                a = json.loads(line)
                if "add" in a:
                    a["add"]["stats"] = json.dumps({"numRecords": 9999})
                out.append(json.dumps(a))
            members[log0] = "\n".join(out).encode()

        with pytest.raises(ValueError, match="numRecords"):
            read_delta_snapshot(_rebuild(synth_delta_table(2), lie))

    def test_non_contiguous_log_raises(self):
        def drop_v0(members):
            del members["_delta_log/" + "0" * 20 + ".json"]

        with pytest.raises(ValueError, match="contiguous"):
            read_delta_snapshot(_rebuild(synth_delta_table(2), drop_v0))

    def test_missing_live_file_raises(self):
        def drop_part(members):
            del members["part-00000.parquet"]

        with pytest.raises(ValueError, match="missing from payload"):
            read_delta_snapshot(_rebuild(synth_delta_table(2), drop_part))

    def test_protocol_v3_is_loud_seam(self):
        def bump(members):
            log0 = "_delta_log/" + "0" * 20 + ".json"
            lines = members[log0].decode().splitlines()
            out = []
            for line in lines:
                a = json.loads(line)
                if "protocol" in a:
                    a["protocol"]["minReaderVersion"] = 3
                out.append(json.dumps(a))
            members[log0] = "\n".join(out).encode()

        with pytest.raises(NotImplementedError, match="protocol"):
            read_delta_snapshot(_rebuild(synth_delta_table(2), bump))

    def test_partitioned_table_is_loud_seam(self):
        def partition(members):
            log0 = "_delta_log/" + "0" * 20 + ".json"
            lines = members[log0].decode().splitlines()
            out = []
            for line in lines:
                a = json.loads(line)
                if "metaData" in a:
                    a["metaData"]["partitionColumns"] = ["k"]
                out.append(json.dumps(a))
            members[log0] = "\n".join(out).encode()

        with pytest.raises(NotImplementedError, match="partitioned"):
            read_delta_snapshot(_rebuild(synth_delta_table(2), partition))

    def test_missing_metadata_raises(self):
        def strip(members):
            log0 = "_delta_log/" + "0" * 20 + ".json"
            lines = [
                line
                for line in members[log0].decode().splitlines()
                if "metaData" not in json.loads(line)
            ]
            members[log0] = "\n".join(lines).encode()

        with pytest.raises(ValueError, match="metaData"):
            read_delta_snapshot(_rebuild(synth_delta_table(2), strip))

    def test_no_log_raises(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("readme.txt", "not a delta table")
        with pytest.raises(ValueError, match="_delta_log"):
            read_delta_snapshot(buf.getvalue())
