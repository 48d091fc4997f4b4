"""Round-4 verdict item #7: sink/lineage/shard writers accept fsspec URIs.

- storage-layer unit behavior over memory:// (pure fsspec) and bare
  local paths (the os fast path must stay byte-identical);
- the FULL kill-and-resume flow over a file:// URI out_dir — every
  writer (sink chunks, wave aggregates, _WAVE_DONE stamps, lineage
  records) and every resume read crosses fsspec's LocalFileSystem;
- checkpoint-level kill-and-resume over memory:// (driver-side state is
  the only place memory:// is coherent — per-process, see storage.py).
"""

import json

import pyarrow as pa
import pytest

from fluent_bit_ray.state import checkpoint as ckpt
from fluent_bit_ray.state import storage


class TestStorageLayer:
    def test_join_and_scheme_detection(self):
        assert storage.join("/a/b", "c", "d.json") == "/a/b/c/d.json"
        assert storage.join("memory://x", "y", "z") == "memory://x/y/z"
        assert storage.join("file:///a/", "b") == "file:///a/b"
        assert storage.dirname("memory://x/y/z") == "memory://x/y"
        assert storage.basename("memory://x/y/z.json") == "z.json"

    def test_memory_roundtrip(self):
        base = "memory://fbr_test_roundtrip"
        storage.makedirs(storage.join(base, "d"))
        p = storage.join(base, "d", "a.json")
        with storage.open_file(p, "w") as f:
            json.dump({"k": 1}, f)
        assert storage.exists(p)
        with storage.open_file(p) as f:
            assert json.load(f) == {"k": 1}
        # glob returns canonical URIs (memory:/// triple-slash form) that
        # round-trip through every other helper
        hits = storage.glob(storage.join(base, "d", "*.json"))
        assert len(hits) == 1 and hits[0].endswith("/d/a.json")
        assert storage.exists(hits[0])
        # replace (mv) commits over an existing target
        tmp = p + ".tmp"
        with storage.open_file(tmp, "w") as f:
            json.dump({"k": 2}, f)
        storage.replace(tmp, p)
        with storage.open_file(p) as f:
            assert json.load(f) == {"k": 2}
        storage.remove(p)
        assert not storage.exists(p)
        storage.rmtree(base)

    def test_memory_parquet_roundtrip(self):
        t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
        p = "memory://fbr_test_pq/x.parquet"
        storage.makedirs(storage.dirname(p))
        storage.write_parquet(t, p)
        assert storage.read_parquet(p).equals(t)
        storage.rmtree("memory://fbr_test_pq")

    def test_local_fast_path(self, tmp_path):
        p = str(tmp_path / "sub" / "f.parquet")
        storage.makedirs(storage.dirname(p))
        t = pa.table({"a": pa.array([9], pa.int64())})
        storage.write_parquet(t, p)
        assert storage.read_parquet(p).equals(t)
        assert storage.glob(str(tmp_path / "sub" / "*.parquet")) == [p]


class TestCheckpointOverMemory:
    def test_kill_and_resume_state(self):
        out = "memory://fbr_ckpt_test"
        files = [f"/in/part_{i}.parquet" for i in range(5)]
        # "crash" after committing 2 partitions
        for pid in ("part_0", "part_1"):
            ckpt.write_lineage(out, pid, {"sink_all": {"records": 7}},
                               wave=0)
        pending = ckpt.pending_partitions(files, out)
        assert [ckpt.partition_id(f) for f in pending] == [
            "part_2", "part_3", "part_4"]
        assert ckpt.is_done(out, "part_0")
        assert not ckpt.is_done(out, "part_2")
        recs = ckpt.read_lineage(out)
        assert {r["partition"] for r in recs} == {"part_0", "part_1"}
        # a torn (unparseable) record reads as NOT done -> re-processed
        torn = ckpt.lineage_path(out, "part_9")
        with storage.open_file(torn, "w") as f:
            f.write('{"status": "do')
        assert not ckpt.is_done(out, "part_9")
        # stale partial sink outputs of pending partitions are cleaned
        stale = storage.join(out, "sink_all", "part_2__deadbeef.jsonl")
        storage.makedirs(storage.dirname(stale))
        with storage.open_file(stale, "w") as f:
            f.write("x")
        removed = ckpt.clean_partial_outputs(
            out, ["part_2", "part_3"], ["sink_all"])
        assert removed == 1
        assert not storage.exists(stale)
        storage.rmtree(out)


@pytest.mark.usefixtures("ray_session")
class TestFileUriKillAndResume:
    def test_full_flow_over_file_uri(self, tmp_path_factory):
        from fluent_bit_ray.pipelines.weblog import (
            final_aggregate,
            run_weblog,
        )
        from fluent_bit_ray.synth import pages_path

        pages_dir = pages_path(600, partitions=6)
        local = str(tmp_path_factory.mktemp("weblog_fsspec"))
        out_uri = f"file://{local}/out"

        res1 = run_weblog(pages_dir, out_uri, wave_size=2, resume=False,
                          max_waves=1)
        assert res1["partitions_processed"] == 2
        # the "crash": resume must skip the committed wave
        res2 = run_weblog(pages_dir, out_uri, wave_size=2, resume=True)
        assert res2["partitions_skipped"] == 2
        assert res2["partitions_processed"] == 4

        agg_uri = final_aggregate(out_uri)
        # parity: the same input through a PLAIN local out_dir
        out_plain = f"{local}/plain"
        run_weblog(pages_dir, out_plain, wave_size=2, resume=False)
        agg_plain = final_aggregate(out_plain)
        assert agg_uri.equals(agg_plain)
        # sink chunk files really landed under the URI's local path
        assert storage.glob(f"file://{local}/out/sink_all/*")
