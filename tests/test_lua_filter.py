"""filter_lua contract (plugins/filter_lua/lua.c:333-389, scripts/test.lua).

Three layers:
- TestCallbackContract pins the -1/0/1/invalid-map/unexpected-code
  semantics through LuaFilter's injected-callback seam — runs everywhere,
  no Lua runtime needed, and exercises the exact code path lupa feeds.
- TestRealLua runs the reference's canonical script shapes (append_tag,
  cb_drop, cb_replace) from ACTUAL .lua source — through lupa where it
  is installed, else through the bundled minilua subset interpreter
  (functions/minilua.py), so these are never skipped.
- TestLuaGolden drives a full filter script (field rewrite + severity
  classification + conditional drop) end-to-end, pinning the
  lua.c:333-385 code contract from real Lua source.
"""

import numpy as np
import pyarrow as pa
import pytest

from fluent_bit_ray.stages.lua import LuaFilter, _NAT

try:
    import lupa  # noqa: F401

    HAVE_LUPA = True
except ImportError:
    HAVE_LUPA = False


def _keep_cb(tag, ts, rec):  # module-level: plain-pickle friendly
    return (0, 0, 0)


def _batch():
    return pa.table({
        "_tag": pa.array(["app.a", "app.b", "app.c"]),
        "_time": pa.array([10**9, 2 * 10**9, 3 * 10**9], pa.int64()),
        "msg": pa.array(["one", "two", "three"]),
        "n": pa.array([1, 2, 3], pa.int64()),
    })


class TestCallbackContract:
    def test_code_minus_one_drops(self):
        f = LuaFilter(_cb=lambda tag, ts, rec: (
            -1 if rec["msg"] == "two" else 0, 0, 0))
        out = f.process_batch(_batch())
        assert out.num_rows == 2
        assert out["msg"].to_pylist() == ["one", "three"]

    def test_code_zero_keeps_original_ignoring_returns(self):
        # cb_print shape: returns `0, 0, 0` — original ts/record survive
        f = LuaFilter(_cb=lambda tag, ts, rec: (0, 0, 0))
        out = f.process_batch(_batch())
        assert out["_time"].to_pylist() == [10**9, 2 * 10**9, 3 * 10**9]
        assert out["msg"].to_pylist() == ["one", "two", "three"]

    def test_code_one_replaces_record_and_timestamp(self):
        def cb(tag, ts, rec):
            return 1, 99.5, {"new": 12345.0, "old_msg": rec["msg"],
                             "tag": tag}

        out = LuaFilter(_cb=cb).process_batch(_batch())
        assert out["_time"].to_pylist() == [int(99.5e9)] * 3
        assert out["old_msg"].to_pylist() == ["one", "two", "three"]
        assert out["tag"].to_pylist() == ["app.a", "app.b", "app.c"]
        # lua numbers with no fraction repack as int64 (lua_tomsgpack)
        assert out["new"].to_pylist() == [12345] * 3
        assert pa.types.is_integer(out.schema.field("new").type)

    def test_invalid_map_notouch_for_whole_chunk(self):
        # array-style table at code 1 (from_lua yields a LIST for
        # consecutive 1..n keys) -> is_valid_map fails -> the WHOLE batch
        # passes through untouched (FLB_FILTER_NOTOUCH)
        def cb(tag, ts, rec):
            if rec["msg"] == "two":
                return 1, ts, ["a", "b"]  # array table: invalid map
            return 1, ts, {"rewritten": True}

        t = _batch()
        out = LuaFilter(_cb=cb).process_batch(t)
        assert out is t

    def test_sparse_int_keyed_table_is_a_valid_map(self):
        # lua_tomsgpack packs {[1]=..., [3]=...} as a MAP (non-consecutive
        # keys), so the reference accepts it at code 1; keys stringify at
        # the Arrow boundary (string column names)
        f = LuaFilter(_cb=lambda tag, ts, rec: (1, ts, {1: "a", 3: "b"}))
        out = f.process_batch(_batch())
        assert out["1"].to_pylist() == ["a"] * 3
        assert out["3"].to_pylist() == ["b"] * 3

    def test_filter_survives_pickling(self):
        # the stage ships to Ray workers inside map_batches closures; the
        # per-process compiled runtime must drop and rebuild on arrival
        import pickle

        f = LuaFilter(_cb=_keep_cb)
        f2 = pickle.loads(pickle.dumps(f))
        assert f2.process_batch(_batch()).num_rows == 3
        if HAVE_LUPA:
            g = LuaFilter(script_text=APPEND_TAG_LUA, call="append_tag")
            g2 = pickle.loads(pickle.dumps(g))
            assert g2._compiled is None  # runtime dropped in transit
            out = g2.process_batch(_batch())  # recompiles on first use
            assert out["tag"].to_pylist() == ["app.a", "app.b", "app.c"]

    def test_unexpected_code_keeps_original(self):
        f = LuaFilter(_cb=lambda tag, ts, rec: (7, 0, 0))
        out = f.process_batch(_batch())
        assert out["msg"].to_pylist() == ["one", "two", "three"]

    def test_mask_limits_effect(self):
        f = LuaFilter(_cb=lambda tag, ts, rec: (-1, 0, 0))
        mask = pa.array([True, False, True])
        out = f.process_batch(_batch(), mask=mask)
        assert out["msg"].to_pylist() == ["two"]

    def test_nat_time_crosses_as_zero(self):
        seen = []

        def cb(tag, ts, rec):
            seen.append(ts)
            return 0, 0, 0

        t = pa.table({"_tag": ["x"], "_time": pa.array([_NAT], pa.int64()),
                      "msg": ["m"]})
        LuaFilter(_cb=cb).process_batch(t)
        assert seen == [0.0]

    def test_row_oracle_twin(self):
        def cb(tag, ts, rec):
            return 1, ts + 1.0, {"k": rec["n"] + 10}

        f = LuaFilter(_cb=cb)
        row = {"_tag": "t", "_time": 5 * 10**9, "n": 1, "msg": "x"}
        out = f.process_row(row)
        assert out["k"] == 11
        assert out["_time"] == 6 * 10**9
        assert out["_tag"] == "t"
        assert "msg" not in out  # replacement, not merge (lua.c packs
        # ONLY the returned table)


APPEND_TAG_LUA = """
function append_tag(tag, timestamp, record)
    new_record = record
    new_record["tag"] = tag
    return 1, timestamp, new_record
end
"""

DROP_REPLACE_LUA = """
function cb_drop(tag, timestamp, record)
   return -1, 0, 0
end
function cb_replace(tag, timestamp, record)
   new_record = {}
   new_record["new"] = 12345
   new_record["old"] = record
   return 1, timestamp, new_record
end
"""


class TestRealLua:
    """Actual .lua source through lupa (when installed) or minilua."""

    def test_append_tag_script(self):
        f = LuaFilter(script_text=APPEND_TAG_LUA, call="append_tag")
        out = f.process_batch(_batch())
        assert out["tag"].to_pylist() == ["app.a", "app.b", "app.c"]
        assert out["msg"].to_pylist() == ["one", "two", "three"]
        assert out["_time"].to_pylist() == [10**9, 2 * 10**9, 3 * 10**9]

    def test_drop_script(self):
        f = LuaFilter(script_text=DROP_REPLACE_LUA, call="cb_drop")
        assert f.process_batch(_batch()).num_rows == 0

    def test_replace_script_nested_table(self):
        f = LuaFilter(script_text=DROP_REPLACE_LUA, call="cb_replace")
        out = f.process_batch(_batch())
        assert out["new"].to_pylist() == [12345] * 3
        old = out["old"].to_pylist()
        assert old[0]["msg"] == "one"

    def test_missing_function_raises(self):
        with pytest.raises(ValueError, match="not found"):
            LuaFilter(script_text=APPEND_TAG_LUA, call="nope")


class TestConfigWiring:
    def test_lua_script_builds_with_any_engine(self, tmp_path):
        # lupa when importable, minilua otherwise — a .lua Script always
        # builds a working LuaFilter
        script = tmp_path / "cb.lua"
        script.write_text(APPEND_TAG_LUA)
        from fluent_bit_ray.pipelines.config import build_filter

        sec = {"name": ["lua"], "match": ["*"],
               "script": [str(script)], "call": ["append_tag"]}
        f = build_filter(sec, None)
        assert isinstance(f, LuaFilter)
        out = f.process_batch(_batch())
        assert out["tag"].to_pylist() == ["app.a", "app.b", "app.c"]


LOG_CLASSIFY_LUA = r"""
-- golden filter: the docker/apache severity classifier shape a real
-- fluent-bit deployment ships (field rewrite + classify + drop),
-- exercising the full lua.c:333-385 code contract from Lua source
function cb_classify(tag, timestamp, record)
    if record["stream"] == "debug" then
        return -1, timestamp, record      -- drop debug noise
    end
    if record["code"] == nil then
        return 0, 0, 0                    -- untouched passthrough
    end
    local c = tonumber(record["code"])
    local out = {}
    for k, v in pairs(record) do
        out[k] = v
    end
    if c >= 500 then
        out["severity"] = "error"
    elseif c >= 400 then
        out["severity"] = "warn"
    else
        out["severity"] = "info"
    end
    out["summary"] = string.format("%s [%d] %s", tag, c,
                                   string.sub(out["msg"], 1, 10))
    out["delayed_ts"] = timestamp + 0.25
    return 1, timestamp + 0.25, out
end
"""


class TestLuaGolden:
    def _batch(self):
        return pa.table({
            "_tag": pa.array(["web.a", "web.b", "web.c", "web.d"]),
            "_time": pa.array([10**9, 2 * 10**9, 3 * 10**9, 4 * 10**9],
                              pa.int64()),
            "msg": pa.array(["GET /index.html", "POST /login x",
                             "boom happened!", "verbose trace"]),
            "code": pa.array(["200", "404", "503", None]),
            "stream": pa.array(["stdout", "stdout", "stderr", "debug"]),
        })

    def test_classify_drop_keep_replace_from_lua_source(self):
        f = LuaFilter(script_text=LOG_CLASSIFY_LUA, call="cb_classify")
        out = f.process_batch(self._batch())
        # row web.d (stream=debug) dropped -> 3 rows survive
        assert out.num_rows == 3
        got = {r["_tag"]: r for r in out.to_pylist()}
        assert got["web.a"]["severity"] == "info"
        assert got["web.b"]["severity"] == "warn"
        assert got["web.c"]["severity"] == "error"
        assert got["web.a"]["summary"] == "web.a [200] GET /index"
        assert got["web.c"]["summary"] == "web.c [503] boom happe"
        # code 1 replaced the timestamp (+0.25 s)
        assert got["web.a"]["_time"] == int(1.25e9)
        # integral lua number repacks as int64 (lua_tomsgpack rule)
        assert isinstance(got["web.a"]["delayed_ts"], float) or isinstance(
            got["web.a"]["delayed_ts"], int)

    def test_null_code_row_kept_untouched(self):
        # a code-0 return keeps the ORIGINAL record: no severity column
        # value for that row even though others gained one... the column
        # union puts null there
        f = LuaFilter(script_text=LOG_CLASSIFY_LUA, call="cb_classify")
        t = pa.table({
            "_tag": pa.array(["k"]),
            "_time": pa.array([5 * 10**9], pa.int64()),
            "msg": pa.array(["hello"]),
            "stream": pa.array(["stdout"]),
        })
        out = f.process_batch(t)
        assert out.num_rows == 1
        assert out["_time"].to_pylist() == [5 * 10**9]
        assert out["msg"].to_pylist() == ["hello"]


class TestFallthroughCallback:
    """A cb that returns NO values (drop-only scripts with fall-through)
    must behave as code 0 / keep-record — lua.c reads the missing return
    with lua_tointeger -> 0 — not crash on int(None)."""

    def test_minilua_fallthrough_keeps_record(self):
        from fluent_bit_ray.stages.lua import _build_minilua_callback

        cb = _build_minilua_callback(
            "function cb_filter(tag, ts, record)\n"
            "  if record.level == 'debug' then return -1, 0, 0 end\n"
            "end\n",
            "cb_filter",
        )
        code, ts, rec = cb("t", 1.5, {"level": "info"})
        assert (code, rec) == (0, None)
        code, _, _ = cb("t", 1.5, {"level": "debug"})
        assert code == -1
