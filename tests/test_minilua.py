"""minilua (functions/minilua.py) — language-level pins.

The interpreter only needs the filter-callback subset, but within that
subset the semantics must be REAL Lua 5.1: number formatting (%.14g),
truthiness (only nil/false falsy), 1-based string.sub with negative
indices, short-circuit and/or returning operands, string→number
arithmetic coercion but NO coercion in ==, floor-based %.
"""

import pytest

from fluent_bit_ray.functions.minilua import (
    LuaError,
    LuaTable,
    MiniLua,
    lua_to_python,
    python_to_lua,
)


def run(src, name="f", *args):
    L = MiniLua()
    L.execute(src)
    fn = L.get_global(name)
    out = fn(*args)
    return out[0] if isinstance(out, tuple) and len(out) == 1 else out


class TestLanguage:
    def test_arithmetic_and_precedence(self):
        assert run("function f() return 1 + 2 * 3 ^ 2 end") == 19.0
        assert run("function f() return (1 + 2) * 3 end") == 9.0
        assert run("function f() return 2 ^ 3 ^ 2 end") == 512.0  # right
        assert run("function f() return -2 ^ 2 end") == -4.0  # ^ above -
        assert run("function f() return 7 % 3 end") == 1.0
        assert run("function f() return -7 % 3 end") == 2.0  # floor mod

    def test_string_number_coercion(self):
        assert run("function f() return '10' + 5 end") == 15.0
        assert run("function f() return '0x10' + 0 end") == 16.0
        with pytest.raises(LuaError):
            run("function f() return {} + 1 end")
        # NO coercion in ==
        assert run("function f() return '10' == 10 end") is False

    def test_concat_renders_like_lua(self):
        assert run("function f() return 'n=' .. 13 end") == "n=13"
        assert run("function f() return 1.5 .. '' end") == "1.5"
        with pytest.raises(LuaError):
            run("function f() return 'x' .. nil end")

    def test_truthiness_and_shortcircuit(self):
        assert run("function f() return 0 and 'yes' end") == "yes"  # 0 truthy
        assert run("function f() return nil or 'dflt' end") == "dflt"
        assert run("function f() return false or nil end") is None
        assert run("function f() return nil and error('boom') end") is None

    def test_multiple_assignment_and_return(self):
        src = """
        function f()
            local a, b, c = 1, 2
            a, b = b, a
            return a, b, c
        end"""
        assert run(src) == (2.0, 1.0, None)

    def test_numeric_for_with_step_and_break(self):
        src = """
        function f()
            local s = 0
            for i = 10, 1, -2 do
                if i == 4 then break end
                s = s + i
            end
            return s
        end"""
        assert run(src) == 24.0  # 10+8+6

    def test_while_and_nested_functions_closures(self):
        src = """
        function f()
            local function make(n)
                return function() n = n + 1 return n end
            end
            local c = make(10)
            c() c()
            return c()
        end"""
        assert run(src) == 13.0

    def test_pairs_ipairs(self):
        src = """
        function f(t)
            local ks, s = 0, 0
            for k, v in pairs(t) do ks = ks + 1 end
            for i, v in ipairs(t) do s = s + v end
            return ks, s
        end"""
        t = LuaTable({1: 10.0, 2: 20.0, 3: 30.0, "x": 1.0})
        assert run(src, "f", t) == (4.0, 60.0)

    def test_string_library(self):
        src = """
        function f(s)
            return string.upper(s), s:lower(), string.sub(s, 2, -2),
                   #s, string.rep('ab', 2), string.format('%05.1f|%s', 3.25, s)
        end"""
        out = run(src, "f", "MiXeD")
        assert out == ("MIXED", "mixed", "iXe", 5.0, "abab", "003.2|MiXeD")

    def test_table_library_and_length(self):
        src = """
        function f()
            local t = {}
            table.insert(t, 'a')
            table.insert(t, 'b')
            table.insert(t, 1, 'z')
            local gone = table.remove(t, 2)
            return #t, table.concat(t, '-'), gone
        end"""
        assert run(src) == (2.0, "z-b", "a")

    def test_table_constructor_mixed(self):
        src = """
        function f()
            local t = {10, 20, x = 'v', ['y z'] = true, 30}
            return t[1], t[3], t.x, t['y z']
        end"""
        assert run(src) == (10.0, 30.0, "v", True)

    def test_tostring_tonumber(self):
        assert run("function f() return tostring(13) end") == "13"
        assert run("function f() return tostring(1.25) end") == "1.25"
        assert run("function f() return tostring(nil) end") == "nil"
        assert run("function f() return tonumber('  7.5 ') end") == 7.5
        assert run("function f() return tonumber('zz') end") is None
        assert run("function f() return tonumber('ff', 16) end") == 255.0

    def test_comments_and_long_strings(self):
        src = """
        -- line comment
        --[[ block
             comment ]]
        function f()
            return [[raw
string]]
        end"""
        assert run(src) == "raw\nstring"

    def test_unsupported_constructs_raise(self):
        with pytest.raises(LuaError):
            MiniLua().execute("function f(...) return ... end")
        with pytest.raises(LuaError):
            MiniLua().execute("repeat x = 1 until true")

    def test_error_builtin(self):
        with pytest.raises(LuaError, match="boom"):
            run("function f() error('boom') end")


class TestHostBridge:
    def test_roundtrip_record(self):
        rec = {"a": 1, "b": "x", "c": [1, 2], "d": {"n": 2.5},
               "e": True, "drop": None}
        t = python_to_lua(rec)
        back = lua_to_python(t)
        assert back == {"a": 1, "b": "x", "c": [1, 2],
                        "d": {"n": 2.5}, "e": True}

    def test_array_table_to_list_and_sparse_to_dict(self):
        assert lua_to_python(LuaTable({1: "a", 2: "b"})) == ["a", "b"]
        assert lua_to_python(LuaTable({1: "a", 3: "b"})) == {1: "a", 3: "b"}

    def test_integral_floats_repack_to_int(self):
        assert lua_to_python(LuaTable({"n": 3.0, "f": 3.5})) == {
            "n": 3, "f": 3.5}


class TestReviewFixesR5:
    """Regressions from the round-5 review: error paths that crashed with
    raw Python exceptions (or silently corrupted control flow) instead of
    Lua semantics."""

    def test_tonumber_with_base_returns_nil_on_garbage(self):
        from fluent_bit_ray.functions.minilua import MiniLua

        lua = MiniLua()
        lua.execute(
            "a = tonumber('ff', 16)\n"
            "b = tonumber('zz', 16)\n"
            "c = tonumber(nil, 16)\n"
        )
        assert lua.get_global("a") == 255.0
        assert lua.get_global("b") is None
        assert lua.get_global("c") is None

    def test_break_escaping_a_function_is_a_lua_error(self):
        import pytest

        from fluent_bit_ray.functions.minilua import LuaError, MiniLua

        lua = MiniLua()
        with pytest.raises(LuaError, match="break outside"):
            lua.execute(
                "function g() break end\n"
                "n = 0\n"
                "while n < 3 do n = n + 1 g() end\n"
            )

    def test_fornum_nil_step_is_a_lua_error(self):
        import pytest

        from fluent_bit_ray.functions.minilua import LuaError, MiniLua

        lua = MiniLua()
        with pytest.raises(LuaError, match="must be a number"):
            lua.execute("for i = 1, 3, nil do end")
