"""minilua — a small pure-Python Lua 5.1-subset interpreter.

Why this exists: the reference's third user-extension surface is
`filter_lua` (plugins/filter_lua/lua.c) — a REAL Lua script defining
`function cb(tag, timestamp, record) -> code, timestamp, record`. The
preferred engine for that in this package is `lupa` (LuaJIT bindings),
but lupa is a compiled extension that cannot be installed in every
deployment (this container has no network and no toolchain). minilua is
the fallback: enough Lua to run the filter-callback scripts the
reference ships and documents, so `.lua` scripts execute everywhere and
the lua.c code 1/0/-1 contract is testable in CI without lupa.

Supported subset (deliberately bounded — filter callbacks, not games):
  - statements: `local` declarations (multi-target), assignment
    (multi-target, table fields), `if/elseif/else/end`, `while`,
    numeric `for`, generic `for ... in pairs/ipairs`, `return` (multi),
    `break`, function definitions (global and local), call statements,
    `do ... end` blocks.
  - expressions: nil/true/false/number/string literals, `..`
    concatenation, arithmetic `+ - * / % ^` (with Lua's string→number
    coercion), comparison `== ~= < <= > >=`, logical `and or not`
    (short-circuit, Lua truthiness: only nil/false are falsy), unary
    `-` and `#`, table constructors `{a=1, ["b"]=2, 3, 4}`, indexing
    `t.k` / `t[k]`, calls, method calls `s:upper()` via the string
    metatable convention.
  - stdlib: tostring, tonumber, type, pairs, ipairs, print (no-op
    stream), error, math.floor/ceil/abs/max/min/huge, string.upper/
    lower/len/sub/rep/format (%s %d %i %f %g %x with width), os.time
    (frozen at construction for determinism), table.insert/remove/concat.
  - numbers are all doubles (Lua 5.1 semantics); `tostring` renders
    with %.14g like luaconf's LUAI_NUMFFORMAT.

NOT supported (raises LuaError at parse time where possible): metatables,
coroutines, goto, varargs `...`, multiple assignment from calls beyond
the last position, `repeat/until`, string patterns (find/gsub/match).

The host bridge (stages/lua.py) converts records dict→LuaTable and back;
array-style tables (consecutive 1..n integer keys) convert to Python
lists, mirroring lupa's behavior and lua_tomsgpack's array rule.
"""

from __future__ import annotations

import math
import re
import time as _time
from typing import Any, Callable, Optional

__all__ = ["MiniLua", "LuaTable", "LuaError", "lua_to_python",
           "python_to_lua"]


class LuaError(RuntimeError):
    pass


class LuaTable:
    """A Lua table: one dict; integer keys are stored as float (Lua
    numbers) but normalized to int for Python-side access helpers."""

    __slots__ = ("data",)

    def __init__(self, data: Optional[dict] = None):
        self.data = data or {}

    def get(self, key):
        return self.data.get(_norm_key(key))

    def set(self, key, value):
        k = _norm_key(key)
        if k is None:
            raise LuaError("table index is nil")
        if value is None:
            self.data.pop(k, None)
        else:
            self.data[k] = value

    def length(self) -> int:
        n = 0
        while (n + 1) in self.data:
            n += 1
        return n

    def __repr__(self):  # pragma: no cover - debug aid
        return f"LuaTable({self.data!r})"


def _norm_key(key):
    # Lua numbers are doubles; t[1] and t[1.0] are the same slot
    if isinstance(key, float) and key.is_integer():
        return int(key)
    if isinstance(key, bool):  # bool keys stay bools (not 0/1)
        return key
    return key


def _tostring(v) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (int, float)):
        return "%.14g" % float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, LuaTable):
        return f"table: 0x{id(v):012x}"
    if callable(v):
        return f"function: 0x{id(v):012x}"
    return str(v)


def _tonumber(v):
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        s = v.strip()
        try:
            if s.lower().startswith(("0x", "-0x")):
                return float(int(s, 16))
            return float(s)
        except ValueError:
            return None
    return None


def _truthy(v) -> bool:
    return v is not None and v is not False


# ------------------------------------------------------------------ lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|--\[\[.*?\]\]|--[^\n]*)
  | (?P<num>0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_]\w*)
  | (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<op>\.\.\.|\.\.|==|~=|<=|>=|[#+\-*/%^<>=(){}\[\];:,.])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for",
    "function", "if", "in", "local", "nil", "not", "or", "repeat",
    "return", "then", "true", "until", "while",
}

_STR_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b",
                "f": "\f", "v": "\v", "\\": "\\", '"': '"', "'": "'",
                "\n": "\n", "0": "\0"}


def _unquote(s: str) -> str:
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt.isdigit():  # \ddd decimal escapes
                j = i + 1
                num = ""
                while j < len(body) and len(num) < 3 and body[j].isdigit():
                    num += body[j]
                    j += 1
                out.append(chr(int(num)))
                i = j
                continue
            out.append(_STR_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _tokenize(src: str) -> list[tuple[str, str, int]]:
    toks = []
    pos = 0
    line = 1
    # long strings [[...]] (used by multi-line script constants)
    src = src.replace("\r\n", "\n")
    while pos < len(src):
        if src.startswith("[[", pos):
            end = src.find("]]", pos + 2)
            if end < 0:
                raise LuaError(f"unterminated long string at line {line}")
            raw = src[pos + 2:end]
            toks.append(("str_raw", raw, line))
            line += raw.count("\n")
            pos = end + 2
            continue
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise LuaError(
                f"lua lex error at line {line}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        line += text.count("\n")
        if kind == "ws":
            continue
        if kind == "name" and text in _KEYWORDS:
            toks.append(("kw", text, line))
        else:
            toks.append((kind, text, line))
    toks.append(("eof", "", line))
    return toks


# ----------------------------------------------------------------- parser
# AST: tuples ("node_kind", ...). Expressions and statements are plain
# tuples so the evaluator is one dispatch dict away.


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, text=None):
        k, v, line = self.next()
        if k != kind or (text is not None and v != text):
            raise LuaError(
                f"lua parse error line {line}: expected "
                f"{text or kind}, got {v!r}")
        return v

    def accept(self, kind, text=None):
        k, v, _ = self.peek()
        if k == kind and (text is None or v == text):
            self.next()
            return True
        return False

    # ---- blocks / statements

    def parse_chunk(self):
        body = self.parse_block(("eof",))
        self.expect("eof")
        return body

    def parse_block(self, stop_kws):
        stmts = []
        while True:
            k, v, _ = self.peek()
            if k == "eof" or (k == "kw" and v in stop_kws):
                return stmts
            if k == "op" and v == ";":
                self.next()
                continue
            stmts.append(self.parse_statement())

    def parse_statement(self):
        k, v, line = self.peek()
        if k == "kw":
            if v == "local":
                return self.parse_local()
            if v == "if":
                return self.parse_if()
            if v == "while":
                return self.parse_while()
            if v == "for":
                return self.parse_for()
            if v == "function":
                return self.parse_function_stmt()
            if v == "return":
                self.next()
                exprs = []
                k2, v2, _ = self.peek()
                if not (k2 == "eof" or (k2 == "kw" and v2 in (
                        "end", "else", "elseif")) or (k2 == "op" and v2 == ";")):
                    exprs.append(self.parse_expr())
                    while self.accept("op", ","):
                        exprs.append(self.parse_expr())
                return ("return", exprs)
            if v == "break":
                self.next()
                return ("break",)
            if v == "do":
                self.next()
                body = self.parse_block(("end",))
                self.expect("kw", "end")
                return ("do", body)
            if v in ("repeat", "until"):
                raise LuaError(f"minilua: repeat/until unsupported "
                               f"(line {line})")
        # expression statement: call or assignment
        target = self.parse_prefix_expr()
        k2, v2, _ = self.peek()
        if (k2 == "op" and v2 in ("=", ",")):
            targets = [target]
            while self.accept("op", ","):
                targets.append(self.parse_prefix_expr())
            self.expect("op", "=")
            values = [self.parse_expr()]
            while self.accept("op", ","):
                values.append(self.parse_expr())
            for t in targets:
                if t[0] not in ("name", "index"):
                    raise LuaError(f"cannot assign to {t[0]} (line {line})")
            return ("assign", targets, values)
        if target[0] not in ("call", "method"):
            raise LuaError(f"unexpected expression statement (line {line})")
        return ("exprstat", target)

    def parse_local(self):
        self.expect("kw", "local")
        if self.accept("kw", "function"):
            name = self.expect("name")
            fn = self.parse_funcbody()
            return ("localfunc", name, fn)
        names = [self.expect("name")]
        while self.accept("op", ","):
            names.append(self.expect("name"))
        values = []
        if self.accept("op", "="):
            values.append(self.parse_expr())
            while self.accept("op", ","):
                values.append(self.parse_expr())
        return ("local", names, values)

    def parse_if(self):
        self.expect("kw", "if")
        branches = []
        cond = self.parse_expr()
        self.expect("kw", "then")
        body = self.parse_block(("elseif", "else", "end"))
        branches.append((cond, body))
        while True:
            k, v, _ = self.peek()
            if k == "kw" and v == "elseif":
                self.next()
                c = self.parse_expr()
                self.expect("kw", "then")
                b = self.parse_block(("elseif", "else", "end"))
                branches.append((c, b))
                continue
            break
        else_body = []
        if self.accept("kw", "else"):
            else_body = self.parse_block(("end",))
        self.expect("kw", "end")
        return ("if", branches, else_body)

    def parse_while(self):
        self.expect("kw", "while")
        cond = self.parse_expr()
        self.expect("kw", "do")
        body = self.parse_block(("end",))
        self.expect("kw", "end")
        return ("while", cond, body)

    def parse_for(self):
        self.expect("kw", "for")
        name = self.expect("name")
        if self.accept("op", "="):
            start = self.parse_expr()
            self.expect("op", ",")
            stop = self.parse_expr()
            step = None
            if self.accept("op", ","):
                step = self.parse_expr()
            self.expect("kw", "do")
            body = self.parse_block(("end",))
            self.expect("kw", "end")
            return ("fornum", name, start, stop, step, body)
        names = [name]
        while self.accept("op", ","):
            names.append(self.expect("name"))
        self.expect("kw", "in")
        iters = [self.parse_expr()]
        while self.accept("op", ","):
            iters.append(self.parse_expr())
        self.expect("kw", "do")
        body = self.parse_block(("end",))
        self.expect("kw", "end")
        return ("forin", names, iters, body)

    def parse_function_stmt(self):
        self.expect("kw", "function")
        # funcname: Name {'.' Name} [':' Name]
        target = ("name", self.expect("name"))
        is_method = False
        while True:
            if self.accept("op", "."):
                target = ("index", target, ("const", self.expect("name")))
                continue
            if self.accept("op", ":"):
                target = ("index", target, ("const", self.expect("name")))
                is_method = True
            break
        fn = self.parse_funcbody(is_method=is_method)
        return ("assign", [target], [fn])

    def parse_funcbody(self, is_method: bool = False):
        self.expect("op", "(")
        params = ["self"] if is_method else []
        if not self.accept("op", ")"):
            while True:
                k, v, line = self.peek()
                if k == "op" and v == "...":
                    raise LuaError(f"minilua: varargs unsupported "
                                   f"(line {line})")
                params.append(self.expect("name"))
                if not self.accept("op", ","):
                    break
            self.expect("op", ")")
        body = self.parse_block(("end",))
        self.expect("kw", "end")
        return ("function", params, body)

    # ---- expressions (precedence climbing)

    _BINPREC = {
        "or": (1, 1), "and": (2, 2),
        "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3),
        "~=": (3, 3), "==": (3, 3),
        "..": (5, 4),  # right associative
        "+": (6, 6), "-": (6, 6),
        "*": (7, 7), "/": (7, 7), "%": (7, 7),
        "^": (10, 9),  # right associative, binds above unary
    }

    def parse_expr(self, min_prec: int = 0):
        left = self.parse_unary()
        while True:
            k, v, _ = self.peek()
            op = v if (k == "op" or (k == "kw" and v in ("and", "or"))) else None
            if op not in self._BINPREC:
                return left
            lp, rp = self._BINPREC[op]
            if lp <= min_prec:
                return left
            self.next()
            right = self.parse_expr(rp)
            left = ("binop", op, left, right)

    def parse_unary(self):
        k, v, _ = self.peek()
        if (k == "op" and v in ("-", "#")) or (k == "kw" and v == "not"):
            self.next()
            operand = self.parse_expr(8)  # unary binds above binops bar ^
            return ("unop", v, operand)
        return self.parse_postfix()

    def parse_postfix(self):
        return self.parse_prefix_expr(allow_simple=True)

    def parse_prefix_expr(self, allow_simple: bool = False):
        k, v, line = self.peek()
        if allow_simple:
            if k == "kw" and v in ("nil", "true", "false"):
                self.next()
                return ("const",
                        None if v == "nil" else (v == "true"))
            if k == "num":
                self.next()
                if v.lower().startswith("0x"):
                    return ("const", float(int(v, 16)))
                return ("const", float(v))
            if k == "str":
                self.next()
                return ("const", _unquote(v))
            if k == "str_raw":
                self.next()
                return ("const", v)
            if k == "op" and v == "{":
                return self.parse_table()
            if k == "kw" and v == "function":
                self.next()
                return self.parse_funcbody()
        if k == "op" and v == "(":
            self.next()
            e = self.parse_expr()
            self.expect("op", ")")
            base = e
        elif k == "name":
            self.next()
            base = ("name", v)
        else:
            raise LuaError(f"lua parse error line {line}: "
                           f"unexpected {v!r}")
        # suffixes
        while True:
            k, v, _ = self.peek()
            if k == "op" and v == ".":
                self.next()
                base = ("index", base, ("const", self.expect("name")))
            elif k == "op" and v == "[":
                self.next()
                idx = self.parse_expr()
                self.expect("op", "]")
                base = ("index", base, idx)
            elif k == "op" and v == "(":
                base = ("call", base, self.parse_args())
            elif k == "str":
                self.next()  # f"literal" call sugar
                base = ("call", base, [("const", _unquote(v))])
            elif k == "op" and v == ":":
                self.next()
                meth = self.expect("name")
                base = ("method", base, meth, self.parse_args())
            elif k == "op" and v == "{":
                base = ("call", base, [self.parse_table()])
            else:
                return base

    def parse_args(self):
        self.expect("op", "(")
        args = []
        if not self.accept("op", ")"):
            args.append(self.parse_expr())
            while self.accept("op", ","):
                args.append(self.parse_expr())
            self.expect("op", ")")
        return args

    def parse_table(self):
        self.expect("op", "{")
        items = []  # ("kv", kexpr, vexpr) | ("arr", vexpr)
        while not self.accept("op", "}"):
            k, v, _ = self.peek()
            if k == "op" and v == "[":
                self.next()
                key = self.parse_expr()
                self.expect("op", "]")
                self.expect("op", "=")
                items.append(("kv", key, self.parse_expr()))
            elif k == "name" and self.toks[self.i + 1][:2] == ("op", "="):
                self.next()
                self.next()
                items.append(("kv", ("const", v), self.parse_expr()))
            else:
                items.append(("arr", self.parse_expr()))
            if not (self.accept("op", ",") or self.accept("op", ";")):
                self.expect("op", "}")
                break
        return ("table", items)


# -------------------------------------------------------------- evaluator


class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, values):
        self.values = values


class _Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def lookup(self, name):
        env = self
        while env is not None:
            if name in env.vars:
                return env.vars[name]
            env = env.parent
        return None

    def set_existing(self, name, value) -> bool:
        env = self
        while env is not None:
            if name in env.vars:
                env.vars[name] = value
                return True
            env = env.parent
        return False

    def declare(self, name, value):
        self.vars[name] = value


class _LuaFunction:
    __slots__ = ("params", "body", "env", "interp")

    def __init__(self, params, body, env, interp):
        self.params = params
        self.body = body
        self.env = env
        self.interp = interp

    def __call__(self, *args):
        env = _Env(self.env)
        for i, p in enumerate(self.params):
            env.declare(p, args[i] if i < len(args) else None)
        try:
            self.interp._exec_block(self.body, env)
        except _Return as r:
            return tuple(r.values)
        except _Break:
            # real Lua rejects `break` outside a loop at compile time; a
            # _Break escaping a call would silently terminate the CALLER's
            # loop — surface it as a script error instead
            raise LuaError("break outside a loop") from None
        return ()


def _tonumber_base(v, base=None):
    """Global tonumber: with a base, unparseable input returns nil (real
    Lua semantics — the defensive `if tonumber(x, 16) then` idiom must
    not raise), not a Python ValueError."""
    if base is None:
        return _tonumber(v)
    try:
        return float(int(str(v).strip(), int(base)))
    except (ValueError, TypeError):
        return None


def _num2(op, a, b):
    x, y = _tonumber(a), _tonumber(b)
    if x is None or y is None:
        bad = a if x is None else b
        raise LuaError(
            f"attempt to perform arithmetic on a "
            f"{'nil' if bad is None else type(bad).__name__} value")
    return x, y


class MiniLua:
    """One interpreter = one global environment (a lua_State analog)."""

    def __init__(self):
        self.globals = _Env()
        self._install_stdlib()

    # ---- host API (the bridge in stages/lua.py uses exactly these)

    def execute(self, src: str) -> None:
        body = _Parser(_tokenize(src)).parse_chunk()
        self._exec_block(body, self.globals)

    def get_global(self, name: str):
        return self.globals.lookup(name)

    # ---- stdlib

    def _install_stdlib(self):
        g = self.globals
        now = float(int(_time.time()))  # frozen: deterministic reruns

        def lua_print(*args):  # records are data, not stdout: no-op sink
            return ()

        def lua_error(msg=None, _level=None):
            raise LuaError(_tostring(msg))

        def lua_type(v):
            if v is None:
                return "nil"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, LuaTable):
                return "table"
            return "function"

        def lua_pairs(t):
            items = list(t.data.items())
            idx = [0]

            def nxt(*_):
                if idx[0] >= len(items):
                    return None
                k, v = items[idx[0]]
                idx[0] += 1
                return (float(k) if isinstance(k, int) else k, v)

            return (nxt, t, None)

        def lua_ipairs(t):
            idx = [0]

            def nxt(*_):
                idx[0] += 1
                v = t.get(idx[0])
                if v is None:
                    return None
                return (float(idx[0]), v)

            return (nxt, t, 0.0)

        def str_format(fmt, *args):
            out = []
            i = 0
            ai = 0
            while i < len(fmt):
                c = fmt[i]
                if c != "%":
                    out.append(c)
                    i += 1
                    continue
                m = re.match(r"%([-+ #0]*\d*\.?\d*)([sdifgGxXeEc%])",
                             fmt[i:])
                if not m:
                    raise LuaError(f"invalid format string {fmt!r}")
                flags, conv = m.groups()
                i += m.end()
                if conv == "%":
                    out.append("%")
                    continue
                a = args[ai] if ai < len(args) else None
                ai += 1
                if conv == "s":
                    out.append(("%" + flags + "s") % _tostring(a))
                elif conv in "di":
                    out.append(("%" + flags + "d") % int(_tonumber(a)))
                elif conv == "c":
                    out.append(chr(int(_tonumber(a))))
                elif conv in "xX":
                    out.append(("%" + flags + conv) % int(_tonumber(a)))
                else:
                    out.append(("%" + flags + conv) % _tonumber(a))
            return "".join(out)

        def str_sub(s, i, j=None):
            n = len(s)
            i = int(i)
            j = n if j is None else int(j)
            if i < 0:
                i = max(n + i + 1, 1)
            elif i == 0:
                i = 1
            if j < 0:
                j = n + j + 1
            elif j > n:
                j = n
            if i > j:
                return ""
            return s[i - 1:j]

        def tbl_insert(t, a, b=None):
            if b is None:
                t.set(t.length() + 1, a)
            else:
                pos = int(a)
                for k in range(t.length(), pos - 1, -1):
                    t.set(k + 1, t.get(k))
                t.set(pos, b)
            return ()

        def tbl_remove(t, pos=None):
            n = t.length()
            if n == 0:
                return None
            pos = n if pos is None else int(pos)
            v = t.get(pos)
            for k in range(pos, n):
                t.set(k, t.get(k + 1))
            t.set(n, None)
            return v

        def tbl_concat(t, sep=""):
            return _tostring(sep).join(
                _tostring(t.get(k + 1)) for k in range(t.length()))

        string_lib = LuaTable({
            "upper": lambda s: str(s).upper(),
            "lower": lambda s: str(s).lower(),
            "len": lambda s: float(len(str(s))),
            "sub": str_sub,
            "rep": lambda s, n: str(s) * int(n),
            "format": str_format,
            "reverse": lambda s: str(s)[::-1],
            "byte": lambda s, i=1: float(ord(str(s)[int(i) - 1])),
            "char": lambda *a: "".join(chr(int(x)) for x in a),
        })
        self._string_lib = string_lib

        g.declare("print", lua_print)
        g.declare("error", lua_error)
        g.declare("type", lua_type)
        g.declare("tostring", _tostring)
        g.declare("tonumber", _tonumber_base)
        g.declare("pairs", lua_pairs)
        g.declare("ipairs", lua_ipairs)
        g.declare("string", string_lib)
        g.declare("math", LuaTable({
            "floor": lambda x: float(math.floor(_tonumber(x))),
            "ceil": lambda x: float(math.ceil(_tonumber(x))),
            "abs": lambda x: float(abs(_tonumber(x))),
            "max": lambda *a: float(max(_tonumber(x) for x in a)),
            "min": lambda *a: float(min(_tonumber(x) for x in a)),
            "huge": math.inf,
            "sqrt": lambda x: float(math.sqrt(_tonumber(x))),
            "pow": lambda x, y: float(_tonumber(x) ** _tonumber(y)),
        }))
        g.declare("table", LuaTable({
            "insert": tbl_insert,
            "remove": tbl_remove,
            "concat": tbl_concat,
            "getn": lambda t: float(t.length()),
        }))
        g.declare("os", LuaTable({
            "time": lambda *_: now,
            "clock": lambda *_: now,
        }))

    # ---- execution

    def _exec_block(self, stmts, env):
        for st in stmts:
            self._exec_stmt(st, env)

    def _exec_stmt(self, st, env):
        kind = st[0]
        if kind == "local":
            _, names, values = st
            vals = self._eval_list(values, env, want=len(names))
            for n, v in zip(names, vals):
                env.declare(n, v)
        elif kind == "localfunc":
            _, name, fnexpr = st
            env.declare(name, None)
            env.vars[name] = self._eval(fnexpr, env)
        elif kind == "assign":
            _, targets, values = st
            vals = self._eval_list(values, env, want=len(targets))
            for t, v in zip(targets, vals):
                if t[0] == "name":
                    if not env.set_existing(t[1], v):
                        self.globals.declare(t[1], v)
                else:  # index
                    obj = self._eval(t[1], env)
                    if not isinstance(obj, LuaTable):
                        raise LuaError(
                            f"attempt to index a "
                            f"{'nil' if obj is None else 'non-table'} value")
                    obj.set(self._eval(t[2], env), v)
        elif kind == "exprstat":
            self._eval(st[1], env)
        elif kind == "if":
            _, branches, else_body = st
            for cond, body in branches:
                if _truthy(self._eval(cond, env)):
                    self._exec_block(body, _Env(env))
                    return
            self._exec_block(else_body, _Env(env))
        elif kind == "while":
            _, cond, body = st
            while _truthy(self._eval(cond, env)):
                try:
                    self._exec_block(body, _Env(env))
                except _Break:
                    break
        elif kind == "fornum":
            _, name, e1, e2, e3, body = st
            i = _tonumber(self._eval(e1, env))
            stop = _tonumber(self._eval(e2, env))
            step = _tonumber(self._eval(e3, env)) if e3 is not None else 1.0
            if i is None or stop is None or step is None or step == 0:
                raise LuaError("'for' initial/limit/step must be a number")
            while (step > 0 and i <= stop) or (step < 0 and i >= stop):
                e = _Env(env)
                e.declare(name, i)
                try:
                    self._exec_block(body, e)
                except _Break:
                    break
                i += step
        elif kind == "forin":
            _, names, iters, body = st
            vals = self._eval_list(iters, env, want=3)
            fn, state, ctrl = vals[0], vals[1], vals[2]
            while True:
                res = fn(state, ctrl)
                if isinstance(res, tuple):
                    res = res if res else (None,)
                else:
                    res = (res,)
                if res[0] is None:
                    break
                ctrl = res[0]
                e = _Env(env)
                for i, n in enumerate(names):
                    e.declare(n, res[i] if i < len(res) else None)
                try:
                    self._exec_block(body, e)
                except _Break:
                    break
        elif kind == "do":
            self._exec_block(st[1], _Env(env))
        elif kind == "return":
            raise _Return(self._eval_list(st[1], env, want=None))
        elif kind == "break":
            raise _Break()
        else:  # pragma: no cover - parser enumerates kinds
            raise LuaError(f"unknown statement {kind}")

    def _eval_list(self, exprs, env, want):
        """Evaluate an expression list with Lua's last-position expansion:
        a call in the final slot contributes ALL its return values."""
        vals: list = []
        for i, e in enumerate(exprs):
            v = self._eval_multi(e, env)
            if i == len(exprs) - 1:
                vals.extend(v)
            else:
                vals.append(v[0] if v else None)
        if want is None:
            return vals
        while len(vals) < want:
            vals.append(None)
        return vals[:want]

    def _eval_multi(self, expr, env) -> tuple:
        if expr[0] in ("call", "method"):
            r = self._eval_call(expr, env)
            return r if isinstance(r, tuple) else (r,)
        return (self._eval(expr, env),)

    def _eval(self, expr, env):
        kind = expr[0]
        if kind == "const":
            return expr[1]
        if kind == "name":
            return env.lookup(expr[1])
        if kind == "index":
            obj = self._eval(expr[1], env)
            key = self._eval(expr[2], env)
            if isinstance(obj, LuaTable):
                return obj.get(key)
            if isinstance(obj, str):  # string metatable: s.upper etc.
                return self._string_lib.get(key)
            raise LuaError(
                f"attempt to index a "
                f"{'nil' if obj is None else type(obj).__name__} value")
        if kind in ("call", "method"):
            r = self._eval_call(expr, env)
            if isinstance(r, tuple):
                return r[0] if r else None
            return r
        if kind == "function":
            return _LuaFunction(expr[1], expr[2], env, self)
        if kind == "table":
            t = LuaTable()
            arr = 0
            for item in expr[1]:
                if item[0] == "kv":
                    t.set(self._eval(item[1], env),
                          self._eval(item[2], env))
                else:
                    arr += 1
                    t.set(arr, self._eval(item[1], env))
            return t
        if kind == "binop":
            return self._eval_binop(expr, env)
        if kind == "unop":
            _, op, operand = expr
            v = self._eval(operand, env)
            if op == "-":
                n = _tonumber(v)
                if n is None:
                    raise LuaError("attempt to perform arithmetic")
                return -n
            if op == "not":
                return not _truthy(v)
            if op == "#":
                if isinstance(v, str):
                    return float(len(v))
                if isinstance(v, LuaTable):
                    return float(v.length())
                raise LuaError("attempt to get length")
        raise LuaError(f"unknown expression {kind}")  # pragma: no cover

    def _eval_call(self, expr, env):
        if expr[0] == "method":
            _, base, meth, argexprs = expr
            obj = self._eval(base, env)
            if isinstance(obj, str):
                fn = self._string_lib.get(meth)
                args = [obj]
            elif isinstance(obj, LuaTable):
                fn = obj.get(meth)
                args = [obj]
            else:
                raise LuaError("attempt to call a method on a non-object")
            args += [self._eval(a, env) for a in argexprs]
        else:
            _, fnexpr, argexprs = expr
            fn = self._eval(fnexpr, env)
            args = [self._eval(a, env) for a in argexprs]
        if not callable(fn):
            raise LuaError(
                f"attempt to call a "
                f"{'nil' if fn is None else type(fn).__name__} value")
        return fn(*args)

    def _eval_binop(self, expr, env):
        _, op, le, re_ = expr
        if op == "and":
            l = self._eval(le, env)
            return self._eval(re_, env) if _truthy(l) else l
        if op == "or":
            l = self._eval(le, env)
            return l if _truthy(l) else self._eval(re_, env)
        a = self._eval(le, env)
        b = self._eval(re_, env)
        if op == "..":
            for v in (a, b):
                if not isinstance(v, (str, int, float)) or isinstance(
                        v, bool):
                    raise LuaError("attempt to concatenate a "
                                   f"{'nil' if v is None else 'non-string'}"
                                   " value")
            return _tostring(a) + _tostring(b)
        if op == "==":
            return self._lua_eq(a, b)
        if op == "~=":
            return not self._lua_eq(a, b)
        if op in ("<", "<=", ">", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            elif (isinstance(a, (int, float)) and not isinstance(a, bool)
                  and isinstance(b, (int, float))
                  and not isinstance(b, bool)):
                pass
            else:
                raise LuaError("attempt to compare "
                               f"{type(a).__name__} with {type(b).__name__}")
            if op == "<":
                return a < b
            if op == "<=":
                return a <= b
            if op == ">":
                return a > b
            return a >= b
        x, y = _num2(op, a, b)
        if op == "+":
            return x + y
        if op == "-":
            return x - y
        if op == "*":
            return x * y
        if op == "/":
            return x / y if y != 0 else (
                math.inf if x > 0 else -math.inf if x < 0 else math.nan)
        if op == "%":
            return x - math.floor(x / y) * y if y != 0 else math.nan
        if op == "^":
            return float(x) ** float(y)
        raise LuaError(f"unknown operator {op}")  # pragma: no cover

    @staticmethod
    def _lua_eq(a, b) -> bool:
        # no number/string coercion in ==; bools only equal bools
        if isinstance(a, bool) or isinstance(b, bool):
            return a is b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return float(a) == float(b)
        if type(a) is not type(b) and not (
                isinstance(a, str) and isinstance(b, str)):
            return a is b
        if isinstance(a, (str, int, float)):
            return a == b
        return a is b  # tables/functions: identity


# ---------------------------------------------------- host conversions


def python_to_lua(obj):
    """dict/list/scalar -> LuaTable/scalar (the record crossing INTO the
    script; mirrors lupa's table_from + flb_lua_pushmsgpack)."""
    if isinstance(obj, dict):
        return LuaTable({
            _norm_key(k): python_to_lua(v)
            for k, v in obj.items() if v is not None})
    if isinstance(obj, (list, tuple)):
        return LuaTable({i + 1: python_to_lua(v)
                         for i, v in enumerate(obj) if v is not None})
    if isinstance(obj, bool) or obj is None or isinstance(obj, str):
        return obj
    if isinstance(obj, (int, float)):
        return float(obj)
    if isinstance(obj, bytes):
        return obj.decode("utf-8", "replace")
    return obj


def lua_to_python(obj):
    """LuaTable/scalar -> dict/list/scalar; array-style tables
    (consecutive 1..n integer keys) become lists (lua_tomsgpack's array
    rule, flb_lua.c), other tables become dicts with integer keys kept."""
    if isinstance(obj, LuaTable):
        keys = list(obj.data.keys())
        ints = [k for k in keys if isinstance(k, int)
                and not isinstance(k, bool)]
        if keys and len(ints) == len(keys) and sorted(ints) == list(
                range(1, len(keys) + 1)):
            return [lua_to_python(obj.data[k]) for k in sorted(ints)]
        return {k: lua_to_python(v) for k, v in obj.data.items()}
    if isinstance(obj, float) and obj.is_integer() and abs(obj) < 2**63:
        return int(obj)
    return obj
