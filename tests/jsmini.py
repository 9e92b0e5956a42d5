"""jsmini — a minimal ES5-subset JavaScript interpreter for the test suite.

The image ships no JS runtime (no node, no embeddable engine), yet the UI's
pure logic (ui/assets/analysis.js — the client-side spectrum/chroma
fallback — plus freshIds / pushRing / legendHit / smoothSeries / fmtHz in
app.js / plots.js) deserves real executable oracles, not structural greps
(VERDICT r4 #8).  This module interprets the deliberately-plain subset those
functions are written in:

  statements   var/let/const, function, return, if/else, for(;;), for..of,
               while, break/continue, blocks, expression statements
  expressions  assignment (= and compound), ternary, ?? || && | ^ &,
               (in)equality, relational, shifts, + - * / %, unary
               (- + ! ~ typeof), ++/-- (pre/post), calls, new, member
               access, array/object literals, function expressions, arrow
               functions
  stdlib       Math, JSON, Array.from/new Array(n), console.log, number
               .toFixed, string/array .length/.slice/.map/.push/...

Semantics follow JS where the target code depends on them: int32 bit ops,
undefined vs null, Math.round(x) = floor(x+0.5), integer-valued numbers
print without a decimal point.  Anything outside the subset raises
JSMiniError at parse time — a test failure, not a silent skip.

This is a test harness, not a sandbox: do not run untrusted code through it.
"""

from __future__ import annotations

import json as _json
import math as _math
import re as _re


class JSMiniError(Exception):
    pass


# ------------------------------ values ------------------------------------


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"


class _Null:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "null"


UNDEF = _Undefined()
NULL = _Null()


class JSArray:
    __slots__ = ("items",)

    def __init__(self, items=None):
        self.items = list(items) if items is not None else []

    def __repr__(self):
        return f"JSArray({self.items!r})"


class JSObject:
    __slots__ = ("props",)

    def __init__(self, props=None):
        self.props = dict(props) if props is not None else {}

    def __repr__(self):
        return f"JSObject({self.props!r})"


class JSFunction:
    __slots__ = ("name", "params", "body", "env", "is_expr_body")

    def __init__(self, name, params, body, env, is_expr_body=False):
        self.name = name
        self.params = params
        self.body = body
        self.env = env
        self.is_expr_body = is_expr_body


class JSFloat32Array:
    """Host stand-in for Float32Array: index get/set, .length, .copyWithin,
    .set, .fill — what pushRing and the plot code touch."""

    __slots__ = ("data",)

    def __init__(self, arg):
        import numpy as np

        if isinstance(arg, (int, float)):
            self.data = np.zeros(int(arg), np.float32)
        else:
            self.data = np.asarray(list(arg), np.float32)

    def __len__(self):
        return len(self.data)


class _Hybrid:
    """Callable-with-properties (e.g. Array: both `new Array(n)` and
    `Array.from`)."""

    __slots__ = ("fn", "props", "_js_ctor")

    def __init__(self, fn, obj):
        self.fn = fn
        self.props = obj.props
        self._js_ctor = True

    def __call__(self, args):
        return self.fn(args)


# ------------------------------ lexer --------------------------------------

_PUNCT = sorted(
    [
        "===", "!==", "**=", "<<=", ">>=", ">>>", "...", "=>", "==", "!=",
        "<=", ">=", "&&", "||", "??", "++", "--", "+=", "-=", "*=", "/=",
        "%=", "&=", "|=", "^=", "<<", ">>", "**", "{", "}", "(", ")", "[",
        "]", ";", ",", "<", ">", "+", "-", "*", "/", "%", "&", "|", "^",
        "~", "!", "?", ":", "=", ".",
    ],
    key=len,
    reverse=True,
)

_KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "for", "of",
    "while", "do", "break", "continue", "new", "typeof", "true", "false",
    "null", "undefined", "in", "instanceof", "this",
}

_NUM_RE = _re.compile(r"0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?")
_IDENT_RE = _re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")


def _tokenize(src):
    toks = []
    i, n = 0, len(src)
    line = 1
    while i < n:
        c = src[i]
        if c in " \t\r":
            i += 1
            continue
        if c == "\n":
            line += 1
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise JSMiniError(f"unterminated comment at line {line}")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                                "'": "'", '"': '"', "0": "\0", "`": "`"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSMiniError(f"unterminated string at line {line}")
            toks.append(("str", "".join(buf), line))
            i = j + 1
            continue
        m = _NUM_RE.match(src, i)
        if m and c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            m = _NUM_RE.match(src, i)
            text = m.group(0)
            val = float(int(text, 16)) if text[:2].lower() == "0x" else float(text)
            toks.append(("num", val, line))
            i = m.end()
            continue
        m = _IDENT_RE.match(src, i)
        if m:
            toks.append(("ident", m.group(0), line))
            i = m.end()
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(("punct", p, line))
                i += len(p)
                break
        else:
            raise JSMiniError(f"unexpected character {c!r} at line {line}")
    toks.append(("eof", None, line))
    return toks


# ------------------------------ parser -------------------------------------


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.pos = 0

    # -- token helpers
    def peek(self, k=0):
        return self.toks[self.pos + k]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def at(self, typ, val=None):
        t = self.peek()
        return t[0] == typ and (val is None or t[1] == val)

    def at_punct(self, val):
        return self.at("punct", val)

    def at_kw(self, val):
        return self.at("ident", val)

    def expect(self, typ, val=None):
        t = self.next()
        if t[0] != typ or (val is not None and t[1] != val):
            raise JSMiniError(f"expected {val or typ}, got {t[1]!r} at line {t[2]}")
        return t

    def eat(self, typ, val=None):
        if self.at(typ, val):
            return self.next()
        return None

    # -- program / statements
    def parse_program(self):
        body = []
        while not self.at("eof"):
            body.append(self.statement())
        return ("block", body)

    def statement(self):
        if self.at_punct("{"):
            return self.block()
        if self.at_punct(";"):
            self.next()
            return ("empty",)
        t = self.peek()
        if t[0] == "ident":
            kw = t[1]
            if kw in ("var", "let", "const"):
                s = self.var_decl()
                self.eat("punct", ";")
                return s
            if kw == "function":
                return self.func_decl()
            if kw == "return":
                self.next()
                if self.at_punct(";") or self.at_punct("}"):
                    self.eat("punct", ";")
                    return ("return", None)
                e = self.expression()
                self.eat("punct", ";")
                return ("return", e)
            if kw == "if":
                return self.if_stmt()
            if kw == "for":
                return self.for_stmt()
            if kw == "while":
                self.next()
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                return ("while", cond, self.statement())
            if kw == "break":
                self.next()
                self.eat("punct", ";")
                return ("break",)
            if kw == "continue":
                self.next()
                self.eat("punct", ";")
                return ("continue",)
        e = self.expression()
        self.eat("punct", ";")
        return ("expr", e)

    def block(self):
        self.expect("punct", "{")
        body = []
        while not self.at_punct("}"):
            body.append(self.statement())
        self.expect("punct", "}")
        return ("block", body)

    def var_decl(self):
        kind = self.next()[1]
        decls = []
        while True:
            name = self.expect("ident")[1]
            init = None
            if self.eat("punct", "="):
                init = self.assignment()
            decls.append((name, init))
            if not self.eat("punct", ","):
                break
        return ("var", kind, decls)

    def func_decl(self):
        self.expect("ident", "function")
        name = self.expect("ident")[1]
        params = self.param_list()
        body = self.block()
        return ("funcdecl", name, params, body)

    def param_list(self):
        self.expect("punct", "(")
        params = []
        while not self.at_punct(")"):
            params.append(self.expect("ident")[1])
            if not self.eat("punct", ","):
                break
        self.expect("punct", ")")
        return params

    def if_stmt(self):
        self.expect("ident", "if")
        self.expect("punct", "(")
        cond = self.expression()
        self.expect("punct", ")")
        then = self.statement()
        alt = None
        if self.at_kw("else"):
            self.next()
            alt = self.statement()
        return ("if", cond, then, alt)

    def for_stmt(self):
        self.expect("ident", "for")
        self.expect("punct", "(")
        # for (const x of expr)  |  for (init; test; update)
        if self.peek()[0] == "ident" and self.peek()[1] in ("var", "let", "const") \
           and self.peek(2)[0] == "ident" and self.peek(2)[1] == "of":
            self.next()
            name = self.expect("ident")[1]
            self.expect("ident", "of")
            it = self.expression()
            self.expect("punct", ")")
            return ("forof", name, it, self.statement())
        init = None
        if not self.at_punct(";"):
            if self.peek()[0] == "ident" and self.peek()[1] in ("var", "let", "const"):
                init = self.var_decl()
            else:
                init = ("expr", self.expression())
        self.expect("punct", ";")
        test = None if self.at_punct(";") else self.expression()
        self.expect("punct", ";")
        update = None if self.at_punct(")") else self.expression()
        self.expect("punct", ")")
        return ("for", init, test, update, self.statement())

    # -- expressions (precedence climbing)
    def expression(self):
        e = self.assignment()
        while self.at_punct(","):
            self.next()
            r = self.assignment()
            e = ("seq", e, r)
        return e

    _ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
                   "<<=", ">>=", "**="}

    def assignment(self):
        left = self.conditional()
        t = self.peek()
        if t[0] == "punct" and t[1] in self._ASSIGN_OPS:
            op = self.next()[1]
            right = self.assignment()
            if left[0] not in ("ident", "member"):
                raise JSMiniError(f"bad assignment target at line {t[2]}")
            return ("assign", op, left, right)
        return left

    def conditional(self):
        cond = self.nullish()
        if self.at_punct("?"):
            self.next()
            a = self.assignment()
            self.expect("punct", ":")
            b = self.assignment()
            return ("cond", cond, a, b)
        return cond

    def _binary_level(self, ops, sub):
        e = sub()
        while True:
            t = self.peek()
            if t[0] == "punct" and t[1] in ops:
                op = self.next()[1]
                e = (("logical" if op in ("&&", "||", "??") else "binary"),
                     op, e, sub())
            else:
                return e

    def nullish(self):
        return self._binary_level({"??"}, self.logical_or)

    def logical_or(self):
        return self._binary_level({"||"}, self.logical_and)

    def logical_and(self):
        return self._binary_level({"&&"}, self.bit_or)

    def bit_or(self):
        return self._binary_level({"|"}, self.bit_xor)

    def bit_xor(self):
        return self._binary_level({"^"}, self.bit_and)

    def bit_and(self):
        return self._binary_level({"&"}, self.equality)

    def equality(self):
        return self._binary_level({"==", "!=", "===", "!=="}, self.relational)

    def relational(self):
        return self._binary_level({"<", ">", "<=", ">="}, self.shift)

    def shift(self):
        return self._binary_level({"<<", ">>", ">>>"}, self.additive)

    def additive(self):
        return self._binary_level({"+", "-"}, self.multiplicative)

    def multiplicative(self):
        return self._binary_level({"*", "/", "%"}, self.exponent)

    def exponent(self):
        e = self.unary()
        if self.at_punct("**"):
            self.next()
            return ("binary", "**", e, self.exponent())
        return e

    def unary(self):
        t = self.peek()
        if t[0] == "punct" and t[1] in ("-", "+", "!", "~"):
            self.next()
            return ("unary", t[1], self.unary())
        if t[0] == "punct" and t[1] in ("++", "--"):
            self.next()
            return ("update", t[1], self.unary(), True)
        if t[0] == "ident" and t[1] == "typeof":
            self.next()
            return ("unary", "typeof", self.unary())
        return self.postfix()

    def postfix(self):
        e = self.call_member()
        t = self.peek()
        if t[0] == "punct" and t[1] in ("++", "--"):
            self.next()
            return ("update", t[1], e, False)
        return e

    def call_member(self):
        if self.at_kw("new"):
            self.next()
            callee = self.call_member_no_call()
            args = self.arguments() if self.at_punct("(") else []
            e = ("new", callee, args)
        else:
            e = self.primary()
        while True:
            if self.at_punct("."):
                self.next()
                prop = self.expect("ident")[1]
                e = ("member", e, ("str", prop), False)
            elif self.at_punct("["):
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("member", e, idx, True)
            elif self.at_punct("("):
                e = ("call", e, self.arguments())
            else:
                return e

    def call_member_no_call(self):
        e = self.primary()
        while True:
            if self.at_punct("."):
                self.next()
                prop = self.expect("ident")[1]
                e = ("member", e, ("str", prop), False)
            else:
                return e

    def arguments(self):
        self.expect("punct", "(")
        args = []
        while not self.at_punct(")"):
            args.append(self.assignment())
            if not self.eat("punct", ","):
                break
        self.expect("punct", ")")
        return args

    def _try_arrow(self):
        """Lookahead for '(a, b) => ...' / 'a => ...'; returns node or None."""
        start = self.pos
        t = self.peek()
        params = None
        if t[0] == "ident" and t[1] not in _KEYWORDS and \
           self.peek(1)[0] == "punct" and self.peek(1)[1] == "=>":
            params = [t[1]]
            self.pos += 1
        elif t[0] == "punct" and t[1] == "(":
            depth = 0
            j = self.pos
            while True:
                tk = self.toks[j]
                if tk[0] == "eof":
                    self.pos = start
                    return None
                if tk[0] == "punct" and tk[1] == "(":
                    depth += 1
                elif tk[0] == "punct" and tk[1] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            nxt = self.toks[j + 1]
            if not (nxt[0] == "punct" and nxt[1] == "=>"):
                return None
            try:
                params = self.param_list()
            except JSMiniError:
                self.pos = start
                return None
        else:
            return None
        self.expect("punct", "=>")
        if self.at_punct("{"):
            return ("arrow", params, self.block(), False)
        return ("arrow", params, self.assignment(), True)

    def primary(self):
        arrow = self._try_arrow()
        if arrow is not None:
            return arrow
        t = self.next()
        if t[0] == "num":
            return ("num", t[1])
        if t[0] == "str":
            return ("str", t[1])
        if t[0] == "ident":
            v = t[1]
            if v == "true":
                return ("bool", True)
            if v == "false":
                return ("bool", False)
            if v == "null":
                return ("null",)
            if v == "undefined":
                return ("undef",)
            if v == "function":
                name = None
                if self.peek()[0] == "ident":
                    name = self.next()[1]
                params = self.param_list()
                body = self.block()
                return ("funcexpr", name, params, body)
            return ("ident", v)
        if t[0] == "punct":
            if t[1] == "(":
                e = self.expression()
                self.expect("punct", ")")
                return e
            if t[1] == "[":
                elems = []
                while not self.at_punct("]"):
                    elems.append(self.assignment())
                    if not self.eat("punct", ","):
                        break
                self.expect("punct", "]")
                return ("array", elems)
            if t[1] == "{":
                props = []
                while not self.at_punct("}"):
                    k = self.next()
                    if k[0] not in ("ident", "str", "num"):
                        raise JSMiniError(f"bad object key at line {k[2]}")
                    key = k[1] if k[0] != "num" else _js_num_str(k[1])
                    if self.eat("punct", ":"):
                        props.append((key, self.assignment()))
                    else:  # shorthand {a}
                        props.append((key, ("ident", key)))
                    if not self.eat("punct", ","):
                        break
                self.expect("punct", "}")
                return ("object", props)
        raise JSMiniError(f"unexpected token {t[1]!r} at line {t[2]}")


# ------------------------------ runtime ------------------------------------


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def lookup(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars
            e = e.parent
        return None

    def get(self, name):
        d = self.lookup(name)
        if d is None:
            raise JSMiniError(f"{name} is not defined")
        return d[name]

    def set(self, name, value):
        d = self.lookup(name)
        if d is None:
            d = self._root().vars  # implicit global, matches sloppy JS
        d[name] = value

    def declare(self, name, value):
        self.vars[name] = value

    def _root(self):
        e = self
        while e.parent is not None:
            e = e.parent
        return e


def _to_int32(x):
    n = int(_math.floor(abs(x))) * (1 if x >= 0 else -1) & 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _to_uint32(x):
    return int(_math.floor(abs(x))) * (1 if x >= 0 else -1) & 0xFFFFFFFF


def _js_num_str(x):
    if isinstance(x, float) and _math.isfinite(x) and x == int(x) and abs(x) < 1e21:
        return str(int(x))
    if isinstance(x, float) and _math.isnan(x):
        return "NaN"
    return repr(x)


def js_str(v):
    if v is UNDEF:
        return "undefined"
    if v is NULL:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _js_num_str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, JSArray):
        return ",".join("" if x in (UNDEF, NULL) else js_str(x) for x in v.items)
    if isinstance(v, JSObject):
        return "[object Object]"
    return str(v)


def js_truthy(v):
    if v is UNDEF or v is NULL or v is False:
        return False
    if isinstance(v, float):
        return not (v == 0.0 or _math.isnan(v))
    if isinstance(v, str):
        return len(v) > 0
    if v is True:
        return True
    return True


def _strict_eq(a, b):
    if a is UNDEF or b is UNDEF or a is NULL or b is NULL:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def to_js(v):
    """Python -> JS value conversion for test inputs."""
    if v is None:
        return NULL
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple)):
        return JSArray([to_js(x) for x in v])
    if isinstance(v, dict):
        return JSObject({str(k): to_js(x) for k, x in v.items()})
    try:  # numpy array
        import numpy as np

        if isinstance(v, np.ndarray):
            return JSArray([float(x) for x in v.tolist()])
    except ImportError:
        pass
    return v  # host object passthrough


def to_python(v):
    """JS -> Python value conversion for test assertions."""
    if v is UNDEF or v is NULL:
        return None
    if isinstance(v, JSArray):
        return [to_python(x) for x in v.items]
    if isinstance(v, JSObject):
        return {k: to_python(x) for k, x in v.props.items()}
    return v


class Interp:
    def __init__(self):
        self.globals = _Env()
        self._install_stdlib()

    # -- public API
    def run(self, src):
        ast = _Parser(_tokenize(src)).parse_program()
        self._hoist(ast[1], self.globals)
        for stmt in ast[1]:
            self.exec_stmt(stmt, self.globals)

    def call(self, fn, args):
        if isinstance(fn, str):
            fn = self.globals.get(fn)
        return self._call(fn, [to_js(a) for a in args])

    # -- statements
    def _hoist(self, stmts, env):
        for s in stmts:
            if s[0] == "funcdecl":
                _, name, params, body = s
                env.declare(name, JSFunction(name, params, body, env))

    def exec_stmt(self, s, env):
        tag = s[0]
        if tag == "expr":
            self.eval_expr(s[1], env)
        elif tag == "var":
            for name, init in s[2]:
                env.declare(name, UNDEF if init is None else self.eval_expr(init, env))
        elif tag == "funcdecl":
            env.declare(s[1], JSFunction(s[1], s[2], s[3], env))
        elif tag == "block":
            inner = _Env(env)
            self._hoist(s[1], inner)
            for st in s[1]:
                self.exec_stmt(st, inner)
        elif tag == "if":
            if js_truthy(self.eval_expr(s[1], env)):
                self.exec_stmt(s[2], env)
            elif s[3] is not None:
                self.exec_stmt(s[3], env)
        elif tag == "for":
            inner = _Env(env)
            if s[1] is not None:
                self.exec_stmt(s[1], inner)
            while s[2] is None or js_truthy(self.eval_expr(s[2], inner)):
                try:
                    self.exec_stmt(s[4], inner)
                except _Break:
                    break
                except _Continue:
                    pass
                if s[3] is not None:
                    self.eval_expr(s[3], inner)
        elif tag == "forof":
            it = self.eval_expr(s[2], env)
            if isinstance(it, JSArray):
                seq = list(it.items)
            elif isinstance(it, JSFloat32Array):
                seq = [float(x) for x in it.data]
            elif isinstance(it, str):
                seq = list(it)
            else:
                raise JSMiniError(f"for..of over non-iterable {it!r}")
            for v in seq:
                inner = _Env(env)
                inner.declare(s[1], v)
                try:
                    self.exec_stmt(s[3], inner)
                except _Break:
                    break
                except _Continue:
                    continue
        elif tag == "while":
            while js_truthy(self.eval_expr(s[1], env)):
                try:
                    self.exec_stmt(s[2], env)
                except _Break:
                    break
                except _Continue:
                    continue
        elif tag == "return":
            raise _Return(UNDEF if s[1] is None else self.eval_expr(s[1], env))
        elif tag == "break":
            raise _Break()
        elif tag == "continue":
            raise _Continue()
        elif tag == "empty":
            pass
        else:
            raise JSMiniError(f"unknown statement {tag}")

    # -- expressions
    def eval_expr(self, e, env):
        tag = e[0]
        if tag == "num":
            return e[1]
        if tag == "str":
            return e[1]
        if tag == "bool":
            return e[1]
        if tag == "null":
            return NULL
        if tag == "undef":
            return UNDEF
        if tag == "ident":
            return env.get(e[1])
        if tag == "array":
            return JSArray([self.eval_expr(x, env) for x in e[1]])
        if tag == "object":
            return JSObject({k: self.eval_expr(v, env) for k, v in e[1]})
        if tag == "funcexpr":
            return JSFunction(e[1], e[2], e[3], env)
        if tag == "arrow":
            return JSFunction(None, e[1], e[2], env, is_expr_body=e[3])
        if tag == "member":
            obj = self.eval_expr(e[1], env)
            key = self.eval_expr(e[2], env)
            return self._get_member(obj, key)
        if tag == "call":
            return self._eval_call(e, env)
        if tag == "new":
            callee = self.eval_expr(e[1], env)
            args = [self.eval_expr(a, env) for a in e[2]]
            return self._construct(callee, args)
        if tag == "assign":
            return self._eval_assign(e, env)
        if tag == "update":
            return self._eval_update(e, env)
        if tag == "cond":
            return (self.eval_expr(e[2], env) if js_truthy(self.eval_expr(e[1], env))
                    else self.eval_expr(e[3], env))
        if tag == "logical":
            l = self.eval_expr(e[2], env)
            op = e[1]
            if op == "&&":
                return self.eval_expr(e[3], env) if js_truthy(l) else l
            if op == "||":
                return l if js_truthy(l) else self.eval_expr(e[3], env)
            if op == "??":
                return self.eval_expr(e[3], env) if l in (UNDEF, NULL) else l
        if tag == "binary":
            return self._binop(e[1], self.eval_expr(e[2], env),
                               self.eval_expr(e[3], env))
        if tag == "unary":
            op = e[1]
            if op == "typeof":
                if e[2][0] == "ident" and env.lookup(e[2][1]) is None:
                    return "undefined"
                v = self.eval_expr(e[2], env)
                if v is UNDEF:
                    return "undefined"
                if v is NULL:
                    return "object"
                if isinstance(v, bool):
                    return "boolean"
                if isinstance(v, float):
                    return "number"
                if isinstance(v, str):
                    return "string"
                if isinstance(v, JSFunction) or callable(v):
                    return "function"
                return "object"
            v = self.eval_expr(e[2], env)
            if op == "-":
                return -v
            if op == "+":
                return float(v) if not isinstance(v, float) else v
            if op == "!":
                return not js_truthy(v)
            if op == "~":
                return float(~_to_int32(v))
        if tag == "seq":
            self.eval_expr(e[1], env)
            return self.eval_expr(e[2], env)
        raise JSMiniError(f"unknown expression {tag}")

    def _binop(self, op, l, r):
        if op == "+":
            if isinstance(l, str) or isinstance(r, str):
                return js_str(l) + js_str(r)
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            if r == 0:
                return _math.inf if l > 0 else (-_math.inf if l < 0 else _math.nan)
            return l / r
        if op == "%":
            return _math.fmod(l, r) if r != 0 else _math.nan
        if op == "**":
            return l ** r
        if op in ("==", "==="):
            eq = _strict_eq(l, r)
            if op == "==" and not eq:
                eq = (l in (UNDEF, NULL)) and (r in (UNDEF, NULL))
            return eq
        if op in ("!=", "!=="):
            return not self._binop("===" if op == "!==" else "==", l, r)
        if op == "<":
            return l < r
        if op == ">":
            return l > r
        if op == "<=":
            return l <= r
        if op == ">=":
            return l >= r
        if op == "&":
            return float(_to_int32(l) & _to_int32(r))
        if op == "|":
            return float(_to_int32(l) | _to_int32(r))
        if op == "^":
            return float(_to_int32(l) ^ _to_int32(r))
        if op == "<<":
            return float(_to_int32(_to_int32(l) << (_to_uint32(r) & 31)))
        if op == ">>":
            return float(_to_int32(l) >> (_to_uint32(r) & 31))
        if op == ">>>":
            return float(_to_uint32(l) >> (_to_uint32(r) & 31))
        raise JSMiniError(f"unknown operator {op}")

    def _eval_assign(self, e, env):
        _, op, target, rhs = e
        if op != "=":
            cur = self.eval_expr(target, env)
            val = self._binop(op[:-1], cur, self.eval_expr(rhs, env))
        else:
            val = self.eval_expr(rhs, env)
        self._store(target, val, env)
        return val

    def _eval_update(self, e, env):
        _, op, target, prefix = e
        cur = self.eval_expr(target, env)
        new = cur + (1.0 if op == "++" else -1.0)
        self._store(target, new, env)
        return new if prefix else cur

    def _store(self, target, val, env):
        if target[0] == "ident":
            env.set(target[1], val)
        elif target[0] == "member":
            obj = self.eval_expr(target[1], env)
            key = self.eval_expr(target[2], env)
            self._set_member(obj, key, val)
        else:
            raise JSMiniError("bad assignment target")

    # -- member protocol
    def _get_member(self, obj, key):
        if isinstance(obj, _Hybrid):
            return obj.props.get(js_str(key), UNDEF)
        if isinstance(obj, JSObject):
            k = js_str(key)
            return obj.props.get(k, UNDEF)
        if isinstance(obj, JSArray):
            if isinstance(key, float):
                i = int(key)
                return obj.items[i] if 0 <= i < len(obj.items) else UNDEF
            return self._array_method(obj, key)
        if isinstance(obj, JSFloat32Array):
            if isinstance(key, float):
                i = int(key)
                return float(obj.data[i]) if 0 <= i < len(obj.data) else UNDEF
            return self._f32_method(obj, key)
        if isinstance(obj, str):
            if isinstance(key, float):
                i = int(key)
                return obj[i] if 0 <= i < len(obj) else UNDEF
            return self._string_method(obj, key)
        if isinstance(obj, float):
            if key == "toFixed":
                return lambda args: f"{obj:.{int(args[0]) if args else 0}f}"
            raise JSMiniError(f"number has no member {key!r}")
        if obj is UNDEF or obj is NULL:
            raise JSMiniError(f"cannot read {key!r} of {js_str(obj)}")
        raise JSMiniError(f"unsupported member base {type(obj).__name__}")

    def _set_member(self, obj, key, val):
        if isinstance(obj, JSObject):
            obj.props[js_str(key)] = val
        elif isinstance(obj, JSArray):
            i = int(key)
            while len(obj.items) <= i:
                obj.items.append(UNDEF)
            obj.items[i] = val
        elif isinstance(obj, JSFloat32Array):
            obj.data[int(key)] = float(val)
        else:
            raise JSMiniError(f"cannot set member on {type(obj).__name__}")

    def _array_method(self, arr, key):
        items = arr.items
        if key == "length":
            return float(len(items))
        if key == "push":
            return lambda args: (items.extend(args), float(len(items)))[1]
        if key == "pop":
            return lambda args: items.pop() if items else UNDEF
        if key == "slice":
            def _slice(args):
                a = int(args[0]) if len(args) > 0 else 0
                b = int(args[1]) if len(args) > 1 else len(items)
                return JSArray(items[slice(*slice(a, b).indices(len(items)))])
            return _slice
        if key == "indexOf":
            def _indexof(args):
                for i, x in enumerate(items):
                    if _strict_eq(x, args[0]):
                        return float(i)
                return -1.0
            return _indexof
        if key == "includes":
            return lambda args: any(_strict_eq(x, args[0]) for x in items)
        if key == "join":
            return lambda args: (js_str(args[0]) if args else ",").join(
                js_str(x) for x in items)
        if key == "map":
            return lambda args: JSArray(
                [self._call(args[0], [x, float(i), arr])
                 for i, x in enumerate(items)])
        if key == "filter":
            return lambda args: JSArray(
                [x for i, x in enumerate(items)
                 if js_truthy(self._call(args[0], [x, float(i), arr]))])
        if key == "forEach":
            def _foreach(args):
                for i, x in enumerate(items):
                    self._call(args[0], [x, float(i), arr])
                return UNDEF
            return _foreach
        if key == "concat":
            def _concat(args):
                out = list(items)
                for a in args:
                    out.extend(a.items if isinstance(a, JSArray) else [a])
                return JSArray(out)
            return _concat
        if key == "fill":
            def _fill(args):
                for i in range(len(items)):
                    items[i] = args[0]
                return arr
            return _fill
        if key == "reduce":
            def _reduce(args):
                acc = args[1]
                for i, x in enumerate(items):
                    acc = self._call(args[0], [acc, x, float(i), arr])
                return acc
            return _reduce
        raise JSMiniError(f"array has no method {key!r}")

    def _f32_method(self, obj, key):
        import numpy as np

        if key == "length":
            return float(len(obj.data))
        if key == "copyWithin":
            def _cw(args):
                t = int(args[0])
                s = int(args[1]) if len(args) > 1 else 0
                e = int(args[2]) if len(args) > 2 else len(obj.data)
                seg = obj.data[s:e].copy()
                obj.data[t:t + len(seg)] = seg[: max(0, len(obj.data) - t)]
                return obj
            return _cw
        if key == "set":
            def _set(args):
                src = args[0]
                vals = (src.items if isinstance(src, JSArray)
                        else [float(x) for x in src.data])
                off = int(args[1]) if len(args) > 1 else 0
                obj.data[off:off + len(vals)] = np.asarray(
                    [float(v) for v in vals], np.float32)
                return UNDEF
            return _set
        if key == "slice":
            def _slice(args):
                a = int(args[0]) if args else 0
                b = int(args[1]) if len(args) > 1 else len(obj.data)
                out = JSFloat32Array(0)
                out.data = obj.data[a:b].copy()
                return out
            return _slice
        if key == "fill":
            def _fill(args):
                obj.data[:] = float(args[0])
                return obj
            return _fill
        raise JSMiniError(f"Float32Array has no method {key!r}")

    def _string_method(self, s, key):
        if key == "length":
            return float(len(s))
        if key == "slice":
            return lambda args: s[slice(
                int(args[0]) if args else 0,
                int(args[1]) if len(args) > 1 else len(s))]
        if key == "toUpperCase":
            return lambda args: s.upper()
        if key == "toLowerCase":
            return lambda args: s.lower()
        if key == "indexOf":
            return lambda args: float(s.find(js_str(args[0])))
        if key == "charCodeAt":
            return lambda args: float(ord(s[int(args[0]) if args else 0]))
        if key == "split":
            return lambda args: JSArray(s.split(js_str(args[0])))
        if key == "trim":
            return lambda args: s.strip()
        if key == "padStart":
            return lambda args: s.rjust(int(args[0]), js_str(args[1]) if len(args) > 1 else " ")
        if key == "repeat":
            return lambda args: s * int(args[0])
        raise JSMiniError(f"string has no method {key!r}")

    # -- calls / construction
    def _eval_call(self, e, env):
        callee = e[1]
        args = [self.eval_expr(a, env) for a in e[2]]
        fn = self.eval_expr(callee, env)
        return self._call(fn, args)

    def _call(self, fn, args):
        if isinstance(fn, JSFunction):
            env = _Env(fn.env)
            for i, p in enumerate(fn.params):
                env.declare(p, args[i] if i < len(args) else UNDEF)
            env.declare("arguments", JSArray(args))
            if fn.is_expr_body:
                return self.eval_expr(fn.body, env)
            try:
                self._hoist(fn.body[1], env)
                for st in fn.body[1]:
                    self.exec_stmt(st, env)
            except _Return as r:
                return r.value
            return UNDEF
        if callable(fn):
            return fn(args)
        raise JSMiniError(f"{fn!r} is not a function")

    def _construct(self, callee, args):
        if callable(callee) and getattr(callee, "_js_ctor", False):
            return callee(args)
        if isinstance(callee, JSFunction):
            this = JSObject()
            env = _Env(callee.env)
            for i, p in enumerate(callee.params):
                env.declare(p, args[i] if i < len(args) else UNDEF)
            try:
                for st in callee.body[1]:
                    self.exec_stmt(st, env)
            except _Return as r:
                if isinstance(r.value, (JSObject, JSArray)):
                    return r.value
            return this
        raise JSMiniError("not a constructor")

    # -- stdlib
    def _install_stdlib(self):
        g = self.globals

        def _math1(f):
            return lambda args: float(f(args[0]))

        math_obj = JSObject({
            "PI": _math.pi,
            "E": _math.e,
            "abs": _math1(abs),
            "floor": _math1(_math.floor),
            "ceil": _math1(_math.ceil),
            "sqrt": _math1(_math.sqrt),
            "cos": _math1(_math.cos),
            "sin": _math1(_math.sin),
            "tan": _math1(_math.tan),
            "atan2": lambda args: float(_math.atan2(args[0], args[1])),
            "exp": _math1(_math.exp),
            "log": _math1(_math.log),
            "log2": _math1(_math.log2),
            "log10": _math1(_math.log10),
            "sign": _math1(lambda x: (x > 0) - (x < 0)),
            # JS Math.round: half-up (toward +inf), unlike Python's banker's
            "round": _math1(lambda x: _math.floor(x + 0.5)),
            "trunc": _math1(_math.trunc),
            "pow": lambda args: float(args[0] ** args[1]),
            "hypot": lambda args: float(_math.hypot(*args)),
            "min": lambda args: float(min(args)) if args else _math.inf,
            "max": lambda args: float(max(args)) if args else -_math.inf,
            "random": lambda args: __import__("random").random(),
        })
        g.declare("Math", math_obj)

        def _json_stringify(args):
            return _json.dumps(to_python(args[0]), separators=(",", ":"))

        def _json_parse(args):
            return to_js(_json.loads(args[0]))

        g.declare("JSON", JSObject({"stringify": _json_stringify,
                                    "parse": _json_parse}))

        def _array_ctor(args):
            if len(args) == 1 and isinstance(args[0], float):
                return JSArray([UNDEF] * int(args[0]))
            return JSArray(list(args))

        _array_ctor._js_ctor = True

        def _array_from(args):
            src = args[0]
            if isinstance(src, JSArray):
                items = list(src.items)
            elif isinstance(src, JSFloat32Array):
                items = [float(x) for x in src.data]
            elif isinstance(src, str):
                items = list(src)
            else:
                raise JSMiniError("Array.from: unsupported source")
            if len(args) > 1:
                items = [self._call(args[1], [x, float(i)])
                         for i, x in enumerate(items)]
            return JSArray(items)

        arr_host = JSObject({"from": _array_from,
                             "isArray": lambda args: isinstance(args[0], JSArray)})
        g.declare("Array", _Hybrid(_array_ctor, arr_host))

        def _f32_ctor(args):
            a = args[0]
            if isinstance(a, JSArray):
                return JSFloat32Array([float(x) for x in a.items])
            if isinstance(a, JSFloat32Array):
                return JSFloat32Array([float(x) for x in a.data])
            return JSFloat32Array(a)

        _f32_ctor._js_ctor = True
        g.declare("Float32Array", _f32_ctor)

        g.declare("console", JSObject({"log": lambda args: print(
            *[js_str(a) for a in args]) or UNDEF}))
        g.declare("Infinity", _math.inf)
        g.declare("NaN", _math.nan)
        g.declare("isFinite", lambda args: _math.isfinite(args[0]))
        g.declare("isNaN", lambda args: isinstance(args[0], float)
                  and _math.isnan(args[0]))
        g.declare("Date", JSObject({"now": lambda args: float(
            __import__("time").time() * 1000)}))
        g.declare("Number", JSObject({
            "isInteger": lambda args: isinstance(args[0], float)
            and args[0] == int(args[0]),
            "MAX_SAFE_INTEGER": float(2**53 - 1),
        }))


# ------------------------------ helpers ------------------------------------

def extract_function(src, name):
    """Extract `function <name>(...) {...}` from a JS source by brace
    matching — lets tests interpret one pure function from app.js/plots.js
    without stubbing the whole DOM."""
    m = _re.search(rf"(^|\n)function {_re.escape(name)}\s*\(", src)
    if not m:
        raise JSMiniError(f"function {name} not found")
    i = src.index("{", m.end() - 1)
    depth = 0
    j = i
    in_str = None
    while j < len(src):
        c = src[j]
        if in_str:
            if c == "\\":
                j += 2
                continue
            if c == in_str:
                in_str = None
        elif c == "/" and src.startswith("//", j):
            j = src.index("\n", j)
            continue
        elif c == "/" and src.startswith("/*", j):
            j = src.index("*/", j) + 2
            continue
        elif c in "'\"`":
            in_str = c
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return src[m.start():j + 1]
        j += 1
    raise JSMiniError(f"unbalanced braces in {name}")


def load_functions(interp, path, names):
    """Extract and run the named functions from a JS file."""
    src = open(path).read()
    for n in names:
        interp.run(extract_function(src, n))
