"""Tiny math-expression language for expression-driven space warps.

Reference parity: euclider's expression-driven warped-space material
(the ``ComponentTransformation``-style material whose behaviour is given by
user-written math expressions parsed at scene-load time; SURVEY.md §2.1
'Materials & transitions' [K-low row]).  The reference parsed expressions
with the ``meval`` crate and evaluated them per ray step; here an expression
compiles once into a **hashable AST** that becomes part of the scene's
static topology — the traced XLA program contains the expression's
arithmetic as straight-line vector code, evaluated per march step on whole
ray batches (zero interpretation overhead at run time).

Grammar (classic precedence, ``^`` is right-associative power):

    expr   := term  (('+'|'-') term)*
    term   := unary (('*'|'/') unary)*
    unary  := '-' unary | power
    power  := atom ('^' unary)?
    atom   := NUMBER | NAME | NAME '(' expr (',' expr)* ')' | '(' expr ')'

Variables: ``x y z w`` (ray position components), ``p0``..``p7``
(differentiable per-material parameters living in SceneTables — gradients
flow through them), and ``t`` (the scene time passed to the render — the
reference's ``trace(time, ...)`` argument, SURVEY.md §3.3; enables animated
warped spaces).  Constant: ``pi``.  Functions: ``sin cos tanh exp log
sqrt abs floor sign min max atan asin acos atan2`` — all built from
Mosaic-lowerable primitives (ops.mathx supplies the arc family) so the same
AST runs in the lax backend, the Pallas TPU kernel, and the NumPy oracle.

The AST is nested tuples — hashable, comparable, and safe as a jit static
argument:

    ('num', 2.0) | ('var', 'x') | ('neg', a)
    ('add'|'sub'|'mul'|'div'|'pow', a, b) | ('call', name, (args...))
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

Ast = Tuple[Any, ...]

_FUNCS1 = ("sin", "cos", "tanh", "exp", "log", "sqrt", "abs", "floor",
           "sign", "atan", "asin", "acos")
_FUNCS2 = ("min", "max", "atan2")
VARS = ("x", "y", "z", "w") + tuple(f"p{i}" for i in range(8)) + ("t",)


class ExprError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer / parser
# ---------------------------------------------------------------------------

def _tokenize(src: str):
    toks = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c in "+-*/^(),":
            toks.append((c, c))
            i += 1
            continue
        if c.isdigit() or c == ".":
            j = i
            seen_e = False
            while j < n and (src[j].isdigit() or src[j] == "."
                             or src[j] in "eE"
                             or (seen_e and src[j] in "+-"
                                 and src[j - 1] in "eE")):
                if src[j] in "eE":
                    seen_e = True
                j += 1
            try:
                val = float(src[i:j])
            except ValueError:
                raise ExprError(f"bad number at {i}: {src[i:j]!r}")
            toks.append(("num", val))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            toks.append(("name", src[i:j]))
            i = j
            continue
        raise ExprError(f"unexpected character {c!r} at {i} in {src!r}")
    toks.append(("end", None))
    return toks


def parse(src: str) -> Ast:
    """Parse an expression string into a hashable AST (validates names)."""
    toks = _tokenize(src)
    pos = [0]

    def peek():
        return toks[pos[0]]

    def take(kind=None):
        t = toks[pos[0]]
        if kind is not None and t[0] != kind:
            raise ExprError(f"expected {kind!r}, got {t[0]!r} in {src!r}")
        pos[0] += 1
        return t

    def expr():
        node = term()
        while peek()[0] in ("+", "-"):
            op = take()[0]
            node = ("add" if op == "+" else "sub", node, term())
        return node

    def term():
        node = unary()
        while peek()[0] in ("*", "/"):
            op = take()[0]
            node = ("mul" if op == "*" else "div", node, unary())
        return node

    def unary():
        if peek()[0] == "-":
            take()
            return ("neg", unary())
        return power()

    def power():
        node = atom()
        if peek()[0] == "^":
            take()
            return ("pow", node, unary())
        return node

    def atom():
        t = take()
        if t[0] == "num":
            return ("num", t[1])
        if t[0] == "(":
            node = expr()
            take(")")
            return node
        if t[0] == "name":
            name = t[1]
            if peek()[0] == "(":
                take("(")
                args = [expr()]
                while peek()[0] == ",":
                    take(",")
                    args.append(expr())
                take(")")
                if name in _FUNCS1 and len(args) == 1:
                    return ("call", name, tuple(args))
                if name in _FUNCS2 and len(args) == 2:
                    return ("call", name, tuple(args))
                raise ExprError(f"unknown function {name}/{len(args)}")
            if name == "pi":
                return ("num", math.pi)
            if name in VARS:
                return ("var", name)
            raise ExprError(f"unknown variable {name!r} (have {VARS})")
        raise ExprError(f"unexpected token {t!r} in {src!r}")

    node = expr()
    take("end")
    return node


def unparse(node: Ast) -> str:
    """AST -> canonical string (for JSON round-trips / repr)."""
    k = node[0]
    if k == "num":
        return repr(node[1])
    if k == "var":
        return node[1]
    if k == "neg":
        return f"(-{unparse(node[1])})"
    if k in ("add", "sub", "mul", "div", "pow"):
        op = {"add": "+", "sub": "-", "mul": "*", "div": "/", "pow": "^"}[k]
        return f"({unparse(node[1])} {op} {unparse(node[2])})"
    if k == "call":
        return f"{node[1]}({', '.join(unparse(a) for a in node[2])})"
    raise ExprError(f"bad AST node {node!r}")


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def eval_ast(node: Ast, env: Dict[str, Any], lib):
    """Evaluate an AST with a function library.

    ``lib`` supplies the transcendental implementations — pass
    ``jax_lib()`` inside traced code (jnp + ops.mathx arc functions, Mosaic
    -safe) or ``numpy_lib()`` in the scalar oracle.  ``env`` maps variable
    names to (possibly batched) values; missing ``p*`` vars default to 0.
    """
    k = node[0]
    if k == "num":
        return lib["const"](node[1])
    if k == "var":
        v = env.get(node[1])
        if v is None:
            if node[1].startswith("p"):
                return lib["const"](0.0)
            raise ExprError(f"unbound variable {node[1]!r}")
        return v
    if k == "neg":
        return -eval_ast(node[1], env, lib)
    if k in ("add", "sub", "mul", "div"):
        a = eval_ast(node[1], env, lib)
        b = eval_ast(node[2], env, lib)
        if k == "add":
            return a + b
        if k == "sub":
            return a - b
        if k == "mul":
            return a * b
        return a / b
    if k == "pow":
        a = eval_ast(node[1], env, lib)
        e = node[2]
        # integer literal exponents become repeated multiplication —
        # exact, cheap, and avoids a pow lowering in Mosaic
        if e[0] == "num" and float(e[1]).is_integer() and abs(e[1]) <= 16:
            n = int(e[1])
            if n == 0:
                return lib["const"](1.0) + 0.0 * a
            acc = a
            for _ in range(abs(n) - 1):
                acc = acc * a
            return 1.0 / acc if n < 0 else acc
        b = eval_ast(e, env, lib)
        return lib["exp"](b * lib["log"](a))
    if k == "call":
        args = [eval_ast(a, env, lib) for a in node[2]]
        return lib[node[1]](*args)
    raise ExprError(f"bad AST node {node!r}")


def jax_lib():
    """Function library for traced evaluation (lax AND Pallas backends —
    arc functions come from ops.mathx so Mosaic can lower them)."""
    import jax.numpy as jnp

    from ..ops import mathx

    return {
        # weak-typed Python float: adapts to the batch dtype (f32 or f64)
        "const": float,
        "sin": jnp.sin, "cos": jnp.cos, "tanh": jnp.tanh,
        "exp": jnp.exp, "log": jnp.log, "sqrt": jnp.sqrt,
        "abs": jnp.abs, "floor": jnp.floor, "sign": jnp.sign,
        "min": jnp.minimum, "max": jnp.maximum,
        "atan": mathx.atan, "asin": mathx.asin, "acos": mathx.acos,
        "atan2": mathx.atan2,
    }


def numpy_lib():
    """Function library for the scalar NumPy oracle (float64)."""
    import numpy as np

    return {
        "const": float,
        "sin": np.sin, "cos": np.cos, "tanh": np.tanh,
        "exp": np.exp, "log": np.log, "sqrt": np.sqrt,
        "abs": np.abs, "floor": np.floor, "sign": np.sign,
        "min": np.minimum, "max": np.maximum,
        "atan": np.arctan, "asin": np.arcsin, "acos": np.arccos,
        "atan2": np.arctan2,
    }


# ---------------------------------------------------------------------------
# postfix compilation (for the C++ oracle's stack VM — oracle/native/oracle.cpp)
# ---------------------------------------------------------------------------

# opcode table shared with the C++ evaluator; vals carry the operand
OPS = {"const": 0, "var": 1, "add": 2, "sub": 3, "mul": 4, "div": 5,
       "neg": 6, "powi": 7, "powf": 8,
       "sin": 9, "cos": 10, "tanh": 11, "exp": 12, "log": 13, "sqrt": 14,
       "abs": 15, "floor": 16, "sign": 17, "atan": 18, "asin": 19,
       "acos": 20, "min": 21, "max": 22, "atan2": 23}
VAR_INDEX = {v: i for i, v in enumerate(VARS)}  # x y z w p0..p7 -> 0..11


def to_postfix(node: Ast):
    """Lower an AST to a postfix (ops, vals) program with eval_ast's exact
    arithmetic (integer-literal powers become the same repeated-multiply
    recurrence, others exp(b*log(a))) so C++ matches NumPy bit-for-bit."""
    ops, vals = [], []

    def emit(op, val=0.0):
        ops.append(OPS[op])
        vals.append(float(val))

    def walk(n):
        k = n[0]
        if k == "num":
            emit("const", n[1])
        elif k == "var":
            emit("var", VAR_INDEX[n[1]])
        elif k == "neg":
            walk(n[1])
            emit("neg")
        elif k == "pow":
            e = n[2]
            if e[0] == "num" and float(e[1]).is_integer() and abs(e[1]) <= 16:
                walk(n[1])
                emit("powi", int(e[1]))
            else:
                walk(n[1])
                walk(e)
                emit("powf")
        elif k in ("add", "sub", "mul", "div"):
            walk(n[1])
            walk(n[2])
            emit(k)
        elif k == "call":
            for a in n[2]:
                walk(a)
            emit(n[1])
        else:
            raise ExprError(f"bad AST node {n!r}")

    walk(node)
    return ops, vals


def free_params(node: Ast) -> Tuple[int, ...]:
    """Indices of p* parameters referenced by the AST."""
    k = node[0]
    if k == "var" and node[1].startswith("p"):
        return (int(node[1][1:]),)
    if k in ("neg",):
        return free_params(node[1])
    if k in ("add", "sub", "mul", "div", "pow"):
        return tuple(sorted(set(free_params(node[1])
                                + free_params(node[2]))))
    if k == "call":
        out = ()
        for a in node[2]:
            out = out + free_params(a)
        return tuple(sorted(set(out)))
    return ()
