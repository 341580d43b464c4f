"""muparser-style math expression compiler -> traceable jnp functions.

Replaces deal.II FunctionParser (src/parameters.cc:470-527): ICs, BCs,
external forces, and gravity potentials in .prm files are runtime math
expressions in x, y (,z), t — e.g. ``1.0*(x<=0.5)+0.125*(x>0.5)`` in
examples/sod_shock_tube/input.prm or ``sqrt(x*x+y*y)`` in
examples/gravity/iso_xing_shu/input_uns.prm.

Expressions are parsed with the Python ast module against a strict whitelist
(no eval of arbitrary code) and compiled to closures over jnp, so a compiled
expression is jit-traceable and differentiable.  muparser's ``^`` power
operator and ``if(cond, a, b)`` ternary are translated.
"""

from __future__ import annotations

import ast
from typing import Callable

import jax.numpy as jnp
import numpy as np

_FUNCS: dict[str, Callable] = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
    "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
    "atan2": jnp.arctan2,
    "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "exp": jnp.exp, "log": jnp.log, "log10": jnp.log10, "ln": jnp.log,
    "sqrt": jnp.sqrt, "abs": jnp.abs, "fabs": jnp.abs,
    "pow": jnp.power, "min": jnp.minimum, "max": jnp.maximum,
    "floor": jnp.floor, "ceil": jnp.ceil, "sign": jnp.sign,
    "erf": None,  # filled below (jax.scipy)
    "where": lambda c, a, b: jnp.where(c, a, b),  # muparser's if(c,a,b)
}
from jax.scipy.special import erf as _erf  # noqa: E402
_FUNCS["erf"] = _erf

_CONSTS = {"pi": np.pi, "Pi": np.pi, "PI": np.pi, "e": np.e, "E": np.e,
           # deal.II FunctionParser spellings (examples/gravity/.../input_cart.prm)
           "_pi": np.pi, "_e": np.e}

_ALLOWED_BINOPS = (ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow, ast.Mod)
_ALLOWED_UNARY = (ast.UAdd, ast.USub)
_ALLOWED_CMP = (ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.Eq, ast.NotEq)


class _Validator(ast.NodeVisitor):
    def __init__(self, variables):
        self.variables = set(variables)

    def generic_visit(self, node):
        ok = (ast.Expression, ast.BinOp, ast.UnaryOp, ast.Compare,
              ast.Call, ast.Name, ast.Constant, ast.BoolOp, ast.And, ast.Or,
              ast.Load) + _ALLOWED_BINOPS + _ALLOWED_UNARY + _ALLOWED_CMP
        if not isinstance(node, ok):
            raise ValueError(f"disallowed syntax in expression: "
                             f"{type(node).__name__}")
        super().generic_visit(node)

    def visit_Call(self, node):
        if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
            name = getattr(node.func, "id", "?")
            raise ValueError(f"unknown function {name!r} in expression")
        for a in node.args:
            self.visit(a)
        if node.keywords:
            raise ValueError("keyword arguments not allowed in expressions")

    def visit_Name(self, node):
        if node.id not in self.variables and node.id not in _CONSTS:
            raise ValueError(f"unknown variable {node.id!r} in expression "
                             f"(allowed: {sorted(self.variables)})")

    def visit_Constant(self, node):
        if not isinstance(node.value, (int, float)):
            raise ValueError("only numeric constants allowed")


def _translate(expr: str) -> str:
    """muparser -> python: '^' is power; 'if(c,a,b)' renamed (keyword clash);
    '&&'/'||' -> and/or."""
    import re
    out = expr.replace("^", "**").replace("&&", " and ").replace("||", " or ")
    out = re.sub(r"\bif\s*\(", "where(", out)
    return out


def compile_expression(expr: str, variables=("x", "y", "t")) -> Callable:
    """Compile one scalar expression into fn(*variables) -> jnp array."""
    src = _translate(expr)
    try:
        tree = ast.parse(src, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"cannot parse expression {expr!r}: {e}") from None
    _Validator(variables).visit(tree)

    def ev(node, env):
        if isinstance(node, ast.Expression):
            return ev(node.body, env)
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Name):
            return env[node.id] if node.id in env else _CONSTS[node.id]
        if isinstance(node, ast.UnaryOp):
            v = ev(node.operand, env)
            return +v if isinstance(node.op, ast.UAdd) else -v
        if isinstance(node, ast.BinOp):
            a, b = ev(node.left, env), ev(node.right, env)
            if isinstance(node.op, ast.Add):
                return a + b
            if isinstance(node.op, ast.Sub):
                return a - b
            if isinstance(node.op, ast.Mult):
                return a * b
            if isinstance(node.op, ast.Div):
                return a / b
            if isinstance(node.op, ast.Mod):
                return a % b
            return a ** b
        if isinstance(node, ast.Compare):
            # chain comparisons like a < x < b as logical and
            res = None
            left = ev(node.left, env)
            for op, comp in zip(node.ops, node.comparators):
                right = ev(comp, env)
                ops = {ast.Lt: jnp.less, ast.LtE: jnp.less_equal,
                       ast.Gt: jnp.greater, ast.GtE: jnp.greater_equal,
                       ast.Eq: jnp.equal, ast.NotEq: jnp.not_equal}
                r = ops[type(op)](left, right)
                res = r if res is None else jnp.logical_and(res, r)
                left = right
            return res
        if isinstance(node, ast.BoolOp):
            vals = [ev(v, env) for v in node.values]
            op = jnp.logical_and if isinstance(node.op, ast.And) \
                else jnp.logical_or
            out = vals[0]
            for v in vals[1:]:
                out = op(out, v)
            return out
        if isinstance(node, ast.Call):
            args = [ev(a, env) for a in node.args]
            return _FUNCS[node.func.id](*args)
        raise AssertionError(type(node))

    def fn(*args):
        env = dict(zip(variables, args))
        out = ev(tree, env)
        ref = next(iter(env.values()))
        return jnp.asarray(out) * jnp.ones_like(ref) if jnp.ndim(out) == 0 \
            else jnp.asarray(out)

    fn.expression = expr
    return fn


def compile_vector_expression(exprs, variables=("x", "y", "t")) -> Callable:
    """Compile dim+2 component expressions into fn(x, y, t) -> [4, ...]
    (the FunctionParser vector_value interface, src/parameters.h:402-407)."""
    fns = [compile_expression(e, variables) for e in exprs]

    def fn(x, y, t=0.0):
        return jnp.stack([f(x, y, t) for f in fns])

    fn.expressions = list(exprs)
    return fn
