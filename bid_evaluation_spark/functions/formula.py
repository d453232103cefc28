"""Safe formula-expression criterion: AST → native Spark Column translation.

Reference semantics (``bid_evaluation/criteria.py:105-151``): the formula is a
math expression evaluated per row with ``simpleeval``; the namespace exposes
``value`` (the row's value), the statistics ``min, max, mean, median, std``,
user variables, and the functions ``abs, min, max, sqrt, log, log10, exp,
clip(x, lo, hi)``; any per-row exception maps to 0.0 (verified: ``'1 / 0'`` →
all rows 0.0 — reference ``tests/test_criteria.py:140-148``); results are
clipped to [0, 100] and multiplied by the criterion weight.

The reference interprets the formula in a per-row Python loop
(``criteria.py:136-149``) — its only O(n)-Python scalar operator. This engine
instead parses the formula once with :mod:`ast` and translates it to a native
Column expression so it executes JVM-side inside whole-stage codegen:

- bare ``min``/``max``/``mean``/``median``/``std`` → statistic literals,
- call-position ``min(`` / ``max(`` → ``least`` / ``greatest``,
- ``clip(x, lo, hi)`` → ``greatest(lo, least(hi, x))`` (= py ``max(lo, min(hi, x))``),
- ``log`` → natural log, ``/`` → ``try_divide`` (÷0 → null → 0.0, matching the
  reference's ZeroDivisionError → 0.0),
- ``%`` and ``//`` use Python floor semantics (``a - floor(a/b)*b``),
- null/NaN results → 0.0 (reference: errors → 0.0; NaN results would crash the
  reference later at ``ranking.astype(int)`` — mapping them to 0.0 is this
  engine's documented clean divergence, SURVEY §7 risk register),
- final ``least(greatest(x, 0), 100)`` clip.

Formulas outside the translatable grammar (compound types, unknown names,
1-arg ``min``…) fall back to an Arrow-batched pandas UDF interpreting the same
whitelisted AST with genuine Python per-row semantics — the always-correct
path, now batched instead of the reference's row loop.
"""

from __future__ import annotations

import ast

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

STAT_NAMES = ("min", "max", "mean", "median", "std")


class FormulaTranslationError(Exception):
    """Formula uses grammar outside the native-translatable subset."""


def _lit(v: Any) -> Column:
    if isinstance(v, Column):
        return v
    if v is None:
        return F.lit(None).cast("double")
    return F.lit(float(v))


def _null_strict(result: Column, *args: Column) -> Column:
    """Propagate null through ``least``/``greatest``-based translations.

    Spark's ``least``/``greatest`` SKIP null arguments, but a null here
    means "this row errored" (e.g. ``try_divide`` ÷0) and must survive to
    the final error→0.0 mapping — Python's ``min``/``max``/``clip`` would
    have raised. Without this, ``clip(1/0, 0, 100)`` silently became 100.
    """
    cond = None
    for a in args:
        c = a.isNull()
        cond = c if cond is None else (cond | c)
    return F.when(cond, F.lit(None).cast("double")).otherwise(result)


# ---------------------------------------------------------------------------
# Native translation: ast → (Column, is_boolean)
# ---------------------------------------------------------------------------

_CMP_OPS = {
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
}


class _Translator:
    def __init__(self, value_col: Column, names: Mapping[str, Any]):
        self.value_col = value_col
        self.names = names

    def _num(self, node: ast.AST) -> Column:
        """Translate a subexpression and coerce boolean → double (py True == 1)."""
        col, is_bool = self.visit(node)
        return col.cast("double") if is_bool else col

    def visit(self, node: ast.AST) -> Tuple[Column, bool]:
        if isinstance(node, ast.Expression):
            return self.visit(node.body)

        if isinstance(node, ast.Constant):
            if isinstance(node.value, bool):
                return F.lit(node.value), True
            if isinstance(node.value, (int, float)):
                return F.lit(float(node.value)), False
            raise FormulaTranslationError(f"non-numeric constant {node.value!r}")

        if isinstance(node, ast.Name):
            if node.id == "value":
                return self.value_col.cast("double"), False
            if node.id in self.names:
                v = self.names[node.id]
                if isinstance(v, bool):
                    return F.lit(v), True
                if v is None or isinstance(v, (int, float, Column)):
                    return _lit(v), False
                raise FormulaTranslationError(f"non-numeric variable {node.id!r}")
            raise FormulaTranslationError(f"unknown name {node.id!r}")

        if isinstance(node, ast.BinOp):
            left, right = self._num(node.left), self._num(node.right)
            op = node.op
            if isinstance(op, ast.Add):
                return left + right, False
            if isinstance(op, ast.Sub):
                return left - right, False
            if isinstance(op, ast.Mult):
                return left * right, False
            if isinstance(op, ast.Div):
                # python ZeroDivisionError → per-row 0.0; try_divide → null → 0.0
                return F.try_divide(left, right), False
            if isinstance(op, ast.Pow):
                # guard 0 ** negative (py: ZeroDivisionError; Spark pow: +inf)
                return (
                    F.when((left == F.lit(0.0)) & (right < F.lit(0.0)), F.lit(None).cast("double"))
                    .otherwise(F.pow(left, right)),
                    False,
                )
            if isinstance(op, ast.Mod):
                # python floor-sign modulo: a - floor(a/b)*b; b == 0 → error → null
                q = F.floor(F.try_divide(left, right)).cast("double")
                return (
                    F.when(right == F.lit(0.0), F.lit(None).cast("double"))
                    .otherwise(left - q * right),
                    False,
                )
            if isinstance(op, ast.FloorDiv):
                return (
                    F.when(right == F.lit(0.0), F.lit(None).cast("double"))
                    .otherwise(F.floor(F.try_divide(left, right)).cast("double")),
                    False,
                )
            raise FormulaTranslationError(f"operator {type(op).__name__}")

        if isinstance(node, ast.UnaryOp):
            if isinstance(node.op, ast.USub):
                return -self._num(node.operand), False
            if isinstance(node.op, ast.UAdd):
                return self._num(node.operand), False
            if isinstance(node.op, ast.Not):
                col, is_bool = self.visit(node.operand)
                if not is_bool:
                    col = col.cast("double") != F.lit(0.0)
                return ~col, True
            raise FormulaTranslationError(f"unary {type(node.op).__name__}")

        if isinstance(node, ast.Compare):
            parts = []
            left = self._num(node.left)
            for op, comparator in zip(node.ops, node.comparators):
                fn = _CMP_OPS.get(type(op))
                if fn is None:
                    raise FormulaTranslationError(f"comparison {type(op).__name__}")
                right = self._num(comparator)
                parts.append(fn(left, right))
                left = right
            out = parts[0]
            for p in parts[1:]:
                out = out & p
            return out, True

        if isinstance(node, ast.BoolOp):
            # restrict to boolean operands (python and/or return operands, not
            # bools — numeric operands go to the UDF fallback for exactness)
            cols = []
            for v in node.values:
                col, is_bool = self.visit(v)
                if not is_bool:
                    raise FormulaTranslationError("and/or over non-boolean operands")
                cols.append(col)
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if isinstance(node.op, ast.And) else (out | c)
            return out, True

        if isinstance(node, ast.IfExp):
            cond, is_bool = self.visit(node.test)
            if not is_bool:
                cond = cond.cast("double") != F.lit(0.0)
            a, a_bool = self.visit(node.body)
            b, b_bool = self.visit(node.orelse)
            if a_bool != b_bool:
                a = a.cast("double") if a_bool else a
                b = b.cast("double") if b_bool else b
                a_bool = b_bool = False
            return F.when(cond, a).otherwise(b), a_bool and b_bool

        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.keywords:
                raise FormulaTranslationError("unsupported call form")
            fname = node.func.id
            args = [self._num(a) for a in node.args]
            if fname == "abs" and len(args) == 1:
                return F.abs(args[0]), False
            if fname == "sqrt" and len(args) == 1:
                return F.sqrt(args[0]), False
            if fname == "log" and len(args) == 1:
                return F.log(args[0]), False
            if fname == "log10" and len(args) == 1:
                return F.log10(args[0]), False
            if fname == "exp" and len(args) == 1:
                return F.exp(args[0]), False
            if fname == "min" and len(args) >= 2:
                return _null_strict(F.least(*args), *args), False
            if fname == "max" and len(args) >= 2:
                return _null_strict(F.greatest(*args), *args), False
            if fname == "clip" and len(args) == 3:
                x, lo, hi = args
                # py: max(lo, min(hi, x))
                return _null_strict(F.greatest(lo, F.least(hi, x)),
                                    x, lo, hi), False
            raise FormulaTranslationError(f"call {fname}/{len(args)}")

        raise FormulaTranslationError(f"node {type(node).__name__}")


def formula_to_column(formula: str, value_col: Column, names: Mapping[str, Any]) -> Column:
    """Translate ``formula`` to a raw Column (no error-mapping/clipping).

    Raises :class:`FormulaTranslationError` when outside the native subset.
    """
    try:
        tree = ast.parse(formula, mode="eval")
    except SyntaxError as e:  # syntactically invalid → per-row error → 0.0
        raise FormulaTranslationError(str(e)) from e
    col, _ = _Translator(value_col, names).visit(tree)
    return col


# ---------------------------------------------------------------------------
# Fallback: Arrow-batched restricted-AST interpreter (python semantics)
# ---------------------------------------------------------------------------

_PY_FUNCS: Dict[str, Callable[..., Any]] = {
    "abs": abs,
    "min": min,
    "max": max,
    "sqrt": np.sqrt,
    "log": np.log,
    "log10": np.log10,
    "exp": np.exp,
    "clip": lambda x, lo, hi: max(lo, min(hi, x)),
}

_PY_CMP = {
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.In: lambda a, b: a in b,
    ast.NotIn: lambda a, b: a not in b,
}


def _py_eval(node: ast.AST, names: Dict[str, Any]) -> Any:
    """Evaluate one whitelisted-AST node with genuine Python semantics.

    Covers the reference's effective grammar (simpleeval's
    ``EvalWithCompoundTypes``): arithmetic, comparisons, bool ops, conditional
    expressions, the whitelisted functions, plus list/tuple/dict literals and
    subscripts. No attribute access, no imports, no arbitrary calls.
    """
    if isinstance(node, ast.Expression):
        return _py_eval(node.body, names)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float, bool, str)) or node.value is None:
            return node.value
        raise ValueError(f"constant {node.value!r}")
    if isinstance(node, ast.Name):
        if node.id in names:
            return names[node.id]
        raise NameError(node.id)
    if isinstance(node, ast.BinOp):
        a, b = _py_eval(node.left, names), _py_eval(node.right, names)
        op = node.op
        if isinstance(op, ast.Add):
            return a + b
        if isinstance(op, ast.Sub):
            return a - b
        if isinstance(op, ast.Mult):
            return a * b
        if isinstance(op, ast.Div):
            return a / b
        if isinstance(op, ast.Pow):
            return a ** b
        if isinstance(op, ast.Mod):
            return a % b
        if isinstance(op, ast.FloorDiv):
            return a // b
        raise ValueError(f"operator {type(op).__name__}")
    if isinstance(node, ast.UnaryOp):
        v = _py_eval(node.operand, names)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return +v
        if isinstance(node.op, ast.Not):
            return not v
        raise ValueError(f"unary {type(node.op).__name__}")
    if isinstance(node, ast.Compare):
        left = _py_eval(node.left, names)
        for op, comparator in zip(node.ops, node.comparators):
            right = _py_eval(comparator, names)
            fn = _PY_CMP.get(type(op))
            if fn is None or not fn(left, right):
                if fn is None:
                    raise ValueError(f"comparison {type(op).__name__}")
                return False
            left = right
        return True
    if isinstance(node, ast.BoolOp):
        if isinstance(node.op, ast.And):
            out: Any = True
            for v in node.values:
                out = _py_eval(v, names)
                if not out:
                    return out
            return out
        out = False
        for v in node.values:
            out = _py_eval(v, names)
            if out:
                return out
        return out
    if isinstance(node, ast.IfExp):
        return (
            _py_eval(node.body, names)
            if _py_eval(node.test, names)
            else _py_eval(node.orelse, names)
        )
    if isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name) or node.func.id not in _PY_FUNCS:
            raise ValueError("unsupported call")
        args = [_py_eval(a, names) for a in node.args]
        kwargs = {k.arg: _py_eval(k.value, names) for k in node.keywords if k.arg}
        return _PY_FUNCS[node.func.id](*args, **kwargs)
    if isinstance(node, (ast.List, ast.Tuple)):
        return [_py_eval(e, names) for e in node.elts]
    if isinstance(node, ast.Set):
        return {_py_eval(e, names) for e in node.elts}
    if isinstance(node, ast.Dict):
        return {
            _py_eval(k, names): _py_eval(v, names)
            for k, v in zip(node.keys, node.values)
            if k is not None
        }
    if isinstance(node, ast.Subscript):
        target = _py_eval(node.value, names)
        if isinstance(node.slice, ast.Slice):
            s = node.slice
            return target[slice(
                _py_eval(s.lower, names) if s.lower else None,
                _py_eval(s.upper, names) if s.upper else None,
                _py_eval(s.step, names) if s.step else None,
            )]
        return target[_py_eval(node.slice, names)]
    if isinstance(node, (ast.ListComp, ast.SetComp, ast.GeneratorExp, ast.DictComp)):
        return _py_comprehension(node, names)
    raise ValueError(f"node {type(node).__name__}")


#: same guard as simpleeval's MAX_COMPREHENSION_LENGTH — a runaway
#: comprehension inside a per-row formula maps to the error→0.0 contract
_MAX_COMPREHENSION_LENGTH = 10000


def _py_comp_assign(target: ast.AST, value: Any, scope: Dict[str, Any]) -> None:
    """Bind a comprehension loop target (name or nested tuple) into scope."""
    if isinstance(target, ast.Name):
        scope[target.id] = value
        return
    if isinstance(target, (ast.Tuple, ast.List)):
        vals = list(value)
        if len(vals) != len(target.elts):
            raise ValueError("unpack length mismatch")
        for t, v in zip(target.elts, vals):
            _py_comp_assign(t, v, scope)
        return
    raise ValueError(f"comprehension target {type(target).__name__}")


def _py_comprehension(node: ast.AST, names: Dict[str, Any]) -> Any:
    """List/set/dict/generator comprehension with python semantics
    (``EvalWithCompoundTypes`` parity — reference ``criteria.py:126`` grammar)."""
    out: list = []

    def rec(gens, scope):
        if not gens:
            if isinstance(node, ast.DictComp):
                out.append((_py_eval(node.key, scope),
                            _py_eval(node.value, scope)))
            else:
                out.append(_py_eval(node.elt, scope))
            if len(out) > _MAX_COMPREHENSION_LENGTH:
                raise ValueError("comprehension too long")
            return
        gen = gens[0]
        for item in _py_eval(gen.iter, scope):
            child = dict(scope)
            _py_comp_assign(gen.target, item, child)
            if all(_py_eval(c, child) for c in gen.ifs):
                rec(gens[1:], child)

    rec(list(node.generators), dict(names))
    if isinstance(node, ast.DictComp):
        return dict(out)
    if isinstance(node, ast.SetComp):
        return set(out)
    return out


def formula_fallback_udf(formula: str, names: Dict[str, Any]) -> Callable[[Column], Column]:
    """Arrow-batched UDF interpreting ``formula`` per row with Python semantics.

    Mirrors the reference loop (``criteria.py:136-149``): per-row errors → 0.0,
    then ``clip(0, 100)``; NaN results become 0.0 (documented divergence — the
    reference would crash at ranking's ``astype(int)``).
    """
    try:
        tree: Optional[ast.AST] = ast.parse(formula, mode="eval")
    except SyntaxError:
        tree = None
    base = dict(names)

    @pandas_udf("double")
    def _formula(values: pd.Series) -> pd.Series:
        results = []
        for val in values:
            if tree is None:
                results.append(0.0)
                continue
            row_names = dict(base)
            row_names["value"] = val
            try:
                results.append(float(_py_eval(tree, row_names)))
            except Exception:
                results.append(0.0)
        out = pd.Series(results, index=values.index).clip(0, 100)
        return out.fillna(0.0)

    return _formula


def formula_score_column(
    formula: str,
    col: Column,
    stats: Mapping[str, Optional[float]],
    variables: Mapping[str, Any],
    *,
    force_udf: bool = False,
) -> Column:
    """Full formula-criterion score: translate natively when possible, else
    fall back to the batched interpreter; errors → 0.0; clipped to [0, 100]."""
    names: Dict[str, Any] = {k: stats.get(k) for k in STAT_NAMES}
    names.update(variables)
    has_column_stats = any(isinstance(v, Column) for v in names.values())

    if not force_udf or has_column_stats:
        try:
            raw = formula_to_column(formula, col, names).cast("double")
            cleaned = (
                F.when(raw.isNull(), F.lit(0.0))
                .when(F.isnan(raw), F.lit(0.0))
                .otherwise(raw)
            )
            return F.least(F.greatest(cleaned, F.lit(0.0)), F.lit(100.0))
        except FormulaTranslationError:
            if has_column_stats:
                raise NotImplementedError(
                    "formula is outside the native-translatable grammar and the "
                    "pandas-UDF fallback cannot capture per-batch (Column) stats"
                )

    return formula_fallback_udf(formula, names)(col)
