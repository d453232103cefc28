"""Static guard for NOTES lesson 18: Catalyst re-evaluates any
subexpression captured inside a higher-order-function lambda once per
array element (no CSE reaches lambda bodies; HOFs sit outside
whole-stage codegen). A captured O(n) array or O(d) scalar turns a
linear operator quadratic — winnowing measured 182 s for 5k docs at
sf0.1 before the fix; l2_normalize 127× at d=512.

The lint walks every package source with ``ast``: per function it
tracks local names assigned from expressions that are not CHEAP to
re-evaluate, then flags a lambda passed to ``F.transform``/
``F.zip_with``/``F.filter``/``F.aggregate``/``F.exists``/``F.forall``
whose body references one of those names as a free variable.

Cheap (allowed to capture): ``F.col``/``F.lit`` references, all-literal
``F.array`` (constant-folded by Catalyst), scalar arithmetic / method
chains / ``F.when`` over cheap bases — each costs O(1) per element.
Expensive (flagged): any array-building or array-consuming ``F.*``
call (``transform``, ``split``, ``sequence``, ``slice``,
``aggregate``, ...), and ANY helper-function call (``tokens(...)``,
``_norm(...)`` — provenance unknown, and exactly how the real bugs
arrived). Legal patterns instead: make the value the HOF's *argument*
(shifted-slice folds), or materialize it as a column first.

Function parameters are not tracked (provenance unknowable statically);
a deliberate capture can be allowlisted with a justification.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "bid_evaluation_spark"

HOFS = {"transform", "zip_with", "filter", "aggregate", "exists", "forall",
        "reduce", "map_filter", "map_zip_with", "transform_keys",
        "transform_values"}

#: F.* whose result is an O(1)-per-evaluation scalar when its inputs are
#: cheap — capturing such a chain costs constant work per element
SCALAR_F = {
    "col", "lit", "when", "coalesce", "greatest", "least", "floor", "ceil",
    "round", "bround", "abs", "sqrt", "log", "log2", "log10", "exp", "pow",
    "pmod", "conv", "substring", "md5", "sha1", "sha2", "xxhash64", "hash",
    "crc32", "concat_ws", "concat", "length", "lower", "upper", "trim",
    "ltrim", "rtrim", "lpad", "rpad", "translate", "regexp_count",
    "regexp_replace", "regexp_extract", "size", "element_at", "isnull",
    "isnan", "nvl", "nullif", "signum", "sin", "cos", "tan", "asin", "acos",
    "atan", "atan2", "radians", "degrees", "struct", "to_date",
    "to_timestamp", "unix_timestamp", "date_format", "try_divide",
}

#: (path-suffix, function, captured-name): justified deliberate captures
ALLOWLIST: set = set()


def _f_attr(node: ast.AST):
    """Return 'x' for a call F.x(...), else None."""
    if (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "F"):
        return node.func.attr
    return None


def _is_cheap(expr: ast.AST) -> bool:
    """True when re-evaluating ``expr`` costs O(1): literals, names,
    F.col/F.lit, all-literal F.array, and scalar F.* / method / operator
    chains over cheap parts. Any helper call or array-building F.* call
    makes it expensive."""
    if isinstance(expr, (ast.Constant, ast.Name)):
        return True
    if isinstance(expr, ast.Attribute):
        return _is_cheap(expr.value)
    if isinstance(expr, ast.Call):
        f = _f_attr(expr)
        args = list(expr.args) + [kw.value for kw in expr.keywords]
        if f in ("col", "lit"):
            return True
        if f == "array":
            # constant-folded when every element is a literal
            star = [a.value if isinstance(a, ast.Starred) else a
                    for a in expr.args]
            return all(_is_cheap(a) for a in star)
        if f in SCALAR_F:
            return all(_is_cheap(a) for a in args)
        if f is not None:
            return False  # array-building / array-consuming F.*
        if isinstance(expr.func, ast.Attribute):
            # method chain: x.cast(...), x.substr(...), x.otherwise(...)
            return _is_cheap(expr.func.value) and all(_is_cheap(a)
                                                      for a in args)
        return False  # helper call — provenance unknown, assume expensive
    if isinstance(expr, (ast.BinOp,)):
        return _is_cheap(expr.left) and _is_cheap(expr.right)
    if isinstance(expr, ast.UnaryOp):
        return _is_cheap(expr.operand)
    if isinstance(expr, ast.BoolOp):
        return all(_is_cheap(v) for v in expr.values)
    if isinstance(expr, ast.Compare):
        return _is_cheap(expr.left) and all(_is_cheap(c)
                                            for c in expr.comparators)
    if isinstance(expr, ast.IfExp):
        return all(_is_cheap(e) for e in (expr.test, expr.body, expr.orelse))
    if isinstance(expr, (ast.List, ast.Tuple)):
        return all(_is_cheap(e) for e in expr.elts)
    if isinstance(expr, ast.Starred):
        return _is_cheap(expr.value)
    if isinstance(expr, (ast.ListComp, ast.GeneratorExp)):
        return _is_cheap(expr.elt)
    if isinstance(expr, ast.Subscript):
        return _is_cheap(expr.value)
    if isinstance(expr, ast.JoinedStr):
        return True
    return False  # unknown node — be conservative


class _FunctionLint(ast.NodeVisitor):
    def __init__(self, path: str, func_name: str):
        self.path = path
        self.func = func_name
        self.expensive: set = set()
        self.findings: list = []

    def _assign(self, target, value):
        if isinstance(target, ast.Name):
            if _is_cheap(value):
                self.expensive.discard(target.id)
            else:
                self.expensive.add(target.id)

    def visit_Assign(self, node: ast.Assign):
        if len(node.targets) == 1:
            self._assign(node.targets[0], node.value)
        self.generic_visit(node)

    def visit_AnnAssign(self, node: ast.AnnAssign):
        if node.value is not None:
            self._assign(node.target, node.value)
        self.generic_visit(node)

    def visit_AugAssign(self, node: ast.AugAssign):
        if isinstance(node.target, ast.Name) and not _is_cheap(node.value):
            self.expensive.add(node.target.id)
        self.generic_visit(node)

    def visit_Call(self, node: ast.Call):
        hof = _f_attr(node)
        if hof in HOFS:
            for arg in node.args[1:]:  # lambdas are never the first arg
                if isinstance(arg, ast.Lambda):
                    params = {a.arg for a in arg.args.args}
                    for sub in ast.walk(arg.body):
                        if (isinstance(sub, ast.Name)
                                and sub.id in self.expensive
                                and sub.id not in params):
                            key = (self.path, self.func, sub.id)
                            if key not in ALLOWLIST:
                                self.findings.append(
                                    f"{self.path}:{node.lineno} "
                                    f"{self.func}: F.{hof} lambda captures "
                                    f"expensive local '{sub.id}' — "
                                    f"re-evaluated per element (lesson 18); "
                                    f"pass it as the HOF argument or "
                                    f"materialize it as a column first")
        self.generic_visit(node)


def _lint_file(path: pathlib.Path):
    tree = ast.parse(path.read_text())
    findings = []
    rel = str(path.relative_to(PKG.parent))
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            lint = _FunctionLint(rel, node.name)
            for stmt in node.body:
                lint.visit(stmt)
            findings.extend(lint.findings)
    return findings


def test_no_expensive_lambda_captures():
    findings = []
    for path in sorted(PKG.rglob("*.py")):
        findings.extend(_lint_file(path))
    assert not findings, "\n".join(findings)


def _lint_src(src: str, func: str):
    tree = ast.parse(src)
    fn = tree.body[0]
    lint = _FunctionLint("fake.py", func)
    for stmt in fn.body:
        lint.visit(stmt)
    return lint.findings


def test_lint_catches_the_winnow_regression_shape():
    """The lint must flag the exact pre-fix winnowing pattern."""
    findings = _lint_src(
        "def winnow(text, k, w):\n"
        "    toks = tokens(text)\n"
        "    hashes = F.transform(toks, lambda g: F.md5(g))\n"
        "    mins = F.transform(\n"
        "        F.sequence(F.lit(1), F.lit(4)),\n"
        "        lambda i: F.array_min(F.slice(hashes, i, w)))\n"
        "    return mins\n", "winnow")
    assert any("'hashes'" in f for f in findings), findings


def test_lint_catches_helper_call_scalar_capture():
    """The pre-fix l2_normalize shape: a helper-computed scalar."""
    findings = _lint_src(
        "def l2(df, vec_col):\n"
        "    nrm = _norm(F.col(vec_col))\n"
        "    return F.transform(F.col(vec_col), lambda x: x / nrm)\n", "l2")
    assert any("'nrm'" in f for f in findings), findings


def test_lint_allows_materialized_column_capture():
    """F.col captures (the documented fix idiom) must pass."""
    assert not _lint_src(
        "def l2(df):\n"
        "    nrm = F.col('_l2_nrm')\n"
        "    return F.transform(F.col('v'), lambda x: x / nrm)\n", "l2")


def test_lint_allows_literal_array_and_scalar_chain():
    """Constant-folded literal arrays and O(1) scalar chains pass."""
    assert not _lint_src(
        "def f(arr, words, score_col):\n"
        "    wordlist = F.array(*[F.lit(w) for w in words])\n"
        "    b = F.greatest(F.lit(0), F.floor(F.col(score_col) / F.lit(2)))"
        ".cast('int')\n"
        "    le = F.filter(arr, lambda x: F.array_contains(wordlist, x)"
        " | (x <= b))\n"
        "    return le\n", "f")
