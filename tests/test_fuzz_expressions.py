"""Differential expression fuzzing: seeded-random expression trees
over the SQL subset BOTH engines implement, evaluated by Spark and
DuckDB on the same rows and compared cell-exactly (SURVEY.md §5.2
extension). The per-op oracles pin each operator's semantics; this
suite sweeps the cross-product of scalar kernels the operators are
built from — the place engine divergence actually hides (rounding
family, % sign, substring bases, NULL propagation).

Grammar restrictions (each is a documented divergence, pinned
elsewhere):
- integer `/` excluded (Spark: double division; DuckDB: double too,
  but int `//` differs) — `div` semantics are pinned in
  fn_rounding_modes; only +, -, * here (exact, closed over bigint).
- float accumulation excluded — decimal-exact pattern owns that
  (helpers.py); per-row double arithmetic IS included (exact IEEE).
- round() excluded (helpers.r4 documents the HALF_UP vs rint split).
- regexp excluded (RE2-vs-Java pinned in fn_regex).

Seeds are FIXED: the suite is deterministic, failures reproduce, and
each seed is a regression test once it has passed."""

from __future__ import annotations

import random

import pytest

from tests.conftest import SF_DIR

_KEY = "doc_id"
_TBL = "documents"

_INT_COLS = ("doc_id", "n_chars")
_STR_COLS = ("lang", "source", "text")


def _int_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 3 or rng.random() < 0.3:
        return rng.choice(
            [rng.choice(_INT_COLS), str(rng.randint(-20, 100))]
        )
    op_ = rng.choice(["+", "-", "*", "CASE", "ABS", "GREATEST", "LEAST", "LEN"])
    if op_ in ("+", "-", "*"):
        return f"({_int_expr(rng, depth + 1)} {op_} {_int_expr(rng, depth + 1)})"
    if op_ == "CASE":
        return (
            f"(CASE WHEN {_pred(rng, depth + 1)} THEN {_int_expr(rng, depth + 1)} "
            f"ELSE {_int_expr(rng, depth + 1)} END)"
        )
    if op_ == "ABS":
        return f"ABS({_int_expr(rng, depth + 1)})"
    if op_ == "LEN":
        return f"LENGTH({_str_expr(rng, depth + 1)})"
    args = f"{_int_expr(rng, depth + 1)}, {_int_expr(rng, depth + 1)}"
    return f"{op_}({args})"


def _str_expr(rng: random.Random, depth: int = 0) -> str:
    if depth >= 3 or rng.random() < 0.35:
        return rng.choice(
            [rng.choice(_STR_COLS), f"'{rng.choice(['x', 'ab', 'scan', ''])}'"]
        )
    op_ = rng.choice(["UPPER", "LOWER", "TRIM", "REVERSE", "CONCAT", "SUBSTR", "REPLACE"])
    if op_ in ("UPPER", "LOWER", "TRIM", "REVERSE"):
        return f"{op_}({_str_expr(rng, depth + 1)})"
    if op_ == "CONCAT":
        return f"({_str_expr(rng, depth + 1)} || {_str_expr(rng, depth + 1)})"
    if op_ == "SUBSTR":
        # positive 1-based start + positive length: the subset with
        # identical semantics on both engines
        return (
            f"SUBSTR({_str_expr(rng, depth + 1)}, "
            f"{rng.randint(1, 8)}, {rng.randint(0, 12)})"
        )
    return (
        f"REPLACE({_str_expr(rng, depth + 1)}, "
        f"'{rng.choice(['a', 'e', 's', 'an'])}', "
        f"'{rng.choice(['', '_', 'Q'])}')"
    )


def _pred(rng: random.Random, depth: int = 0) -> str:
    if depth >= 3 or rng.random() < 0.4:
        lhs, rhs = _int_expr(rng, 3), _int_expr(rng, 3)
        cmp_ = rng.choice(["=", "<", ">", "<=", ">=", "<>"])
        return f"({lhs} {cmp_} {rhs})"
    op_ = rng.choice(["AND", "OR", "NOT", "BETWEEN", "IN", "LIKE"])
    if op_ in ("AND", "OR"):
        return f"({_pred(rng, depth + 1)} {op_} {_pred(rng, depth + 1)})"
    if op_ == "NOT":
        return f"(NOT {_pred(rng, depth + 1)})"
    if op_ == "BETWEEN":
        lo = rng.randint(0, 100)
        return f"({_int_expr(rng, depth + 1)} BETWEEN {lo} AND {lo + rng.randint(0, 200)})"
    if op_ == "IN":
        vals = ", ".join(f"'{v}'" for v in rng.sample(["en", "es", "fr", "de", "zh"], 3))
        return f"({rng.choice(['lang', 'source'])} IN ({vals}))"
    pat = rng.choice(["src%", "%1", "%a%", "e_"])
    return f"({rng.choice(['lang', 'source'])} LIKE '{pat}')"


def _compare(spark, duck, select_expr: str) -> None:
    sql = (
        f"SELECT {_KEY}, {select_expr} AS v FROM {_TBL} "
        f"WHERE {_KEY} % 11 = 0 ORDER BY {_KEY}"
    )
    got = [
        (r[0], r[1]) for r in spark.sql(sql).collect()
    ]
    want = [tuple(r) for r in duck.execute(sql).fetchall()]
    assert got == want, f"divergence on: {select_expr}\nspark={got[:5]}\nduck={want[:5]}"


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    from lambda_hive_spark.io import register_views

    register_views(spark, SF_DIR)


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_integer_expressions(spark, duck, seed):
    rng = random.Random(1000 + seed)
    _compare(spark, duck, f"CAST({_int_expr(rng)} AS BIGINT)")


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_string_expressions(spark, duck, seed):
    rng = random.Random(2000 + seed)
    _compare(spark, duck, _str_expr(rng))


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_predicates(spark, duck, seed):
    rng = random.Random(3000 + seed)
    _compare(spark, duck, f"(CASE WHEN {_pred(rng)} THEN 1 ELSE 0 END)")
