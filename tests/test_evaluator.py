import numpy as np
import pytest

from databend_tpu.errors import SemanticError, UnknownColumn, UnknownFunction
from databend_tpu.expression import Column, DataBlock
from databend_tpu.expression.evaluator import Evaluator, cast_column
from databend_tpu.sql.expr_binder import BindContext, ExprBinder
from databend_tpu.sql.parser import Parser
from databend_tpu.types import (Boolean, Float32, Float64, Int64, String,
                                VectorType, parse_type_name)


def make_block():
    return DataBlock(
        ["a", "b", "s", "n", "emb"],
        [
            Column.from_pylist([1, 2, 3, 4], Int64),
            Column.from_pylist([10.0, 20.0, 30.0, 40.0], Float64),
            Column.from_pylist(["foo", "bar", "baz", "qux"], String),
            Column.from_pylist([1, None, 3, None], Int64),
            Column.from_pylist([[1, 0], [0, 1], [1, 1], [2, 2]], VectorType(2)),
        ])


def bind_and_eval(sql_expr, block=None):
    block = block or make_block()
    ctx = BindContext()
    for name, col in block.items():
        ctx.add(name, col.dtype)
    ast = Parser(f"SELECT {sql_expr}").parse_statement().query.body.items[0].expr
    bound = ExprBinder(ctx).bind(ast)
    return Evaluator(block).run(bound)


class TestEvaluator:
    def test_arithmetic(self):
        assert bind_and_eval("a + 1").to_pylist() == [2, 3, 4, 5]
        assert bind_and_eval("a * b").to_pylist() == [10.0, 40.0, 90.0, 160.0]
        assert bind_and_eval("b / a").to_pylist() == [10.0, 10.0, 10.0, 10.0]
        assert bind_and_eval("a % 2").to_pylist() == [1, 0, 1, 0]
        assert bind_and_eval("-a").to_pylist() == [-1, -2, -3, -4]

    def test_comparison_and_logic(self):
        assert bind_and_eval("a > 2").to_pylist() == [False, False, True, True]
        assert bind_and_eval("a > 1 AND a < 4").to_pylist() == [False, True, True, False]
        assert bind_and_eval("NOT (a = 2)").to_pylist() == [True, False, True, True]
        assert bind_and_eval("s = 'bar'").to_pylist() == [False, True, False, False]

    def test_null_propagation(self):
        assert bind_and_eval("n + 1").to_pylist() == [2, None, 4, None]
        assert bind_and_eval("n IS NULL").to_pylist() == [False, True, False, True]
        assert bind_and_eval("n IS NOT NULL").to_pylist() == [True, False, True, False]
        assert bind_and_eval("coalesce(n, 0)").to_pylist() == [1, 0, 3, 0]
        assert bind_and_eval("if(n IS NULL, -1, n)").to_pylist() == [1, -1, 3, -1]

    def test_three_valued_logic(self):
        # FALSE AND NULL = FALSE ; TRUE AND NULL = NULL
        got = bind_and_eval("a > 10 AND n > 0").to_pylist()
        assert got == [False, False, False, False]
        got = bind_and_eval("a > 0 AND n > 0").to_pylist()
        assert got == [True, None, True, None]
        # TRUE OR NULL = TRUE
        got = bind_and_eval("a > 0 OR n > 0").to_pylist()
        assert got == [True, True, True, True]

    def test_strings(self):
        assert bind_and_eval("upper(s)").to_pylist() == ["FOO", "BAR", "BAZ", "QUX"]
        assert bind_and_eval("length(s)").to_pylist() == [3, 3, 3, 3]
        assert bind_and_eval("s || '!'").to_pylist() == ["foo!", "bar!", "baz!", "qux!"]
        assert bind_and_eval("substr(s, 2)").to_pylist() == ["oo", "ar", "az", "ux"]
        assert bind_and_eval("s LIKE 'ba%'").to_pylist() == [False, True, True, False]
        assert bind_and_eval("concat(s, '-', to_string(a))").to_pylist() == \
            ["foo-1", "bar-2", "baz-3", "qux-4"]

    def test_in_between_case(self):
        assert bind_and_eval("a IN (1, 3)").to_pylist() == [True, False, True, False]
        assert bind_and_eval("a NOT IN (1, 3)").to_pylist() == [False, True, False, True]
        assert bind_and_eval("a BETWEEN 2 AND 3").to_pylist() == [False, True, True, False]
        got = bind_and_eval("CASE WHEN a < 2 THEN 'lo' WHEN a < 4 THEN 'mid' ELSE 'hi' END")
        assert got.to_pylist() == ["lo", "mid", "mid", "hi"]
        got = bind_and_eval("CASE a WHEN 1 THEN 'one' WHEN 2 THEN 'two' END")
        assert got.to_pylist() == ["one", "two", None, None]

    def test_math(self):
        assert bind_and_eval("abs(-a)").to_pylist() == [1, 2, 3, 4]
        got = bind_and_eval("sqrt(b)").to_pylist()
        np.testing.assert_allclose(got, np.sqrt([10, 20, 30, 40]))
        assert bind_and_eval("round(b / 3, 1)").to_pylist() == [3.3, 6.7, 10.0, 13.3]

    def test_cast(self):
        assert bind_and_eval("CAST(a AS DOUBLE)").dtype == Float64
        assert bind_and_eval("a::VARCHAR").to_pylist() == ["1", "2", "3", "4"]
        assert bind_and_eval("CAST('12' AS BIGINT) + a").to_pylist() == [13, 14, 15, 16]
        assert bind_and_eval("TRY_CAST('x' AS BIGINT)").to_pylist() == [None] * 4

    def test_vector_functions(self):
        got = bind_and_eval("l2_distance(emb, [0.0, 0.0])")
        np.testing.assert_allclose(got.to_pylist(),
                                   [1.0, 1.0, np.sqrt(2), np.sqrt(8)], rtol=1e-6)
        got = bind_and_eval("cosine_distance(emb, [1.0, 0.0])")
        np.testing.assert_allclose(got.to_pylist(),
                                   [0.0, 1.0, 1 - 1 / np.sqrt(2), 1 - 1 / np.sqrt(2)],
                                   rtol=1e-5, atol=1e-6)
        assert bind_and_eval("vector_dims(emb)").to_pylist() == [2, 2, 2, 2]
        got = bind_and_eval("inner_product(emb, [2.0, 3.0])")
        assert got.to_pylist() == [2.0, 3.0, 5.0, 10.0]

    def test_errors(self):
        with pytest.raises(SemanticError, match="doesn't exist"):
            bind_and_eval("zzz + 1")
        with pytest.raises(UnknownFunction):
            bind_and_eval("frobnicate(a)")
        with pytest.raises(SemanticError):
            bind_and_eval("l2_distance(emb, [1.0, 2.0, 3.0])")  # dim mismatch via cast
        with pytest.raises(Exception):
            bind_and_eval("upper(a, b)")

    def test_array_literal_cast_to_vector(self):
        col = Column.from_pylist([[1.5, 2.5]], parse_type_name("ARRAY(DOUBLE)"))
        out = cast_column(col, VectorType(2), False)
        assert out.numpy().dtype == np.float32
        np.testing.assert_allclose(out.numpy(), [[1.5, 2.5]])


def test_divide_by_zero_and_bit_ops():
    """Reference semantics: 1/0 and 1%0 error 'divided by zero'; bit
    operators and DIV work; TRY_CAST of malformed dates is NULL."""
    import pytest

    from databend_tpu import SessionContext
    ctx = SessionContext()
    with pytest.raises(Exception, match="divided by zero"):
        ctx.sql("SELECT 1/0")
    with pytest.raises(Exception, match="divided by zero"):
        ctx.sql("SELECT 1 % 0")
    # ^ is POWER in the reference dialect (xor is # / bit_xor())
    assert ctx.sql("SELECT 5 & 3, 5 | 3, 5 # 3, 1 << 4, 32 >> 2,"
                   " 7 DIV 2").rows() == [(1, 7, 6, 16, 8, 3)]
    assert ctx.sql("SELECT 2 ^ 3").rows() == [(8.0,)]
    assert ctx.sql("SELECT TRY_CAST('nope' AS DATE),"
                   " TRY_CAST('x' AS TIMESTAMP)").rows() == [(None, None)]
    with pytest.raises(Exception):
        ctx.sql("SELECT CAST('nope' AS DATE)")


def test_cast_skips_null_rows():
    """CAST over a nullable column must not inspect the payload of NULL
    rows (corpus finding: INSERT .. SELECT IF(cond, '2024-01-01', NULL)
    raised 'cannot cast ""' on the NULL rows — reference casts only the
    valid rows)."""
    from databend_tpu import SessionContext
    ctx = SessionContext()
    ctx.sql("CREATE TABLE cast_null_t (d DATE NULL)")
    ctx.sql("INSERT INTO cast_null_t SELECT IF(number % 3 = 0,"
            " '2024-01-01', NULL) FROM numbers(9)")
    assert ctx.sql("SELECT count(1), count(d) FROM cast_null_t"
                   ).rows() == [(9, 3)]
    # numeric + decimal arms too
    assert ctx.sql("SELECT CAST(IF(false, '1', NULL) AS INT),"
                   " CAST(IF(false, '1.5', NULL) AS DECIMAL(5,2))"
                   ).rows() == [(None, None)]


def test_deep_nesting_is_clean_syntax_error():
    """Pathological nesting must fail as SyntaxException, never
    RecursionError (fuzz finding)."""
    import pytest

    from databend_tpu.errors import DatabendError
    from databend_tpu.sql.parser import parse_statements
    with pytest.raises(DatabendError):
        parse_statements("SELECT * FROM " + "(SELECT * FROM " * 400
                         + "t" + ")" * 400)
