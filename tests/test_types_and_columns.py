import numpy as np
import pytest

from databend_tpu.errors import SyntaxException, TypeMismatch
from databend_tpu.expression import Column, DataBlock, StringData, TableSchema, DataField
from databend_tpu.types import (
    ArrayType, Boolean, Float32, Float64, Int32, Int64, NullableType, String,
    UInt8, VectorType, common_super_type, parse_type_name,
)


class TestTypes:
    def test_parse_type_names(self):
        assert parse_type_name("INT") == Int32
        assert parse_type_name("bigint") == Int64
        assert parse_type_name("FLOAT") == Float32
        assert parse_type_name("VARCHAR") == String
        assert parse_type_name("VECTOR(128)") == VectorType(128, "f32")
        assert parse_type_name("VECTOR(64, INT8)") == VectorType(64, "i8")
        assert parse_type_name("ARRAY(FLOAT)") == ArrayType(Float32)
        assert parse_type_name("INT NULL") == NullableType(Int32)
        assert parse_type_name("INT NOT NULL") == Int32

    def test_parse_bad_type(self):
        with pytest.raises(SyntaxException):
            parse_type_name("WIBBLE")

    def test_super_type(self):
        assert common_super_type(Int32, Int64) == Int64
        assert common_super_type(Int32, Float32) == Float64  # int32 exceeds f32 mantissa
        assert common_super_type(parse_type_name("SMALLINT"), Float32) == Float32
        assert common_super_type(Float32, Float64) == Float64
        assert common_super_type(UInt8, Int32) == Int32
        assert common_super_type(NullableType(Int32), Int64) == NullableType(Int64)
        with pytest.raises(TypeMismatch):
            common_super_type(VectorType(4), Int32)

    def test_nullable_wrap(self):
        t = Int32.wrap_nullable()
        assert t.is_nullable() and t.remove_nullable() == Int32
        assert t.wrap_nullable() == t


class TestColumns:
    def test_numeric_roundtrip(self):
        c = Column.from_pylist([1, 2, 3], Int64)
        assert len(c) == 3
        assert c.to_pylist() == [1, 2, 3]

    def test_nullable(self):
        c = Column.from_pylist([1, None, 3], Int64)
        assert c.null_count() == 1
        assert c.to_pylist() == [1, None, 3]
        assert c.get(1) is None

    def test_string_roundtrip(self):
        c = Column.from_pylist(["a", "héllo", ""], String)
        assert c.to_pylist() == ["a", "héllo", ""]
        assert c.get(1) == "héllo"

    def test_string_take_concat(self):
        c = Column.from_pylist(["aa", "b", "cccc", "dd"], String)
        t = c.take([2, 0])
        assert t.to_pylist() == ["cccc", "aa"]
        cc = Column.concat([c, t])
        assert cc.to_pylist() == ["aa", "b", "cccc", "dd", "cccc", "aa"]

    def test_vector_column(self):
        vt = VectorType(4)
        c = Column.from_pylist([[1, 2, 3, 4], [5, 6, 7, 8]], vt)
        assert c.numpy().shape == (2, 4)
        assert c.numpy().dtype == np.float32
        t = c.take([1])
        assert t.to_pylist() == [[5.0, 6.0, 7.0, 8.0]]

    def test_vector_dim_mismatch(self):
        from databend_tpu.errors import BadDataValueType
        with pytest.raises(BadDataValueType):
            Column.from_pylist([[1, 2]], VectorType(4))

    def test_array_column(self):
        at = ArrayType(Int64)
        c = Column.from_pylist([[1, 2], [], [3]], at)
        assert c.to_pylist() == [[1, 2], [], [3]]
        assert c.take([2, 0]).to_pylist() == [[3], [1, 2]]

    def test_filter_slice(self):
        c = Column.from_pylist([10, 20, 30, 40], Int64)
        assert c.filter(np.array([True, False, True, False])).to_pylist() == [10, 30]
        assert c.slice(1, 3).to_pylist() == [20, 30]


class TestDataBlock:
    def _block(self):
        return DataBlock(
            ["id", "name"],
            [Column.from_pylist([1, 2, 3], Int64),
             Column.from_pylist(["x", "y", "z"], String)])

    def test_basic(self):
        b = self._block()
        assert b.num_rows == 3
        assert b.column("ID").to_pylist() == [1, 2, 3]
        assert b.to_rows() == [(1, "x"), (2, "y"), (3, "z")]

    def test_take_filter_concat(self):
        b = self._block()
        assert b.take([2, 0]).to_rows() == [(3, "z"), (1, "x")]
        assert b.filter(np.array([False, True, False])).to_rows() == [(2, "y")]
        cc = DataBlock.concat([b, b.slice(0, 1)])
        assert cc.num_rows == 4

    def test_with_column_project(self):
        b = self._block()
        b2 = b.with_column("score", Column.from_pylist([0.5, 0.25, 0.125], Float64))
        assert b2.num_columns() == 3
        assert b2.project(["score", "id"]).names == ["score", "id"]


class TestSchema:
    def test_schema(self):
        s = TableSchema([DataField("id", Int64), DataField("emb", VectorType(8))])
        assert s.index_of("EMB") == 1
        assert s.column_id_of("emb") == 1
        d = s.to_dict()
        s2 = TableSchema.from_dict(d)
        assert s2.field("emb").dtype == VectorType(8)
