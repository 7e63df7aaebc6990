import pyarrow as pa
import pytest

from featherstore_ray.schema import (
    SchemaError,
    TOKENS_SCHEMA,
    empty_table,
    parse_type,
    require_entity_column,
    schema_from_features,
    validate_schema,
)


def test_parse_type_basic():
    assert parse_type("int64") == pa.int64()
    assert parse_type("string") == pa.string()
    assert parse_type("timestamp") == pa.timestamp("us")
    assert parse_type("list<int32>") == pa.list_(pa.int32())
    assert parse_type("list<list<float32>>") == pa.list_(pa.list_(pa.float32()))
    with pytest.raises(SchemaError):
        parse_type("decimal128")


def test_tokens_schema_shape():
    # the driver input_hint table shape
    assert TOKENS_SCHEMA.names == ["doc_id", "tokens", "n_tok", "source"]
    assert TOKENS_SCHEMA.field("tokens").type == pa.list_(pa.int32())


def test_require_entity_column():
    s = schema_from_features({"entity_id": "string", "f": "float64"})
    require_entity_column(s)
    with pytest.raises(SchemaError):
        require_entity_column(pa.schema([pa.field("x", pa.int64())]))


def test_validate_schema_strict_and_lenient():
    declared = schema_from_features(
        {"entity_id": "string", "timestamp": "timestamp[us]", "f1": "float64"}
    )
    ok = pa.schema(
        [
            pa.field("entity_id", pa.string()),
            pa.field("timestamp", pa.timestamp("us")),
            pa.field("f1", pa.float64()),
        ]
    )
    validate_schema(ok, declared, strict=True)
    # missing f1: fails strict (duckdb path), passes lenient (parquet path)
    partial = pa.schema(
        [
            pa.field("entity_id", pa.string()),
            pa.field("timestamp", pa.timestamp("us")),
        ]
    )
    with pytest.raises(SchemaError):
        validate_schema(partial, declared, strict=True)
    validate_schema(partial, declared, strict=False)
    # exact type-id equality, no coercion (parquet.go:921-925)
    wrong = pa.schema(
        [
            pa.field("entity_id", pa.string()),
            pa.field("timestamp", pa.timestamp("ns")),
            pa.field("f1", pa.float64()),
        ]
    )
    with pytest.raises(SchemaError):
        validate_schema(wrong, declared, strict=False)


def test_empty_table_preserves_schema():
    s = schema_from_features({"entity_id": "string", "f": "int64"})
    t = empty_table(s)
    assert t.num_rows == 0
    assert t.schema == s
