from mfar_tpu.data.schema import (
    SCHEMAS,
    dense_keys,
    resolve_fields,
    sparse_keys,
)
from mfar_tpu.data.types import FieldType

import pytest


def test_schema_sizes():
    assert len(SCHEMAS["mag"]) == 2 * 5
    assert len(SCHEMAS["prime"]) == 2 * 22
    assert len(SCHEMAS["amazon"]) == 2 * 8
    assert len(SCHEMAS["whatsthatbook"]) == 2 * 12


def test_resolve_all_dense():
    fields = resolve_fields("all_dense", "mag")
    assert len(fields) == 5
    assert all(f.field_type == FieldType.DENSE for f in fields.values())
    assert list(fields) == sorted(fields)


def test_resolve_mixed_sorted_dense_first():
    fields = resolve_fields("title_sparse,abstract_dense,title_dense", "mag")
    keys = list(fields)
    assert keys == ["abstract_dense", "title_dense", "title_sparse"]


def test_resolve_all_both():
    fields = resolve_fields("all_dense,all_sparse", "amazon")
    assert len(fields) == 16
    keys = list(fields)
    assert all(fields[k].is_dense for k in keys[:8])
    assert all(fields[k].is_sparse for k in keys[8:])


def test_resolve_single():
    fields = resolve_fields("single_sparse,single_dense", "prime")
    assert set(fields) == {"single_sparse", "single_dense"}
    assert fields["single_dense"].name == "single"
    assert fields["single_dense"].max_seq_length == 512


def test_dot_alias_for_space():
    fields = resolve_fields("off-label.use_sparse", "prime")
    assert list(fields) == ["off-label use_sparse"]


def test_dataset_path_matching():
    fields = resolve_fields("title_dense", "/data/stark/amazon-v2")
    assert fields["title_dense"].dataset == "amazon"


def test_unknown_dataset_raises():
    with pytest.raises(NotImplementedError):
        resolve_fields("all_dense", "unknown_ds")


def test_unknown_field_raises():
    with pytest.raises(ValueError):
        resolve_fields("nonexistent_dense", "mag")


def test_key_helpers():
    fields = resolve_fields("all_dense,title_sparse", "mag")
    assert len(dense_keys(fields)) == 5
    assert sparse_keys(fields) == ["title_sparse"]


def test_field_serialize_roundtrip():
    from mfar_tpu.data.types import Field

    f = resolve_fields("title_dense", "mag")["title_dense"]
    assert Field.deserialize(f.serialize()) == f
