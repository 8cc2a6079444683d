"""Direct parity against the reference's schema registry + field-DSL code.

mfar/data/schema.py is importable offline once its two unavailable
dependencies are stubbed: ``mashumaro`` (typedef's DataClassJSONMixin -- an
inert base class here) and ``pytorch_lightning`` (data/util.py's
MLFlowLogger wrapper, never touched by schema code).  The stubs replace
packages that are NOT installed in this environment, so nothing real is
shadowed.

Field order is load-bearing (it defines the field axis of every score
tensor and the mixer weight columns), so resolve_fields parity is checked
on ORDERED keys across the DSL matrix, not just set equality.
"""

import pytest

from tests.ref_stubs import install_reference_stubs

install_reference_stubs()

from mfar.data import schema as ref_schema  # noqa: E402

from mfar_tpu.data import schema as our_schema  # noqa: E402


def _ser(field_dict):
    return {k: f.serialize() for k, f in field_dict.items()}


def test_field_tables_parity():
    assert our_schema.SPARSE_MAX == ref_schema.SPARSE_MAX
    assert our_schema.DATASET_NAMES == ref_schema.DATASET_NAMES
    for name in ref_schema.DATASET_NAMES:
        assert our_schema.FIELDS_DICT[name] == ref_schema.FIELDS_DICT[name], name


def test_schemas_parity():
    for name in ref_schema.DATASET_NAMES:
        ours, refs = our_schema.SCHEMAS[name], ref_schema.SCHEMAS[name]
        assert list(ours.keys()) == list(refs.keys()), name
        assert _ser(ours) == _ser(refs), name
        assert _ser(our_schema.SINGLE_SCHEMAS[name]) == _ser(ref_schema.STARK_SCHEMAS[name])


DSL_CASES = [
    ("mag", "all_dense"),
    ("mag", "all_sparse"),
    ("mag", "all_dense,all_sparse"),
    ("mag", "all_sparse,all_dense"),  # order-insensitive: same sorted result
    ("mag", "title_dense,abstract_sparse,title_sparse"),
    ("mag", "single_sparse,all_dense"),
    ("mag", "single_dense,single_sparse"),
    ("prime", "all_dense,all_sparse"),
    ("prime", "off-label.use_dense,name_sparse"),  # '.' aliases ' '
    ("prime", "interacts.with_dense,side.effect_sparse,type_dense"),
    ("amazon", "title_dense,title_sparse,review_dense"),
    ("amazon", "all_sparse,single_dense"),
    ("whatsthatbook", "all_dense"),
    # dataset spec matched by substring of the last path component
    ("data/stark-prime", "all_dense"),
    ("/abs/path/to/amazon_v2", "title_dense"),
]


@pytest.mark.parametrize("dataset,names", DSL_CASES)
def test_resolve_fields_parity(dataset, names):
    ours = our_schema.resolve_fields(names, dataset)
    refs = ref_schema.resolve_fields(names, dataset)
    assert list(ours.keys()) == list(refs.keys()), (dataset, names)
    assert _ser(ours) == _ser(refs), (dataset, names)


def test_resolve_fields_list_input_parity():
    names = ["title_dense", "all_sparse"]
    ours = our_schema.resolve_fields(names, "mag")
    refs = ref_schema.resolve_fields(names, "mag")
    assert list(ours.keys()) == list(refs.keys())
    assert _ser(ours) == _ser(refs)


def test_resolve_fields_error_parity():
    with pytest.raises(ValueError):
        ref_schema.resolve_fields("nope_dense", "mag")
    with pytest.raises(ValueError):
        our_schema.resolve_fields("nope_dense", "mag")
    with pytest.raises(NotImplementedError):
        ref_schema.resolve_fields("all_dense", "unknown_ds")
    with pytest.raises(NotImplementedError):
        our_schema.resolve_fields("all_dense", "unknown_ds")
