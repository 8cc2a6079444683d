"""Shared import scaffolding for the direct reference-parity tests.

The reference tree at /root/reference needs a handful of packages this
environment doesn't ship (mashumaro, pytorch_lightning, bm25s).  None are
needed for the code paths the parity tests exercise, so inert stand-ins are
installed in sys.modules -- ONLY when the real package is absent, so nothing
real is ever shadowed.  bm25s.BM25 must be a class because the reference's
index.py evaluates it inside a signature annotation at class-definition time.
"""

import os
import sys
import types

import pytest

REFERENCE = "/root/reference"

_STUBS = [
    ("mashumaro", {}),
    ("mashumaro.mixins", {}),
    ("mashumaro.mixins.json", {"DataClassJSONMixin": object}),
    ("pytorch_lightning", {}),
    ("pytorch_lightning.loggers", {"MLFlowLogger": object}),
    ("bm25s", {"BM25": type("BM25", (), {}), "tokenize": None}),
]


def install_reference_stubs():
    """Make the reference importable, or skip the calling module."""
    if not os.path.isdir(os.path.join(REFERENCE, "mfar")):  # pragma: no cover
        pytest.skip("reference tree unavailable", allow_module_level=True)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    for name, attrs in _STUBS:
        root = name.split(".")[0]
        if root in sys.modules and not getattr(
            sys.modules[root], "__mfar_tpu_test_stub__", False
        ):  # pragma: no cover - only if the real package appears in the image
            pytest.skip(f"{root} is installed for real", allow_module_level=True)
        mod = types.ModuleType(name)
        mod.__mfar_tpu_test_stub__ = True
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
