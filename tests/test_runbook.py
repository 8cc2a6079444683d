"""RUNBOOK.md stays executable: every flag in its command blocks exists.

The quality-parity campaign (RUNBOOK.md) can only be launched on a rare
network-connected session, so a stale flag would waste exactly that session
(round-3 verdict item 9).  This test parses every ``python -m
mfar_tpu.commands.*`` / ``mfar-*`` invocation out of the runbook's fenced
code blocks and asserts each ``--flag`` is accepted by that command's real
argparse surface (via its ``--help`` text, which argparse renders before
any heavy work).
"""

import io
import re
from contextlib import redirect_stderr, redirect_stdout
from importlib import import_module

import pytest

RUNBOOK = "/root/repo/RUNBOOK.md"

# console-script name -> module (mirrors pyproject [project.scripts])
SCRIPTS = {
    "mfar-train": "train",
    "mfar-retrieve": "retrieve",
    "mfar-serve": "serve",
    "mfar-mask-fields": "mask_fields",
    "mfar-encode-corpus": "encode_corpus",
    "mfar-make-synth-data": "make_synth_data",
    "mfar-create-sparse-index": "create_sparse_index",
    "mfar-precompute-sparse-scores": "precompute_sparse_scores",
    "mfar-stark-to-trec": "stark.stark_to_trec",
    "mfar-download-queries": "stark.download_queries",
}


def _command_lines():
    """Yield (module_path, [flag, ...]) for every invocation in RUNBOOK.md,
    from fenced code blocks AND inline backtick spans (the prose also
    carries commands)."""
    text = open(RUNBOOK).read()
    chunks = re.findall(r"```(?:bash|sh)?\n(.*?)```", text, re.S)
    chunks += re.findall(r"`([^`]*)`", text)
    for chunk in chunks:
        # join backslash continuations, then scan statement by statement
        joined = chunk.replace("\\\n", " ")
        for line in joined.splitlines():
            line = line.strip()
            m = re.match(r"python -m (mfar_tpu\.commands\.[\w.]+)\s+(.*)", line)
            if not m:
                s = re.match(r"(mfar-[\w-]+)\s+(.*)", line)
                if not s or s.group(1) not in SCRIPTS:
                    continue
                m = None, f"mfar_tpu.commands.{SCRIPTS[s.group(1)]}", s.group(2)
                module, rest = m[1], m[2]
            else:
                module, rest = m.group(1), m.group(2)
            flags = re.findall(r"--[A-Za-z0-9][A-Za-z0-9_-]*", rest)
            if flags:
                yield module, flags


CASES = sorted({(mod, tuple(flags)) for mod, flags in _command_lines()})


def test_runbook_has_command_blocks():
    assert len(CASES) >= 10, f"runbook parser found too few commands: {CASES}"


@pytest.mark.parametrize("module,flags", CASES,
                         ids=[f"{m.split('.')[-1]}:{i}" for i, (m, _) in enumerate(CASES)])
def test_runbook_flags_exist(module, flags):
    mod = import_module(module)
    buf = io.StringIO()
    with pytest.raises(SystemExit) as exc, redirect_stdout(buf), redirect_stderr(buf):
        mod.main(["--help"])
    assert exc.value.code == 0, buf.getvalue()
    helptext = buf.getvalue().replace("\n", " ")
    for flag in flags:
        # the runbook accepts both spellings (normalize_argv); help prints
        # the hyphenated canonical form
        canon = flag.replace("_", "-")
        assert canon in helptext, (
            f"RUNBOOK.md uses {flag} but `{module} --help` does not list "
            f"{canon} -- the runbook has drifted from the flag surface"
        )
