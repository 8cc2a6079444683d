#!/bin/bash
# One-shot TPU measurement campaign: the full BENCH_NOTES.md round-3
# checklist, one configuration per process (the relay wedges if a process
# dies mid-compile -- see BENCH_NOTES.md "Timing"), each inside its own
# timeout, results appended to a fresh timestamped log (see LOG below).
#
# Usage: bash benchmarks/run_all.sh            # probe, then run everything
#        bash benchmarks/run_all.sh --no-probe # skip the probe (relay known up)
#
# Sized so the whole campaign finishes in ~35 min of relay time; each
# section is independent -- a failure or timeout moves on to the next.
set -u
cd "$(dirname "$0")/.."
# The exp_*.py scripts live in benchmarks/, so sys.path[0] is benchmarks/ --
# the repo root must be importable even when the package isn't pip-installed
# (round-4 lesson: every section died on ModuleNotFoundError without this).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# Fresh timestamped log per campaign (override with MFAR_CAMPAIGN_LOG).
# The committed results_r*.log files are historical artifacts BENCH_NOTES
# cites -- appending live runs to them interleaved new output with the
# checked-in evidence.
LOG=${MFAR_CAMPAIGN_LOG:-benchmarks/results_$(date +%Y%m%d_%H%M%S).log}
stamp() { date +"%Y-%m-%d %H:%M:%S"; }
say() { echo "[$(stamp)] $*" | tee -a "$LOG"; }

if [ "${1:-}" != "--no-probe" ]; then
  say "probe: tiny matmul (180s budget)"
  if ! timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('PROBE_OK', float((x@x).sum()), jax.devices()[0].platform)" 2>&1 | tee -a "$LOG" | grep -q PROBE_OK; then
    say "probe FAILED -- relay down, aborting campaign"
    exit 1
  fi
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  say "=== $name (timeout ${t}s): $*"
  timeout "$t" "$@" 2>&1 | tail -25 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  say "=== $name done rc=$rc"
  if [ "$rc" = "124" ]; then
    say "TIMEOUT fired: relay may be wedged; sleeping 180s + reprobing"
    sleep 180
    timeout 180 python -c "
import jax, jax.numpy as jnp
print('REPROBE_OK', float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))" \
      2>&1 | tail -2 | tee -a "$LOG"
  fi
}

# 2. Engine end-to-end breakdowns at production shapes.
run engine_dense_b256 900 python benchmarks/exp_engine.py dense 1048576 256
run engine_hybrid_b64 900 python benchmarks/exp_engine.py hybrid 1048576 64
run engine_hybrid_b256 900 python benchmarks/exp_engine.py hybrid 1048576 256

# 2b. Host-streamed corpus (capacity escape hatch): price the H2D-bound
#     modes at an N the relay tunnel (~75 MB/s standing in for PCIe) can
#     finish inside the timeout -- round 4 measured 2 QPS at N=512K, i.e.
#     the 524288 sections burned their full 900 s and still timed out.
run engine_dense_host 900 python benchmarks/exp_engine.py dense-host 131072 256
run engine_dense_host_i8 900 python benchmarks/exp_engine.py dense-host-int8 131072 256

# 3. Op-level: the B=512 row-block path (round-2 cliff fix).
run topk_b512 600 python benchmarks/exp_topk.py 512 256

# 3b. Online daemon: HTTP + micro-batching on top of the device scan.
run server_n1m 900 python benchmarks/exp_server.py 1048576 256 64 30

# 4. Train step with the recommended flags (726 ms/step claimed).
run train_step 900 python benchmarks/exp_train_step.py bf16sm

# 5. Pallas rerank gather: validate + price every variant (round 4: all
#    three validated, megacore made the default).  N=131072: the f32
#    corpus + its row-DMA copy at 262144 rows OOM'd the 16 GB chip.
run pallas_gather 600 python benchmarks/exp_pallas.py all 131072 256 128

# 6. The driver bench LAST: every claim in one JSON line (headline +
#    extras).  Runs last so a mid-campaign relay death costs the number the
#    driver re-measures at end-of-round anyway, not the engine breakdowns.
run bench 2400 python bench.py

say "campaign complete -- results in $LOG"
