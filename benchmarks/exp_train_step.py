"""Train-step timing at the mag `all_dense` shape (BENCH_NOTES methodology).

Contriever-base encoder (12L/768), 5 dense fields at the mag token budgets
(512/512/512/64/64) + 64-token query, B=24, one sparse field, remat on,
rbg PRNG, attention dropout 0.  Usage:

    python benchmarks/exp_train_step.py [full|dots|attn_out|bf16sm] [nodonate] [bN]
    python benchmarks/exp_train_step.py dist-bucketed|dist-onshape [bN]

arg 1 picks the remat policy (or bf16 softmax with full remat); `nodonate`
disables state donation for an A/B; `bN` (e.g. ``b48``) overrides the batch
size for throughput-mode runs (B=24 is the reference's per-GPU mag batch —
parity posture; larger B amortizes the fixed per-step work and raises MFU
on a dedicated chip). Steps run back-to-back with
device-resident losses; one scalar fetch ends the timed region (relay-safe
single-fetch timing).

The ``dist-*`` modes are the padding A/B (VERDICT round-4 item 5): 8
distinct batches whose per-sequence REAL lengths follow the documented
STaRK-like distribution (mfar_tpu.data.synth.stark_like_token_lengths),
masks at the real lengths either way.  ``dist-bucketed`` pads each token
group the way the shipped collation does -- smallest power-of-two bucket
>= the batch max (models/tokenizer.py::pad_to_bucket), each distinct width
combo compiling its own program; ``dist-onshape`` pads every group to its
full schema budget -- ONE compiled program.  Reports warm ms/step over the
batch set, padding %, distinct compiled shape combos, and useful
(real-token) throughput; the bucketed/onshape ratio is the win the bucketed
collation actually buys on this distribution.
"""

import sys
import time

import numpy as np


def main():
    from mfar_tpu.utils.compile_cache import enable as _cc

    _cc()
    donate = "nodonate" not in sys.argv[1:]
    steps = 6

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from mfar_tpu.models.encoder import EncoderConfig
    from mfar_tpu.train.model import MFARModel
    from mfar_tpu.train.optim import make_optimizer
    from mfar_tpu.train.train_step import init_state, make_train_step

    B = 24
    known = ("full", "dots", "attn_out", "bf16sm", "nodonate",
             "dist-bucketed", "dist-onshape")
    dist_mode = None
    for a in sys.argv[1:]:
        if a.startswith("b") and a[1:].isdigit():
            B = int(a[1:])
            if B < 1:
                sys.exit(f"batch override {a!r} must be >= 1")
        elif a not in known:
            sys.exit(
                f"unrecognized argument {a!r} (expected one of {known} "
                f"or a batch override like 'b48')"
            )
        elif a.startswith("dist-"):
            dist_mode = a.removeprefix("dist-")
    budgets = {"title_dense": 512, "abstract_dense": 512, "cites_dense": 512,
               "topic_dense": 64, "affil_dense": 64}
    config = EncoderConfig(
        vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
        intermediate_size=3072, max_position_embeddings=512,
        hidden_dropout=0.1, attention_dropout=0.0, remat=True,
        remat_policy=sys.argv[1]
        if len(sys.argv) > 1 and sys.argv[1] in ("dots", "attn_out")
        else "full",
        softmax_dtype=jnp.bfloat16 if "bf16sm" in sys.argv[1:] else jnp.float32,
    )
    model = MFARModel(encoder_config=config, num_fields=len(budgets) + 1,
                      query_cond=True, temperature=0.05)
    opt = make_optimizer(encoder_lr=1e-4, weights_lr=1e-1)
    state = init_state(model, opt, seed=0)

    rng = np.random.default_rng(0)

    def toks(n, s):
        return {
            "input_ids": jnp.asarray(rng.integers(1000, 30000, size=(n, s)), jnp.int32),
            "attention_mask": jnp.ones((n, s), jnp.int32),
        }

    batch = {
        "query": toks(B, 64),
        "pos": {fk: toks(B, s) for fk, s in budgets.items()},
        "neg": {fk: toks(B, s) for fk, s in budgets.items()},
        "sparse_pos": jnp.asarray(rng.normal(size=(B, B, 1)), jnp.float32),
        "sparse_neg": jnp.asarray(rng.normal(size=(B, B, 1)), jnp.float32),
    }

    step_fn = jax.jit(make_train_step(model, opt),
                      donate_argnums=(0,) if donate else ())

    if dist_mode:
        run_dist(step_fn, state, B, budgets, bucketed=dist_mode == "bucketed")
        return

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics["loss"])
    float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    last = None
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        last = metrics["loss"]
    lv = float(last)  # single fetch ends the timed region
    dt = (time.perf_counter() - t0) / steps
    print(f"donate={donate}: {dt*1000:.0f} ms/step (loss {lv:.3f}, "
          f"{B/dt:.1f} ex/s)", flush=True)


def run_dist(step_fn, state, B, budgets, bucketed: bool):
    """The padding A/B: 8 STaRK-like-length batches, bucketed vs one-shape
    widths.  Donation is per-program in XLA, so the bucketed variant's many
    programs all donate the SAME state buffers safely (each step consumes
    the previous step's output state)."""
    import json

    import jax
    import jax.numpy as jnp

    from mfar_tpu.data.synth import stark_like_token_lengths
    from mfar_tpu.models.tokenizer import pad_to_bucket

    import os

    # Each DISTINCT bucket combo is a fresh train-step program (~200 s
    # remote compile on this relay, cached persistently thereafter).  Bound
    # a single process's fresh-compile exposure by growing the batch count
    # across runs: MFAR_DIST_BATCHES=4 first (1-2 fresh combos), then 8
    # (the rest) -- each run inside its timeout, never killed mid-compile.
    n_batches = int(os.environ.get("MFAR_DIST_BATCHES", "8"))
    rng = np.random.default_rng(7)
    real_tok = total_tok = 0
    shapes = set()

    def toks(n, budget):
        nonlocal real_tok, total_tok
        lens = stark_like_token_lengths(budget, n, rng)
        width = pad_to_bucket(int(lens.max()), budget) if bucketed else budget
        ids = rng.integers(1000, 30000, size=(n, width)).astype(np.int32)
        mask = (np.arange(width)[None, :] < lens[:, None]).astype(np.int32)
        ids *= mask
        real_tok += int(lens.sum())
        total_tok += n * width
        return {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)}

    batches = []
    for _ in range(n_batches):
        batch = {
            "query": toks(B, 64),
            "pos": {fk: toks(B, s) for fk, s in budgets.items()},
            "neg": {fk: toks(B, s) for fk, s in budgets.items()},
            "sparse_pos": jnp.asarray(rng.normal(size=(B, B, 1)), jnp.float32),
            "sparse_neg": jnp.asarray(rng.normal(size=(B, B, 1)), jnp.float32),
        }
        shapes.add(tuple(
            g["input_ids"].shape[1]
            for g in [batch["query"], *batch["pos"].values(), *batch["neg"].values()]
        ))
        batches.append(batch)

    # Pass 1 compiles every distinct shape combo (off the clock), pass 2+3
    # time warm steps; one scalar fetch ends each timed region.
    t0 = time.perf_counter()
    for batch in batches:
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2):
        for batch in batches:
            state, metrics = step_fn(state, batch)
    lv = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / (2 * n_batches)
    print("dist_ab " + json.dumps({
        "variant": "bucketed" if bucketed else "onshape",
        "B": B,
        "ms_per_step": round(dt * 1000, 1),
        "useful_tokens_per_s": round(real_tok / n_batches / dt),
        "padding_pct": round(100 * (1 - real_tok / total_tok), 1),
        "distinct_shape_combos": len(shapes),
        "compile_pass_s": round(compile_s, 1),
        "loss": round(lv, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
