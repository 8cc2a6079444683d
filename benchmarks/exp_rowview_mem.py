"""Measure the HBM cost of the [N, 1, F*E] row-DMA corpus view per dtype.

The Pallas rerank kernel needs the unit-sublane row view (Mosaic can only
single-row-slice axes above the (8,128)-tiled trailing dims).  The open
question for bf16 support: does the TPU layout pad the unit sublane dim to
the tile height (8 for f32, 16 for bf16), inflating the copy 8-16x?  This
probe device_puts each layout and reads device memory_stats deltas.

python benchmarks/exp_rowview_mem.py [N]
"""

import sys

import jax
import jax.numpy as jnp

F, E = 5, 768


def used() -> int:
    st = jax.devices()[0].memory_stats()
    return st.get("bytes_in_use", 0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    fe = F * E
    logical = {"f32": n * fe * 4, "bf16": n * fe * 2}

    base = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    base.block_until_ready()
    float(base.sum())  # force through the relay

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        m0 = used()
        flat = jax.device_put(jnp.zeros((n, fe), dtype))
        float(flat.sum())
        m1 = used()
        rows = jax.jit(lambda x: x.reshape(n, 1, fe))(flat)
        float(rows.sum())
        m2 = used()
        print(
            f"{name}: logical={logical[name]/2**20:.0f} MiB  "
            f"flat={(m1-m0)/2**20:.0f} MiB ({(m1-m0)/logical[name]:.2f}x)  "
            f"rowview={(m2-m1)/2**20:.0f} MiB ({(m2-m1)/logical[name]:.2f}x)",
            flush=True,
        )
        del flat, rows


if __name__ == "__main__":
    main()
