"""Measure the VPU int32 throughput ceiling with peak-ILP Pallas kernels.

PERF.md §2 previously ESTIMATED the v5e VPU integer ceiling (~3.9 Tera-
int-ops/s from the (8, 128) SIMD geometry) to place the fused rollout
kernel's utilization; VERDICT r4 item 7 asks for a measured denominator.
Two kernels bracket the relevant op classes:

- `addlike`: chains of dependent-free add/xor ops (the accessibility, mask
  and key-compare class that dominates the rollout kernels),
- `mac`: int32 multiply-then-add (the score/key arithmetic class; 32-bit
  multiplies cost multiple VPU passes, so this is the pessimistic bound).

Each kernel runs NACC independent [ROWS, 128] accumulators so the sublane
pipeline stays full, unrolled K deep; device time comes from the profiler
(`utils.profiling.device_time_ms`). Output: one JSON line with measured
Tera-ops/s per class. Run on the real chip: python scripts/vpu_ceiling.py
"""

import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = 256
NACC = 8
K = 256


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tapnet_tpu.utils.profiling import device_time_ms

    if jax.default_backend() != "tpu":
        print("ERROR: run on the real TPU backend", file=sys.stderr)
        return 1

    def make(kind):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            acc = [x + jnp.int32(j) for j in range(NACC)]
            c = x | jnp.int32(1)
            for _ in range(K):
                for j in range(NACC):
                    if kind == "addlike":
                        acc[j] = (acc[j] + c) ^ acc[(j + 1) % NACC]
                    else:
                        acc[j] = acc[j] * c + jnp.int32(3)
            out = acc[0]
            for j in range(1, NACC):
                out = out + acc[j]
            o_ref[:] = out

        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        )

    x = jnp.arange(ROWS * 128, dtype=jnp.int32).reshape(ROWS, 128)
    out = {}
    for kind, ops_per_iter in (("addlike", 2), ("mac", 2)):
        call = make(kind)

        @jax.jit
        def vpu_probe(x, call=call):
            return call(x)

        jax.block_until_ready(vpu_probe(x))
        dev_ms = device_time_ms(lambda: jax.block_until_ready(vpu_probe(x)),
                                "vpu_probe", iters=5, warmup=2)
        total_ops = 8 * NACC * ROWS * 128 * K * ops_per_iter
        out[f"{kind}_tera_ops_per_s"] = round(
            total_ops / (dev_ms / 1e3) / 1e12, 3)
        out[f"{kind}_device_ms"] = round(dev_ms, 4)
    out["shape"] = f"{NACC}x[{ROWS},128] x {K} deep x 8 grid"
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
