"""Microbenchmark: pallas matmul cost vs contraction (K) size and
window-slice origin alignment, mimicking the sampling kernel's stage-1
shape — decides whether half-height y windows can halve stage-1.

Grid of B steps; each step slices a (K, M) window from a VMEM-resident
(128, M) buffer at a static or dynamic origin and contracts against a
per-step (K, N) rhs.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

M, N = 640, 2048
B = 512


def bench(kern_k, dyn, nmat):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def body(oy_ref, lhs_ref, rhs_ref, out_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((M, N), jnp.float32)
        for r in range(nmat):
            if dyn:
                oy = pl.multiple_of(oy_ref[i] + r * 0, 16)
                win = lhs_ref[pl.ds(oy, kern_k), :]
            else:
                win = lhs_ref[r * 0 : kern_k, :]
            acc += jax.lax.dot_general(
                win,
                rhs_ref[0, : kern_k],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0] = (acc[:8] * (1.0 / nmat)).astype(jnp.bfloat16)

    lhs = jnp.asarray(np.random.rand(128, M), jnp.bfloat16)
    rhs = jnp.asarray(np.random.rand(B, 128, N), jnp.bfloat16)
    oy = jnp.asarray(
        (np.random.randint(0, (128 - kern_k) // 16 + 1, B) * 16), jnp.int32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, N), lambda i, _o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, N), lambda i, _o: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, N), jnp.bfloat16),
    )

    @jax.jit
    def run(lhs, rhs):
        def step(c, _):
            o = call(oy, lhs + c.astype(jnp.bfloat16), rhs)
            s = o[0, 0, 0].astype(jnp.float32) * 1e-30
            return s, s

        _, outs = jax.lax.scan(step, jnp.float32(0), None, length=8)
        return outs

    np.asarray(run(lhs, rhs))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(lhs, rhs))
        best = min(best, time.perf_counter() - t0)
    per = best / 8 / B / nmat
    macs = M * kern_k * N
    print(
        f"K={kern_k:4d} dyn={int(dyn)} nmat={nmat}: {per*1e6:7.2f} us/matmul "
        f"({macs/per/1e12:6.1f} TMAC/s)"
    )


def main():
    for k in (128, 64, 32):
        for dyn in (False, True):
            bench(k, dyn, 5)


if __name__ == "__main__":
    main()
