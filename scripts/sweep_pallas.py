"""Parameter sweep for the Pallas sampling kernel on the real chip.

Sweeps (window sizes, samples/block, MXU precision, contraction axis) at
the Panoptic JLN scale and prints ms + max error per config.  The winner
becomes the production default in ops/pallas_sampling.py.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, J, W, H = 5, 15, 240, 128
JP = 16
K = 10
CUBE = 64 * 64 * 64


def make_kernel(s, xw, yw, precision, contract):
    """contract='x': hm (V, W, H*JP), MXU contracts x, VPU reduces y.
    contract='y': hm (V, H, W*JP), MXU contracts y, VPU reduces x."""

    def kernel(coords_ref, hm_ref, out_ref):
        acc = jnp.zeros((JP, s), jnp.float32)
        for v in range(V):
            x = coords_ref[0, v, 0, :]
            y = coords_ref[0, v, 1, :]
            ox = jnp.clip(jnp.floor(jnp.min(x)), 0.0, float(W - xw)).astype(
                jnp.int32
            )
            oy = jnp.clip(jnp.floor(jnp.min(y)), 0.0, float(H - yw)).astype(
                jnp.int32
            )
            ox = pl.multiple_of((ox // 8) * 8, 8)
            oy = pl.multiple_of((oy // 8) * 8, 8)

            xi = jax.lax.broadcasted_iota(jnp.int32, (xw, s), 0).astype(
                jnp.float32
            ) + ox.astype(jnp.float32)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - xi))
            yi = jax.lax.broadcasted_iota(jnp.int32, (yw, s), 0).astype(
                jnp.float32
            ) + oy.astype(jnp.float32)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, :] - yi))

            if contract == "x":
                win = hm_ref[v, pl.ds(ox, xw), pl.ds(pl.multiple_of(oy * JP, 128), yw * JP)]
                t = jax.lax.dot_general(
                    win, wx, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )  # (YW*JP, S)
                p3 = t.reshape(yw, JP, s) * wy[:, None, :]
            else:
                win = hm_ref[v, pl.ds(oy, yw), pl.ds(pl.multiple_of(ox * JP, 128), xw * JP)]
                t = jax.lax.dot_general(
                    win, wy, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                )  # (XW*JP, S)
                p3 = t.reshape(xw, JP, s) * wx[:, None, :]
            acc = acc + jnp.sum(p3, axis=0)

        out_ref[0] = jnp.clip(acc * (1.0 / V), 0.0, 1.0)

    return kernel


def make_fn(s, xw, yw, precision, contract):
    kern = make_kernel(s, xw, yw, precision, contract)

    def fn(hm_packed, coords):
        n_blocks = coords.shape[0]
        return pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(
                    (1, V, 2, s), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, JP, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_blocks, JP, s), jnp.float32),
        )(coords, hm_packed)

    return fn


def pack_hm(hm, contract):
    hmp = jnp.pad(hm, ((0, 0), (0, 0), (0, 0), (0, JP - J)))
    if contract == "x":
        return hmp.transpose(0, 2, 1, 3).reshape(V, W, H * JP)
    return hmp.reshape(V, H, W * JP)


def xla_ref(hm, coords):
    from faster_voxelpose_tpu.ops.sampling import bilinear_sample

    x = coords[:, :, 0, :]
    y = coords[:, :, 1, :]
    c = jnp.stack([x / (W - 1) * 2 - 1, y / (H - 1) * 2 - 1], axis=-1)
    vals = jax.vmap(lambda cv: jax.vmap(bilinear_sample, (0, 0))(hm, cv))(c)
    out = jnp.clip(jnp.mean(vals, axis=1), 0.0, 1.0)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, JP - J)))
    return out.transpose(0, 2, 1)


def slope_time(fn, args, iters=(2, 8)):
    def runner(n):
        @jax.jit
        def run(a):
            def body(carry, _):
                out = fn(*jax.tree.map(lambda x: x + carry * 1e-30, a))
                ss = (jnp.sum(out[..., :1]) * 1e-30).astype(jnp.float32)
                return ss, ss

            _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return outs

        np.asarray(run(args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = runner(iters[0]), runner(iters[1])
    return (t2 - t1) / (iters[1] - iters[0])


def main():
    spread = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    rng = np.random.RandomState(0)
    hm = rng.rand(V, H, W, J).astype(np.float32)
    hm_d = jnp.asarray(hm)

    P = jax.lax.Precision
    configs = [
        # (S, XW, YW, precision, contract)
        (256, 24, 24, P.HIGHEST, "x"),
        (256, 24, 24, P.HIGH, "x"),
        (256, 24, 24, P.DEFAULT, "x"),
        (256, 24, 24, P.HIGH, "y"),
        (256, 16, 40, P.HIGH, "y"),
        (128, 16, 40, P.HIGH, "y"),
        (256, 24, 40, P.HIGH, "y"),
        (512, 24, 24, P.HIGH, "x"),
        (512, 16, 40, P.HIGH, "y"),
    ]

    for (s, xw, yw, prec, contract) in configs:
        n_blocks = K * CUBE // s
        coords = np.empty((n_blocks, V, 2, s), np.float32)
        cx = rng.uniform(-10, W + 10, (n_blocks, V, 1))
        cy = rng.uniform(-10, H + 10, (n_blocks, V, 1))
        coords[:, :, 0, :] = cx + rng.uniform(-spread / 2, spread / 2, (n_blocks, V, s))
        coords[:, :, 1, :] = cy + rng.uniform(-spread / 2, spread / 2, (n_blocks, V, s))
        coords_d = jax.device_put(jnp.asarray(coords))
        hm_packed = jax.jit(functools.partial(pack_hm, contract=contract))(hm_d)
        fn = make_fn(s, xw, yw, prec, contract)

        try:
            small = coords_d[:64]
            ours = np.asarray(jax.jit(fn)(hm_packed, small))
            ref = np.asarray(jax.jit(xla_ref)(hm_d, small))
            err = float(np.abs(ours - ref).max())
            t = slope_time(fn, (hm_packed, coords_d))
            n_samples = n_blocks * s * V
            print(
                f"S={s:4d} XW={xw} YW={yw} {str(prec):18s} {contract} : "
                f"{t*1e3:7.2f} ms  {t/n_samples*1e9:6.3f} ns/sample  err={err:.2e}"
            )
        except Exception as e:
            print(f"S={s} XW={xw} YW={yw} {prec} {contract}: FAILED {str(e)[:120]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
