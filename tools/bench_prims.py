"""Microbenchmark of Mosaic vector-primitive costs relevant to the warp
kernel (run manually on the chip: python tools/bench_prims.py).

The warp kernel spends its time in per-slice lane gathers
(take_along_axis over (bh, 128)), misaligned sublane slices, selects and
FMAs.  This measures each primitive's standalone throughput so kernel
restructurings (e.g. replacing gathers with static-roll + select chains
for small column spreads) are designed against measured costs, not guesses.

Each variant runs a serial fori_loop chain (data-dependent, so nothing can
be hoisted or dead-code-eliminated) over a (BH, W) f32 block; reported as
ns per iteration per (8,128) vreg touched.
"""

import sys
import os
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 32
N_ITERS = 512
N_BLOCKS = 64          # amortize grid overhead


def _mk(body, w):
    def kern(x_ref, i_ref, o_ref):
        x = x_ref[...]
        idx = i_ref[...]

        def step(_, acc):
            return body(acc, idx)

        o_ref[...] = lax.fori_loop(0, N_ITERS, step, x)

    return pl.pallas_call(
        kern,
        grid=(N_BLOCKS,),
        in_specs=[pl.BlockSpec((BH, w), lambda i: (i, 0)),
                  pl.BlockSpec((BH, w), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BH, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_BLOCKS * BH, w), jnp.float32),
    )


def timeit(fn, x, idx):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(x, idx))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(x, idx)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    vregs = N_BLOCKS * (BH // 8) * (x.shape[1] // 128)
    return dt / N_ITERS / vregs * 1e9      # ns per vreg per iteration


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    for w in (128, 256):
        x = jnp.asarray(rng.normal(0, 1, (N_BLOCKS * BH, w)).astype(np.float32))
        idxf = jnp.asarray(
            rng.integers(0, 128, (N_BLOCKS * BH, w)).astype(np.float32))

        def with_int_idx(body):
            def wrapped(acc, idxf_):
                return body(acc, idxf_.astype(jnp.int32))
            return wrapped

        variants = {}
        if w == 128:
            variants["gather128 (take_along_axis)"] = with_int_idx(
                lambda acc, idx: jnp.take_along_axis(acc, idx, axis=1))
        else:
            variants["gather256 (2 gathers + select)"] = with_int_idx(
                lambda acc, idx: jnp.where(
                    idx < 128,
                    jnp.take_along_axis(acc[:, :128], jnp.clip(idx[:, :128], 0, 127), axis=1),
                    jnp.take_along_axis(acc[:, 128:], jnp.clip(idx[:, :128] - 128, 0, 127), axis=1),
                ).repeat(2, axis=1)[:, :w])
        variants["roll_static1"] = (
            lambda acc, idxf_: pltpu.roll(acc, 1, 1))
        variants["roll_dynamic"] = with_int_idx(
            lambda acc, idx: pltpu.roll(acc, idx[0, 0], 1))
        variants["select"] = (
            lambda acc, idxf_: jnp.where(idxf_ > 64.0, acc, acc + 1.0))
        variants["fma"] = (
            lambda acc, idxf_: acc * 1.0001 + idxf_)
        variants["roll1+select"] = (
            lambda acc, idxf_: jnp.where(idxf_ > 64.0,
                                         pltpu.roll(acc, 1, 1), acc))
        variants["sublane_slice_misaligned"] = (
            lambda acc, idxf_: jnp.concatenate(
                [lax.slice_in_dim(acc, 3, BH, axis=0),
                 lax.slice_in_dim(acc, 0, 3, axis=0)], axis=0))
        # the warp inner step: 2 gathers + 2 selects + fma (per field, per
        # slice, 2-third variant)
        if w == 256:
            def warp_step(acc, idxf_):
                idx = idxf_.astype(jnp.int32)[:, :128]
                a = jnp.clip(idx, 0, 127)
                b = jnp.clip(idx - 128, 0, 127)
                g1 = jnp.where(idx < 128,
                               jnp.take_along_axis(acc[:, :128], a, axis=1),
                               jnp.take_along_axis(acc[:, 128:], b, axis=1))
                g2 = jnp.where(idx < 127,
                               jnp.take_along_axis(acc[:, :128], jnp.clip(a + 1, 0, 127), axis=1),
                               jnp.take_along_axis(acc[:, 128:], jnp.clip(b + 1, 0, 127), axis=1))
                r = 0.3 * g1 + 0.7 * g2
                return jnp.concatenate([r, r], axis=1)
            variants["warp_inner_gather (4G+2S+FMA)"] = warp_step

            def warp_step_roll(acc, idxf_, n_roll=4):
                # small-spread alternative: delta in [0, n_roll); rolls are
                # shared between the two taps (tap2 of delta == tap1 of
                # delta+1)
                d = idxf_.astype(jnp.int32)[:, :128] % n_roll
                rolls = [acc[:, :128]]
                for k in range(1, n_roll + 1):
                    rolls.append(pltpu.roll(acc, -k, 1)[:, :128])
                g1 = rolls[0]
                g2 = rolls[1]
                for k in range(1, n_roll):
                    g1 = jnp.where(d == k, rolls[k], g1)
                    g2 = jnp.where(d == k, rolls[k + 1], g2)
                r = 0.3 * g1 + 0.7 * g2
                return jnp.concatenate([r, r], axis=1)
            variants["warp_inner_roll4 (5R+6S+FMA)"] = warp_step_roll
            variants["warp_inner_roll8"] = functools.partial(
                warp_step_roll, n_roll=8)

        for name, body in variants.items():
            try:
                ns = timeit(_mk(body, w), x, idxf)
                print(f"w={w} {name:38s} {ns:8.2f} ns/vreg/iter")
            except Exception as e:                       # noqa: BLE001
                print(f"w={w} {name:38s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
