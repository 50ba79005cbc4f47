"""Variant surgery on the warp kernel: isolate WHERE the 40x-above-BW-floor
time goes (run manually on the chip).

The microbench (tools/bench_prims.py) shows take_along_axis gathers cost
about the same as FMAs per vreg on this part, so the kernel is NOT
primitive-bound; candidates are the per-slice lax.cond guards, the 12-array
fori_loop carry (accumulator spills), and the misaligned sublane slices.
Each variant disables one structure; deltas against baseline attribute the
time.  Variants are NOT exact (except baseline) -- timing only.
"""

import functools
import os
import sys
import time

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

import octane_tpu.ops.pallas.warp as wm


def timed(fn, *args, reps=20):
    red = jax.jit(lambda *a: fn(*a)[0][0, 0, 0])
    jax.block_until_ready(red(*args))
    t0 = time.perf_counter()
    s = [red(*args) for _ in range(reps)]
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / reps


def bench_flow(h, w):
    """Bench-like smooth flow (config-3 post-convergence shape)."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = (2.4 + 0.3 * np.sin(yy / 97.0) + rng.uniform(-0.1, 0.1, (h, w))
         ).astype(np.float32)
    v = (0.1 * np.cos(xx / 83.0) + rng.uniform(-0.1, 0.1, (h, w))
         ).astype(np.float32)
    fields = rng.normal(0, 1, (6, h, w)).astype(np.float32)
    return jnp.asarray(fields), jnp.asarray(u), jnp.asarray(v)


def make_variant(shape, *, no_cond=False, no_gather=False, no_acc=False,
                 aligned_slice=False, k_one=False):
    """Copy of the production kernel structure with one knob disabled."""
    h, w = shape
    dv = wm._round_dv(wm.DV)
    bh = wm._pick_bh(h, dv)
    hp = -(-h // bh) * bh
    wp = -(-w // wm.BW) * wm.BW
    BW = wm.BW
    SRC_W = wm.SRC_W
    CPAD = wm.CPAD
    src_h = bh + 2 * dv + 2
    gh, gw = hp // bh, wp // BW
    rows_p = max(hp, h) + 2 * bh + 2 * dv + 2
    cols_p = -(-(max(wp, w) + CPAD) // 128) * 128 + SRC_W
    k = 1 if k_one else 6

    def kern(srow_ref, scol_ref, dlo_ref, dhi_ref, eflag_ref, f_hbm,
             u_ref, v_ref, o_ref, bx_ref, by_ref, src2, er_lo2, er_hi2,
             sem, sem_lo, sem_hi):
        rb = pl.program_id(0)
        cb = pl.program_id(1)
        two = jnp.int32(2)
        lin = rb * gw + cb
        cur = lax.rem(lin, two)
        nxt = lax.rem(lin + 1, two)

        def start_dma(buf, blk):
            bi = blk // gw
            bj = lax.rem(blk, jnp.int32(gw))
            s_row = pl.multiple_of(srow_ref[bi, bj], 8)
            s_col = pl.multiple_of(scol_ref[bi, bj], 128)
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(s_row, src_h), pl.ds(s_col, SRC_W)],
                src2.at[buf], sem.at[buf]).start()
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(0, 8), pl.ds(s_col, SRC_W)],
                er_lo2.at[buf], sem_lo.at[buf]).start()
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(8, 8), pl.ds(s_col, SRC_W)],
                er_hi2.at[buf], sem_hi.at[buf]).start()

        @pl.when(lin == 0)
        def _():
            start_dma(cur, lin)

        @pl.when(lin + 1 < gh * gw)
        def _():
            start_dma(nxt, lin + 1)

        s_row = pl.multiple_of(srow_ref[rb, cb], 8)
        s_col = pl.multiple_of(scol_ref[rb, cb], 128)
        src = src2.at[cur]

        u = u_ref[:]
        v = v_ref[:]
        lj = lax.broadcasted_iota(jnp.int32, (bh, BW), 0)
        jj = (rb * bh + lj).astype(jnp.float32)
        ii = (cb * BW + lax.broadcasted_iota(jnp.int32, (bh, BW), 1)
              ).astype(jnp.float32)
        px = ii + u
        py = jj + v
        bx_ref[:] = (px < 0.0) | (px >= w)
        by_ref[:] = (py < 0.0) | (py >= h)
        px = jnp.where(px < 0.0, 0.0, jnp.where(px >= w, float(w - 1), px))
        py = jnp.where(py < 0.0, 0.0, jnp.where(py >= h, float(h - 1), py))
        iv1 = jnp.minimum(px.astype(jnp.int32), w - 2)
        jv1 = jnp.minimum(py.astype(jnp.int32), h - 2)
        p1 = (iv1 + 1).astype(jnp.float32) - px
        p2 = px - iv1.astype(jnp.float32)
        p3 = (jv1 + 1).astype(jnp.float32) - py
        p4 = py - jv1.astype(jnp.float32)
        ci = jnp.clip(iv1 + CPAD - s_col, 0, SRC_W - 2)
        d2 = jnp.clip(jv1 + bh - s_row - lj, 0, 2 * dv)

        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(s_row, src_h), pl.ds(s_col, SRC_W)],
            src2.at[cur], sem.at[cur]).wait()
        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(0, 8), pl.ds(s_col, SRC_W)],
            er_lo2.at[cur], sem_lo.at[cur]).wait()
        pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(8, 8), pl.ds(s_col, SRC_W)],
            er_hi2.at[cur], sem_hi.at[cur]).wait()

        cip = ci + 1
        if no_gather:
            cst = jnp.zeros((bh, BW), jnp.int32)
            idx0 = (cst, cst, cst, ci < 128, ci < 256)
            idx1 = (cst, cst, cst, cip < 128, cip < 256)
        else:
            idx0 = (jnp.clip(ci, 0, 127), jnp.clip(ci - 128, 0, 127),
                    jnp.clip(ci - 256, 0, 127), ci < 128, ci < 256)
            idx1 = (jnp.clip(cip, 0, 127), jnp.clip(cip - 128, 0, 127),
                    jnp.clip(cip - 256, 0, 127), cip < 128, cip < 256)

        def lane_gather(rows, idx):
            a, b_, c_, s0, s1 = idx
            return jnp.where(
                s0, jnp.take_along_axis(rows[:, :128], a, axis=1),
                jnp.take_along_axis(rows[:, 128:256], b_, axis=1))

        zero = jnp.zeros((bh, BW), jnp.float32)
        d_lo = dlo_ref[rb, cb]
        d_hi = dhi_ref[rb, cb]

        def row_body(q, r, acc):
            d = q * 8 + r
            m_top = d2 == d
            m_bot = d2 == d - 1
            out = []
            for c in range(k):
                f_top, f_bot = acc[2 * c], acc[2 * c + 1]
                blk = src[c, pl.ds(pl.multiple_of(q * 8, 8), bh + 8),
                          pl.ds(0, 256)]
                if aligned_slice:
                    rows = lax.slice_in_dim(blk, 0, bh, axis=0)
                else:
                    rows = lax.slice_in_dim(blk, r, r + bh, axis=0)
                g1 = lane_gather(rows, idx0)
                g2 = lane_gather(rows, idx1)
                cb_ = p1 * g1 + p2 * g2
                if no_acc:
                    out.append(f_top + cb_)
                    out.append(f_bot + cb_)
                else:
                    out.append(jnp.where(m_top, cb_, f_top))
                    out.append(jnp.where(m_bot, cb_, f_bot))
            return out

        def chunk(q, acc):
            for r in range(8):
                d = q * 8 + r
                if no_cond:
                    acc = row_body(q, r, acc)
                else:
                    acc = lax.cond(
                        (d >= d_lo) & (d <= d_hi + 1),
                        lambda a, r=r: row_body(q, r, a),
                        lambda a: a,
                        acc)
            return acc

        acc = [zero] * (2 * k)
        q_lo = d_lo // 8
        q_hi = (d_hi + 1) // 8 + 1
        acc = lax.fori_loop(q_lo, q_hi, chunk, acc)
        for c in range(k):
            o_ref[c] = p3 * acc[2 * c] + p4 * acc[2 * c + 1]

    call = pl.pallas_call(
        kern,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(gh, gw),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((bh, BW), lambda r, c, *_: (r, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, BW), lambda r, c, *_: (r, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((k, bh, BW), lambda r, c, *_: (0, r, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, BW), lambda r, c, *_: (r, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, BW), lambda r, c, *_: (r, c),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, k, src_h, SRC_W), jnp.float32),
                pltpu.VMEM((2, k, 8, SRC_W), jnp.float32),
                pltpu.VMEM((2, k, 8, SRC_W), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.bool_),
            jax.ShapeDtypeStruct((hp, wp), jnp.bool_),
        ),
    )

    pad_rows = (bh, rows_p - h - bh)
    pad_cols = (CPAD, cols_p - w - CPAD)

    @jax.jit
    def run(fields, u, v):
        fields = fields[:k]
        p = jnp.pad(fields, ((0, 0), pad_rows, pad_cols))
        row0 = jnp.repeat(p[:, bh:bh + 1], 8, axis=1)
        rowh = jnp.repeat(p[:, bh + h - 1:bh + h], 8, axis=1)
        padded = p.at[:, 0:8].set(row0).at[:, 8:16].set(rowh)
        jv1, iv1, up, vp = wm._sample_indices(u, v, h, w, hp, wp)
        r_min, r_max, c_min, c_max, eflag = wm._block_stats(
            jv1, iv1, vp, h, w, hp, wp, bh)
        s_row = jnp.clip(r_min // 8 * 8, 0, rows_p - src_h).astype(jnp.int32)
        d_lo = jnp.clip(r_min - s_row, 0, 2 * dv).astype(jnp.int32)
        d_hi = jnp.clip(r_max - s_row, 0, 2 * dv).astype(jnp.int32)
        s_col = jnp.clip(c_min // 128 * 128,
                         0, cols_p - SRC_W).astype(jnp.int32)
        return call(s_row, s_col, d_lo, d_hi, eflag, padded, up, vp)

    return run


def main():
    h = w = 5424
    fields, u, v = bench_flow(h, w)

    prod = wm.make_pallas_warp((h, w))
    t = timed(jax.jit(prod), fields, u, v)
    print(f"production kernel:        {t * 1e3:8.2f} ms")

    for name, kw in [
        ("baseline copy (2-third)", {}),
        ("no_cond (all 42 slices)", dict(no_cond=True)),
        ("no_gather (const idx)", dict(no_gather=True)),
        ("no_acc (no m_top/bot sel)", dict(no_acc=True)),
        ("aligned_slice (r=0)", dict(aligned_slice=True)),
        ("k=1 (single field)", dict(k_one=True)),
    ]:
        try:
            t = timed(make_variant((h, w), **kw), fields, u, v)
            print(f"{name:26s}{t * 1e3:8.2f} ms")
        except Exception as e:                           # noqa: BLE001
            print(f"{name:26s}FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
