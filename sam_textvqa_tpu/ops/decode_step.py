"""Per-STEP fused decode megakernel (Pallas, TPU).

ONE pallas call per decode step runs ALL MMT layers: grid = (layers,
batch_tiles, head_pairs), with the evolving decoder-row activations held
in VMEM scratch across grid steps (TPU grids execute sequentially) and
each layer's weights + cached encoder K/V streamed through
double-buffered blocks. This is the fix for the per-LAYER kernel's
failure mode (ops/decode_attention.py, SCALING.md): there, every pallas
call stalled on its ~33 MB encoder-K/V DMA because XLA schedules custom
calls conservatively; here the DMA for the next (layer, head-pair) block
overlaps the current one's compute inside one kernel.

Grid layout: the minor ``j`` dimension walks the D // 128 lane blocks
(pairs of hd=64 heads). j == 0 computes the full QKV projection into
scratch; every j does its head-pair's attention into a ctx scratch
column; j == last runs the output projection + FFN + layernorms and
advances the layer's activations. Keeping the per-program body small is
what makes the Mosaic compile tractable — a 6x-unrolled in-kernel head
loop (previous revision) compiled for 20+ minutes before being killed.

The step index ``t`` is a scalar-prefetch argument, so all 12 decode
steps share ONE compiled kernel (the decoder K/V row write and the
causal bias compare against t at runtime).

Math identical to models/fast_decode._decode_one_row (same scores
scaling, 0/-10000 biases, f32 softmax over [encoder; decoder] keys,
dtype-cast probabilities, f32 layernorms, erf GeLU — via XLA's own
ErfImpl32 polynomial, since Mosaic lacks an erf primitive) — verified in
tests/test_decode_step.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_BIAS = -10000.0
LANE = 128


def _erf(x):
    """XLA's f32 erf (ErfImpl32: clamp to [-4, 4], rational polynomial in
    x^2) — Mosaic has no erf primitive; reimplementing XLA's own
    approximation keeps the GeLU numerics aligned with the XLA paths."""
    dtype = x.dtype
    xf = jnp.clip(x.astype(jnp.float32), -4.0, 4.0)
    x2 = xf * xf
    alpha = (-2.72614225801306e-10, 2.77068142495902e-08,
             -2.10102402082508e-06, -5.69250639462346e-05,
             -7.34990630326855e-04, -2.95459980854025e-03,
             -1.60960333262415e-02)
    beta = (-1.45660718464996e-05, -2.13374055278905e-04,
            -1.68282697438203e-03, -7.37332916720468e-03,
            -1.42647390514189e-02)
    num = jnp.asarray(alpha[0], jnp.float32)
    for c in alpha[1:]:
        num = num * x2 + c
    num = num * xf
    den = jnp.asarray(beta[0], jnp.float32)
    for c in beta[1:]:
        den = den * x2 + c
    return (num / den).astype(dtype)


def _layernorm_f32(w, b, x, eps=1e-12):
    xf = x.astype(jnp.float32)
    u = xf.mean(-1, keepdims=True)
    s = jnp.square(xf - u).mean(-1, keepdims=True)
    y = w * ((xf - u) / jnp.sqrt(s + eps)) + b
    return y.astype(x.dtype)


def _kernel(t_ref, lens_ref, x0_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
            ln1w_ref, ln1b_ref, wff1_ref, bff1_ref, wff2_ref, bff2_ref,
            ln2w_ref, ln2b_ref, ke_ref, ve_ref, kdin_ref, vdin_ref,
            xout_ref, kdout_ref, vdout_ref, x_scr, qkv_scr, ctx_scr, *,
            hd, q_len, n_obj, scale, num_j):
    l = pl.program_id(0)
    jb = pl.program_id(1)
    j = pl.program_id(2)
    t = t_ref[0]
    b2, d = x0_ref.shape
    le = ke_ref.shape[1]
    t_max = kdin_ref.shape[1]
    dtype = x0_ref.dtype

    def dot(a, w):
        # bf16 matmul with f32 accumulation, rounded back — the XLA
        # jnp.matmul behavior on TPU
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    @pl.when((l == 0) & (j == 0))
    def _():
        x_scr[jb] = x0_ref[:]

    # full QKV projection once per (l, jb), into scratch
    @pl.when(j == 0)
    def _():
        qkv_scr[jb] = dot(x_scr[jb], wqkv_ref[:]) + bqkv_ref[0].astype(dtype)

    q_j = qkv_scr[jb, :, pl.ds(j * LANE, LANE)]
    k_row_j = qkv_scr[jb, :, pl.ds(d + j * LANE, LANE)]
    v_row_j = qkv_scr[jb, :, pl.ds(2 * d + j * LANE, LANE)]

    # decoder K/V buffers (this head-pair's lane block): carry history
    # forward, write row t via a masked select (Mosaic cannot prove
    # alignment of a dynamic sublane store at an arbitrary t)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1) == t
    kd = jnp.where(row_t, k_row_j[:, None, :], kdin_ref[:])
    vd = jnp.where(row_t, v_row_j[:, None, :], vdin_ref[:])
    kdout_ref[:] = kd
    vdout_ref[:] = vd

    # additive biases (reference 0/-10000 convention)
    rws = jax.lax.broadcasted_iota(jnp.int32, (1, le, 1), 1)
    qv = lens_ref[:, 0:1][:, :, None].astype(jnp.int32)
    ov = lens_ref[:, 1:2][:, :, None].astype(jnp.int32)
    cv = lens_ref[:, 2:3][:, :, None].astype(jnp.int32)
    valid = (
        (rws < qv)
        | ((rws >= q_len) & (rws < q_len + ov))
        | ((rws >= q_len + n_obj) & (rws < q_len + n_obj + cv))
    )
    bias_enc = jnp.where(valid, 0.0, MASK_BIAS)      # (B2, Le, 1)
    steps = jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1)
    bias_dec = jnp.where(steps <= t, 0.0, MASK_BIAS)  # (1, T, 1)

    hpb = LANE // hd
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (LANE, hpb), 0) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (LANE, hpb), 1)
    ).astype(dtype)
    sel_t = (
        jax.lax.broadcasted_iota(jnp.int32, (hpb, LANE), 1) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (hpb, LANE), 0)
    ).astype(dtype)

    def scores(kv):
        kq = kv * q_j[:, None, :]
        s = jax.lax.dot_general(
            kq, sel, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s.astype(dtype) * jnp.asarray(scale, dtype)

    s_enc = scores(ke_ref[:].astype(dtype)).astype(jnp.float32) + bias_enc
    s_dec = scores(kd.astype(dtype)).astype(jnp.float32) + bias_dec
    m = jnp.maximum(
        jnp.max(s_enc, axis=1, keepdims=True),
        jnp.max(s_dec, axis=1, keepdims=True),
    )
    e_enc = jnp.exp(s_enc - m)
    e_dec = jnp.exp(s_dec - m)
    den = jnp.sum(e_enc, axis=1, keepdims=True) + jnp.sum(
        e_dec, axis=1, keepdims=True
    )
    p_enc = (e_enc / den).astype(dtype)
    p_dec = (e_dec / den).astype(dtype)

    def wsum(p, v):
        p_lanes = jax.lax.dot_general(
            p, sel_t, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        # f32 accumulate like the MXU einsum on the XLA path
        return jnp.sum(
            (p_lanes * v).astype(jnp.float32), axis=1
        ).astype(dtype)

    ctx_j = wsum(p_enc, ve_ref[:].astype(dtype)) + wsum(p_dec, vd)
    ctx_scr[jb, :, pl.ds(j * LANE, LANE)] = ctx_j

    # dense tail once per (l, jb), after the last head-pair
    @pl.when(j == num_j - 1)
    def _():
        x = x_scr[jb]
        ctx = ctx_scr[jb]
        attn = dot(ctx, wout_ref[:]) + bout_ref[0].astype(dtype)
        attn_out = _layernorm_f32(ln1w_ref[0], ln1b_ref[0], attn + x)
        inter = dot(attn_out, wff1_ref[:]) + bff1_ref[0].astype(dtype)
        inter = inter * 0.5 * (
            1.0 + _erf(inter / jnp.sqrt(2.0).astype(dtype))
        )
        out2 = dot(inter, wff2_ref[:]) + bff2_ref[0].astype(dtype)
        x_new = _layernorm_f32(ln2w_ref[0], ln2b_ref[0], out2 + attn_out)
        x_scr[jb] = x_new
        xout_ref[:] = x_new


@functools.partial(
    jax.jit,
    static_argnames=(
        "hd", "q_len", "n_obj", "batch_tiles", "interpret",
    ),
)
def decode_step_fused(
    t_arr, lens, x0,
    wqkv, bqkv, wout, bout, ln1w, ln1b, wff1, bff1, wff2, bff2, ln2w, ln2b,
    k_enc, v_enc, k_dec, v_dec,
    *, hd: int, q_len: int, n_obj: int,
    batch_tiles: int = 2, interpret: bool = False,
):
    """One full decode step (all layers) in one pallas call.

    Args:
      t_arr: (1,) int32 step index (scalar-prefetched — one compile for
        all steps).
      lens: (B, 128) f32 segment lengths (see ops/decode_attention.py).
      x0: (B, D) decoder-row embedding for step t.
      wqkv..ln2b: per-layer weight stacks — wqkv (L, D, 3D), bqkv
        (L, 1, 3D), wout (L, D, D), bout (L, 1, D), wff1 (L, D, F), bff1
        (L, 1, F), wff2 (L, F, D), bff2 (L, 1, D); layernorm params
        (L, 1, D) f32 (unit middle dim for block tiling).
      k_enc / v_enc: (L, B, Le, D) head-flat cached encoder K/V.
      k_dec / v_dec: (L, B, T, D) decoder K/V buffers (rows < t filled).
    Returns:
      (x_out (B, D), k_dec', v_dec') — final-layer activations and the
      buffers including row t.
    """
    num_layers, b, le, d = k_enc.shape
    t_max = k_dec.shape[2]
    f = wff1.shape[2]
    assert b % batch_tiles == 0 and d % LANE == 0
    b2 = b // batch_tiles
    num_j = d // LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_layers, batch_tiles, num_j),
        in_specs=[
            pl.BlockSpec((b2, LANE), lambda l, jb, j, t: (jb, 0)),    # lens
            pl.BlockSpec((b2, d), lambda l, jb, j, t: (jb, 0)),       # x0
            pl.BlockSpec((None, d, 3 * d), lambda l, jb, j, t: (l, 0, 0)),
            pl.BlockSpec((None, 1, 3 * d), lambda l, jb, j, t: (l, 0, 0)),
            pl.BlockSpec((None, d, d), lambda l, jb, j, t: (l, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda l, jb, j, t: (l, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda l, jb, j, t: (l, 0, 0)),  # ln1w
            pl.BlockSpec((None, 1, d), lambda l, jb, j, t: (l, 0, 0)),  # ln1b
            pl.BlockSpec((None, d, f), lambda l, jb, j, t: (l, 0, 0)),
            pl.BlockSpec((None, 1, f), lambda l, jb, j, t: (l, 0, 0)),
            pl.BlockSpec((None, f, d), lambda l, jb, j, t: (l, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda l, jb, j, t: (l, 0, 0)),
            pl.BlockSpec((None, 1, d), lambda l, jb, j, t: (l, 0, 0)),  # ln2w
            pl.BlockSpec((None, 1, d), lambda l, jb, j, t: (l, 0, 0)),  # ln2b
            pl.BlockSpec((None, b2, le, LANE),
                         lambda l, jb, j, t: (l, jb, 0, j)),          # k_enc
            pl.BlockSpec((None, b2, le, LANE),
                         lambda l, jb, j, t: (l, jb, 0, j)),          # v_enc
            pl.BlockSpec((None, b2, t_max, LANE),
                         lambda l, jb, j, t: (l, jb, 0, j)),          # k_dec
            pl.BlockSpec((None, b2, t_max, LANE),
                         lambda l, jb, j, t: (l, jb, 0, j)),          # v_dec
        ],
        out_specs=[
            pl.BlockSpec((b2, d), lambda l, jb, j, t: (jb, 0)),
            pl.BlockSpec((None, b2, t_max, LANE),
                         lambda l, jb, j, t: (l, jb, 0, j)),
            pl.BlockSpec((None, b2, t_max, LANE),
                         lambda l, jb, j, t: (l, jb, 0, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((batch_tiles, b2, d), x0.dtype),      # x
            pltpu.VMEM((batch_tiles, b2, 3 * d), x0.dtype),  # qkv
            pltpu.VMEM((batch_tiles, b2, d), x0.dtype),      # ctx
        ],
    )
    kernel = functools.partial(
        _kernel,
        hd=hd, q_len=q_len, n_obj=n_obj,
        scale=1.0 / float(np.sqrt(hd)), num_j=num_j,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), x0.dtype),
            jax.ShapeDtypeStruct(k_dec.shape, k_dec.dtype),
            jax.ShapeDtypeStruct(v_dec.shape, v_dec.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(t_arr, lens, x0, wqkv, bqkv, wout, bout, ln1w, ln1b, wff1, bff1,
      wff2, bff2, ln2w, ln2b, k_enc, v_enc, k_dec, v_dec)
