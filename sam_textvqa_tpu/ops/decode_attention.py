"""Fused incremental-decode attention kernel (Pallas, TPU).

One decode step's attention for ONE MMT layer: a single decoder row per
sample attends to the cached encoder K/V (question/obj/OCR, reference
sam/sa_m4c.py:834-845 prefix-LM structure) and to the decoder K/V history
(causal, static step index). Replaces ~15 small XLA ops per layer-step
(head split/merge transposes, two score einsums, bias adds, concat,
softmax chain, two weighted sums) with one kernel — the decode steps are
op-overhead-bound, not FLOP-bound (see SCALING.md round-2 notes).

Layout choices (the whole point of the kernel):
  * K/V ride HEAD-FLAT as (B, L, D=768): the lane dimension is a multiple
    of 128, so blocks slice into per-program (B, L, 128) tiles with zero
    padding waste (the (B, H, L, 64) layout pads head_dim 64 -> 128 lanes,
    doubling the dominant HBM read).
  * grid = (D // 128,): each program handles 128 lanes = TWO hd=64 heads.
    Per-sample scores come from one batched MXU matmul against a
    block-diagonal query matrix built in-kernel:
        Q[b, d, i] = q[b, d] * (d // hd == i)   (B, 128, 2)
        S[b, l, i] = sum_d K[b, l, d] Q[b, d, i]  == per-head scores.
  * the encoder padding bias is rebuilt in-kernel from three per-sample
    segment lengths (question/obj/OCR valid counts — the masks are prefix-
    contiguous by construction in the data pipeline), so no (B, L, 128)
    bias tensor is streamed per layer-step.

Numerics mirror models/fast_decode._decode_one_row exactly: scores scaled
in the compute dtype, 0/-10000 additive bias, f32 softmax over the
concatenated [encoder; decoder] key axis, probabilities cast back to the
compute dtype for the weighted sum.
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


def _kernel(lens_ref, q_ref, ke_ref, ve_ref, kd_ref, vd_ref, out_ref, *,
            hd, t, q_len, n_obj, scale):
    heads_per_blk = LANE // hd
    le = ke_ref.shape[1]
    t_max = kd_ref.shape[1]
    dtype = q_ref.dtype

    # head selector: sel[d, i] = (d // hd == i); scores for both heads of
    # the block come from one shared matmul over the lane dim:
    #   S[b, l, i] = sum_d K[b, l, d] * q[b, d] * sel[d, i]
    # (the q broadcast inserts a MIDDLE dim — a no-op relayout — where a
    # per-sample block-diagonal Q would need a minor-dim insertion that
    # Mosaic only supports for 32-bit types)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (LANE, heads_per_blk), 0) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (LANE, heads_per_blk), 1)
    ).astype(dtype)
    qb = q_ref[:].astype(dtype)  # (B, LANE)

    def scores(k_ref):
        kq = k_ref[:].astype(dtype) * qb[:, None, :]  # (B, L, LANE)
        s = jax.lax.dot_general(
            kq, sel,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, L, heads_per_blk) f32 accumulate
        # mirror the XLA path: bf16 dot results round to bf16, then the
        # scale multiplies in the compute dtype
        return s.astype(dtype) * jnp.asarray(scale, dtype)

    s_enc = scores(ke_ref)  # (B, Le, hpb)
    s_dec = scores(kd_ref)  # (B, T, hpb)

    # encoder padding bias from per-sample segment lengths (prefix masks);
    # iota must be integer-typed in Mosaic
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, le, 1), 1)
    qv = lens_ref[:, 0:1][:, :, None].astype(jnp.int32)   # (B, 1, 1)
    ov = lens_ref[:, 1:2][:, :, None].astype(jnp.int32)
    cv = lens_ref[:, 2:3][:, :, None].astype(jnp.int32)
    valid = (
        (rows < qv)
        | ((rows >= q_len) & (rows < q_len + ov))
        | ((rows >= q_len + n_obj) & (rows < q_len + n_obj + cv))
    )
    bias_enc = jnp.where(valid, 0.0, MASK_BIAS)  # (B, Le, 1)
    # decoder causal bias: positions <= t visible (static step index)
    steps = jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1)
    bias_dec = jnp.where(steps <= t, 0.0, MASK_BIAS)

    # joint softmax over [enc; dec] keys WITHOUT materializing the concat
    # (each (B, L, hpb) intermediate pads hpb -> 128 lanes; concats double
    # the footprint and blow the scoped-VMEM budget)
    s_enc = s_enc.astype(jnp.float32) + bias_enc
    s_dec = s_dec.astype(jnp.float32) + bias_dec
    m = jnp.maximum(
        jnp.max(s_enc, axis=1, keepdims=True),
        jnp.max(s_dec, axis=1, keepdims=True),
    )
    e_enc = jnp.exp(s_enc - m)
    e_dec = jnp.exp(s_dec - m)
    denom = jnp.sum(e_enc, axis=1, keepdims=True) + jnp.sum(
        e_dec, axis=1, keepdims=True
    )
    p_enc = (e_enc / denom).astype(dtype)
    p_dec = (e_dec / denom).astype(dtype)

    # expand per-head probs back to the 128 lanes and weight the values
    sel_t = (
        jax.lax.broadcasted_iota(jnp.int32, (heads_per_blk, LANE), 1) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (heads_per_blk, LANE), 0)
    ).astype(dtype)

    def weighted(p, v_ref):
        p_lanes = jax.lax.dot_general(
            p, sel_t,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,  # Mosaic needs 32-bit acc
        ).astype(dtype)  # (B, L, LANE)
        # f32 accumulate like the MXU einsum on the XLA path (a bf16 sum
        # over ~182 terms can flip near-tie argmaxes)
        return jnp.sum(
            (p_lanes * v_ref[:].astype(dtype)).astype(jnp.float32), axis=1
        ).astype(dtype)

    out = weighted(p_enc, ve_ref) + weighted(p_dec, vd_ref)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("hd", "t", "q_len", "n_obj", "interpret"),
)
def decode_attention(
    q, k_enc, v_enc, k_dec, v_dec, seg_lens,
    *, hd: int, t: int, q_len: int, n_obj: int,
    interpret: bool = False,
):
    """Fused one-row decode attention.

    Args:
      q: (B, D) decoder-row queries, head-flat.
      k_enc / v_enc: (B, Le, D) cached encoder keys/values, head-flat.
      k_dec / v_dec: (B, T, D) decoder K/V buffers (rows 0..t populated).
      seg_lens: (B, 128) f32; lanes 0..2 hold the per-sample valid counts
        of the question / obj / OCR segments (prefix-contiguous masks).
      hd: head dim (128 % hd == 0).
      t: static decode step index (causal visibility = positions <= t).
    Returns:
      (B, D) attention context, head-flat (no merge transpose needed).
    """
    b, d = q.shape
    le = k_enc.shape[1]
    t_max = k_dec.shape[1]
    assert d % LANE == 0 and LANE % hd == 0
    grid = (d // LANE,)

    kernel = functools.partial(
        _kernel,
        hd=hd, t=t, q_len=q_len, n_obj=n_obj,
        scale=1.0 / float(np.sqrt(hd)),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, LANE), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),       # seg_lens
            pl.BlockSpec((b, LANE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),       # q
            pl.BlockSpec((b, le, LANE), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),       # k_enc
            pl.BlockSpec((b, le, LANE), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),       # v_enc
            pl.BlockSpec((b, t_max, LANE), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),       # k_dec
            pl.BlockSpec((b, t_max, LANE), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),       # v_dec
        ],
        out_specs=pl.BlockSpec((b, LANE), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # the (B, L, hpb->128-lane-padded) intermediates exceed the
            # 16 MB default scoped budget at batch >= 64; v5e has 128 MB
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seg_lens, q, k_enc, v_enc, k_dec, v_dec)
