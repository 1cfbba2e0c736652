"""Pallas TPU flash attention: blockwise online-softmax, scores never leave VMEM.

Why: the UNet's self-attention at 512x512 runs over S=4096 tokens; the reference
materializes (B, 8, 4096, 4096) score tensors through HBM
(``diffusion_model.py:123-126``). This kernel streams K/V blocks through VMEM with
running (m, l, acc) statistics — O(S) HBM traffic instead of O(S²) — and scales to
the 2048px image sizes the reference GUI exposes (65k tokens) where the einsum path
simply OOMs.

Shape coverage (SD1.5): head_dim ∈ {40, 80, 160} (Mosaic pads the lane dim
internally), q_len ∈ {64..65536}, kv_len either equal to q_len (self-attn) or the
77·m text context (cross-attn, single K block). The CLIP causal path stays on XLA
(77 tokens — nothing to win). Softmax statistics are fp32 regardless of input dtype.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Scores-block VMEM budget. Bigger blocks = fewer grid steps (per-step overhead is
# what dominates at head_dim 40); 6 MB of fp32 scores + K/V blocks + accumulators
# stays within the ~16 MB VMEM.
SCORES_BUDGET_BYTES = 6 * 1024 * 1024
MAX_BLOCK_K = 2048
MAX_BLOCK_Q = 2048


def _pick_blocks(q_len: int, kv_len: int, head_dim: int = 128, itemsize: int = 2):
    """(block_q, block_k) maximizing work per grid step under the VMEM budget.

    head_dim matters: Mosaic double-buffers the K/V input blocks, whose VMEM cost is
    ``2 (K,V) * 2 (buffers) * block_k * pad128(d) * itemsize`` — at d=512 (the VAE's
    single-head spatial attention, 2048px images) that alone is 8 MB at block_k 2048,
    so the scores budget must shrink accordingly or the kernel overflows the 16 MB
    scoped VMEM (hit at 65536 tokens in r2). ``itemsize`` is the input dtype's
    (fp32 parity/dossier runs double the K/V and p-copy footprints — VMEM OOM at
    the bf16-tuned blocks, hit by the r4 quality dossier's fp32 512px leg)."""
    # Mosaic pads the lane axis to a multiple of 128 — round UP (128 < d <= 256
    # occupies 256 lanes, not d).
    dpad = -(-head_dim // 128) * 128
    budget = SCORES_BUDGET_BYTES if itemsize <= 2 else SCORES_BUDGET_BYTES // 2
    block_k = kv_len
    if block_k > MAX_BLOCK_K:
        block_k = MAX_BLOCK_K
        while kv_len % block_k != 0 and block_k > 128:
            block_k //= 2
    # keep K/V double-buffers within half the budget; shrink block_k if oversized
    while block_k > 128 and 2 * 2 * block_k * dpad * itemsize > budget:
        block_k //= 2
    kv_bytes = 2 * 2 * block_k * dpad * itemsize
    budget_q = max(0, budget - kv_bytes) // (4 * block_k)
    pow2 = 128
    while pow2 * 2 <= min(budget_q, MAX_BLOCK_Q):
        pow2 *= 2
    block_q = min(q_len, pow2)
    while q_len % block_q != 0 and block_q > 64:
        block_q //= 2
    # The Q/O blocks are ALSO double-buffered at (block_q, dpad) — negligible at
    # the d<=80 UNet shapes, but at the VAE's d=512 in fp32 they are 4 MB each
    # and the scores-only budget overflows scoped VMEM (21.5 MB at block_q 2048,
    # hit by the r5 dossier's fp32 batch-8 leg). Shrink block_q until the whole
    # working set — scores + K/V + Q/O double-buffers + fp32 accumulator row —
    # fits the budget.
    def total_bytes(bq):
        qo_bytes = 2 * 2 * bq * dpad * itemsize
        acc_bytes = bq * dpad * 4 + 2 * bq * 128  # o accumulator + m/l rows
        return 4 * bq * block_k + kv_bytes + qo_bytes + acc_bytes

    while block_q > 64 and total_bytes(block_q) > 2 * budget:
        block_q //= 2
    return block_q, block_k


def supports(q_len: int, kv_len: int, head_dim: int, causal: bool = False,
             itemsize: int = 2) -> bool:
    if causal:
        return False
    # Short-KV (cross-attention vs the 77-308 token text context) is measured faster
    # on the XLA einsum path (the score matrix is small; kernel overhead dominates).
    if kv_len < 512:
        return False
    if _use_onepass(q_len, kv_len, head_dim, itemsize):
        return True
    block_q, block_k = _pick_blocks(q_len, kv_len, head_dim, itemsize)
    return q_len % block_q == 0 and (kv_len == block_k or kv_len % block_k == 0)


LOG2E = 1.4426950408889634
# One-pass path: whole KV row resident in VMEM, plain (non-online) softmax. For the
# SD1.5 self-attention sizes (kv <= 4096, d <= 160) this removes the online-softmax
# correction math (exp(m_prev-m_new), accumulator rescales, scratch round-trips) —
# measured faster than the online kernel at every production shape. Larger kv or
# head_dim (VAE spatial attention d=512, >=1024px images) falls back to the online
# kernel, whose VMEM use is O(block_k).
ONEPASS_MAX_KV = 4096
ONEPASS_MAX_D = 160
# 8 MB of fp32 scores (vs 6 MB for the online kernel): block_q 512 at kv 4096 —
# halves the grid steps; measured −4% attention device time (xprof A/B r2). The
# production onepass shapes (kv<=4096, d<=80) leave ample VMEM for K/V under this.
ONEPASS_SCORES_BYTES = 8 * 1024 * 1024


def _use_onepass(q_len: int, kv_len: int, head_dim: int, itemsize: int = 2) -> bool:
    if os.environ.get("MINSDTF_FLASH_ONEPASS", "1") != "1":
        return False
    if kv_len > ONEPASS_MAX_KV or head_dim > ONEPASS_MAX_D:
        return False
    # fp32 inputs at large KV go to the online kernel: the one-pass working set
    # (whole K/V rows + fp32 scores + fp32 p copy) overflowed scoped VMEM in the
    # r5 dossier's fp32 batch-8 leg even at the halved block budget, and fp32
    # runs are parity/dossier legs where the one-pass speed win is irrelevant.
    if itemsize > 2 and kv_len > 2048:
        return False
    return _onepass_block_q(q_len, kv_len, itemsize) is not None


def _onepass_block_q(q_len: int, kv_len: int, itemsize: int = 2):
    """Largest power-of-two q block whose fp32 scores fit the VMEM budget and that
    divides q_len; None if no valid block exists. fp32 inputs (itemsize 4) halve
    the budget: the exp2 output p stays fp32 instead of casting down to bf16, and
    the K/V row buffers double — measured 21.2 MB scoped VMEM (>16 limit) at the
    bf16-tuned block_q 512, kv 4096 (r4 dossier fp32 leg)."""
    scores_bytes = ONEPASS_SCORES_BYTES if itemsize <= 2 else ONEPASS_SCORES_BYTES // 2
    budget = scores_bytes // (4 * kv_len)
    block = 64
    while block * 2 <= min(budget, MAX_BLOCK_Q, q_len):
        block *= 2
    while q_len % block != 0 and block > 64:
        block //= 2
    if block > budget or q_len % block != 0:
        return None
    return block


# int8-QK attention (SageAttention-style per-token Q/K quantization, in-kernel and
# hoisted variants, plus a full-int8 QK+PV experiment) was built and MEASURED OUT in
# r3: on-chip A/B at the production shape (B2 S4096 H8 D40) showed all variants
# LOSE to the bf16 one-pass kernel (0.73 ms/call bf16 vs 0.91-1.03 int8, RTT-
# corrected), and the long-context online path (S=16384) measured an exact 1.000x
# tie — Mosaic does not convert the K=40 contraction's half-filled lanes into fewer
# int8 cycles, while the quant/dequant VPU work is real. Deleted per delete-or-win;
# numbers recorded in ROADMAP.md r3.


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, d: int):
    """Single-KV-block attention: scores for the whole row in VMEM, one softmax.

    exp2 with the log2e factor folded into the q scaling (one multiply on the tiny
    (block_q, d) tile instead of the (block_q, kv) score matrix); the softmax
    denominator comes out of the MXU via a ones-column appended to V, so the VPU
    does only max / sub / exp2. (bf16 exp was tried and is device-time-neutral —
    the kernel is MXU-bound by the d=40 contraction, xprof A/B r2.)"""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    prec = jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32 else None
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )  # (block_q, kv) — log2-domain scores
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    ones = jnp.ones((v.shape[0], 1), dtype=v.dtype)
    vl = jnp.concatenate([v, ones], axis=1)  # (kv, d+1): PV and the row sum fused
    pvl = jax.lax.dot_general(
        p.astype(v.dtype), vl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    o_ref[0] = (pvl[:, :d] / pvl[:, d:]).astype(o_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float, kv_blocks: int):
    """Grid (BH, q_blocks, kv_blocks); kv is the minor (sequential) axis, so the
    scratch accumulators carry the online-softmax state across kv steps."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]

    # fp32 inputs (parity tests) get exact fp32 MXU passes; bf16 production uses the
    # fast default with fp32 accumulation.
    prec = jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32 else None
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=prec
    ) * scale  # (block_q, block_k)

    m_prev = m_scr[:]                   # (block_q, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)              # (block_q, block_k) fp32
    correction = jnp.exp(m_prev - m_new)
    l_new = correction * l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    acc_scr[:] = acc_scr[:] * correction + pv
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(ik == kv_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,  # (B, Sq, H, D)
    k: jax.Array,  # (B, Sk, H, D)
    v: jax.Array,
    scale: float,
    causal: bool = False,
    interpret: bool = False,
) -> jax.Array:
    assert not causal, "causal path uses XLA (see ops.attention)"
    b, sq, h, d = q.shape
    sk = k.shape[1]

    # (B, S, H, D) -> (B*H, S, D): each batch-head row is an independent instance.
    def fold(x, s):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, x.shape[-1])

    qf, kf, vf = fold(q, sq), fold(k, sk), fold(v, sk)
    itemsize = q.dtype.itemsize

    if _use_onepass(sq, sk, d, itemsize):
        block_q = _onepass_block_q(sq, sk, itemsize)
        out = pl.pallas_call(
            functools.partial(_onepass_kernel, scale=scale, d=d),
            grid=(b * h, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda ibh, iq: (ibh, iq, 0)),
                pl.BlockSpec((1, sk, d), lambda ibh, iq: (ibh, 0, 0)),
                pl.BlockSpec((1, sk, d), lambda ibh, iq: (ibh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda ibh, iq: (ibh, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            interpret=interpret,
        )(qf, kf, vf)
        return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)

    block_q, block_k = _pick_blocks(sq, sk, d, itemsize)
    assert sq % block_q == 0 and (sk == block_k or sk % block_k == 0)
    kv_blocks = pl.cdiv(sk, block_k)

    grid = (b * h, sq // block_q, kv_blocks)
    scratch = [
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_blocks=kv_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qf, kf, vf)

    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
