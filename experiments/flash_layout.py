"""Layout-shave A/B (VERDICT r3 #4): flash attention reading (B, S, H*D) directly.

The production path folds (B, S, H, D) -> transpose -> (B*H, S, D) around every
attention call; those transposes are part of the r2 "data formatting" bucket
(~34 ms/generation). Alternative: keep the projection output layout and let the
kernel's BlockSpec index the head axis — block (1, block_q, d) over the (B, Sq,
H*D) array with index map (ibh, iq) -> (ibh // h, iq, ibh % h). The head slice is
a non-128-aligned window in the minor dim (offsets h*40), which Mosaic may or may
not DMA efficiently — hence measure, not assume.

Runs both variants 30x inside one jit; compares xprof device time (contention-
immune) of the attention custom-call + surrounding formatting ops, and checks
numerics vs the XLA path.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/minsdtf-jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl

from minsdtf_tpu import profiling
from minsdtf_tpu.ops import flash_attention as fa

B, S, H, D = 2, 4096, 8, 40
N_ITERS = 30
SCALE = float(D) ** -0.5


def direct_flash(q, k, v):
    """(B, S, H*D) in/out — head-indexed BlockSpec, no transposes."""
    b, sq, hd = q.shape
    sk = k.shape[1]
    block_q = fa._onepass_block_q(sq, sk)
    out = pl.pallas_call(
        functools.partial(fa._onepass_kernel, scale=SCALE, d=D),
        grid=(b * H, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda ibh, iq: (ibh // H, iq, ibh % H)),
            pl.BlockSpec((1, sk, D), lambda ibh, iq: (ibh // H, 0, ibh % H)),
            pl.BlockSpec((1, sk, D), lambda ibh, iq: (ibh // H, 0, ibh % H)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda ibh, iq: (ibh // H, iq, ibh % H)),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
    )(q, k, v)
    return out


def folded_flash(q, k, v):
    """Production path: reshape+transpose fold, kernel, unfold."""
    b, sq, hd = q.shape
    qh = q.reshape(b, sq, H, D)
    kh = k.reshape(b, sq, H, D)
    vh = v.reshape(b, sq, H, D)
    return fa.flash_attention(qh, kh, vh, scale=SCALE).reshape(b, sq, hd)


def loop(fn):
    @jax.jit
    def run(q, k, v):
        def body(q, _):
            o = fn(q, k, v)
            # keep the loop carried through q so iterations serialize
            return (o * 0.999).astype(q.dtype), None
        q, _ = jax.lax.scan(body, q, None, length=N_ITERS)
        return q[0, 0]
    return run


def main():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.normal(0, 1, (B, S, H * D)), jnp.bfloat16)
    k = jnp.asarray(rs.normal(0, 1, (B, S, H * D)), jnp.bfloat16)
    v = jnp.asarray(rs.normal(0, 1, (B, S, H * D)), jnp.bfloat16)

    # numeric check first (one call, fp32 vs xla)
    qf = q.astype(jnp.float32)[:, :512]
    kf, vf = k.astype(jnp.float32), v.astype(jnp.float32)
    try:
        got = direct_flash(qf, kf, vf)
    except Exception as e:
        print(f"direct variant FAILED to compile/run: {type(e).__name__}: {e}")
        return
    from minsdtf_tpu.ops.attention import _xla_attention

    want = _xla_attention(
        qf.reshape(B, 512, H, D), kf.reshape(B, S, H, D), vf.reshape(B, S, H, D),
        scale=SCALE, causal=False,
    ).reshape(B, 512, H * D)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"direct numerics: max abs err {err:.2e} (ref max {float(jnp.max(jnp.abs(want))):.2f})",
          flush=True)

    for tag, fn in (("folded", folded_flash), ("direct", direct_flash)):
        run = loop(fn)
        out = run(q, k, v)
        jax.block_until_ready(out)
        float(out)  # staging
        trace_dir = f"/tmp/flash-layout-{tag}"
        with profiling.trace(trace_dir):
            float(run(q, k, v))
        print(f"==== {tag} ====", flush=True)
        profiling.op_report(trace_dir, top=8, by="category")


if __name__ == "__main__":
    main()
