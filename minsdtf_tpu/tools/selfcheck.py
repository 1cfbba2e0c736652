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
    todo = [t for t in (shapes or PRODUCTION_SHAPES) if fa.supports(t[1], t[1], t[3])]
    if verbose:
        for t in (shapes or PRODUCTION_SHAPES):
            if t not in todo:
                print(f"selfcheck: skip (B{t[0]} S{t[1]} H{t[2]} D{t[3]}) — xla path")
    if not todo:
        return []

    # ONE program for every shape: both paths for all shapes jit together, so a
    # full selfcheck costs one compile + one dispatch instead of two programs per
    # shape (6 server-side compiles through the tunnel dominated the r5 bench's
    # fixed startup — ~280 s; the single fused program also amortizes executable
    # staging). Only per-shape (max_abs_diff, max_abs_ref, per-element-ok) scalars
    # come back.
    def run_all():
        stats = []
        for (b, s, h, d) in todo:
            key = jax.random.PRNGKey(s + d)
            kq, kk, kv = jax.random.split(key, 3)
            q = jax.random.normal(kq, (b, s, h, d), dtype)
            k = jax.random.normal(kk, (b, s, h, d), dtype)
            v = jax.random.normal(kv, (b, s, h, d), dtype)
            scale = float(d) ** -0.5
            p32 = fa.flash_attention(q, k, v, scale=scale).astype(jnp.float32)
            x32 = attn._xla_attention(q, k, v, scale=scale, causal=False).astype(jnp.float32)
            diff = jnp.abs(p32 - x32)
            # same criterion as np.allclose: |a-b| <= atol + rtol*|b| everywhere
            ok = jnp.all(diff <= atol + rtol * jnp.abs(x32))
            stats.append((jnp.max(diff), jnp.max(jnp.abs(x32)), ok))
        return stats

    stats = [[np.asarray(v) for v in row] for row in jax.jit(run_all)()]
    results = []
    for (b, s, h, d), (max_err, ref_max, ok) in zip(todo, stats):
        max_err, ok = float(max_err), bool(ok)
        results.append(((b, s, h, d), max_err))
        if verbose:
            print(f"selfcheck: flash B{b} S{s} H{h} D{d}: max abs err {max_err:.3e} "
                  f"(ref max {float(ref_max):.2f}) {'OK' if ok else 'MISMATCH'}")
        if not ok:
            raise AssertionError(
                f"compiled Pallas flash attention disagrees with XLA at shape "
                f"(B{b} S{s} H{h} D{d}): max abs err {max_err:.3e}"
            )
    return results


def check_flash_attention_cached(verbose=True):
    """Run :func:`check_flash_attention` once per (kernel source, jax version,
    device kind) and record the verdict in a marker file; later processes skip
    the re-run. The parity of a COMPILED kernel can only change when one of
    those inputs changes — re-verifying per process cost the bench ~500 s of
    server-side Mosaic+XLA compile through the tunnel (r5 measured) for a
    deterministic answer. MINSDTF_SELFCHECK=always forces a fresh run."""
    import hashlib
    import os

    import jax

    from minsdtf_tpu.ops import attention as attn
    from minsdtf_tpu.ops import flash_attention as fa

    h = hashlib.sha256()
    for mod in (fa, attn):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    h.update(jax.__version__.encode())
    h.update(jax.devices()[0].device_kind.encode())
    marker = os.path.join(
        os.path.expanduser("~/.cache/minsdtf-jax"),
        f"selfcheck-{h.hexdigest()[:16]}.ok")
    if os.environ.get("MINSDTF_SELFCHECK") != "always" and os.path.exists(marker):
        if verbose:
            print(f"selfcheck: verified earlier on this device/kernel version "
                  f"({os.path.basename(marker)}) — skipping re-run")
        return None
    results = check_flash_attention(verbose=verbose)
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        f.write("".join(f"{shape} {err:.3e}\n" for shape, err in results))
    return results


def main():
    import jax

    print(f"selfcheck on {jax.devices()[0].device_kind} ({jax.devices()[0].platform})")
    check_flash_attention()
    print("selfcheck OK: compiled kernels agree with XLA")


if __name__ == "__main__":
    main()
