"""int8-QK flash attention A/B on the real chip.

r2 established the d=40 structural MXU cap for bf16 attention (~59 TF/s effective:
QK^T fills 40/128 contraction lanes, PV outputs 41/128 columns). The int8 MXU path
packs two values per lane per cycle, so an int8 QK^T halves the contraction cycles
at the same lane fill — the only lever that moves a K=40 contraction without
changing the model. This measures the compiled one-pass kernel bf16 vs int8-QK at
the production shape (B2 S4096 H8 D40), looping INSIDE one jit per the ROADMAP
tunnel-measurement discipline, plus a compiled-accuracy check vs fp32 XLA.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LOOPS = int(os.environ.get("LOOPS", 40))


def main():
    import jax
    import jax.numpy as jnp

    from minsdtf_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(0)
    if os.environ.get("ONLINE") == "1":
        # long-context online-kernel shape (1024px self-attention); forces the
        # online kernel (kv > ONEPASS_MAX_KV) where int8-QK is always hoisted
        b, s, h, d = 1, 16384, 8, 40
        os.environ["MINSDTF_FLASH_ONEPASS"] = "0"
    else:
        b, s, h, d = 2, 4096, 8, 40
    scale = 1.0 / np.sqrt(d)
    q = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.bfloat16)

    # fp32 oracle at a reduced shape (S=1024, 2 heads) — the 4096-token oracle
    # einsum compiles for many minutes; accuracy doesn't depend on S here.
    sa, ha = 1024, 2
    qa, ka, va = q[:1, :sa, :ha], k[:1, :sa, :ha], v[:1, :sa, :ha]

    def oracle(q, k, v):
        qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
        sarr = jnp.einsum("bqhd,bkhd->bhqk", qf, kf,
                          precision=jax.lax.Precision.HIGHEST) * scale
        p = jax.nn.softmax(sarr, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vf,
                          precision=jax.lax.Precision.HIGHEST)

    ref = np.asarray(jax.jit(oracle)(qa, ka, va))

    flops_per_call = 2 * 2 * b * h * s * s * d  # QK + PV
    results = {}
    if os.environ.get("ONLINE") == "1":
        variants = [("bf16", "0"), ("int8qk_hoisted", "2")]  # online path: hoisted only
    else:
        variants = [("bf16", "0"), ("int8qk", "1"), ("int8qk_hoisted", "2"),
                    ("int8pv", "3")]
        if os.environ.get("BLOCKQ_SWEEP") == "1":
            variants += [("int8qk_bq256", "1:256"), ("int8qk_bq128", "1:128")]
    for name, knob in variants:
        if ":" in knob:
            knob, bq = knob.split(":")
            os.environ["MINSDTF_INT8QK_BLOCKQ"] = bq
        else:
            os.environ.pop("MINSDTF_INT8QK_BLOCKQ", None)
        os.environ["MINSDTF_FLASH_INT8QK"] = knob

        def run(q, k, v, x0):
            # x0 varies per execution (server dedupes identical (program, args));
            # the loop carry keeps iterations data-dependent inside one dispatch.
            def body(x, _):
                o = fa.flash_attention(q + x, k, v, scale)
                return x + o[0, 0, 0, 0] * 0, o[0, 0, 0, :1]
            _, outs = jax.lax.scan(body, x0, length=LOOPS)
            return outs

        f = jax.jit(run)
        zero = jnp.zeros((), jnp.bfloat16)
        try:
            f(q, k, v, zero)  # compile
        except Exception as e:  # e.g. Mosaic scoped-VMEM overflow — keep sweeping
            print(f"{name}: COMPILE FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            continue
        np.asarray(f(q, k, v, zero * 0 + 1e-12))  # staging rep, distinct args
        t0 = time.perf_counter()
        out = np.asarray(f(q, k, v, zero * 0 + 2e-12))
        dt = time.perf_counter() - t0
        per_call = dt / LOOPS
        tf = flops_per_call / per_call / 1e12
        err = np.abs(np.asarray(fa.flash_attention(qa, ka, va, scale), np.float32) - ref)
        results[name] = per_call
        print(f"{name}: {per_call*1e3:.3f} ms/call  {tf:.1f} TF/s-effective  "
              f"max abs err vs fp32 oracle {err.max():.5f} mean {err.mean():.6f}",
              flush=True)
    for name, t in results.items():
        if name != "bf16" and "bf16" in results:
            print(f"speedup {name} vs bf16: {results['bf16']/t:.3f}x")


if __name__ == "__main__":
    main()
