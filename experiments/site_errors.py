"""Print the per-site analytic error distribution of the int8-hybrid config.

Loads the committed calibration fixture, hybridizes the (seeded-random) UNet
params with the current env knobs, and prints every quantized site's estimated
relative output MSE (weights/quantize._equalized_module) sorted descending,
with the activation/weight split and the cumulative share — the data for
choosing MINSDTF_HYBRID_MAX_ERR error budgets in the dossier sweep.

CPU-only (no generation): runs anywhere, ~1 min.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from minsdtf_tpu.models import unet as unet_lib
    from minsdtf_tpu.weights import calibrate, quantize

    scales = calibrate.load_scales(os.environ.get(
        "DOSSIER_SCALES",
        os.path.join(REPO, "fixtures", "hybrid_scales_random512_v2.npz")))
    params = unet_lib.init_params(jax.random.PRNGKey(0))

    alpha = float(os.environ.get("MINSDTF_HYBRID_ALPHA", "0.5"))
    clip = os.environ.get("MINSDTF_HYBRID_CLIP", "none")
    clip = None if clip == "none" else float(clip)
    report = {}
    quantize.hybridize_params(params, scales, equalize_alpha=alpha,
                              clip_sigmas=clip, report=report)
    rows = sorted(report.items(), key=lambda kv: -kv[1]["rel_mse"])
    total = sum(v["rel_mse"] for _, v in rows)
    print(f"{len(rows)} eligible sites, total est rel MSE {total:.3e} "
          f"(alpha={alpha}, clip={clip})")
    cum = 0.0
    for name, v in rows:
        cum += v["rel_mse"]
        print(f"  {v['rel_mse']:.3e} (act {v['act_rel']:.1e} w {v['w_rel']:.1e}) "
              f"cum {100*cum/total:5.1f}%  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
