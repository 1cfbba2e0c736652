"""CLI: convert PyTorch/safetensors checkpoints to cached JAX pytrees offline.

    python -m minsdtf_tpu.tools.convert --unet model.safetensors --vae vae.safetensors \
        --text-encoder te.safetensors [--controlnet cn.pth] [--lora lora.safetensors] \
        [--out-dir converted/]

Writes orbax checkpoints (sharded-restorable) plus the msgpack convert-cache next to
each source file, so serving startup never touches torch again.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--unet")
    parser.add_argument("--vae")
    parser.add_argument("--text-encoder", dest="text_encoder")
    parser.add_argument("--controlnet")
    parser.add_argument("--lora")
    parser.add_argument("--out-dir", dest="out_dir", default=None,
                        help="also write orbax checkpoints here")
    args = parser.parse_args(argv)

    from minsdtf_tpu.weights import convert, lora as lora_lib

    te_lora = unet_lora = None
    if args.lora:
        te_lora, unet_lora = lora_lib.load_lora(args.lora)
        print(f"lora: {len(te_lora)} text-encoder + {len(unet_lora)} unet deltas")

    jobs = [
        ("unet", args.unet, unet_lora),
        ("vae", args.vae, None),
        ("text_encoder", args.text_encoder, te_lora),
        ("controlnet", args.controlnet, None),
    ]
    for kind, path, lora in jobs:
        if not path:
            continue
        print(f"converting {kind} from {path}")
        params = convert.convert_cached(kind, path, lora=lora)
        n = sum(leaf.size for leaves in params.values() for leaf in leaves.values())
        print(f"  {kind}: {len(params)} modules, {n/1e6:.1f}M params")
        if args.out_dir:
            from minsdtf_tpu.weights import checkpoint

            out = os.path.join(args.out_dir, kind)
            checkpoint.save_params(params, out)
            print(f"  wrote orbax checkpoint: {out}")


if __name__ == "__main__":
    main()
