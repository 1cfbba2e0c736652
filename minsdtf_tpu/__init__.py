"""minsdtf_tpu — a TPU-native (JAX/XLA/Pallas) Stable Diffusion 1.5 framework.

Re-designed from scratch for TPU with the capability surface of cpuimage/minSDTF:
txt2img / img2img / inpaint, classifier-free guidance + rescale, clip-skip, textual
inversion, ControlNet (canny), merged LoRA, A1111 long-prompt weighting, and the TCD
few-step scheduler. See DESIGN.md for the architecture.
"""

__version__ = "0.1.0"

from minsdtf_tpu.scheduler import Scheduler  # noqa: F401

__all__ = ["Scheduler", "StableDiffusion"]


def __getattr__(name):
    # Lazy import: keep `import minsdtf_tpu` light (no jit tracing, no model modules)
    # until the pipeline is actually requested.
    if name == "StableDiffusion":
        from minsdtf_tpu.pipeline import StableDiffusion

        return StableDiffusion
    raise AttributeError(f"module 'minsdtf_tpu' has no attribute {name!r}")
