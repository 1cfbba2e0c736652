"""Diffusion noise schedule: tables, timestep selection, and the sampling update.

Two consumers:

1. :class:`Scheduler` — a host-side, numpy, API-compatible equivalent of the reference
   scheduler (reference: ``stable_diffusion/scheduler.py:22-318``), supporting both the
   DDIM-like deterministic path (``active_tcd=False``) and TCD "strategic stochastic
   sampling" (``active_tcd=True``).

2. :class:`DenoiseSchedule` — the TPU-native form: every per-step scalar coefficient the
   sampling update needs is precomputed on host into stacked arrays of shape
   ``(num_steps, 1, 1, 1, 1)`` that a single ``lax.scan`` consumes row by row on device.
   This is what lets the whole denoise loop compile into one jit with zero host round
   trips (the reference instead calls host-side ``scheduler.step`` between every UNet
   dispatch, ``stable_diffusion/stable_diffusion.py:468``).

Schedule math (reference ``scheduler.py:52-56``): "scaled-linear" betas,
``alphas_cumprod = cumprod(1 - linspace(sqrt(b0), sqrt(b1), T)**2)``;
``signal_rates = sqrt(acp)``, ``noise_rates = sqrt(1 - acp)``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


def make_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> np.ndarray:
    """Scaled-linear cumulative alpha table (float64 on host for accuracy)."""
    betas = np.square(
        np.linspace(np.sqrt(beta_start), np.sqrt(beta_end), num_train_timesteps)
    )
    return np.cumprod(1.0 - betas, axis=0)


def ddim_timesteps(num_inference_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """Descending DDIM-like schedule (reference ``scheduler.py:238-242``).

    ``linspace(0, T, n, endpoint=False)`` truncated to int32, then reversed.
    """
    ts = np.linspace(0, num_train_timesteps, num_inference_steps, dtype=np.int32, endpoint=False)
    return ts[::-1].copy()


def tcd_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    original_inference_steps: int = 50,
    strength: float = 1.0,
    arbitrary_grid: bool = False,
) -> np.ndarray:
    """Descending TCD schedule (reference ``scheduler.py:147-237``).

    Default origin grid: ``(1..floor(orig*strength)) * k - 1`` with ``k = T // orig``.
    ``arbitrary_grid`` reproduces the reference's explicitly-passed
    ``original_inference_steps`` branch (:152-154): origin = ``0..T*strength`` (any
    timestep allowed). The final schedule is a floor-linspace subsample of the
    reversed origin grid.
    """
    if arbitrary_grid:
        origin = np.asarray(range(0, int(num_train_timesteps * strength)))
    else:
        k = num_train_timesteps // original_inference_steps
        origin = np.asarray(range(1, int(original_inference_steps * strength) + 1)) * k - 1
    if len(origin) // num_inference_steps < 1:
        raise ValueError(
            f"original_steps*strength ({original_inference_steps}x{strength}) is smaller "
            f"than num_inference_steps ({num_inference_steps})."
        )
    if num_inference_steps > original_inference_steps:
        raise ValueError(
            f"num_inference_steps ({num_inference_steps}) cannot exceed "
            f"original_inference_steps ({original_inference_steps})."
        )
    origin = origin[::-1].copy()
    idx = np.floor(np.linspace(0, len(origin), num=num_inference_steps, endpoint=False)).astype(np.int32)
    return origin[idx].astype(np.int32)


def karras_timesteps(num_inference_steps: int, alphas_cumprod: np.ndarray,
                     rho: float = 7.0) -> np.ndarray:
    """Karras et al. sigma spacing (arXiv:2206.00364 eq. 5) mapped onto the
    discrete training grid: sigmas interpolate sigma_max -> sigma_min in
    sigma^(1/rho) space, then each is snapped to the nearest training timestep of
    the VP sigma table sigma(t) = sqrt((1-acp)/acp). This is the community
    "DPM++ 2M Karras" spacing — denser steps at low noise where the ODE curvature
    concentrates, markedly better few-step quality than uniform-t."""
    sigmas_all = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
    sig_min, sig_max = float(sigmas_all[0]), float(sigmas_all[-1])
    ramp = np.linspace(0, 1, num_inference_steps)
    s = (sig_max ** (1 / rho) + ramp * (sig_min ** (1 / rho) - sig_max ** (1 / rho))) ** rho
    # snap each target sigma to the nearest training timestep (table is monotone
    # increasing in t); enforce strict descent for tiny step counts
    idx = np.searchsorted(sigmas_all, s).clip(1, len(sigmas_all) - 1)
    left = np.abs(sigmas_all[idx - 1] - s) <= np.abs(sigmas_all[idx] - s)
    ts = np.where(left, idx - 1, idx).astype(np.int64)
    for i in range(1, len(ts)):  # dedupe collisions from snapping
        if ts[i] >= ts[i - 1]:
            ts[i] = ts[i - 1] - 1
    if ts[-1] < 0:
        raise ValueError(f"karras grid collapsed at {num_inference_steps} steps")
    return ts.astype(np.int32)


class Scheduler:
    """Host-side scheduler with the reference's public surface.

    Constructor args, attributes (``alphas_cumprod``, ``signal_rates``, ``noise_rates``,
    ``timesteps``, ``init_noise_sigma``) and methods (``set_timesteps``, ``step``) match
    the reference scheduler (``stable_diffusion/scheduler.py:46-315``) so existing user
    code drops in. ``step`` is only used on the slow/compatible path; the jitted sampler
    uses :class:`DenoiseSchedule` instead.
    """

    order = 1

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        original_inference_steps: int = 50,
        active_tcd: bool = True,
    ):
        self.active_tcd = active_tcd
        self.num_train_timesteps = num_train_timesteps
        self.original_inference_steps = original_inference_steps
        self.alphas_cumprod = make_alphas_cumprod(num_train_timesteps, beta_start, beta_end)
        self.signal_rates = np.sqrt(self.alphas_cumprod)
        self.noise_rates = np.sqrt(1.0 - self.alphas_cumprod)
        self.final_alpha_cumprod = 1.0
        self.init_noise_sigma = 1.0
        self.num_inference_steps: Optional[int] = None
        self.timesteps = np.arange(0, num_train_timesteps)[::-1].copy().astype(np.int32)
        self.custom_timesteps = False
        self._step_index: Optional[int] = None
        self._begin_index: Optional[int] = None

    # -- step-index bookkeeping (reference scheduler.py:69-106) --------------------

    @property
    def step_index(self):
        return self._step_index

    @property
    def begin_index(self):
        return self._begin_index

    def set_begin_index(self, begin_index: int = 0):
        self._begin_index = begin_index

    def index_for_timestep(self, timestep, schedule_timesteps=None) -> int:
        if schedule_timesteps is None:
            schedule_timesteps = self.timesteps
        matches = np.nonzero(schedule_timesteps == timestep)[0]
        return int(matches[0])

    def _init_step_index(self, timestep):
        if self._begin_index is None:
            self._step_index = self.index_for_timestep(timestep)
        else:
            self._step_index = self._begin_index

    # -- timestep selection ---------------------------------------------------------

    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        original_inference_steps: Optional[int] = None,
        timesteps: Optional[List[int]] = None,
        strength: float = 1.0,
    ):
        if (num_inference_steps is None) == (timesteps is None):
            raise ValueError("Pass exactly one of `num_inference_steps` or `timesteps`.")

        if not self.active_tcd:
            self.num_inference_steps = num_inference_steps
            self.timesteps = ddim_timesteps(num_inference_steps, self.num_train_timesteps)
            self._step_index = None
            self._begin_index = None
            return

        if timesteps is not None:
            # Custom descending schedule with strength truncation
            # (reference scheduler.py:157-204, incl. its validation warnings).
            orig = (original_inference_steps
                    if original_inference_steps is not None else self.original_inference_steps)
            k = self.num_train_timesteps // orig
            train_grid = {i * k - 1 for i in range(1, int(orig * strength) + 1)}
            for i in range(1, len(timesteps)):
                if timesteps[i] >= timesteps[i - 1]:
                    raise ValueError("custom `timesteps` must be in descending order.")
            if timesteps[0] >= self.num_train_timesteps:
                raise ValueError("`timesteps` must start before num_train_timesteps.")
            if strength == 1.0 and timesteps[0] != self.num_train_timesteps - 1:
                print(
                    f"The first custom timestep is {timesteps[0]}, not "
                    f"num_train_timesteps-1 ({self.num_train_timesteps - 1}); results "
                    f"may be unexpected."
                )
            off_grid = [t for t in timesteps[1:] if t not in train_grid]
            if off_grid:
                print(
                    f"Custom timesteps not on the training/distillation schedule: "
                    f"{off_grid}; results may be unexpected."
                )
            if len(timesteps) > orig:
                print(
                    f"Custom schedule length {len(timesteps)} exceeds the "
                    f"distillation schedule length {orig}; results may be unexpected."
                )
            ts = np.array(timesteps, dtype=np.int32)
            self.num_inference_steps = len(ts)
            self.custom_timesteps = True
            init_timestep = min(int(self.num_inference_steps * strength), self.num_inference_steps)
            t_start = max(self.num_inference_steps - init_timestep, 0)
            self.timesteps = ts[t_start * self.order:]
        else:
            if num_inference_steps > self.num_train_timesteps:
                raise ValueError(
                    f"num_inference_steps ({num_inference_steps}) > num_train_timesteps"
                    f" ({self.num_train_timesteps})."
                )
            orig = (
                original_inference_steps
                if original_inference_steps is not None
                else self.original_inference_steps
            )
            self.num_inference_steps = num_inference_steps
            self.timesteps = tcd_timesteps(
                num_inference_steps, self.num_train_timesteps, orig, strength,
                # Explicitly-passed original_inference_steps selects the reference's
                # arbitrary-timestep origin grid (scheduler.py:152-154).
                arbitrary_grid=original_inference_steps is not None,
            )
        self._step_index = None
        self._begin_index = None

    # -- the sampling update (host path; reference scheduler.py:246-315) -------------

    def step(self, latent: np.ndarray, timestep: int, latent_prev: np.ndarray, eta: float = 0.3):
        if self.num_inference_steps is None:
            raise ValueError("Call `set_timesteps` before `step`.")
        if self.step_index is None:
            self._init_step_index(timestep)
        assert 0 <= eta <= 1.0, "eta (gamma) must be in [0, 1]"

        i = self.step_index
        is_last = i == self.num_inference_steps - 1
        if i + 1 < len(self.timesteps):
            prev_t = int(self.timesteps[i + 1])
        else:
            prev_t = 0 if self.active_tcd else int(timestep)

        sr_t = self.signal_rates[timestep]
        nr_t = self.noise_rates[timestep]
        pred_x0 = (latent_prev - nr_t * latent) / sr_t

        if self.active_tcd:
            t_s = int(np.floor((1.0 - eta) * prev_t))
            a_s = self.alphas_cumprod[t_s]
            denoised = np.sqrt(a_s) * pred_x0 + np.sqrt(1.0 - a_s) * latent
            if eta > 0.0 and not is_last:
                a_prev = self.alphas_cumprod[prev_t]
                noise = np.random.randn(*latent.shape).astype(np.float32)
                out = np.sqrt(a_prev / a_s) * denoised + np.sqrt(1.0 - a_prev / a_s) * noise
            else:
                out = denoised
        else:
            if is_last:
                out = pred_x0
            else:
                out = self.signal_rates[prev_t] * pred_x0 + self.noise_rates[prev_t] * latent

        self._step_index += 1
        return out

    def __len__(self):
        return self.num_train_timesteps


class LCMScheduler(Scheduler):
    """Latent Consistency Model sampler (reference README TODO "Sampler",
    README.md:150) — the few-step predecessor of TCD.

    Same distillation timestep grid as TCD (``tcd_timesteps``), but the update uses
    the consistency-model boundary conditions: with ``st = t * timestep_scaling``,

        c_skip = sigma_data^2 / (st^2 + sigma_data^2)
        c_out  = st / sqrt(st^2 + sigma_data^2)
        denoised = c_out * pred_x0 + c_skip * latent_prev
        x' = last ? denoised : sr_prev * denoised + nr_prev * z   (fresh z per step)

    (LCM paper arXiv:2310.04378; the standard diffusers-style discrete boundary
    scaling with sigma_data=0.5, timestep_scaling=10.)
    """

    def __init__(self, *args, sigma_data: float = 0.5, timestep_scaling: float = 10.0,
                 **kwargs):
        kwargs["active_tcd"] = True  # reuse the TCD timestep-grid machinery
        super().__init__(*args, **kwargs)
        self.mode = "lcm"
        self.sigma_data = float(sigma_data)
        self.timestep_scaling = float(timestep_scaling)

    def boundary_scalings(self, timestep):
        st = np.asarray(timestep, np.float64) * self.timestep_scaling
        c_skip = self.sigma_data**2 / (st**2 + self.sigma_data**2)
        c_out = st / np.sqrt(st**2 + self.sigma_data**2)
        return c_skip, c_out

    def step(self, latent: np.ndarray, timestep: int, latent_prev: np.ndarray,
             eta: float = 0.3):
        """``eta`` is accepted for interface parity and ignored (LCM always
        re-noises fully between steps)."""
        if self.num_inference_steps is None:
            raise ValueError("Call `set_timesteps` before `step`.")
        if self.step_index is None:
            self._init_step_index(timestep)
        i = self.step_index
        is_last = i == self.num_inference_steps - 1
        prev_t = int(self.timesteps[i + 1]) if i + 1 < len(self.timesteps) else 0

        sr_t = self.signal_rates[timestep]
        nr_t = self.noise_rates[timestep]
        pred_x0 = (latent_prev - nr_t * latent) / sr_t
        c_skip, c_out = self.boundary_scalings(timestep)
        denoised = c_out * pred_x0 + c_skip * latent_prev
        if is_last:
            out = denoised
        else:
            noise = np.random.randn(*latent.shape).astype(np.float32)
            out = self.signal_rates[prev_t] * denoised + self.noise_rates[prev_t] * noise
        self._step_index += 1
        return out


class DPMSolverScheduler(Scheduler):
    """DPM-Solver++(2M) multistep sampler (beyond reference; arXiv:2211.01095,
    data-prediction form) over the DDIM timestep grid — the de-facto fast
    high-quality sampler in SD practice (~12-15 steps matching DDIM-25).

    Per step i (descending t -> prev), with half-log-SNR
    ``lambda(t) = ln(signal_rate/noise_rate)`` and ``h = lambda_prev - lambda_t``:

        x0     = (x - nr_t * eps) / sr_t                      (data prediction)
        D      = (1 + w) * x0 - w * x0_prev,  w = h / (2 * h_prev)   (2M combine)
        x_prev = (nr_prev / nr_t) * x + sr_prev * (1 - exp(-h)) * D

    The first step has no ``x0_prev`` (w = 0: first-order, which reduces exactly
    to the DDIM update — verified algebraically in tests). The final step targets
    the clean boundary ``alpha_cumprod = 1`` (noise rate 0), where the update
    degenerates to ``x = x0``; it also runs first-order (diffusers'
    ``lower_order_final`` behavior — the 2M correction is ill-defined at h=inf).
    """

    def __init__(self, *args, karras_sigmas: bool = False, **kwargs):
        kwargs["active_tcd"] = False
        super().__init__(*args, **kwargs)
        self.mode = "dpm"
        self.karras_sigmas = bool(karras_sigmas)
        self._prev_x0 = None
        self._prev_h = None

    def set_timesteps(self, num_inference_steps=None, **kwargs):
        super().set_timesteps(num_inference_steps, **kwargs)
        if self.karras_sigmas and num_inference_steps is not None:
            self.timesteps = karras_timesteps(
                num_inference_steps, self.alphas_cumprod)

    def _lambda(self, t: int) -> float:
        return float(np.log(self.signal_rates[t] / self.noise_rates[t]))

    def step(self, latent: np.ndarray, timestep: int, latent_prev: np.ndarray,
             eta: float = 0.3):
        """``eta`` accepted for interface parity and ignored (deterministic)."""
        if self.num_inference_steps is None:
            raise ValueError("Call `set_timesteps` before `step`.")
        if self.step_index is None:
            self._init_step_index(timestep)
            self._prev_x0 = None
            self._prev_h = None
        i = self.step_index
        is_last = i == self.num_inference_steps - 1

        sr_t = self.signal_rates[timestep]
        nr_t = self.noise_rates[timestep]
        x0 = (latent_prev - nr_t * latent) / sr_t
        if is_last:
            out = x0
            h = None
        else:
            prev_t = int(self.timesteps[i + 1])
            h = self._lambda(prev_t) - self._lambda(timestep)
            if self._prev_x0 is None:
                d = x0
            else:
                w = h / (2.0 * self._prev_h)
                d = (1.0 + w) * x0 - w * self._prev_x0
            # NB reference step() convention: ``latent`` is the MODEL OUTPUT (eps),
            # ``latent_prev`` is the current latent x (see Scheduler.step).
            out = (self.noise_rates[prev_t] / nr_t) * latent_prev \
                + self.signal_rates[prev_t] * (1.0 - np.exp(-h)) * d
        self._prev_x0 = x0
        self._prev_h = h
        self._step_index += 1
        return out


class EulerAncestralScheduler(Scheduler):
    """Euler-Ancestral sampler (beyond reference) — the community "Euler a".

    k-diffusion's ancestral Euler step (Karras et al. arXiv:2206.00364 Alg. 2 +
    the ancestral noise split popularized by k-diffusion/A1111), mapped onto this
    pipeline's VP (signal/noise-rate) latent convention. With
    ``sigma(t) = noise_rate/signal_rate`` and the k-space latent ``x_k = x / sr``:

        sigma_up^2 = sig_prev^2 * (sig_t^2 - sig_prev^2) / sig_t^2
        sigma_down = sqrt(sig_prev^2 - sigma_up^2)
        x_k'       = x_k + (sigma_down - sig_t) * eps + sigma_up * z

    which in VP coordinates is the row form the scan consumes:

        x' = c_x * x + c_d * eps + c_noise * z,
        c_x = sr_prev / sr_t,  c_d = sr_prev * (sigma_down - sig_t),
        c_noise = sr_prev * sigma_up

    (exact-denoiser check: (c_x * nr_t + c_d)^2 + c_noise^2 == nr_prev^2 — the
    marginal noise variance is preserved; pinned in tests). The final step
    returns pred_x0.

    NOTE plain (non-ancestral) "euler" needs no implementation: on the VP
    eps-prediction parametrization Euler's update algebraically EQUALS the DDIM
    update (coefficient of eps: sr_prev*(sig_prev - sig_t) == nr_prev -
    sr_prev*nr_t/sr_t), so ``scheduler_type="euler"`` aliases the DDIM scheduler.
    """

    def __init__(self, *args, **kwargs):
        kwargs["active_tcd"] = False
        super().__init__(*args, **kwargs)
        self.mode = "euler_a"

    def _sigma(self, t: int) -> float:
        return float(self.noise_rates[t] / self.signal_rates[t])

    def step(self, latent: np.ndarray, timestep: int, latent_prev: np.ndarray,
             eta: float = 0.3, noise: Optional[np.ndarray] = None):
        """Reference step convention: ``latent`` is the MODEL OUTPUT (eps),
        ``latent_prev`` the current latent x. ``eta`` accepted for interface
        parity and ignored (the ancestral split fixes the noise level).
        ``noise`` overrides the drawn z (tests)."""
        if self.num_inference_steps is None:
            raise ValueError("Call `set_timesteps` before `step`.")
        if self.step_index is None:
            self._init_step_index(timestep)
        i = self.step_index
        is_last = i == self.num_inference_steps - 1

        sr_t = self.signal_rates[timestep]
        nr_t = self.noise_rates[timestep]
        x0 = (latent_prev - nr_t * latent) / sr_t
        if is_last:
            out = x0
        else:
            prev_t = int(self.timesteps[i + 1])
            sig_t, sig_p = self._sigma(timestep), self._sigma(prev_t)
            sig_up2 = sig_p**2 * (sig_t**2 - sig_p**2) / sig_t**2
            sig_up = np.sqrt(max(0.0, sig_up2))
            sig_down = np.sqrt(max(0.0, sig_p**2 - sig_up2))
            sr_prev = self.signal_rates[prev_t]
            z = (noise if noise is not None
                 else np.random.randn(*latent.shape).astype(np.float32))
            out = ((sr_prev / sr_t) * latent_prev
                   + sr_prev * (sig_down - sig_t) * latent
                   + sr_prev * sig_up * z)
        self._step_index += 1
        return out


@dataclasses.dataclass(frozen=True)
class DenoiseSchedule:
    """Per-step coefficients, stacked for consumption by the jitted ``lax.scan``.

    All arrays have leading dim ``num_steps`` (the number of iterations actually run —
    already truncated for img2img strength) and are float32 (timesteps int32). Broadcast
    dims are added by the sampler.

    The update computed on-device from row ``i``, given model output ``eps`` and current
    latent ``x`` (matches :meth:`Scheduler.step`):

        x0 = (x - nr_t * eps) / sr_t
        DDIM-like:  x' = last ? x0 : sr_prev * x0 + nr_prev * eps
        TCD:        d  = sr_s * x0 + nr_s * eps
                    x' = (last or eta==0) ? d : c_denoised * d + c_noise * z
        LCM:        d  = c_out * x0 + c_skip * x
                    x' = last ? d : sr_prev * d + nr_prev * z
        DPM++(2M):  d  = (1 + w) * x0 - w * x0_prev      (x0_prev in the scan carry)
                    x' = c_x * x + c_d * d
    """

    timesteps: np.ndarray        # (n,) int32, descending — the t fed to the UNet
    sr_t: np.ndarray             # signal_rates[t]
    nr_t: np.ndarray             # noise_rates[t]
    sr_prev: np.ndarray          # signal_rates[prev_t]   (DDIM branch)
    nr_prev: np.ndarray          # noise_rates[prev_t]
    sr_s: np.ndarray             # signal_rates[t_s]      (TCD branch)
    nr_s: np.ndarray             # noise_rates[t_s]
    c_denoised: np.ndarray       # sqrt(a_prev / a_s)     (TCD re-noise mix)
    c_noise: np.ndarray          # sqrt(1 - a_prev / a_s)
    is_last: np.ndarray          # (n,) float32 {0,1}
    active_tcd: bool
    eta: float
    # LCM consistency boundary scalings (zeros unless mode == "lcm")
    c_skip: np.ndarray = None    # sigma_d^2 / (st^2 + sigma_d^2)
    c_out: np.ndarray = None     # st / sqrt(st^2 + sigma_d^2)
    # DPM-Solver++(2M) coefficients (zeros unless mode == "dpm"):
    #   x' = c_x * x + c_d * ((1 + w) * x0 - w * x0_prev)
    c_x: np.ndarray = None       # nr_prev / nr_t   (0 on the final clean step)
    c_d: np.ndarray = None       # sr_prev * (1 - exp(-h))   (1 on the final step)
    w: np.ndarray = None         # h / (2 h_prev); 0 on first + final steps
    mode: str = ""               # "" -> derived from active_tcd; "lcm"/"dpm"
    # img2img: the timestep at which the init latent is noised. The reference uses
    # ascending[k] — one step ABOVE the first iterated step (stable_diffusion.py:414:
    # `init_time = timesteps[num_steps]` after ascending reversal) — NOT the first
    # iterated timestep itself.
    init_timestep: int = 0

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def build_denoise_schedule(
    scheduler: Scheduler,
    num_steps: int,
    strength: Optional[float] = None,
    eta: float = 0.3,
    timesteps: Optional[Sequence[int]] = None,
) -> DenoiseSchedule:
    """Precompute the :class:`DenoiseSchedule` for a generation run.

    Mirrors the reference pipeline's host loop setup: ``set_timesteps(num_steps)`` then,
    for img2img, truncation to the first ``int(num_steps*strength + 0.5)`` ascending
    entries (reference ``stable_diffusion.py:399-416``) — i.e. the run covers descending
    indices ``[n-k, n)`` of the full schedule.
    """
    scheduler.set_timesteps(num_inference_steps=None if timesteps is not None else num_steps,
                            timesteps=list(timesteps) if timesteps is not None else None)
    full = scheduler.timesteps.astype(np.int64)  # descending
    n = len(full)
    if strength is not None and 0.0 < strength < 1.0:
        k = int(num_steps * strength + 0.5)
        start = max(0, n - k)
    else:
        start = 0
    # Reference semantics: init noising at descending[start-1] (== ascending[k]); the
    # reference indexes out of bounds when k == n, so clamp to the top of the schedule.
    init_timestep = int(full[start - 1]) if start > 0 else int(full[0])

    mode = getattr(scheduler, "mode", "")
    acp = scheduler.alphas_cumprod
    rows_t, rows = [], {k: [] for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s", "c_denoised", "c_noise",
        "c_skip", "c_out", "c_x", "c_d", "w", "is_last")}
    prev_h = None
    for i in range(start, n):
        t = int(full[i])
        is_last = i == n - 1
        prev_t = int(full[i + 1]) if i + 1 < n else (0 if scheduler.active_tcd else t)
        a_t = acp[t]
        a_prev = acp[prev_t]
        t_s = int(np.floor((1.0 - eta) * prev_t))
        a_s = acp[t_s]
        rows_t.append(t)
        rows["sr_t"].append(np.sqrt(a_t))
        rows["nr_t"].append(np.sqrt(1.0 - a_t))
        rows["sr_prev"].append(np.sqrt(a_prev))
        rows["nr_prev"].append(np.sqrt(1.0 - a_prev))
        rows["sr_s"].append(np.sqrt(a_s))
        rows["nr_s"].append(np.sqrt(1.0 - a_s))
        rows["c_denoised"].append(np.sqrt(a_prev / a_s))
        if mode == "euler_a" and not is_last:
            # ancestral split (EulerAncestralScheduler): c_noise carries
            # sr_prev * sigma_up; c_x/c_d below carry the deterministic part
            sig_t = float(np.sqrt((1.0 - a_t) / a_t))
            sig_p = float(np.sqrt((1.0 - a_prev) / a_prev))
            sig_up2 = sig_p**2 * (sig_t**2 - sig_p**2) / sig_t**2
            rows["c_noise"].append(float(np.sqrt(a_prev) * np.sqrt(max(0.0, sig_up2))))
        else:
            rows["c_noise"].append(np.sqrt(max(0.0, 1.0 - a_prev / a_s)))
        if mode == "lcm":
            c_skip, c_out = scheduler.boundary_scalings(t)
            rows["c_skip"].append(float(c_skip))
            rows["c_out"].append(float(c_out))
        else:
            rows["c_skip"].append(0.0)
            rows["c_out"].append(0.0)
        if mode == "dpm":
            if is_last:
                # final boundary a = 1 exactly (noise rate 0): x' = x0; h = inf
                # makes the 2M correction ill-defined, so first-order (w = 0 —
                # diffusers' lower_order_final)
                rows["c_x"].append(0.0)
                rows["c_d"].append(1.0)
                rows["w"].append(0.0)
                prev_h = None
            else:
                lam_t = np.log(np.sqrt(a_t) / np.sqrt(1.0 - a_t))
                lam_p = np.log(np.sqrt(a_prev) / np.sqrt(1.0 - a_prev))
                h = float(lam_p - lam_t)
                rows["c_x"].append(float(np.sqrt(1.0 - a_prev) / np.sqrt(1.0 - a_t)))
                rows["c_d"].append(float(np.sqrt(a_prev) * (1.0 - np.exp(-h))))
                rows["w"].append(0.0 if prev_h is None else h / (2.0 * prev_h))
                prev_h = h
        elif mode == "euler_a":
            if is_last:
                rows["c_x"].append(0.0)   # is_last selects x0 in the scan body
                rows["c_d"].append(0.0)
            else:
                sig_t = float(np.sqrt((1.0 - a_t) / a_t))
                sig_p = float(np.sqrt((1.0 - a_prev) / a_prev))
                sig_up2 = sig_p**2 * (sig_t**2 - sig_p**2) / sig_t**2
                sig_down = float(np.sqrt(max(0.0, sig_p**2 - sig_up2)))
                rows["c_x"].append(float(np.sqrt(a_prev / a_t)))
                rows["c_d"].append(float(np.sqrt(a_prev) * (sig_down - sig_t)))
            rows["w"].append(0.0)
        else:
            rows["c_x"].append(0.0)
            rows["c_d"].append(0.0)
            rows["w"].append(0.0)
        rows["is_last"].append(1.0 if is_last else 0.0)

    return DenoiseSchedule(
        timesteps=np.asarray(rows_t, dtype=np.int32),
        active_tcd=scheduler.active_tcd,
        eta=eta,
        mode=mode,
        init_timestep=init_timestep,
        **{k: np.asarray(v, dtype=np.float32) for k, v in rows.items()},
    )


def timestep_embedding(timesteps, dim: int = 320, max_period: float = 10000.0) -> np.ndarray:
    """Sinusoidal timestep embedding, ``concat([cos, sin])`` ordering — host numpy.

    Matches reference ``stable_diffusion.py:543-553`` bitwise. The denoise schedule's
    timesteps are static per run, so the sampler precomputes all step embeddings here
    on host and feeds them as scan inputs (no transcendentals traced on device, and no
    cos-ulp divergence vs the oracle). ``timesteps`` is a scalar or (n,) array.
    """
    half = dim // 2
    freqs = np.exp(-np.log(max_period) * np.arange(half, dtype=np.float32) / half)
    args = np.asarray(timesteps, dtype=np.float32)[..., None] * freqs
    return np.concatenate([np.cos(args), np.sin(args)], axis=-1).astype(np.float32)


def timestep_embedding_traced(timesteps, dim: int = 320, max_period: float = 10000.0):
    """Traced (jnp) variant of :func:`timestep_embedding` for data-dependent timesteps
    (training draws t at random per example). Same formula; float32."""
    import jax.numpy as jnp

    half = dim // 2
    freqs = jnp.asarray(
        np.exp(-np.log(max_period) * np.arange(half, dtype=np.float32) / half)
    )
    args = jnp.asarray(timesteps, dtype=jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
