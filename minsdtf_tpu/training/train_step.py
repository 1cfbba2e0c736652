"""Diffusion fine-tuning: ε-prediction MSE loss + optax update, mesh-sharded.

The reference is inference-only; this module is the framework-completeness piece that
the pure-functional design gives almost for free: the same :func:`unet.apply` traced
in the sampler is differentiated with ``jax.grad`` here. Sharding is inherited from
the GSPMD param placements (:mod:`minsdtf_tpu.parallel.sharding`): DP gradients are
all-reduced automatically because params are replicated on the data axis; TP matmul
partials follow the Megatron column/row rules.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from minsdtf_tpu import scheduler as sched_lib
from minsdtf_tpu.models import unet as unet_lib


class TrainBatch(NamedTuple):
    latents: jax.Array   # (B, h, w, 4) clean VAE latents (already scaled)
    context: jax.Array   # (B, S, 768) text conditioning
    timesteps: jax.Array  # (B,) int32 in [0, num_train_timesteps)
    noise: jax.Array     # (B, h, w, 4) target ε


def denoising_loss(unet_params, batch: TrainBatch, signal_rates, noise_rates) -> jax.Array:
    """MSE(ε̂, ε) at per-example timesteps (forward process q(x_t|x_0) noising)."""
    sr = signal_rates[batch.timesteps][:, None, None, None].astype(batch.latents.dtype)
    nr = noise_rates[batch.timesteps][:, None, None, None].astype(batch.latents.dtype)
    noised = sr * batch.latents + nr * batch.noise
    # timestep-embedding dim is defined by the UNet's first time-embedding kernel
    # (320 for SD1.5; smaller for test-width models)
    t_dim = unet_params["time_embedding.linear_1"]["kernel"].shape[0]
    t_emb = sched_lib.timestep_embedding_traced(batch.timesteps, dim=t_dim).astype(
        batch.latents.dtype
    )
    eps = unet_lib.apply(unet_params, noised, t_emb, batch.context)
    return jnp.mean(jnp.square(eps.astype(jnp.float32) - batch.noise.astype(jnp.float32)))


def make_train_step(
    optimizer: Optional[optax.GradientTransformation] = None,
    num_train_timesteps: int = 1000,
):
    """-> (init_fn, step_fn). ``step_fn(params, opt_state, batch)`` is jittable and
    mesh-agnostic; shard params/batch before calling (GSPMD does the rest)."""
    optimizer = optimizer or optax.adamw(1e-5)
    sched = sched_lib.Scheduler(active_tcd=False, num_train_timesteps=num_train_timesteps)
    signal_rates = jnp.asarray(sched.signal_rates, jnp.float32)
    noise_rates = jnp.asarray(sched.noise_rates, jnp.float32)

    def init_fn(params):
        return optimizer.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch: TrainBatch) -> Tuple[dict, optax.OptState, jax.Array]:
        loss, grads = jax.value_and_grad(denoising_loss)(
            params, batch, signal_rates, noise_rates
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn


def sample_batch(rng: jax.Array, batch_size: int, latent_hw: int = 8, ctx_len: int = 77,
                 num_train_timesteps: int = 1000, dtype=jnp.float32) -> TrainBatch:
    """Random batch for smoke tests / the multichip dry-run."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return TrainBatch(
        latents=jax.random.normal(k1, (batch_size, latent_hw, latent_hw, 4), dtype),
        context=jax.random.normal(k2, (batch_size, ctx_len, 768), dtype),
        timesteps=jax.random.randint(k3, (batch_size,), 0, num_train_timesteps),
        noise=jax.random.normal(k4, (batch_size, latent_hw, latent_hw, 4), dtype),
    )
