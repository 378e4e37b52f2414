"""DPM-Solver++ multistep scheduler, re-designed for XLA.

The reference keeps Python-side mutable state (`step_index`, a deque of model
outputs) and computes per-step coefficients on the fly
(reference vibevoice/schedule/dpm_solver.py:122-1022). On TPU we instead
precompute every per-step coefficient on the host into a small table
(`SolverCoeffs`) and run the whole K-step denoise loop as one `lax.scan`, so a
frame's diffusion fuses into a single XLA program with no host round-trips.

Supported (matching the reference's runtime surface):
  * beta schedules: linear, scaled_linear, cosine/squaredcos_cap_v2, exp,
    cauchy, laplace (reference :28-83, :232-247)
  * prediction types: epsilon, sample, v_prediction (reference :570-594)
  * algorithms: dpmsolver++ (ODE) and sde-dpmsolver++ (SDE; the Gradio demo's
    mode, reference demo/gradio_demo.py:142-147), orders 1-2 with midpoint
    second-order updates and the lower-order-final stabilisation (:977-1008)
  * timestep spacings: linspace, leading, trailing (:358-382)
  * training utilities: add_noise, get_velocity (:1024-1062)

All tables are float64 on host, stored float32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Beta schedules
# ---------------------------------------------------------------------------


def _alpha_bar_fn(kind: str) -> Callable[[float], float]:
    if kind == "cosine":
        return lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    if kind == "exp":
        return lambda t: math.exp(t * -12.0)
    if kind == "cauchy":
        # SNR = mu + gamma * tan(pi * (0.5 - t) * 0.9); alpha_bar = 1 - 1/(e^snr + 1.1)
        return lambda t, gamma=1.0, mu=3.0: 1 - 1 / (
            math.exp(mu + gamma * math.tan(math.pi * (0.5 - t) * 0.9)) + 1.1
        )
    if kind == "laplace":
        return lambda t, mu=0.0, b=1.0: 1 - 1 / (
            math.exp(mu - b * math.copysign(1, 0.5 - t) * math.log(1 - 2 * abs(t - 0.5) * 0.98))
            + 1.02
        )
    raise ValueError(f"unknown alpha transform {kind}")


def betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999, kind: str = "cosine") -> np.ndarray:
    fn = _alpha_bar_fn(kind)
    i = np.arange(num_steps, dtype=np.float64)
    t1, t2 = i / num_steps, (i + 1) / num_steps
    return np.minimum(1 - np.array([fn(b) for b in t2]) / np.array([fn(a) for a in t1]), max_beta)


def make_betas(
    num_train_timesteps: int,
    beta_schedule: str,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        )
    if beta_schedule in ("squaredcos_cap_v2", "cosine"):
        return betas_for_alpha_bar(num_train_timesteps, kind="cosine")
    if beta_schedule in ("exp", "cauchy", "laplace"):
        return betas_for_alpha_bar(num_train_timesteps, kind=beta_schedule)
    raise NotImplementedError(beta_schedule)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Zero-terminal-SNR rescale (reference :87-120; arXiv 2305.08891 alg. 1)."""
    alphas_bar_sqrt = np.sqrt(np.cumprod(1.0 - betas))
    a0, aT = alphas_bar_sqrt[0], alphas_bar_sqrt[-1]
    alphas_bar_sqrt = (alphas_bar_sqrt - aT) * (a0 / (a0 - aT))
    alphas_bar = alphas_bar_sqrt**2
    alphas = np.concatenate([alphas_bar[:1], alphas_bar[1:] / alphas_bar[:-1]])
    return 1 - alphas


# ---------------------------------------------------------------------------
# Train-time schedule (add_noise / get_velocity)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NoiseSchedule:
    """Host-precomputed VP schedule tables; alpha_t/sigma_t indexed by train step."""

    num_train_timesteps: int
    alpha_t: jnp.ndarray  # (T,) sqrt(alphas_cumprod)
    sigma_t: jnp.ndarray  # (T,) sqrt(1 - alphas_cumprod)

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_schedule: str = "cosine",
        rescale_betas_zero_snr: bool = False,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
    ) -> "NoiseSchedule":
        betas = make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        ac = np.cumprod(1.0 - betas)
        if rescale_betas_zero_snr:
            ac[-1] = 2**-24
        return cls(
            num_train_timesteps=num_train_timesteps,
            alpha_t=jnp.asarray(np.sqrt(ac), jnp.float32),
            sigma_t=jnp.asarray(np.sqrt(1 - ac), jnp.float32),
        )

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """x_t = alpha_t x0 + sigma_t eps (reference :1024-1044)."""
        shape = (-1,) + (1,) * (x0.ndim - 1)
        a = self.alpha_t[t].reshape(shape).astype(x0.dtype)
        s = self.sigma_t[t].reshape(shape).astype(x0.dtype)
        return a * x0 + s * noise

    def get_velocity(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """v = alpha_t eps - sigma_t x0 (reference :1046-1062)."""
        shape = (-1,) + (1,) * (x0.ndim - 1)
        a = self.alpha_t[t].reshape(shape).astype(x0.dtype)
        s = self.sigma_t[t].reshape(shape).astype(x0.dtype)
        return a * noise - s * x0


# ---------------------------------------------------------------------------
# Inference-time solver coefficient tables
# ---------------------------------------------------------------------------


class SolverCoeffs(NamedTuple):
    """Per-inference-step coefficients such that one solver step is

        x0   = a_conv * x + b_conv * m          (model-output -> x0-space)
        D1   = inv_r0 * (x0 - x0_prev)
        x'   = c_x * x + c_d0 * x0 + c_d1 * D1 + c_noise * z

    covering first/second order, ODE and SDE dpmsolver++ uniformly."""

    timesteps: jnp.ndarray  # (N,) float32, fed to the model
    a_conv: jnp.ndarray
    b_conv: jnp.ndarray
    c_x: jnp.ndarray
    c_d0: jnp.ndarray
    c_d1: jnp.ndarray
    c_noise: jnp.ndarray
    inv_r0: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def _inference_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int,
    timestep_spacing: str,
    last_timestep: Optional[int] = None,
) -> np.ndarray:
    """Discrete model timesteps, descending (reference :349-382)."""
    last = num_train_timesteps if last_timestep is None else last_timestep
    if timestep_spacing == "linspace":
        return (
            np.linspace(0, last - 1, num_inference_steps + 1).round()[::-1][:-1].astype(np.int64)
        )
    if timestep_spacing == "leading":
        step_ratio = last // (num_inference_steps + 1)
        return (np.arange(0, num_inference_steps + 1) * step_ratio).round()[::-1][:-1].astype(
            np.int64
        )
    if timestep_spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        return (np.arange(last, 0, -step_ratio).round() - 1).astype(np.int64)
    raise ValueError(timestep_spacing)


def make_solver(
    num_inference_steps: int,
    *,
    num_train_timesteps: int = 1000,
    beta_schedule: str = "cosine",
    prediction_type: str = "v_prediction",
    algorithm_type: str = "dpmsolver++",
    solver_order: int = 2,
    solver_type: str = "midpoint",
    lower_order_final: bool = True,
    euler_at_final: bool = False,
    final_sigmas_type: str = "zero",
    timestep_spacing: str = "linspace",
    rescale_betas_zero_snr: bool = False,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
) -> SolverCoeffs:
    """Precompute the full solver table on host (float64)."""
    if algorithm_type not in ("dpmsolver++", "sde-dpmsolver++"):
        raise NotImplementedError(algorithm_type)
    if solver_type != "midpoint":
        raise NotImplementedError(solver_type)
    if solver_order not in (1, 2):
        raise NotImplementedError("orders 1-2 only (reference ships order 2)")
    sde = algorithm_type == "sde-dpmsolver++"

    betas = make_betas(num_train_timesteps, beta_schedule, beta_start, beta_end)
    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)
    ac = np.cumprod(1.0 - betas)
    if rescale_betas_zero_snr:
        ac[-1] = 2**-24
    sigmas_full = np.sqrt((1 - ac) / ac)

    timesteps = _inference_timesteps(num_inference_steps, num_train_timesteps, timestep_spacing)
    sigmas = np.interp(timesteps, np.arange(len(sigmas_full)), sigmas_full)
    if final_sigmas_type == "zero":
        sigma_last = 0.0
    elif final_sigmas_type == "sigma_min":
        sigma_last = sigmas_full[0]
    else:
        raise ValueError(final_sigmas_type)
    sigmas = np.concatenate([sigmas, [sigma_last]])

    n = num_inference_steps

    def split(sigma):
        alpha = 1.0 / np.sqrt(sigma**2 + 1)
        return alpha, sigma * alpha

    with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
        a_conv = np.zeros(n)
        b_conv = np.zeros(n)
        c_x = np.zeros(n)
        c_d0 = np.zeros(n)
        c_d1 = np.zeros(n)
        c_noise = np.zeros(n)
        inv_r0 = np.zeros(n)

        lower_order_nums = 0
        for i in range(n):
            alpha_s, sigma_s = split(sigmas[i])
            alpha_t, sigma_t = split(sigmas[i + 1])

            # model output -> x0 space (reference convert_model_output :570-594)
            if prediction_type == "v_prediction":
                a_conv[i], b_conv[i] = alpha_s, -sigma_s
            elif prediction_type == "epsilon":
                a_conv[i], b_conv[i] = 1.0 / alpha_s, -sigma_s / alpha_s
            elif prediction_type == "sample":
                a_conv[i], b_conv[i] = 0.0, 1.0
            else:
                raise ValueError(prediction_type)

            lam_t = np.log(alpha_t) - np.log(sigma_t) if sigma_t > 0 else np.inf
            lam_s = np.log(alpha_s) - np.log(sigma_s)
            h = lam_t - lam_s

            is_last = i == n - 1
            use_first = (
                solver_order == 1
                or lower_order_nums < 1
                or (
                    is_last
                    and (
                        euler_at_final
                        or (lower_order_final and n < 15)
                        or final_sigmas_type == "zero"
                    )
                )
            )
            use_second_forced = (i == n - 2) and lower_order_final and n < 15

            if not use_first and (solver_order == 2 or lower_order_nums < 2 or use_second_forced):
                alpha_s1, sigma_s1 = split(sigmas[i - 1])
                lam_s1 = np.log(alpha_s1) - np.log(sigma_s1)
                h0 = lam_s - lam_s1
                r0 = h0 / h
                inv_r0[i] = 1.0 / r0
            else:
                inv_r0[i] = 0.0

            em_h = np.exp(-h)  # exp(-h); h may be inf on the final zero-sigma step
            if not sde:
                c_x[i] = sigma_t / sigma_s if sigma_s > 0 else 0.0
                c_d0[i] = -(alpha_t * (em_h - 1.0))
                c_d1[i] = 0.0 if inv_r0[i] == 0.0 else -0.5 * (alpha_t * (em_h - 1.0))
                c_noise[i] = 0.0
            else:
                c_x[i] = (sigma_t / sigma_s) * em_h if sigma_s > 0 else 0.0
                c_d0[i] = alpha_t * (1 - em_h**2)
                c_d1[i] = 0.0 if inv_r0[i] == 0.0 else 0.5 * (alpha_t * (1 - em_h**2))
                c_noise[i] = sigma_t * np.sqrt(max(1.0 - em_h**2, 0.0))

            if lower_order_nums < solver_order:
                lower_order_nums += 1

    f32 = lambda x: jnp.asarray(np.nan_to_num(x), jnp.float32)
    return SolverCoeffs(
        timesteps=jnp.asarray(timesteps.astype(np.float32)),
        a_conv=f32(a_conv),
        b_conv=f32(b_conv),
        c_x=f32(c_x),
        c_d0=f32(c_d0),
        c_d1=f32(c_d1),
        c_noise=f32(c_noise),
        inv_r0=f32(inv_r0),
    )


def sample(
    coeffs: SolverCoeffs,
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_init: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Run the full multistep solve as a `lax.scan`.

    denoise_fn(x, t) -> raw model output for a batch x (t is scalar-per-batch
    broadcast by the caller). The solve runs in float32 (reference step()
    upcasts, :993).
    """
    n = coeffs.num_steps
    if key is None:
        keys = jnp.zeros((n, 2), jnp.uint32)
        use_noise = False
    else:
        keys = jax.random.split(key, n)
        use_noise = True

    x_init = x_init.astype(jnp.float32)

    def step(carry, inp):
        x, x0_prev = carry
        c, k = inp
        t = jnp.broadcast_to(c.timesteps, (x.shape[0],))
        m = denoise_fn(x, t).astype(jnp.float32)
        x0 = c.a_conv * x + c.b_conv * m
        d1 = c.inv_r0 * (x0 - x0_prev)
        z = jax.random.normal(k, x.shape, jnp.float32) if use_noise else jnp.zeros_like(x)
        x_new = c.c_x * x + c.c_d0 * x0 + c.c_d1 * d1 + c.c_noise * z
        return (x_new, x0), None

    (x, _), _ = jax.lax.scan(step, (x_init, jnp.zeros_like(x_init)), (coeffs, keys))
    return x


def cfg_sample(
    coeffs: SolverCoeffs,
    head_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    cfg_scale: float | jnp.ndarray,
    x_init: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Classifier-free-guided solve (reference sample_speech_tokens,
    modeling_vibevoice_inference.py:697-710): the head runs on a 2B batch of
    [cond; uncond] and the guided output drives a single solver trajectory."""
    both = jnp.concatenate([cond, uncond], axis=0)

    def denoise(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        out = head_fn(x2, t2, both)
        c, u = jnp.split(out, 2, axis=0)
        return u + cfg_scale * (c - u)

    return sample(coeffs, denoise, x_init, key)
