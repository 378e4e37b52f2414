"""Golden tests: scan-based DPM-Solver++ vs the reference's vendored
scheduler, and diffusion head parity (SURVEY.md §4 item 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vibevoice_tpu.configs import DiffusionHeadConfig
from vibevoice_tpu.models import diffusion_head as dh
from vibevoice_tpu.schedule import dpm_solver as dpm

from reference_shim import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference checkout absent")


@pytest.fixture(scope="module")
def ref():
    from reference_shim import import_reference

    import_reference()
    from vibevoice.schedule.dpm_solver import DPMSolverMultistepScheduler

    return DPMSolverMultistepScheduler


def _run_reference_solve(SchedulerCls, model_np, x0, steps, variance_noise=None, **sched_kwargs):
    """Drive the reference scheduler with a deterministic numpy 'model'.

    variance_noise: optional (steps, *x0.shape) array fed as the SDE noise
    (the reference step()'s `variance_noise` arg) for deterministic goldens."""
    import torch

    sched = SchedulerCls(
        num_train_timesteps=1000,
        beta_schedule=sched_kwargs.pop("beta_schedule", "cosine"),
        prediction_type=sched_kwargs.pop("prediction_type", "v_prediction"),
        **sched_kwargs,
    )
    sched.set_timesteps(steps)
    x = torch.from_numpy(x0.copy())
    for i, t in enumerate(sched.timesteps):
        m = torch.from_numpy(model_np(x.numpy(), float(t)))
        vn = None if variance_noise is None else torch.from_numpy(variance_noise[i])
        x = sched.step(m, t, x, variance_noise=vn).prev_sample
    return x.numpy(), [float(t) for t in sched.timesteps]


def _run_our_solve(coeffs, model_np, x0, noise=None, **sample_kwargs):
    """Python-loop mirror of dpm.sample (so the host numpy model stays usable)."""
    x = jnp.asarray(x0, jnp.float32)
    m1 = jnp.zeros_like(x)
    m2 = jnp.zeros_like(x)
    for i in range(coeffs.num_steps):
        c = jax.tree.map(lambda a: a[i], coeffs)
        raw = jnp.asarray(model_np(np.asarray(x), float(c.timesteps)))
        m0 = c.a_conv * x + c.b_conv * raw
        z = jnp.zeros_like(x) if noise is None else jnp.asarray(noise[i])
        x = c.c_x * x + c.c_m0 * m0 + c.c_m1 * m1 + c.c_m2 * m2 + c.c_noise * z
        m2 = m1
        m1 = m0
    return np.asarray(x)


def _fake_model(x, t):
    """A deterministic nonlinear stand-in for the diffusion head."""
    return np.tanh(x * 0.1 + t / 1000.0).astype(np.float32) * 0.5


@pytest.mark.parametrize("steps", [5, 10, 20])
@pytest.mark.parametrize("pred", ["v_prediction", "epsilon"])
def test_ode_solver_matches_reference(ref, steps, pred):
    rng = np.random.RandomState(steps)
    x0 = rng.randn(3, 16).astype(np.float32)
    ref_out, ref_ts = _run_reference_solve(ref, _fake_model, x0, steps, prediction_type=pred)

    coeffs = dpm.make_solver(steps, prediction_type=pred)
    np.testing.assert_array_equal(np.asarray(coeffs.timesteps), np.array(ref_ts, np.float32))
    ours = _run_our_solve(coeffs, _fake_model, x0)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("order", [1, 2, 3])
@pytest.mark.parametrize("algorithm", ["dpmsolver++", "dpmsolver"])
@pytest.mark.parametrize("steps", [8, 20])
def test_solver_orders_match_reference(ref, order, algorithm, steps):
    """Order 1-3 updates + warm-up/tail order forcing vs the reference
    (reference dpm_solver.py:627-930, :977-1008).

    Non-++ goldens use the linear beta schedule: with cosine, sigma_max is
    ~2e4 and the reference's float32 schedule math loses ~2e-3 relative
    precision vs our float64 host tables (formulas verified to 1e-7 on
    linear; see test_nonplusplus_cosine_fp32_envelope)."""
    final = "zero" if algorithm.endswith("++") else "sigma_min"
    beta = "cosine" if algorithm.endswith("++") else "linear"
    kwargs = dict(
        solver_order=order, algorithm_type=algorithm, final_sigmas_type=final, beta_schedule=beta
    )
    rng = np.random.RandomState(order)
    x0 = rng.randn(2, 12).astype(np.float32)
    ref_out, ref_ts = _run_reference_solve(ref, _fake_model, x0, steps, **kwargs)
    coeffs = dpm.make_solver(steps, **kwargs)
    np.testing.assert_array_equal(np.asarray(coeffs.timesteps), np.array(ref_ts, np.float32))
    ours = _run_our_solve(coeffs, _fake_model, x0)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_nonplusplus_cosine_fp32_envelope(ref):
    """dpmsolver + cosine agrees within the reference's own float32 schedule
    precision (sigma_max ~2e4 amplifies fp32 rounding; measured ~2e-3)."""
    kwargs = dict(algorithm_type="dpmsolver", final_sigmas_type="sigma_min")
    rng = np.random.RandomState(9)
    x0 = rng.randn(2, 12).astype(np.float32)
    ref_out, _ = _run_reference_solve(ref, _fake_model, x0, 10, **kwargs)
    ours = _run_our_solve(dpm.make_solver(10, **kwargs), _fake_model, x0)
    np.testing.assert_allclose(ours, ref_out, rtol=8e-3, atol=1e-4)


@pytest.mark.parametrize("algorithm", ["dpmsolver++", "dpmsolver"])
def test_heun_matches_reference(ref, algorithm):
    """heun second-order variant (reference :766-772, :782-787)."""
    final = "zero" if algorithm.endswith("++") else "sigma_min"
    beta = "cosine" if algorithm.endswith("++") else "linear"
    kwargs = dict(
        solver_type="heun", algorithm_type=algorithm, final_sigmas_type=final, beta_schedule=beta
    )
    rng = np.random.RandomState(7)
    x0 = rng.randn(2, 12).astype(np.float32)
    ref_out, _ = _run_reference_solve(ref, _fake_model, x0, 10, **kwargs)
    ours = _run_our_solve(dpm.make_solver(10, **kwargs), _fake_model, x0)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("algorithm", ["sde-dpmsolver++", "sde-dpmsolver"])
@pytest.mark.parametrize("solver_type", ["midpoint", "heun"])
def test_sde_matches_reference_with_injected_noise(ref, algorithm, solver_type):
    """SDE families with identical injected variance noise on both sides
    (reference step() variance_noise, :956-960)."""
    final = "zero" if algorithm.endswith("++") else "sigma_min"
    kwargs = dict(algorithm_type=algorithm, solver_type=solver_type, final_sigmas_type=final)
    steps = 10
    rng = np.random.RandomState(11)
    x0 = rng.randn(2, 12).astype(np.float32)
    noise = rng.randn(steps, 2, 12).astype(np.float32)
    ref_out, _ = _run_reference_solve(ref, _fake_model, x0, steps, variance_noise=noise, **kwargs)
    ours = _run_our_solve(dpm.make_solver(steps, **kwargs), _fake_model, x0, noise=noise)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "variant",
    [
        # Karras/Lu use the linear beta schedule: under cosine the top sigmas
        # round to duplicate timesteps, which crashes the reference itself
        # (its step-index dedup overruns sigmas, reference :739, :924-935)
        {"use_karras_sigmas": True, "beta_schedule": "linear"},
        {"use_lu_lambdas": True, "beta_schedule": "linear"},
        {"lambda_min_clipped": -5.1},
        {"timestep_spacing": "leading", "steps_offset": 1},
        {"timestep_spacing": "trailing"},
        {"prediction_type": "sample"},
        {"euler_at_final": True},
        {"final_sigmas_type": "sigma_min"},
        {"rescale_betas_zero_snr": True},
        {"beta_schedule": "scaled_linear"},
        {"solver_order": 3, "use_karras_sigmas": True, "beta_schedule": "linear"},
    ],
)
def test_schedule_variants_match_reference(ref, variant):
    """Timestep-construction + config variants vs the reference set_timesteps
    (reference :321-423)."""
    steps = 12
    rng = np.random.RandomState(3)
    x0 = rng.randn(2, 12).astype(np.float32)
    ref_out, ref_ts = _run_reference_solve(ref, _fake_model, x0, steps, **variant)
    coeffs = dpm.make_solver(steps, **variant)
    np.testing.assert_allclose(
        np.asarray(coeffs.timesteps), np.array(ref_ts, np.float32), atol=0.0
    )
    ours = _run_our_solve(coeffs, _fake_model, x0)
    np.testing.assert_allclose(ours, ref_out, rtol=3e-4, atol=3e-5)


def test_thresholding_matches_reference(ref):
    """Dynamic thresholding (reference _threshold_sample :427-457).

    Samples are 3-D (B, C, T): the reference reshape assumes image-model
    shapes (batch, channels, *spatial) and fails on 2-D input."""
    steps = 8
    rng = np.random.RandomState(5)
    x0 = (rng.randn(2, 4, 3) * 3).astype(np.float32)

    big = lambda x, t: (_fake_model(x, t) * 5).astype(np.float32)
    for algo, final, eps_space in [
        ("dpmsolver++", "zero", False),
        ("dpmsolver", "sigma_min", True),
    ]:
        kwargs = dict(
            algorithm_type=algo,
            final_sigmas_type=final,
            thresholding=True,
            prediction_type="sample",
            beta_schedule="linear",  # see test_solver_orders_match_reference
        )
        ref_out, _ = _run_reference_solve(ref, big, x0, steps, **kwargs)
        coeffs = dpm.make_solver(
            steps,
            algorithm_type=algo,
            final_sigmas_type=final,
            prediction_type="sample",
            beta_schedule="linear",
        )
        # mirror dpm.sample's thresholding branch on host
        x = jnp.asarray(x0)
        m1 = jnp.zeros_like(x)
        m2 = jnp.zeros_like(x)
        for i in range(steps):
            c = jax.tree.map(lambda a: a[i], coeffs)
            raw = jnp.asarray(big(np.asarray(x), float(c.timesteps)))
            m0 = c.a_conv * x + c.b_conv * raw
            if eps_space:
                xx = (x - c.sigma_s * m0) / c.alpha_s
                xx = dpm._threshold_x0(xx, 0.995, 1.0)
                m0 = (x - c.alpha_s * xx) / c.sigma_s
            else:
                m0 = dpm._threshold_x0(m0, 0.995, 1.0)
            x = c.c_x * x + c.c_m0 * m0 + c.c_m1 * m1 + c.c_m2 * m2
            m2 = m1
            m1 = m0
        np.testing.assert_allclose(np.asarray(x), ref_out, rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("schedule", ["cosine", "linear", "laplace", "cauchy"])
def test_beta_schedules_match(ref, schedule):
    sched = ref(num_train_timesteps=100, beta_schedule=schedule)
    ours = dpm.make_betas(100, schedule)
    np.testing.assert_allclose(ours, sched.betas.numpy(), rtol=1e-6, atol=1e-8)


def test_add_noise_velocity_match(ref):
    import torch

    sched = ref(num_train_timesteps=1000, beta_schedule="cosine", prediction_type="v_prediction")
    ns = dpm.NoiseSchedule.create(1000, "cosine")
    rng = np.random.RandomState(0)
    x0 = rng.randn(4, 8).astype(np.float32)
    eps = rng.randn(4, 8).astype(np.float32)
    t = np.array([0, 10, 500, 999])
    ref_noisy = sched.add_noise(torch.from_numpy(x0), torch.from_numpy(eps), torch.from_numpy(t))
    ref_v = sched.get_velocity(torch.from_numpy(x0), torch.from_numpy(eps), torch.from_numpy(t))
    np.testing.assert_allclose(
        np.asarray(ns.add_noise(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))),
        ref_noisy.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ns.get_velocity(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t))),
        ref_v.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )


def test_scan_sample_matches_python_loop():
    """The jitted scan path equals the unrolled coefficient loop."""
    steps = 6
    coeffs = dpm.make_solver(steps)
    w = jnp.asarray(np.random.RandomState(0).randn(16, 16).astype(np.float32) * 0.1)

    def denoise(x, t):
        return jnp.tanh(x @ w + t[:, None] / 1000.0) * 0.5

    x0 = jnp.asarray(np.random.RandomState(1).randn(2, 16).astype(np.float32))
    scanned = dpm.sample(coeffs, denoise, x0)

    x = x0
    m1 = jnp.zeros_like(x)
    m2 = jnp.zeros_like(x)
    for i in range(steps):
        c = jax.tree.map(lambda a: a[i], coeffs)
        t = jnp.broadcast_to(c.timesteps, (x.shape[0],))
        m0 = c.a_conv * x + c.b_conv * denoise(x, t)
        x = c.c_x * x + c.c_m0 * m0 + c.c_m1 * m1 + c.c_m2 * m2
        m2 = m1
        m1 = m0
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_sample_noise_injection_matches_key_draws():
    """sample(noise=...) reproduces sample(key=...) when fed the same draws."""
    steps = 5
    coeffs = dpm.make_solver(steps, algorithm_type="sde-dpmsolver++")
    w = jnp.asarray(np.random.RandomState(0).randn(8, 8).astype(np.float32) * 0.1)

    def denoise(x, t):
        return jnp.tanh(x @ w + t[:, None] / 1000.0) * 0.5

    x0 = jnp.asarray(np.random.RandomState(1).randn(2, 8).astype(np.float32))
    key = jax.random.PRNGKey(3)
    via_key = dpm.sample(coeffs, denoise, x0, key=key)
    draws = np.stack(
        [np.asarray(jax.random.normal(k, x0.shape, jnp.float32)) for k in jax.random.split(key, steps)]
    )
    via_noise = dpm.sample(coeffs, denoise, x0, noise=jnp.asarray(draws))
    np.testing.assert_allclose(np.asarray(via_key), np.asarray(via_noise), rtol=1e-6, atol=1e-7)


class TestDiffusionHeadGolden:
    @pytest.fixture(scope="class")
    def ref_head(self):
        import torch
        from reference_shim import import_reference

        import_reference()
        from vibevoice.modular.modular_vibevoice_diffusion_head import VibeVoiceDiffusionHead
        from vibevoice.modular.configuration_vibevoice import VibeVoiceDiffusionHeadConfig

        torch.manual_seed(0)
        cfg = VibeVoiceDiffusionHeadConfig(hidden_size=32, head_layers=2, latent_size=8)
        model = VibeVoiceDiffusionHead(cfg).eval()
        # zero-init adaLN makes outputs trivially zero; randomise for a real test
        with torch.no_grad():
            for p in model.parameters():
                p.normal_(0, 0.05)
        return model

    def test_forward_matches(self, ref_head):
        import torch
        from vibevoice_tpu.utils.torch_convert import convert_diffusion_head

        cfg = DiffusionHeadConfig(hidden_size=32, head_layers=2, latent_size=8)
        params = convert_diffusion_head(ref_head.state_dict(), cfg)
        rng = np.random.RandomState(2)
        noisy = rng.randn(4, 8).astype(np.float32)
        t = np.array([0.0, 100.0, 500.0, 999.0], np.float32)
        cond = rng.randn(4, 32).astype(np.float32)
        with torch.no_grad():
            ref_out = ref_head(
                torch.from_numpy(noisy), torch.from_numpy(t), torch.from_numpy(cond)
            ).numpy()
        ours = dh.apply(params, cfg, jnp.asarray(noisy), jnp.asarray(t), jnp.asarray(cond))
        np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-5)
