"""End-to-end CFG diffusion parity: the reference's per-token sampling loop
(scheduler + diffusion head + CFG mixing) vs our fused scan, with identical
weights, conditions, and initial noise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shim import reference_available

from vibevoice_tpu.configs import DiffusionHeadConfig
from vibevoice_tpu.models import diffusion_head as dh
from vibevoice_tpu.schedule import dpm_solver as dpm
from vibevoice_tpu.utils.torch_convert import convert_diffusion_head

# fast gate (-m "not slow") skips this module: live-torch CFG-loop parity sweep (~35 s serial)
pytestmark = [
    pytest.mark.skipif(not reference_available(), reason="reference checkout absent"),
    pytest.mark.slow,
]


@pytest.mark.parametrize("steps,cfg_scale", [(5, 1.3), (10, 1.5), (20, 3.0)])
def test_cfg_sampling_matches_reference(steps, cfg_scale):
    import torch
    from reference_shim import import_reference

    import_reference()
    from vibevoice.modular.modular_vibevoice_diffusion_head import VibeVoiceDiffusionHead
    from vibevoice.modular.configuration_vibevoice import VibeVoiceDiffusionHeadConfig
    from vibevoice.schedule.dpm_solver import DPMSolverMultistepScheduler

    torch.manual_seed(0)
    rcfg = VibeVoiceDiffusionHeadConfig(hidden_size=32, head_layers=2, latent_size=8)
    head = VibeVoiceDiffusionHead(rcfg).eval()
    with torch.no_grad():
        for p in head.parameters():
            p.normal_(0, 0.05)

    rng = np.random.RandomState(1)
    cond = rng.randn(3, 32).astype(np.float32)
    uncond = rng.randn(3, 32).astype(np.float32)
    x_init = rng.randn(3, 8).astype(np.float32)

    # ---- reference loop (mirrors sample_speech_tokens,
    # modeling_vibevoice_inference.py:697-710, with fixed init noise) --------
    sched = DPMSolverMultistepScheduler(
        num_train_timesteps=1000, beta_schedule="cosine", prediction_type="v_prediction"
    )
    sched.set_timesteps(steps)
    with torch.no_grad():
        condition = torch.cat([torch.from_numpy(cond), torch.from_numpy(uncond)], dim=0)
        speech = torch.cat([torch.from_numpy(x_init), torch.from_numpy(x_init)], dim=0)
        for t in sched.timesteps:
            half = speech[: len(speech) // 2]
            combined = torch.cat([half, half], dim=0)
            eps = head(combined, t.repeat(combined.shape[0]).to(combined), condition=condition)
            cond_eps, uncond_eps = torch.split(eps, len(eps) // 2, dim=0)
            half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
            eps = torch.cat([half_eps, half_eps], dim=0)
            speech = sched.step(eps, t, speech).prev_sample
        ref = speech[: len(speech) // 2].numpy()

    # ---- ours --------------------------------------------------------------
    cfg = DiffusionHeadConfig(hidden_size=32, head_layers=2, latent_size=8)
    params = convert_diffusion_head(head.state_dict(), cfg)
    coeffs = dpm.make_solver(steps)
    head_fn = lambda x, t, c: dh.apply(params, cfg, x, t, c)
    ours = dpm.cfg_sample(
        coeffs, head_fn, jnp.asarray(cond), jnp.asarray(uncond), cfg_scale, jnp.asarray(x_init)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-4)
