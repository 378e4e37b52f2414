"""CPU rehearsal of the one-command real-checkpoint QA harness
(vibevoice_tpu/scripts/qa_real_checkpoint.py) against the synthetic HF-layout
fixture: convert -> per-component parity vs the live reference on the SAME
weights -> short generate -> forced-diffusion RTF bench -> JSON report."""

import json

import pytest

from reference_shim import reference_available

# fast gate (-m "not slow") skips this module: end-to-end QA subprocess on a synthetic checkpoint (~19 s)
pytestmark = [
    pytest.mark.skipif(not reference_available(), reason="reference checkout absent"),
    pytest.mark.slow,
]


def test_qa_harness_on_synthetic_fixture(tmp_path):
    from reference_shim import import_reference

    import_reference()  # stubs diffusers so build_reference_model can import

    from test_real_ckpt_fixture import (
        _ref_model,
        _tiny_cfg,
        _write_hf_checkpoint,
        _write_real_tokenizer,
    )
    from vibevoice_tpu.scripts import qa_real_checkpoint as qa

    ref = _ref_model(tie=True)
    ckpt = tmp_path / "ckpt"
    _write_hf_checkpoint(ckpt, ref, _tiny_cfg(tie=True))
    _write_real_tokenizer(ckpt)

    report_path = tmp_path / "qa_report.json"
    rc = qa.main([
        str(ckpt), "--cpu", "--frames", "8", "--ddpm_steps", "2",
        "--report", str(report_path),
    ])
    assert rc == 0

    report = json.loads(report_path.read_text())
    assert report["ok"] is True
    comps = {c["component"] for c in report["parity"]}
    assert {
        "acoustic_encode", "acoustic_decode", "semantic_encode",
        "diffusion_head", "lm_prefill_hidden", "lm_prefill_logits",
    } <= comps
    assert all(c["pass"] for c in report["parity"])
    assert report["rtf"]["frames"] == 8
    assert report["rtf"]["audio_seconds"] > 0
    assert report["generate"]["prompt_tokens"] > 0


def test_qa_harness_detects_conversion_bug(tmp_path, monkeypatch):
    """Sanity that the parity gate actually gates: both sides load the SAME
    files, so what it catches is CONVERSION drift. Inject a realistic bug
    (conv-transpose kernels not time-flipped) and the harness must exit
    nonzero with the decoder component failing while encoders stay green."""
    from reference_shim import import_reference

    import_reference()

    from test_real_ckpt_fixture import (
        _ref_model,
        _tiny_cfg,
        _write_hf_checkpoint,
        _write_real_tokenizer,
    )
    from vibevoice_tpu.scripts import qa_real_checkpoint as qa
    from vibevoice_tpu.utils import torch_convert as tc

    ref = _ref_model(tie=True)
    ckpt = tmp_path / "ckpt_bug"
    _write_hf_checkpoint(ckpt, ref, _tiny_cfg(tie=True))
    _write_real_tokenizer(ckpt)

    import jax.numpy as jnp

    def unflipped_convtr_w(x):
        w = tc._np(x).transpose(2, 0, 1)  # missing the [::-1] time flip
        return jnp.asarray(w.copy())

    monkeypatch.setattr(tc, "convtr_w", unflipped_convtr_w)

    report_path = tmp_path / "qa_report.json"
    rc = qa.main([
        str(ckpt), "--cpu", "--skip_generate", "--report", str(report_path),
    ])
    assert rc == 1
    report = json.loads(report_path.read_text())
    assert report["ok"] is False
    failing = {c["component"] for c in report["parity"] if not c["pass"]}
    assert "acoustic_decode" in failing
    assert "acoustic_encode" not in failing and "semantic_encode" not in failing
