"""VibeVoice-TPU: a TPU-native JAX/XLA/Pallas framework for next-token-
diffusion text-to-speech, re-building the capabilities of
vibevoice-community/VibeVoice (reference mounted at /root/reference).

Layers (bottom-up): ops (norms, causal convs, attention) -> schedule
(DPM-Solver++) -> models (tokenizers, diffusion head, Qwen2 LM, composite
model, generation engines) -> processor (prompt/audio front-end) -> streamer
(delivery) -> parallel (mesh sharding) -> finetune (training).
"""

__version__ = "0.5.0"

from . import configs
from .configs import (
    AcousticTokenizerConfig,
    DiffusionHeadConfig,
    Qwen2Config,
    SemanticTokenizerConfig,
    VibeVoiceConfig,
    VibeVoiceStreamingConfig,
    tiny_config,
)
from .streamer import AsyncAudioStreamer, AudioStreamer

# vibevoice_tpu.serving / .models / .finetune import jax and are intentionally
# not re-exported here; import them as submodules.

__all__ = [
    "configs",
    "AcousticTokenizerConfig",
    "SemanticTokenizerConfig",
    "DiffusionHeadConfig",
    "Qwen2Config",
    "VibeVoiceConfig",
    "VibeVoiceStreamingConfig",
    "tiny_config",
    "AudioStreamer",
    "AsyncAudioStreamer",
]
