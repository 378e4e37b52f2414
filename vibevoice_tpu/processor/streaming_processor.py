"""Streaming processor: script text + cached voice prompt -> engine inputs.

Reference VibeVoiceStreamingProcessor
(reference vibevoice/processor/vibevoice_streaming_processor.py:24-421):
the streaming model consumes *precomputed* voice-prompt KV caches; the
processor just tokenizes the script (with a trailing newline) and reports the
cached prompt lengths. The reference builds pseudo pad-id input sequences so
HF's generation bookkeeping lines up (reference :233-240); here the native
engine tracks per-sample cache lengths directly so only `tts_text_ids` and
the prompt lengths are needed — the pseudo ids are still returned for API
parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import numpy as np

from .text_tokenizer import FallbackTextTokenizer


@dataclass
class StreamingProcessorOutput:
    input_ids: np.ndarray  # (1, L_lm) pseudo pad ids
    attention_mask: np.ndarray
    tts_lm_input_ids: np.ndarray  # (1, L_tts) pseudo pad ids
    tts_lm_attention_mask: np.ndarray
    tts_text_ids: np.ndarray  # (1, n) script tokens
    speech_input_mask: np.ndarray


class VibeVoiceStreamingProcessor:
    def __init__(self, tokenizer=None):
        self.tokenizer = tokenizer or FallbackTextTokenizer()

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "VibeVoiceStreamingProcessor":
        from .processor import VibeVoiceProcessor

        return cls(tokenizer=VibeVoiceProcessor.from_pretrained(path, **kwargs).tokenizer)

    def __call__(self, *args, **kwargs):
        raise RuntimeError(
            "VibeVoiceStreamingProcessor requires a cached voice prompt; use "
            "process_input_with_cached_prompt(text, cached_prompt) "
            "(reference vibevoice_streaming_processor.py:169-178)."
        )

    def process_input_with_cached_prompt(
        self,
        text: str,
        cached_prompt: Any,
        **kwargs,
    ) -> StreamingProcessorOutput:
        """`cached_prompt` may be a models.streaming.VoicePreset or the
        reference's dict schema {'lm': {'last_hidden_state': ...}, ...}."""
        script_tokens = self.tokenizer.encode(text.strip() + "\n")

        if hasattr(cached_prompt, "lm_kv"):  # VoicePreset
            lm_len = int(np.asarray(cached_prompt.lm_kv[2]).reshape(-1)[0])
            tts_len = int(np.asarray(cached_prompt.tts_kv[2]).reshape(-1)[0])
        else:
            lm_len = cached_prompt["lm"]["last_hidden_state"].shape[1]
            tts_len = cached_prompt["tts_lm"]["last_hidden_state"].shape[1]

        pad = getattr(self.tokenizer, "pad_id", 0)
        return StreamingProcessorOutput(
            input_ids=np.full((1, lm_len), pad, np.int64),
            attention_mask=np.ones((1, lm_len), np.bool_),
            tts_lm_input_ids=np.full((1, tts_len), pad, np.int64),
            tts_lm_attention_mask=np.ones((1, tts_len), np.bool_),
            tts_text_ids=np.asarray([script_tokens], np.int64),
            speech_input_mask=np.zeros((1, tts_len), np.bool_),
        )
