from .audio import AudioNormalizer, VibeVoiceTokenizerProcessor, load_audio, write_wav
from .processor import VibeVoiceProcessor, VibeVoiceProcessorOutput
from .text_tokenizer import FallbackTextTokenizer, VibeVoiceTextTokenizer

__all__ = [
    "AudioNormalizer",
    "VibeVoiceTokenizerProcessor",
    "VibeVoiceProcessor",
    "VibeVoiceProcessorOutput",
    "VibeVoiceTextTokenizer",
    "FallbackTextTokenizer",
    "load_audio",
    "write_wav",
]
