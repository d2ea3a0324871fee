"""piper-tpu: a TPU-native Piper/VITS text-to-speech inference framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of ocrickard/piper-swift
(reference surveyed in SURVEY.md). Instead of interpreting the 2755-node ONNX
graph op-by-op (the reference's GraphExecutor.swift approach), this framework
parses Piper ONNX checkpoints once into named weight arrays and runs the VITS
forward pass natively as jit-compiled, static-shape-bucketed JAX modules.

Public API surface (mirrors the reference's PiperMetalRuntime / PiperCore):
    - VoiceConfig            (reference: PiperConfig.swift:3-47)
    - AudioFormat/AudioChunk (reference: PiperAudio.swift:3-27)
    - TestVector/TestSummary (reference: PiperTestVector.swift:3-52)
    - VoiceIndex/VoiceManager(reference: PiperVoices.swift:54-289)
    - PiperRuntime           (reference: PiperMetalRuntime.swift:44-124)
"""

from piper_tpu.core.config import VoiceConfig
from piper_tpu.core.audio import AudioFormat, AudioChunk
from piper_tpu.core.alignment import PhonemeAlignment
from piper_tpu.core.test_vector import TestVector, TestSummary
from piper_tpu.core.voices import VoiceIndex, VoiceManager
from piper_tpu.version import __version__

__all__ = [
    "VoiceConfig",
    "AudioFormat",
    "AudioChunk",
    "PhonemeAlignment",
    "TestVector",
    "TestSummary",
    "VoiceIndex",
    "VoiceManager",
    "PiperRuntime",
    "RuntimeOptions",
    "ServingPipeline",
    "BatchingServer",
    "VoiceServer",
    "PiperClient",
    "PiperStreamingClient",
    "PiperClientError",
    "__version__",
]

_LAZY = {
    # Engine classes import jax; load them on first access so `import
    # piper_tpu` stays light for config/voice-only use.
    "PiperRuntime": ("piper_tpu.engine.runtime", "PiperRuntime"),
    "RuntimeOptions": ("piper_tpu.engine.runtime", "RuntimeOptions"),
    "ServingPipeline": ("piper_tpu.engine.pipeline", "ServingPipeline"),
    "BatchingServer": ("piper_tpu.engine.batcher", "BatchingServer"),
    "MultiVoiceBatchingServer": ("piper_tpu.engine.batcher", "MultiVoiceBatchingServer"),
    "VoiceServer": ("piper_tpu.engine.server", "VoiceServer"),
    # Clients are stdlib-only but live lazy for symmetry.
    "PiperClient": ("piper_tpu.client", "PiperClient"),
    "PiperStreamingClient": ("piper_tpu.client", "PiperStreamingClient"),
    "PiperClientError": ("piper_tpu.client", "PiperClientError"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'piper_tpu' has no attribute {name!r}")
