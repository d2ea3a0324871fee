"""Multi-voice serving: several voices resident in one process.

The reference loads one voice per runtime instance and its streaming wrapper
even spawns a fresh runtime per request (PiperMetalRuntime.swift:95-137).
Here voices load once, stay device-resident, and share the process's compiled
program cache; an optional LRU cap bounds HBM use (a medium voice is ~65M
params, so a v5e chip holds many).
"""

from __future__ import annotations

from collections import OrderedDict
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Union

import numpy as np

from piper_tpu.core.audio import AudioChunk
from piper_tpu.core.voices import VoiceManager
from piper_tpu.engine.pipeline import ServingPipeline
from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions


class VoiceServer:
    def __init__(
        self,
        options: Optional[RuntimeOptions] = None,
        max_voices: Optional[int] = None,
        manager: Optional[VoiceManager] = None,
    ):
        self.options = options
        self.max_voices = max_voices
        self.manager = manager or VoiceManager()
        self._voices: "OrderedDict[str, PiperRuntime]" = OrderedDict()
        self._pipelines: Dict[str, ServingPipeline] = {}

    # -- voice management ----------------------------------------------------

    def load(
        self,
        voice: Union[str, Path],
        config_path: Union[str, Path, None] = None,
        key: Optional[str] = None,
    ) -> str:
        """Load a voice by id (downloads if needed) or by checkpoint path.

        Returns the key under which it is served (the id or file stem)."""
        voice = str(voice)
        if key is None:
            key = Path(voice).stem if voice.endswith(".onnx") else voice
        if key in self._voices:
            self._voices.move_to_end(key)
            return key
        if voice.endswith(".onnx"):
            rt = PiperRuntime(voice, config_path, self.options)
        else:
            rt = PiperRuntime.load_voice(voice, self.options, self.manager)
        self._voices[key] = rt
        self._evict()
        return key

    def _evict(self) -> None:
        while self.max_voices is not None and len(self._voices) > self.max_voices:
            evicted_key, _ = self._voices.popitem(last=False)
            pipe = self._pipelines.pop(evicted_key, None)
            if pipe is not None:
                pipe.close()

    def runtime(self, key: str) -> PiperRuntime:
        if key not in self._voices:
            self.load(key)
        self._voices.move_to_end(key)
        return self._voices[key]

    @property
    def loaded_voices(self) -> List[str]:
        return list(self._voices)

    # -- synthesis -----------------------------------------------------------

    def synthesize(self, voice: str, phoneme_ids: Sequence[int], **kwargs) -> np.ndarray:
        return self.runtime(voice).synthesize(phoneme_ids, **kwargs)

    def synthesize_batch(self, voice: str, batches, **kwargs) -> List[np.ndarray]:
        return self.runtime(voice).synthesize_batch(batches, **kwargs)

    def synthesize_stream(self, voice: str, phoneme_ids, **kwargs) -> Iterator[AudioChunk]:
        return self.runtime(voice).synthesize_stream(phoneme_ids, **kwargs)

    def pipeline(self, voice: str, **kwargs) -> ServingPipeline:
        """A shared async pipeline for the given voice."""
        if voice not in self._pipelines:
            self._pipelines[voice] = ServingPipeline(self.runtime(voice), **kwargs)
        return self._pipelines[voice]

    def batching_server(self, voices: Sequence[str], **kwargs):
        """A continuous batcher across the given voices (loaded on demand):
        one worker thread multiplexes every voice's bucketed queues onto the
        device (see MultiVoiceBatchingServer). The caller owns closing it."""
        from piper_tpu.engine.batcher import MultiVoiceBatchingServer

        return MultiVoiceBatchingServer(
            {v: self.runtime(v) for v in voices}, **kwargs)

    def close(self) -> None:
        for pipe in self._pipelines.values():
            pipe.close()
        self._pipelines.clear()
        self._voices.clear()

    def __enter__(self) -> "VoiceServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
