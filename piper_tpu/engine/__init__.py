from piper_tpu.engine.runtime import PiperRuntime, RuntimeOptions, RunTimings

__all__ = ["PiperRuntime", "RuntimeOptions", "RunTimings"]
