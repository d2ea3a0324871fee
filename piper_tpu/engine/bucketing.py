"""Static shape buckets.

XLA compiles one program per distinct shape; padding variable lengths into a
small geometric bucket ladder keeps the program count tiny across the
scale-bench sweep (the recompile-count analog of the reference's flush-count
metric — SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import List, Sequence

DEFAULT_PHONEME_BUCKETS: List[int] = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096]
# Frame buckets: ~1.25-1.33x ladder below 1024 (typical utterances live
# there and decode FLOPs scale with the bucket, so padding waste is paid in
# vocoder compute — a 170-frame decode at bucket 256 wastes 33%, at 192 only
# 11%), ~1.5x above. A frame is hop_length samples (256 for 22.05kHz voices
# => the largest bucket is ~380s of audio, enough for a 4096-phoneme input
# at typical durations).
DEFAULT_FRAME_BUCKETS: List[int] = [
    32, 64, 96, 128, 192, 256, 320, 384, 512, 640, 768, 1024, 1536, 2048,
    3072, 4096, 6144, 8192, 12288, 16384, 24576, 32768,
]


class BucketOverflowError(ValueError):
    def __init__(self, value: int, largest: int, what: str):
        super().__init__(
            f"{what} length {value} exceeds the largest bucket {largest}; "
            f"raise the bucket ladder or split the input"
        )
        self.value = value
        self.largest = largest


def bucket_for(value: int, buckets: Sequence[int], what: str = "sequence") -> int:
    """Smallest bucket >= value."""
    for b in buckets:
        if value <= b:
            return b
    raise BucketOverflowError(value, buckets[-1], what)


def pad_to(seq, bucket: int, fill=0):
    """Pad a 1-D python list/array to `bucket` with `fill`."""
    import numpy as np

    arr = np.asarray(seq)
    if arr.shape[0] > bucket:
        raise ValueError(f"sequence of length {arr.shape[0]} does not fit bucket {bucket}")
    out = np.full((bucket,), fill, dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out
