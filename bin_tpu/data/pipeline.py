"""Host-side input pipeline: sample sources → cropped, batched device feeds.

Reference equivalent: torch ``Dataset``/``DataLoader`` over pre-extracted PNG
frame folders with random 128x128 crop + flips for training and full frames
for eval (SURVEY.md §3.2).  This machine has ONE host CPU core (SURVEY.md §8
hard part (e)), so the pipeline favors cheap vectorized numpy transforms and
an in-process prefetch thread over worker processes.

A *source* is any object with:
  __len__() -> int
  __getitem__(i) -> {"blurry": (K, H, W, 3) f32, "sharp": (2K-1, H, W, 3) f32}

``SyntheticSource`` procedurally generates samples; ``FrameFolderSource``
(bin_tpu.data.frames) reads Adobe240/GoPro-layout folder trees.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from bin_tpu.data import synthetic

__all__ = ["SyntheticSource", "train_iterator", "eval_clips"]


class SyntheticSource:
    """Procedural source of blurry/sharp samples (see synthetic.py).

    ``cache=True`` keeps rendered samples in RAM after first access — on the
    1-CPU-core host, re-rendering a clip (~50 sub-frames) per draw would
    starve the TPU; cached epochs reduce the loader to crop/flip cost.
    """

    def __init__(self, num_samples: int, num_keys: int, height: int, width: int,
                 taps: int = 11, stride: int = 8, seed: int = 0,
                 cache: bool = False, as_u8: bool = False,
                 style: str = "smooth"):
        self.num_samples = num_samples
        self.num_keys = num_keys
        self.height = height
        self.width = width
        self.taps = taps
        self.stride = stride
        self.seed = seed
        self.style = style
        self.as_u8 = as_u8  # quantize to uint8, like real PNG datasets:
                            # 4x less cache traffic + the native crop path
        self._cache: dict[int, dict[str, np.ndarray]] | None = {} if cache else None

    def __len__(self) -> int:
        return self.num_samples

    def sample_name(self, i: int) -> str:
        return f"synth{self.seed}_{i:04d}"

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        if not 0 <= i < self.num_samples:
            raise IndexError(i)
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        sample = synthetic.make_sample(self.seed * 1_000_003 + i, self.num_keys,
                                       self.height, self.width, self.taps,
                                       self.stride, style=self.style)
        if self.as_u8:
            sample = {k: (v * 255.0 + 0.5).astype(np.uint8)
                      for k, v in sample.items()}
        if self._cache is not None:
            self._cache[i] = sample
        return sample


def _random_crop_flip(sample: dict[str, np.ndarray], crop_hw: tuple[int, int],
                      rng: np.random.Generator, flip: bool,
                      keep_u8: bool = False) -> dict[str, np.ndarray]:
    """Shared spatial crop + flip across the blurry/sharp frame stacks.

    uint8 samples (FrameFolderSource(raw_u8=True)) take the fused native
    crop+flip+normalize kernel (bin_tpu._fastops) — one pass instead of
    slice + copy + cast on the single-core host.

    ``keep_u8``: emit uint8 crops (no normalization) so the host→device
    transfer is 4× smaller; the train step normalizes on device
    (DataConfig.transfer_u8).  The RNG draw order is identical either way,
    so a run is bit-reproducible across the two modes.
    """
    ch, cw = crop_hw
    h, w = sample["blurry"].shape[1:3]
    if h < ch or w < cw:
        raise ValueError(f"sample {h}x{w} smaller than crop {ch}x{cw}")
    y0 = int(rng.integers(0, h - ch + 1))
    x0 = int(rng.integers(0, w - cw + 1))
    fw = fh = ft = False
    if flip:
        fw = rng.random() < 0.5
        fh = rng.random() < 0.5
        ft = rng.random() < 0.5  # temporal flip: valid, blur is symmetric

    all_u8 = all(v.dtype == np.uint8 for v in sample.values())
    if all_u8 and not keep_u8:
        from bin_tpu.data import fastops
        return {k: fastops.crop_norm_u8(v, y0, x0, ch, cw, fh, fw, ft)
                for k, v in sample.items()}

    out = {k: v[:, y0:y0 + ch, x0:x0 + cw] for k, v in sample.items()}
    if fw:
        out = {k: v[:, :, ::-1] for k, v in out.items()}
    if fh:
        out = {k: v[:, ::-1] for k, v in out.items()}
    if ft:
        out = {k: v[::-1] for k, v in out.items()}
    return {k: np.ascontiguousarray(v) for k, v in out.items()}


def train_iterator(source, batch_size: int, crop_size: tuple[int, int],
                   seed: int = 0, random_flip: bool = True,
                   prefetch: int = 2,
                   keep_u8: bool = False) -> Iterator[dict[str, np.ndarray]]:
    """Infinite iterator of batches {"blurry": (B,K,h,w,3), "sharp": (B,2K-1,h,w,3)}.

    Runs sampling + crop on a background thread with a bounded queue so host
    preprocessing overlaps device steps (the TPU analog of DataLoader
    prefetching, sized for a 1-core host).
    """
    def produce(q: queue.Queue):
        try:
            rng = np.random.Generator(np.random.Philox(seed))
            n = len(source)
            while True:
                idx = rng.integers(0, n, size=batch_size)
                items = [_random_crop_flip(source[int(i)], crop_size, rng,
                                           random_flip, keep_u8=keep_u8)
                         for i in idx]
                batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
                q.put(batch)
        except BaseException as exc:  # propagate to the consumer, don't hang it
            q.put(exc)

    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
    thread = threading.Thread(target=produce, args=(q,), daemon=True)
    thread.start()
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        yield item


def eval_clips(source, batch_size: int = 1) -> Iterator[dict[str, np.ndarray]]:
    """Deterministic full-frame eval batches, one pass over the source.

    Samples are grouped by shape before batching (full-clip sources yield
    clips of different lengths — stacking across groups would fail);
    trailing partial batches are padded by repeating the last clip of the
    group with a "valid" mask so metrics can ignore padding.
    """
    def emit(items: list[tuple[str, dict[str, np.ndarray]]]):
        valid = np.zeros((batch_size,), dtype=bool)
        valid[: len(items)] = True
        items = items + [items[-1]] * (batch_size - len(items))
        batch = {k: np.stack([it[k] for _, it in items]) for k in items[0][1]}
        batch["valid"] = valid
        # clip identities ride alongside (NOT stacked): the reference's
        # eval prints a per-VIDEO table, so names survive batching
        batch["names"] = [name for name, _ in items]
        return batch

    def name_of(i: int) -> str:
        if hasattr(source, "sample_name"):
            return source.sample_name(i)
        return f"clip{i:04d}"

    buffers: dict[tuple, list] = {}
    for i in range(len(source)):  # single pass; <= batch_size items buffered
        item = source[i]          # per distinct clip shape
        buf = buffers.setdefault(item["blurry"].shape, [])
        buf.append((name_of(i), item))
        if len(buf) == batch_size:
            yield emit(buf)
            buf.clear()
    for buf in buffers.values():
        if buf:
            yield emit(buf)
