"""Released-weights format: a single portable ``.npz`` + JSON model card.

The reference ships pretrained ``state_dict`` files its demo consumes
(SURVEY.md §3.2 'Model factory' load-pretrained).  The bin_tpu equivalent is
a flat .npz (param tree flattened with '/'-joined keys) plus an embedded
model card recording the preset/config the weights were trained under, so
``bin-tpu-demo --weights file.npz`` can rebuild the exact model with no
checkpoint directory or optimizer state.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

import numpy as np

from bin_tpu.config import Config, ModelConfig

__all__ = ["export_weights", "load_weights", "OPS_VERSION"]

_CARD_KEY = "__model_card__"

# Op-definition version stamped into every exported card. Bump whenever an
# op's numerics change in a way that re-scores old checkpoints differently:
#   1  round 1: decoder Upsample = bilinear 2x (zero-SAME conv border)
#   2  round 2: fused phase-bank upsample-conv with REPLICATE border padding
#      (models/layers.py Upsample) — old weights still load but border
#      pixels differ from the round-1 op, so round-1 quality numbers are
#      not exactly reproducible under v2 semantics (ADVICE r2).
OPS_VERSION = 2


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        *parents, leaf = key.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = value
    return tree


def export_weights(path: str, params: Any, model_cfg: ModelConfig,
                   metadata: dict | None = None,
                   store_dtype: str | None = None) -> None:
    """Write params + model card to ``path`` (.npz).

    ``store_dtype`` (e.g. ``"float16"``) downcasts floating-point leaves for
    storage only — ``load_weights`` upcasts back to float32, and the card
    records the storage dtype so the round trip is self-documenting.  fp16
    storage halves the file (conv weights sit well inside fp16 range after
    grad clipping; the measured eval delta is recorded in BASELINE.md) and
    is what makes the released weights small enough to version in-repo.
    """
    card = {"model": dataclasses.asdict(model_cfg), "metadata": metadata or {},
            "ops_version": OPS_VERSION}
    flat = _flatten(params)
    if store_dtype is not None:
        dt = np.dtype(store_dtype)
        if dt.kind != "f":
            raise ValueError(f"store_dtype must be floating, got {store_dtype}")
        flat = {k: v.astype(dt) if v.dtype.kind == "f" else v
                for k, v in flat.items()}
        card["store_dtype"] = dt.name
    flat[_CARD_KEY] = np.frombuffer(
        json.dumps(card).encode("utf-8"), dtype=np.uint8)
    np.savez(path, **flat)


def read_card(path: str) -> dict:
    """Read ONLY the embedded model card of a released-weights .npz —
    npz members load lazily, so this costs one small zip entry, not the
    (possibly hundreds of MB) parameter arrays."""
    with np.load(path) as data:
        return json.loads(bytes(data[_CARD_KEY]).decode("utf-8"))


def load_weights(path: str) -> tuple[dict, ModelConfig, dict]:
    """Read a weights file -> (params, ModelConfig, metadata)."""
    data = np.load(path)
    card = json.loads(bytes(data[_CARD_KEY]).decode("utf-8"))
    v = card.get("ops_version", 1)
    if v != OPS_VERSION:
        print(f"NOTE: weights were exported under ops_version {v}; current "
              f"ops are version {OPS_VERSION} — border-pixel numerics may "
              "differ from the scores recorded at export time (see "
              "bin_tpu/weights.py OPS_VERSION history)")
    flat = {k: data[k] for k in data.files if k != _CARD_KEY}
    if card.get("store_dtype"):  # storage-only downcast: restore float32
        flat = {k: v.astype(np.float32) if v.dtype.kind == "f" else v
                for k, v in flat.items()}
    mc = card["model"]
    # JSON round-trips tuples as lists; restore every tuple-typed
    # ModelConfig field (derived from the annotations, not a literal list,
    # so new tuple fields can't be silently missed).
    for key, f in ModelConfig.__dataclass_fields__.items():
        if "tuple" in str(f.type) and key in mc and isinstance(mc[key], list):
            mc[key] = tuple(mc[key])
    model_cfg = ModelConfig(**{k: v for k, v in mc.items()
                               if k in ModelConfig.__dataclass_fields__})
    return _unflatten(flat), model_cfg, card.get("metadata", {})
