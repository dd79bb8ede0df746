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

__all__ = ["export_weights", "load_weights"]

_CARD_KEY = "__model_card__"


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
                   metadata: dict | None = None) -> None:
    """Write params + model card to ``path`` (.npz)."""
    card = {"model": dataclasses.asdict(model_cfg), "metadata": metadata or {}}
    flat = _flatten(params)
    flat[_CARD_KEY] = np.frombuffer(
        json.dumps(card).encode("utf-8"), dtype=np.uint8)
    np.savez(path, **flat)


def load_weights(path: str) -> tuple[dict, ModelConfig, dict]:
    """Read a weights file -> (params, ModelConfig, metadata)."""
    data = np.load(path)
    card = json.loads(bytes(data[_CARD_KEY]).decode("utf-8"))
    flat = {k: data[k] for k in data.files if k != _CARD_KEY}
    mc = card["model"]
    for key in ("channel_mult", "vgg_layers"):
        if key in mc and isinstance(mc[key], list):
            mc[key] = tuple(mc[key])
    model_cfg = ModelConfig(**{k: v for k, v in mc.items()
                               if k in ModelConfig.__dataclass_fields__})
    return _unflatten(flat), model_cfg, card.get("metadata", {})
