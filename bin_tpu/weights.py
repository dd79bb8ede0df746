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

__all__ = ["export_weights", "load_weights", "read_card", "update_card",
           "card_path", "OPS_VERSION"]

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
        # load_weights restores every float leaf to float32, so the round
        # trip is only faithful when every float leaf IS float32 going in
        # (true for this framework: master weights are always fp32,
        # ModelConfig.param_dtype).  Enforce it rather than silently
        # re-typing e.g. a bf16-trained tree (ADVICE r3).
        nonf32 = [k for k, v in flat.items()
                  if v.dtype.kind == "f" and v.dtype != np.float32]
        if nonf32:
            raise ValueError(
                "store_dtype round-trips only float32 trees; non-float32 "
                f"float leaves: {nonf32[:3]}{'...' if len(nonf32) > 3 else ''}")
        flat = {k: v.astype(dt) if v.dtype.kind == "f" else v
                for k, v in flat.items()}
        card["store_dtype"] = dt.name
    flat[_CARD_KEY] = np.frombuffer(
        json.dumps(card).encode("utf-8"), dtype=np.uint8)
    np.savez(path, **flat)
    # Mirror the card to a sidecar JSON: later provenance updates (new eval
    # numbers, ops-drift revalidation) rewrite THIS small file, never the
    # hundreds-of-MB npz blob — so git history grows by bytes, not by a new
    # weights blob per card change (ADVICE r3 medium).
    with open(card_path(path), "w") as f:
        json.dump(card, f, indent=1)


def card_path(path: str) -> str:
    """The sidecar-card path for a weights file: foo.npz -> foo.card.json."""
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".card.json"


def read_card(path: str) -> dict:
    """Read the model card of a released-weights file.

    The sidecar JSON (``card_path(path)``) wins over the card embedded in
    the npz — provenance updates go to the sidecar so the weights blob stays
    immutable.  Reading the embedded card costs one small zip entry (npz
    members load lazily), not the parameter arrays."""
    import os
    side = card_path(path)
    if os.path.exists(side):
        with open(side) as f:
            return json.load(f)
    with np.load(path) as data:
        return json.loads(bytes(data[_CARD_KEY]).decode("utf-8"))


def update_card(path: str, **fields: Any) -> dict:
    """Merge ``fields`` into the weights file's card via the sidecar JSON.

    Top-level keys are replaced except ``metadata``, which is merged
    key-by-key.  The npz itself is untouched.  Returns the updated card."""
    card = read_card(path)
    meta = fields.pop("metadata", None)
    card.update(fields)
    if meta:
        card.setdefault("metadata", {}).update(meta)
    with open(card_path(path), "w") as f:
        json.dump(card, f, indent=1)
    return card


def load_weights(path: str) -> tuple[dict, ModelConfig, dict]:
    """Read a weights file -> (params, ModelConfig, metadata)."""
    data = np.load(path)
    card = read_card(path)
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
