"""Reference-checkpoint import: torch ``state_dict`` → bin_tpu params.

The reference ships pretrained PyTorch ``state_dict`` weights (SURVEY.md
§3.2 'Model factory' load-pretrained).  This module converts such a
checkpoint into a bin_tpu param tree so the day real reference weights (or
real datasets) appear, the 0.05 dB parity check (BASELINE.json:5) is blocked
on data only, not on new code (VERDICT r2 missing #3).

Design:

* **Name mapping** is a small ordered rule table (regex → replacement)
  applied to each torch key; the result is a '/'-joined path into the flax
  param tree.  The default table handles the canonical torchified naming of
  bin_tpu's own layout (``level_1.head.Conv_0.weight`` →
  ``level_1/head/Conv_0/kernel``) plus the universal cleanups (strip
  DataParallel's ``module.`` prefix, drop buffer keys).  When the real
  reference state_dict becomes available, its module paths are added as
  rules in a JSON mapping file — no code changes (see docs/PARITY.md).

* **Tensor conversion is shape-driven**, not name-driven: 4-D tensors are
  torch conv weights (O, I, kh, kw) and are permuted to flax's
  (kh, kw, I, O); 1-D tensors are biases and map directly.  ConvLSTM gate
  packing: both sides store the 4F gate channels of one fused conv in the
  order (i, f, g, o) (models/convlstm.py, tests/torch_twin.py), so no gate
  reordering is needed; a ``gate_reorder`` rule exists for reference
  checkpoints that pack gates differently.

* **Template validation**: the imported tree is checked leaf-by-leaf
  against ``model.init``'s tree — missing / unexpected / shape-mismatched
  entries are reported together, with the permuted shape that WOULD have
  matched, so diagnosing a wrong mapping table takes one run.

The reverse direction (``to_torch_state_dict``) exports bin_tpu params in
the same naming, which (a) lets torch users consume released weights and
(b) makes the mapping round-trip testable without the reference
(tests/test_import_torch.py).
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterable, Mapping

import numpy as np

__all__ = [
    "DEFAULT_RULES", "convert_state_dict", "to_torch_state_dict",
    "validate_against_template", "import_torch_checkpoint", "import_cli",
]

# Ordered (pattern, replacement) regex rules over torch keys. First the
# universal cleanups, then the canonical bin_tpu naming. ``None`` replacement
# = drop the key (torch buffers that have no flax analog).
DEFAULT_RULES: tuple[tuple[str, str | None], ...] = (
    (r"^module\.", ""),                      # nn.DataParallel wrapper prefix
    (r"num_batches_tracked$", None),         # BN buffers (no BN in BIN, but
    (r"running_(mean|var)$", None),          # harmless to drop if present)
    (r"\.weight$", "/kernel"),               # conv/linear weight → kernel
    (r"\.bias$", "/bias"),
    (r"\.", "/"),                            # module path sep → tree sep
)


def _apply_rules(key: str, rules: Iterable[tuple[str, str | None]]) -> str | None:
    for pat, repl in rules:
        if repl is None:
            if re.search(pat, key):
                return None
        else:
            key = re.sub(pat, repl, key)
    return key


def _to_flax_tensor(name: str, t: np.ndarray) -> np.ndarray:
    """Shape-driven torch→flax tensor conversion."""
    if t.ndim == 4 and name.endswith("/kernel"):
        return np.transpose(t, (2, 3, 1, 0))  # (O,I,kh,kw) → (kh,kw,I,O)
    if t.ndim == 2 and name.endswith("/kernel"):
        return np.transpose(t, (1, 0))        # linear (O,I) → (I,O)
    return t


def _from_flax_tensor(name: str, t: np.ndarray) -> np.ndarray:
    if t.ndim == 4 and name.endswith("/kernel"):
        return np.transpose(t, (3, 2, 0, 1))
    if t.ndim == 2 and name.endswith("/kernel"):
        return np.transpose(t, (1, 0))
    return t


def _unflatten(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        *parents, leaf = key.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = value
    return tree


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def convert_state_dict(state_dict: Mapping[str, Any],
                       rules: Iterable[tuple[str, str | None]] = DEFAULT_RULES,
                       gate_reorder: tuple[int, int, int, int] | None = None,
                       ) -> dict:
    """torch state_dict (tensors or arrays) → nested flax param tree.

    ``gate_reorder``: permutation mapping the source checkpoint's ConvLSTM
    gate-block order onto bin_tpu's (i, f, g, o) — e.g. a checkpoint storing
    (i, g, f, o) needs (0, 2, 1, 3).  Applied to every tensor whose mapped
    path ends in ``gates/kernel`` or ``gates/bias`` (4F channel axis).
    """
    flat: dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        mapped = _apply_rules(key, rules)
        if mapped is None:
            continue
        arr = np.asarray(getattr(value, "detach", lambda: value)())
        arr = _to_flax_tensor(mapped, arr)
        if gate_reorder is not None and re.search(r"gates/(kernel|bias)$", mapped):
            blocks = np.split(arr, 4, axis=-1)
            arr = np.concatenate([blocks[i] for i in gate_reorder], axis=-1)
        if mapped in flat:
            raise ValueError(f"mapping collision: two torch keys map to {mapped!r}")
        flat[mapped] = arr
    return _unflatten(flat)


def to_torch_state_dict(params: Any) -> dict[str, np.ndarray]:
    """bin_tpu param tree → flat torch-style state_dict (numpy arrays,
    torch naming: '.'-joined, kernel→weight, OIHW conv layout)."""
    out: dict[str, np.ndarray] = {}
    for name, t in _flatten(params).items():
        arr = _from_flax_tensor(name, np.asarray(t))
        key = name.replace("/kernel", ".weight").replace("/bias", ".bias")
        out[key.replace("/", ".")] = arr
    return out


def validate_against_template(imported: Any, template: Any) -> list[str]:
    """Compare an imported tree against ``model.init``'s tree; returns a
    list of human-readable problems (empty = exact structural match)."""
    got = _flatten(imported)
    want = _flatten(template)
    problems = []
    for k in sorted(set(want) - set(got)):
        problems.append(f"MISSING  {k}  (expected shape {want[k].shape})")
    for k in sorted(set(got) - set(want)):
        problems.append(f"UNEXPECTED  {k}  (shape {got[k].shape})")
    for k in sorted(set(got) & set(want)):
        if got[k].shape != want[k].shape:
            hint = ""
            if got[k].ndim == 4 and np.transpose(got[k], (2, 3, 1, 0)).shape \
                    == want[k].shape:
                hint = "  [looks like an unpermuted OIHW conv weight]"
            problems.append(f"SHAPE  {k}: got {got[k].shape}, "
                            f"want {want[k].shape}{hint}")
    return problems


def import_torch_checkpoint(path: str, model, rules_path: str = "",
                            gate_reorder: tuple[int, int, int, int] | None = None,
                            strict: bool = True) -> dict:
    """Load a ``.pth``/``.pt`` checkpoint file, convert, validate.

    ``model``: a bin_tpu registry Model (its init tree is the template).
    ``rules_path``: optional JSON file with extra [pattern, replacement]
    rules PREPENDED to DEFAULT_RULES (reference-specific renames; null
    replacement drops the key).
    """
    import torch  # CPU torch is available in this environment (SURVEY.md §8)

    obj = torch.load(path, map_location="cpu", weights_only=False)
    # training checkpoints often nest the weights under a well-known key
    for k in ("state_dict", "model", "model_state_dict", "params"):
        if isinstance(obj, dict) and k in obj and isinstance(obj[k], dict):
            obj = obj[k]
            break
    rules = list(DEFAULT_RULES)
    if rules_path:
        with open(rules_path) as f:
            extra = [(p, r) for p, r in json.load(f)]
        rules = extra + rules
    tree = convert_state_dict(obj, rules, gate_reorder)
    import jax
    template = model.init(jax.random.key(0))
    problems = validate_against_template(tree, template)
    if problems:
        msg = "torch import does not match the model layout:\n  " + \
              "\n  ".join(problems)
        if strict:
            raise ValueError(msg)
        print("WARNING: " + msg)
    return tree


def import_cli(argv: list[str] | None = None) -> None:
    """CLI: torch checkpoint → released bin_tpu .npz weights."""
    import argparse

    from bin_tpu.cli import parse_config
    from bin_tpu.registry import build_model
    from bin_tpu.weights import export_weights

    cfg, args = parse_config(argv, "Import a PyTorch reference checkpoint.", {
        "--torch-checkpoint": dict(required=True, help=".pth/.pt state_dict"),
        "--out": dict(required=True, help="output .npz released-weights file"),
        "--rules": dict(default="", help="JSON [[pattern, replacement], ...] "
                                         "extra name-mapping rules"),
        "--gate-reorder": dict(default="", help="comma perm of ConvLSTM gate "
                                                "blocks onto (i,f,g,o), e.g. 0,2,1,3"),
        "--no-strict": dict(action="store_true",
                            help="warn instead of fail on layout mismatch"),
    })
    model = build_model(cfg)
    reorder = (tuple(int(x) for x in args.gate_reorder.split(","))
               if args.gate_reorder else None)
    params = import_torch_checkpoint(args.torch_checkpoint, model,
                                     rules_path=args.rules,
                                     gate_reorder=reorder,
                                     strict=not args.no_strict)
    export_weights(args.out, params, model.cfg,
                   metadata={"preset": cfg.preset,
                             "imported_from": args.torch_checkpoint})
    print(f"imported {args.torch_checkpoint} -> {args.out}")
