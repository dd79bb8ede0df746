"""Torch state_dict import harness (bin_tpu/import_torch.py).

The reference's real checkpoints are unavailable (SURVEY.md §0), so the
mapping is validated round-trip against bin_tpu's own layout torchified by
``to_torch_state_dict`` — the same property that must hold for a real
reference checkpoint once its rename rules are added (docs/PARITY.md).
"""

import numpy as np
import pytest

import jax

from bin_tpu.config import get_config
from bin_tpu.import_torch import (
    DEFAULT_RULES, convert_state_dict, import_torch_checkpoint,
    to_torch_state_dict, validate_against_template,
)
from bin_tpu.registry import build_model


def tiny_model():
    cfg = get_config("config3_prf", [
        "model.base_features=8", "model.convlstm_features=16",
        "model.num_res_blocks=1",
    ])
    return build_model(cfg)


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    params = model.init(jax.random.key(0), height=32, width=32)
    return model, params


def _assert_trees_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    # same structure
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(np.asarray, b))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), str(path))


def test_round_trip_exact(model_and_params):
    _, params = model_and_params
    sd = to_torch_state_dict(params)
    # conv weights really are OIHW on the torch side
    k = sd["level_1.head.Conv_0.weight"]
    assert k.ndim == 4 and k.shape[2:] == (3, 3)
    back = convert_state_dict(sd)
    _assert_trees_equal(params, back)


def test_validation_reports_everything(model_and_params):
    model, params = model_and_params
    sd = to_torch_state_dict(params)
    del sd["level_1.tail.bias"]                       # missing
    sd["level_9.bogus.weight"] = np.zeros((4, 4, 3, 3), np.float32)  # extra
    # unpermuted conv weight (simulates a mapping that forgot the transpose)
    w = sd["level_1.head.Conv_0.weight"]
    tree = convert_state_dict(sd)
    tree["level_1"]["head"]["Conv_0"]["kernel"] = w  # OIHW where HWIO expected
    problems = validate_against_template(tree, params)
    text = "\n".join(problems)
    assert "MISSING  level_1/tail/bias" in text
    assert "UNEXPECTED  level_9/bogus/kernel" in text
    assert "SHAPE  level_1/head/Conv_0/kernel" in text
    assert "unpermuted OIHW" in text


def test_gate_reorder_recovers_permuted_gates(model_and_params):
    _, params = model_and_params
    sd = to_torch_state_dict(params)
    # simulate a reference checkpoint storing gate blocks as (i, g, f, o):
    # swap blocks 1 and 2 of every gates tensor (channel axis 0 in torch)
    for key in list(sd):
        if ".gates." in key:
            blocks = np.split(sd[key], 4, axis=0)
            sd[key] = np.concatenate(
                [blocks[0], blocks[2], blocks[1], blocks[3]], axis=0)
    # importing with the matching reorder permutation restores our layout
    back = convert_state_dict(sd, gate_reorder=(0, 2, 1, 3))
    _assert_trees_equal(params, back)
    # ...and without it, the trees differ (kernel init is random-nonzero,
    # bias init is zeros — compare the kernel)
    wrong = convert_state_dict(sd)
    g = np.asarray(params["lstm_1"]["gates"]["kernel"])
    assert not np.array_equal(np.asarray(wrong["lstm_1"]["gates"]["kernel"]), g)


def test_file_import_with_dataparallel_prefix(tmp_path, model_and_params):
    torch = pytest.importorskip("torch")
    model, params = model_and_params
    sd = {f"module.{k}": torch.from_numpy(np.array(v))
          for k, v in to_torch_state_dict(params).items()}
    # extra buffer key that the default rules must drop
    sd["module.level_1.bn.num_batches_tracked"] = torch.tensor(7)
    path = tmp_path / "ref.pth"
    torch.save({"state_dict": sd, "epoch": 3}, path)
    tree = import_torch_checkpoint(str(path), model, strict=True)
    _assert_trees_equal(params, tree)


def test_imported_params_run_forward(tmp_path, model_and_params):
    torch = pytest.importorskip("torch")
    model, params = model_and_params
    path = tmp_path / "ref.pth"
    torch.save({k: torch.from_numpy(np.array(v))
                for k, v in to_torch_state_dict(params).items()}, path)
    tree = import_torch_checkpoint(str(path), model)
    blurry = np.random.default_rng(0).random((1, 6, 32, 32, 3), np.float32)
    video_a, _ = jax.jit(model.infer_clip)(params, blurry)
    video_b, _ = jax.jit(model.infer_clip)(tree, blurry)
    np.testing.assert_array_equal(np.asarray(video_a), np.asarray(video_b))


def test_strict_raises_on_mismatch(tmp_path, model_and_params):
    torch = pytest.importorskip("torch")
    model, params = model_and_params
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in to_torch_state_dict(params).items()}
    del sd["level_1.tail.bias"]
    path = tmp_path / "bad.pth"
    torch.save(sd, path)
    with pytest.raises(ValueError, match="MISSING"):
        import_torch_checkpoint(str(path), model, strict=True)
