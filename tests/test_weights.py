"""Released-weights format: export/load round trip + demo CLI consumption
(reference: pretrained state_dict + demo.py — SURVEY.md §3.2/§4.2)."""

import os

import numpy as np

import jax

from bin_tpu.config import ModelConfig
from bin_tpu.registry import build_model
from bin_tpu.weights import export_weights, load_weights

SMALL = ModelConfig(name="prf", base_features=8, channel_mult=(1, 2, 4),
                    num_res_blocks=1, convlstm_features=16, stem_factor=2)


def test_export_load_roundtrip(tmp_path):
    model = build_model(SMALL)
    params = model.init(jax.random.key(0))
    path = str(tmp_path / "weights.npz")
    export_weights(path, params, SMALL, metadata={"preset": "test", "step": 7})

    params2, cfg2, meta = load_weights(path)
    assert cfg2 == build_model(SMALL).cfg  # normalized model config survives
    assert meta == {"preset": "test", "step": 7}
    flat1 = jax.tree.leaves_with_path(params)
    flat2 = jax.tree.leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(sorted(flat1, key=lambda x: str(x[0])),
                                sorted(flat2, key=lambda x: str(x[0]))):
        assert str(p1) == str(p2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # loaded weights drive the model identically
    rng = np.random.default_rng(0)
    clip = rng.uniform(0, 1, (1, 6, 32, 32, 3)).astype(np.float32)
    v1, _ = model.infer_clip(params, clip)
    model2 = build_model(cfg2)
    v2, _ = model2.infer_clip(params2, clip)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_export_float16_storage_roundtrip(tmp_path):
    """fp16 storage halves the file; load upcasts every float leaf back to
    float32 and the card records the storage dtype (what lets the released
    weights live in-repo)."""
    model = build_model(SMALL)
    params = model.init(jax.random.key(0))
    p32 = str(tmp_path / "w32.npz")
    p16 = str(tmp_path / "w16.npz")
    export_weights(p32, params, SMALL)
    export_weights(p16, params, SMALL, store_dtype="float16")
    assert os.path.getsize(p16) < 0.6 * os.path.getsize(p32)

    from bin_tpu.weights import read_card
    assert read_card(p16)["store_dtype"] == "float16"
    assert "store_dtype" not in read_card(p32)

    params16, cfg2, _ = load_weights(p16)
    assert cfg2 == build_model(SMALL).cfg
    for (pth, a), (_, b) in zip(
            sorted(jax.tree.leaves_with_path(params), key=lambda x: str(x[0])),
            sorted(jax.tree.leaves_with_path(params16), key=lambda x: str(x[0]))):
        b = np.asarray(b)
        assert b.dtype == np.float32, pth
        np.testing.assert_array_equal(
            np.asarray(a).astype(np.float16).astype(np.float32), b)

    import pytest
    with pytest.raises(ValueError):
        export_weights(str(tmp_path / "bad.npz"), params, SMALL,
                       store_dtype="int8")


def test_demo_cli_consumes_weights(tmp_path):
    from bin_tpu.cli import demo_main

    model = build_model(SMALL)
    params = model.init(jax.random.key(1))
    path = str(tmp_path / "w.npz")
    export_weights(path, params, SMALL, metadata={"preset": "test"})

    out = str(tmp_path / "out")
    demo_main(["--weights", path, "--input", "synthetic",
               "--out", out, "--size", "64", "64", "--keys", "6"])
    pngs = os.listdir(os.path.join(out, "demo"))
    assert len(pngs) == 9  # 2*6-3 covered timestamps
    assert all(p.endswith(".png") for p in pngs)


def test_restore_params_accepts_npz(tmp_path):
    """eval --checkpoint / train --init-from accept a released .npz
    (load-pretrained flow, SURVEY.md §3.2)."""
    import jax
    import numpy as np

    from bin_tpu.config import get_config
    from bin_tpu.registry import build_model
    from bin_tpu.training.checkpoint import restore_params
    from bin_tpu.weights import export_weights

    cfg = get_config("config1_backbone_128", [
        "model.base_features=8", "model.num_res_blocks=1"])
    model = build_model(cfg)
    params = model.init(jax.random.key(0), height=32, width=32)
    path = str(tmp_path / "w.npz")
    export_weights(path, params, cfg.model)
    restored = restore_params(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_read_card_light(tmp_path):
    """read_card returns the embedded card without loading param arrays."""
    import dataclasses

    import jax

    from bin_tpu.config import get_config
    from bin_tpu.registry import build_model
    from bin_tpu.weights import export_weights, read_card

    cfg = get_config("config1_backbone_128", ["model.base_features=8"])
    model = build_model(cfg)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    p = str(tmp_path / "w.npz")
    export_weights(p, params, cfg.model, {"psnr_overall": 12.34, "step": 7})
    card = read_card(p)
    assert card["metadata"]["psnr_overall"] == 12.34
    assert card["model"]["base_features"] == 8


def test_sidecar_card_and_update(tmp_path):
    """The model card is mirrored to a sidecar JSON; update_card rewrites
    ONLY the sidecar (the npz blob stays byte-identical — the property that
    keeps git history from growing per card change, ADVICE r3)."""
    from bin_tpu.weights import card_path, read_card, update_card

    model = build_model(SMALL)
    params = model.init(jax.random.key(0))
    path = str(tmp_path / "w.npz")
    export_weights(path, params, SMALL, metadata={"preset": "test"})

    side = card_path(path)
    assert os.path.exists(side)
    with open(path, "rb") as f:
        blob_before = f.read()

    card = update_card(path, metadata={"psnr_overall": 28.5},
                       ops_version=99)
    assert card["metadata"]["psnr_overall"] == 28.5
    assert card["metadata"]["preset"] == "test"   # merged, not replaced
    assert card["ops_version"] == 99              # top-level replaced
    with open(path, "rb") as f:
        assert f.read() == blob_before, "update_card must not touch the npz"

    # read_card prefers the sidecar; load_weights sees the updated metadata
    assert read_card(path)["ops_version"] == 99
    _, _, meta = load_weights(path)
    assert meta["psnr_overall"] == 28.5

    # without the sidecar, the embedded card still serves (portability)
    os.remove(side)
    assert read_card(path)["ops_version"] != 99


def test_export_cli_folds_eval_record_into_card(tmp_path):
    """bin-tpu-export --eval-json puts the eval's numbers + protocol into
    the card metadata — the provenance the release guard test enforces."""
    import json

    from bin_tpu.weights import read_card

    # a released .npz doubles as the "checkpoint" (restore_params accepts it)
    model = build_model(SMALL)
    params = model.init(jax.random.key(0))
    ckpt = str(tmp_path / "ckpt.npz")
    export_weights(ckpt, params, SMALL, metadata={"preset": "test"})

    ev = tmp_path / "eval.json"
    ev.write_text(json.dumps({
        "protocol": {"size": [64, 64], "clips": 1, "keys": 6, "seed": 9999,
                     "style": "textured", "dtype": "float32", "params": "raw"},
        "model": {"psnr_overall": 28.1234, "ssim_overall": 0.7999},
        "baseline": {"psnr_overall": 25.0},
    }))
    out = str(tmp_path / "release.npz")
    from bin_tpu.cli import export_main
    export_main(["--preset", "config1_backbone_128", "--platform", "cpu",
                 "--set", "model.base_features=8",
                 "--checkpoint", ckpt, "--out", out,
                 "--eval-json", str(ev)])
    meta = read_card(out)["metadata"]
    assert meta["psnr_overall"] == 28.1234
    assert meta["ssim_overall"] == 0.7999
    assert meta["eval_protocol"]["size"] == [64, 64]
    assert meta["evals"][0]["baseline"]["psnr_overall"] == 25.0


def test_export_rejects_nonfloat32_tree_with_store_dtype(tmp_path):
    """store_dtype's load-time upcast to float32 is only lossless for an
    all-float32 tree; anything else must be refused, not silently retyped
    (ADVICE r3)."""
    import pytest

    model = build_model(SMALL)
    params = jax.tree.map(lambda x: np.asarray(x, np.float16),
                          model.init(jax.random.key(0)))
    with pytest.raises(ValueError, match="float32"):
        export_weights(str(tmp_path / "w.npz"), params, SMALL,
                       store_dtype="float16")
