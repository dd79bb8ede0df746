"""In-repo released weights stay loadable.

The reference ships pretrained state_dict files in its repo (SURVEY.md
§3.2 'Model factory' load-pretrained); bin-tpu versions its release .npz
files under weights/ (fp16 storage, see bin_tpu/weights.py).  This guard
makes a stale release impossible to miss: every committed weights file
must carry a readable model card, the CURRENT ops_version, and a param
tree that matches what the card's model config builds today.
"""

import glob
import os

import numpy as np
import pytest

import jax

from bin_tpu.registry import build_model
from bin_tpu.weights import OPS_VERSION, load_weights, read_card

WEIGHTS = sorted(
    p for p in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "weights", "*.npz"))
    # *.scales.npz are calibrated int8 activation scales
    # (tools/calibrate_int8.py sidecars), not release checkpoints — they
    # carry no params/card and are covered by tests/test_quant.py
    if not p.endswith(".scales.npz"))

# Releases exported before the quality-provenance guard existed (VERDICT r3
# weak #3).  Legacy entries are tolerated until replaced — do NOT add new
# releases here: every new export must carry its eval record
# (bin-tpu-export --eval-json).  Empty since round 4 retired the last
# pre-provenance release (prf_ext10k_ema_r3.npz).
LEGACY_NO_QUALITY = set()

pytestmark = pytest.mark.skipif(
    not WEIGHTS, reason="no release weights committed in this checkout")


@pytest.mark.parametrize("path", WEIGHTS, ids=os.path.basename)
def test_release_card_is_current(path):
    card = read_card(path)
    assert card["ops_version"] == OPS_VERSION, (
        f"{path} was exported under ops_version {card['ops_version']}; "
        f"current ops are {OPS_VERSION} — revalidate the pinned eval under "
        "the new ops and update the sidecar card (bin_tpu.weights."
        "update_card, metadata.ops_reval) or re-export")
    assert card["metadata"].get("preset"), "card must name its preset"


@pytest.mark.parametrize("path", WEIGHTS, ids=os.path.basename)
def test_release_card_carries_quality_provenance(path):
    """A committed release must state what it scores and under which
    protocol (VERDICT r3: the round-3 release shipped with NO recorded
    quality — headline numbers cited artifacts that no longer existed)."""
    if os.path.basename(path) in LEGACY_NO_QUALITY:
        pytest.skip("legacy pre-provenance release (to be replaced)")
    meta = read_card(path)["metadata"]
    assert isinstance(meta.get("psnr_overall"), float) and \
        np.isfinite(meta["psnr_overall"]), "card must record psnr_overall"
    assert isinstance(meta.get("ssim_overall"), float), \
        "card must record ssim_overall"
    proto = meta.get("eval_protocol")
    assert isinstance(proto, dict) and {"size", "clips", "keys", "seed",
                                        "dtype", "params"} <= set(proto), \
        "card must record the full eval protocol"


@pytest.mark.parametrize("path", WEIGHTS, ids=os.path.basename)
def test_release_matches_model_init_tree(path):
    params, model_cfg, _meta = load_weights(path)
    model = build_model(model_cfg)
    want = model.init(jax.random.key(0))
    got_paths = {str(p) for p, _ in jax.tree.leaves_with_path(params)}
    want_paths = {str(p) for p, _ in jax.tree.leaves_with_path(want)}
    assert got_paths == want_paths
    for (p, a), (_, b) in zip(
            sorted(jax.tree.leaves_with_path(params), key=lambda x: str(x[0])),
            sorted(jax.tree.leaves_with_path(want), key=lambda x: str(x[0]))):
        assert np.asarray(a).shape == np.asarray(b).shape, p
        assert np.asarray(a).dtype == np.float32, p  # load upcasts storage
        assert np.all(np.isfinite(np.asarray(a))), p
