"""CPU-scale QAT value experiment (committed evidence, BASELINE.md round 3
session 3): overfit a tiny PRF so its weights carry fine detail (the regime
where int8 PTQ costs dB at full scale), measure the int8-all gap, then a
short fake-quant fine-tune (model.conv_int8_qat) and re-measure.
Measured on this host (1-core CPU, ~35 min): gap 0.759 dB -> 0.155 dB
(+0.734 recovered), float eval unchanged (+0.13).  Supports the queued
chip-scale 2k-step fine-tune (tools/round3_queue8.sh).  Run:
  python tools/qat_value_experiment.py
"""
import dataclasses

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import os
import sys

# tools/ scripts must run without the editable install (a VM reset wipes
# site-packages): put the repo root ahead of sys.path[0]=tools/.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bin_tpu.config import get_config
from bin_tpu.registry import build_model
from bin_tpu.training.state import create_train_state
from bin_tpu.training.trainer import make_train_step
from bin_tpu.data.pipeline import SyntheticSource
from bin_tpu.evaluation.evaluator import clip_metrics_fn

ov = ["model.base_features=16", "model.num_res_blocks=1",
      "model.convlstm_features=32", "data.crop_size=32,32", "data.batch_size=2"]
cfg = get_config("config3_prf", ov)
model = build_model(cfg)
state = create_train_state(cfg, model, jax.random.key(0))
src = SyntheticSource(2, 6, 32, 32, seed=0)  # TWO clips, fixed
batch = {"blurry": np.stack([src[0]["blurry"], src[1]["blurry"]]),
         "sharp": np.stack([src[0]["sharp"], src[1]["sharp"]])}
batch = jax.tree.map(jnp.asarray, batch)
step = make_train_step(model, cfg)
for i in range(2500):
    state, aux = step(state, batch)
print("overfit loss:", float(aux["loss_total"]))

def ev(m, params):
    fn, _ = clip_metrics_fn(m, 6)
    out = fn(params, batch["blurry"], batch["sharp"])
    return float(np.mean(np.asarray(out["psnr"]["overall"])))

m_f = model
m_i8 = build_model(dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, conv_int8=True)))
p = state.params
f0, i0 = ev(m_f, p), ev(m_i8, p)
print(f"float eval: {f0:.3f}  int8-all eval: {i0:.3f}  gap: {f0-i0:.3f}")

cfg_q = dataclasses.replace(cfg,
    model=dataclasses.replace(cfg.model, conv_int8_qat=True),
    optim=dataclasses.replace(cfg.optim, learning_rate=2.5e-5))
m_q = build_model(cfg_q)
state_q = create_train_state(cfg_q, m_q, jax.random.key(0)).replace(params=p)
step_q = make_train_step(m_q, cfg_q)
for i in range(300):
    state_q, auxq = step_q(state_q, batch)
pq = state_q.params
f1, i1 = ev(m_f, pq), ev(m_i8, pq)
print(f"after 300-step QAT ft: float {f1:.3f}  int8-all {i1:.3f}  gap: {f1-i1:.3f}")
print(f"int8 recovery: {i1-i0:+.3f} dB (target: close the {f0-i0:.3f} gap)")
