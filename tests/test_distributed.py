"""REAL multi-process distributed test: 2 OS processes x 2 fake CPU devices
each, joined by jax.distributed.initialize into a 4-device global mesh.

This exercises what the in-process 8-fake-device tests cannot: coordinator
handshake, cross-process collectives (Gloo — the CPU stand-in for DCN),
jax.make_array_from_process_local_data assembly in mesh.shard_batch /
replicated, and process_batch_slice.  The reference has no multi-node story
at all (single-process DataParallel, SURVEY.md §6.8) — this validates the
TPU-native upgrade path end to end.
"""

import dataclasses
import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_worker_pair(per_rank_args, timeout=420, attempts=3):
    """Launch the 2-process worker pair; retry on HANDSHAKE flakes only.

    The coordinator handshake (jax.distributed.initialize over Gloo) has a
    fixed internal deadline, and this host has ONE CPU core — when another
    heavy process holds it (e.g. the live training chain), a rank can miss
    the barrier and exit nonzero.  The retries convert that load flake into
    a pass (two retries: a 2026-08-20 run concurrent with an on-chip eval
    chain flaked the Gloo init on two consecutive attempts, then passed in
    isolation).  The retry is SCOPED to the flake's signature (a pair
    timeout or a coordination/Gloo-init error in the worker log) — an
    assertion-style worker failure fails immediately, so an intermittent
    real regression cannot hide behind the retry (ADVICE r4).

    per_rank_args: list of extra argv lists, one per rank (after port/rank),
    or a callable attempt_index -> such a list (for tests whose scratch state
    must be fresh on retry, e.g. a shared train workdir).
    """
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    last_logs, last_rcs = [], []
    for attempt in range(attempts):
        rank_args = (per_rank_args(attempt) if callable(per_rank_args)
                     else per_rank_args)
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i)] + rank_args[i],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for i in range(2)]
        logs = []
        timed_out = False
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                out = "<timed out>"
                timed_out = True
            logs.append(out)
        last_logs = logs
        last_rcs = [p.returncode for p in procs]
        if not timed_out and all(rc == 0 for rc in last_rcs):
            return logs
        # retry only the known load-flake signatures; anything else (e.g.
        # an AssertionError inside a worker) is a real failure NOW.  The
        # signatures are deliberately narrow (no bare "barrier": normal
        # coordination chatter mentions it) and an AssertionError anywhere
        # vetoes the retry even when a flake signature also matches — a
        # real regression wrapped in a GRPC error must not hide here.
        assertion_failure = any("AssertionError" in log for log in logs)
        handshake_flake = not assertion_failure and (timed_out or any(
            sig in log for log in logs
            for sig in ("DEADLINE_EXCEEDED", "UNAVAILABLE",
                        "coordination service",
                        "Gloo context initialization failed",
                        "Connect timeout")))
        if not handshake_flake or attempt == attempts - 1:
            break
        print(f"worker pair attempt {attempt + 1} hit a handshake flake "
              f"(rcs={last_rcs}, timed_out={timed_out}) — retrying")
    pytest.fail("distributed worker pair failed: rcs="
                f"{last_rcs}\nrank0:\n{last_logs[0][-3000:]}\n"
                f"rank1:\n{last_logs[1][-3000:]}")


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dist")
    outs = [str(tmp / f"rank{i}.json") for i in range(2)]
    _run_worker_pair([[outs[0]], [outs[1]]])
    return [json.load(open(o)) for o in outs]


def test_ranks_agree_bitwise(worker_results):
    r0, r1 = worker_results
    assert r0["loss_total"] == r1["loss_total"]
    assert r0["param_digest"] == r1["param_digest"]


def test_matches_single_process_step(worker_results):
    """The 2-process 4-device DP step must equal the plain single-process
    step on the same global batch (same contract as
    test_parallel.test_data_parallel_step_matches_single_device)."""
    from bin_tpu.registry import build_model
    from bin_tpu.training.state import create_train_state
    from bin_tpu.training.trainer import make_train_step
    from tests.dist_worker import global_batch, tiny_cfg

    cfg = tiny_cfg()
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0))
    batch = global_batch(cfg)
    step = make_train_step(model, cfg)
    _, aux = step(state, jax.tree.map(jnp.asarray, batch))
    np.testing.assert_allclose(worker_results[0]["loss_total"],
                               float(aux["loss_total"]), rtol=1e-5)


def test_process_batch_slice_single_process():
    from bin_tpu.parallel.distributed import process_batch_slice
    assert process_batch_slice(8) == (8, 0)


def test_train_entry_two_processes(tmp_path):
    """The PUBLIC train() entry under 2 real processes: shared workdir,
    global batch sharded per process, orbax multi-process checkpointing,
    one JSONL writer.  This is the multi-host upgrade path working through
    the same code a single-host user runs (SURVEY.md §6.8)."""
    workdirs = [str(tmp_path / f"run{a}") for a in range(2)]
    _run_worker_pair(lambda a: [[workdirs[a], "train"]] * 2)
    workdir = next(w for w in reversed(workdirs) if os.path.isdir(w))
    # process 0 logged every step, once
    records = [json.loads(l) for l in
               open(os.path.join(workdir, "metrics.jsonl"))]
    assert [r["step"] for r in records] == [1, 2, 3, 4]
    assert all(np.isfinite(r["loss_total"]) for r in records)
    # a valid multi-process checkpoint landed at step 4
    assert os.path.isdir(os.path.join(workdir, "checkpoints"))
    names = os.listdir(os.path.join(workdir, "checkpoints"))
    assert any(n.rstrip("/").endswith("4") for n in names), names
