"""Streaming session tests: coverage, ordering, and equivalence of carried
state with the batch clip scan."""

import dataclasses

import jax
import numpy as np

from bin_tpu.config import ModelConfig
from bin_tpu.evaluation.streaming import StreamingSession
from bin_tpu.registry import build_model

SMALL = ModelConfig(name="prf", base_features=8, channel_mult=(1, 2, 4),
                    num_res_blocks=1, convlstm_features=16, stem_factor=1)


def _clip(b, k, h, w, seed=0):
    return (np.random.default_rng(seed)
            .uniform(0, 1, (b, k, h, w, 3)).astype(np.float32))


def test_streaming_contiguous_coverage():
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    sess = StreamingSession(model, params, batch=1, height=32, width=32)
    clip = _clip(1, 8, 32, 32)
    emitted = []
    for i in range(8):
        for t, frame in sess.push(clip[:, i]):
            emitted.append(t)
            assert frame.shape == (1, 32, 32, 3)
    # keys 0..7 → windows at 0..4 → contiguous steady coverage of 1..11
    assert emitted == list(range(1, 12))
    # end-of-stream flush emits the last window's trailing times
    emitted += [t for t, _ in sess.flush()]
    assert emitted == list(range(1, 14))
    assert sess.flush() == []  # idempotent


def test_streaming_reset_reproduces():
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    sess = StreamingSession(model, params, batch=1, height=32, width=32)
    clip = _clip(1, 5, 32, 32, seed=1)
    out1 = [f for i in range(5) for _, f in sess.push(clip[:, i])]
    sess.reset()
    out2 = [f for i in range(5) for _, f in sess.push(clip[:, i])]
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(a, b)


def test_streaming_state_matches_clip_scan():
    """After streaming a clip, ConvLSTM carries must equal the batch scan's
    final states — the streaming path IS the scan, step by step."""
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    clip = _clip(1, 6, 32, 32, seed=2)

    _, final_states = jax.jit(model.forward_clip)(params, clip)

    sess = StreamingSession(model, params, batch=1, height=32, width=32)
    for i in range(6):
        sess.push(clip[:, i])
    for (h_s, c_s), (h_f, c_f) in zip(sess.states, final_states):
        np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_f), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_f), atol=1e-5)


def test_streaming_interp_only_model():
    model = build_model(dataclasses.replace(SMALL, name="backbone"))
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    sess = StreamingSession(model, params, batch=1, height=32, width=32)
    clip = _clip(1, 6, 32, 32)
    times = [t for i in range(6) for t, _ in sess.push(clip[:, i])]
    times += [t for t, _ in sess.flush()]
    assert times == [1, 3, 5, 7, 9]  # odd (midpoint) times only


def test_drain_equals_direct_materialization():
    """Batched drain() (device-resident ring buffer, one stacked fetch)
    returns exactly the frames push()/flush() return directly."""
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    clip = _clip(1, 8, 32, 32, seed=3)

    direct = {}
    s1 = StreamingSession(model, params, batch=1, height=32, width=32)
    for i in range(8):
        for t, f in s1.push(clip[:, i]):
            direct[t] = np.asarray(f)
    for t, f in s1.flush():
        direct[t] = np.asarray(f)

    s2 = StreamingSession(model, params, batch=1, height=32, width=32,
                          buffer_drain=True)
    for i in range(8):
        s2.push(clip[:, i])
    s2.flush()
    drained = dict(s2.drain())
    assert sorted(drained) == sorted(direct)
    for t in direct:
        np.testing.assert_allclose(direct[t], drained[t], atol=1e-6)
    assert s2.drain() == []  # buffer cleared

    # without buffer_drain, nothing is retained
    assert s1.drain() == []


def test_push_uint8_matches_float():
    """uint8 push (device-side /255) emits the same frames as float push."""
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(0, 256, (1, 6, 32, 32, 3), dtype=np.uint8)
    frames_f32 = frames_u8.astype(np.float32) / 255.0

    outs = {}
    for name, clip in (("u8", frames_u8), ("f32", frames_f32)):
        sess = StreamingSession(model, params, batch=1, height=32, width=32)
        got = []
        for i in range(clip.shape[1]):
            got += sess.push(clip[:, i])
        got += sess.flush()
        outs[name] = {t: np.asarray(f) for t, f in got}
    assert outs["u8"].keys() == outs["f32"].keys()
    for t in outs["u8"]:
        np.testing.assert_allclose(outs["u8"][t], outs["f32"][t],
                                   atol=1e-6, rtol=0)


def test_drain_emit_u8():
    """emit_u8 drains device-quantized uint8 frames matching the fp32 path."""
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)
    clip = _clip(1, 6, 32, 32)
    outs = {}
    for u8 in (False, True):
        sess = StreamingSession(model, params, batch=1, height=32, width=32,
                                buffer_drain=True, emit_u8=u8)
        for i in range(6):
            assert sess.push(clip[:, i]) == []  # serving mode returns []
        sess.flush()
        outs[u8] = dict(sess.drain())
    assert outs[True].keys() == outs[False].keys()
    for t, f_u8 in outs[True].items():
        assert f_u8.dtype == np.uint8
        ref = np.round(np.clip(outs[False][t], 0, 1) * 255).astype(np.uint8)
        # device vs host rounding may differ by 1 on exact-half values
        assert np.abs(f_u8.astype(int) - ref.astype(int)).max() <= 1


def test_async_drain_equals_buffered(devices):
    """async_drain (in-step finalize + background fetch thread) must deliver
    exactly the frames the buffered drain path delivers — poll() over the
    stream plus final drain() covers every emission once, u8 and fp32."""
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=2, height=32, width=32)
    clip = _clip(2, 8, 32, 32, seed=11)

    for u8 in (False, True):
        s_buf = StreamingSession(model, params, batch=2, height=32, width=32,
                                 buffer_drain=True, emit_u8=u8)
        for i in range(8):
            s_buf.push(clip[:, i])
        s_buf.flush()
        want = dict(s_buf.drain())

        s_async = StreamingSession(model, params, batch=2, height=32,
                                   width=32, emit_u8=u8, async_drain=True)
        got = {}
        for i in range(8):
            s_async.push(clip[:, i])
            for t, f in s_async.poll():
                assert t not in got
                got[t] = f
        s_async.flush()
        for t, f in s_async.drain():
            assert t not in got
            got[t] = f
        assert sorted(got) == sorted(want)
        for t in want:
            assert got[t].dtype == want[t].dtype
            if u8:
                # in-step finalize computes round(clip(x)*255) in one fused
                # program; allow 1 ulp of quantization disagreement
                assert np.max(np.abs(got[t].astype(np.int16)
                                     - want[t].astype(np.int16))) <= 1
            else:
                np.testing.assert_allclose(got[t], want[t], atol=1e-6)

        # reset clears in-flight + ready state
        s_async.reset()
        assert s_async.poll() == [] and s_async.drain() == []


def test_sessions_share_jitted_programs():
    """Round-5 serving fix: the jitted session programs are cached on the
    Model handle, so a second same-config session reuses the first one's
    programs (when they were per-session closures, every new session paid
    its own trace + compile-cache deserialization — the 5-10 s mid-stream
    stalls in runs/serving_http_r5b.json).  Different (emit_u8,
    async_drain) configs get distinct programs."""
    model = build_model(SMALL)
    params = model.init(jax.random.key(0), batch=1, height=32, width=32)

    a = StreamingSession(model, params, batch=1, height=32, width=32,
                         emit_u8=True, async_drain=True)
    b = StreamingSession(model, params, batch=2, height=32, width=32,
                         emit_u8=True, async_drain=True)  # batch differs: OK
    assert a._step_emit is b._step_emit
    assert a._insert is b._insert
    assert a._finalize_jit is b._finalize_jit
    assert a._plans is b._plans

    c = StreamingSession(model, params, batch=1, height=32, width=32,
                         emit_u8=False, async_drain=False)
    assert c._step_emit is not a._step_emit

    # a second model handle (even same config) gets its own cache
    model2 = build_model(SMALL)
    d = StreamingSession(model2, params, batch=1, height=32, width=32,
                         emit_u8=True, async_drain=True)
    assert d._step_emit is not a._step_emit

    # the shared programs actually run: push through the first window
    clip = _clip(1, 6, 32, 32)
    for i in range(6):
        a.push(clip[:, i])
        c.push(clip[:, i])
    a.flush()
    assert len(a.drain()) > 0
    assert len(c.flush()) > 0
    a.close(); b.close(); c.close(); d.close()
