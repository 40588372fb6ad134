"""The reference tester's five invariants (src/runner/tester.cpp:318-378),
re-expressed for the pytree state model:

1. compress -> decompress roundtrip is byte-exact (test_roundtrip.py).
2. checkpoint mid-stream + restart in a fresh predictor produces a
   bit-identical archive AND re-serialised state equals the original
   (serialize . deserialize = identity).
3. in-memory Copy behaves identically to a disk roundtrip.
4. decompression survives a mid-stream checkpoint/restart.
5. generation leaves long-term memory bit-identical and advances short-term
   memory.
"""
import os

import jax
import numpy as np

import gmix_tpu as g
from gmix_tpu.core.codec import (
    Predictor,
    _pad_streams,
    _WORST_PER_BYTE,
    compress_bytes,
    decompress_bytes,
    generate_bytes,
    run_chunks,
)

DATA = (
    b"Compression is the art of prediction; prediction, the art of memory. " * 30
)[:2048]
CHUNK = 256


def _spec():
    return g.tiny_spec(with_lstm=True)


def _compress_with_restart(tmp_path, via_copy: bool):
    import jax.numpy as jnp

    spec = _spec()
    arr, per = _pad_streams(DATA, 1, CHUNK)
    cap = int(per + per // 2 + _WORST_PER_BYTE * CHUNK + 4096)

    pred = Predictor(spec, 1)
    data_buf = jnp.asarray(arr)
    code_buf = jnp.zeros((1, cap), jnp.uint8)
    half = (per // 2 // CHUNK) * CHUNK
    data_buf, code_buf, body_a = run_chunks(
        pred, data_buf, code_buf, half, decode=False, chunk=CHUNK
    )

    if via_copy:
        pred2 = pred.copy()
    else:
        ck = os.path.join(tmp_path, "ck.gxt")
        pred.save(ck)
        pred2 = Predictor(spec, 1)
        pred2.load(ck)
        # serialize . deserialize = identity (memory-interface.h contract)
        ck2 = os.path.join(tmp_path, "ck2.gxt")
        pred2.save(ck2)
        assert open(ck, "rb").read() == open(ck2, "rb").read()

    data_buf, code_buf, body_b = run_chunks(
        pred2, data_buf, code_buf, per - half, decode=False, t0=half, chunk=CHUNK
    )
    from gmix_tpu.ops import coder as coder_ops

    coder = jax.device_get(pred2.state["coder"])
    tail = coder_ops.flush_bytes(coder["x1"], coder["x2"])[0]
    return body_a[0] + body_b[0] + tail


def _compress_oneshot():
    spec = _spec()
    pred = Predictor(spec, 1)
    blob = compress_bytes(DATA, spec, 1, CHUNK, pred=pred)
    # strip container header: payload only
    import struct

    S = 1
    off = 40 + 8 * S
    return blob[off:], blob


def test_checkpoint_restart_bitexact(tmp_path):
    payload, _ = _compress_oneshot()
    assert _compress_with_restart(str(tmp_path), via_copy=False) == payload


def test_copy_restart_bitexact(tmp_path):
    payload, _ = _compress_oneshot()
    assert _compress_with_restart(str(tmp_path), via_copy=True) == payload


def test_decompression_with_restart(tmp_path):
    import jax.numpy as jnp

    spec = _spec()
    _, blob = _compress_oneshot()
    # decode the container manually in two halves with a checkpoint in between
    import struct

    ver, _f, S, orig, per, _h, _r = struct.unpack("<BBHQQQQ", blob[4:40])
    sizes = struct.unpack("<Q", blob[40:48])
    payload = blob[48 : 48 + sizes[0]]

    pred = Predictor(spec, 1)
    cap = len(payload) + 8
    codes = np.zeros((1, cap), np.uint8)
    codes[0, : len(payload)] = np.frombuffer(payload, np.uint8)
    x0 = np.uint32(int.from_bytes(payload[:4], "big"))
    st = dict(pred.state)
    st["coder"] = dict(st["coder"])
    st["coder"]["x"] = jnp.asarray([x0])
    st["coder"]["rpos"] = jnp.full((1,), 4, jnp.uint32)
    pred.state = st

    data_buf = jnp.zeros((1, per), jnp.uint8)
    code_buf = jnp.asarray(codes)
    half = (per // 2 // CHUNK) * CHUNK
    data_buf, code_buf, _ = run_chunks(pred, data_buf, code_buf, half, decode=True, chunk=CHUNK)

    ck = os.path.join(str(tmp_path), "dck.gxt")
    pred.save(ck)
    pred2 = Predictor(spec, 1)
    pred2.load(ck)
    data_buf, code_buf, _ = run_chunks(
        pred2, data_buf, code_buf, per - half, decode=True, t0=half, chunk=CHUNK
    )
    out = np.asarray(jax.device_get(data_buf)).reshape(-1)[:orig].tobytes()
    assert out == DATA


def test_generation_freezes_ltm():
    spec = _spec()
    pred = Predictor(spec, 1)
    compress_bytes(DATA, spec, 1, CHUNK, pred=pred)  # "train" online
    ltm_before = jax.device_get(pred.state["ltm"])
    stm_before = jax.device_get(pred.state["stm"])

    out = generate_bytes(pred, b"", 256, temperature=0.8, chunk=256)
    assert len(out) == 256

    ltm_after = jax.device_get(pred.state["ltm"])
    stm_after = jax.device_get(pred.state["stm"])
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ltm_before),
        jax.tree_util.tree_leaves_with_path(ltm_after),
    ):
        assert np.array_equal(a, b), f"LTM changed during generation: {jax.tree_util.keystr(pa)}"
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(stm_before), jax.tree_util.tree_leaves(stm_after))
    )
    assert changed, "STM should advance during generation"


def test_pretrained_warmstart_improves():
    """Fine-tuning path: a predictor pre-trained on the same distribution
    compresses a fresh file smaller than a cold one."""
    spec = _spec()
    cold = Predictor(spec, 1)
    blob_cold = compress_bytes(DATA, spec, 1, CHUNK, pred=cold)

    warm = Predictor(spec, 1)
    compress_bytes(DATA, spec, 1, CHUNK, pred=warm)  # pretrain pass
    warm.state = dict(warm.state)  # reuse learned state; reset coder+metrics
    import jax.numpy as jnp

    warm.state["coder"] = {
        "x1": jnp.zeros((1,), jnp.uint32),
        "x2": jnp.full((1,), 0xFFFFFFFF, jnp.uint32),
        "x": jnp.zeros((1,), jnp.uint32),
        "wpos": jnp.zeros((1,), jnp.uint32),
        "rpos": jnp.zeros((1,), jnp.uint32),
    }
    warm.state["metrics"] = jax.tree_util.tree_map(
        jnp.zeros_like, warm.state["metrics"]
    )
    blob_warm = compress_bytes(DATA, spec, 1, CHUNK, pred=warm)
    assert len(blob_warm) < len(blob_cold)


def test_analysis_ema_tracks_models():
    """Analysis subsystem (predictor.cpp:422-503): per-column entropy EMA has
    one column per prediction + L0/L1 mixer + final, stays finite, and the
    final column improves while learning on compressible data."""
    from gmix_tpu.core.codec import analysis_columns, analysis_snapshot, memory_report

    spec = _spec()
    pred = Predictor(spec, 1)
    cols = analysis_columns(spec)
    compress_bytes(DATA, spec, 1, CHUNK, pred=pred)
    snap = analysis_snapshot(pred)
    assert snap.shape == (1, len(cols))
    assert np.all(np.isfinite(snap))
    assert "final" in cols and cols.index("final") == len(cols) - 1
    # the mixed output must beat a fair coin on this highly repetitive input
    assert snap[0, -1] < 0.9
    rows = memory_report(pred)
    assert sum(b for _, b in rows) == pred.memory_bytes()
