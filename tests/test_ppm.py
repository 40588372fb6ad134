"""Differential tests of the device PPM (exclusion + SEE + update exclusion)
against an independent scalar numpy model, and the rolling-hash context
invariant."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmix_tpu as g
from gmix_tpu.core.meta import ROLL_BASE, build_meta
from gmix_tpu.core.step import _ppm_predict, _ppm_rows, _ppm_update
from gmix_tpu.ops.murmur import murmur3_u32
from gmix_tpu.state import init_state

M32 = (1 << 32) - 1


def _logit(p):
    p = min(max(p, 1e-4), 1.0 - 1e-4)
    return np.log(p / (1.0 - p))


def _scalar_cascade(rows, see, sp):
    """Scalar reference of the top-down exclusion cascade for ONE stream.
    rows: (NO, 256) float; see: (NO, NB). Returns per-order dicts + excl."""
    NO = rows.shape[0]
    excl = np.zeros(256, bool)
    out = [None] * NO
    for i in range(NO - 1, -1, -1):
        row = np.where(excl, 0.0, rows[i]) if sp.exclusion else rows[i].copy()
        total = row.sum()
        distinct = float((row > 0).sum())
        has = total > 0
        ppmc = distinct / max(total + distinct, 1.0)
        b = min(int(distinct), sp.see_buckets - 1)
        esc = 1.0 / (1.0 + np.exp(-np.float32(_logit(ppmc) + see[i, b])))
        out[i] = dict(row=row, total=total, has=has, esc=esc, bucket=b)
        if sp.exclusion:
            excl |= rows[i] > 0
    return out, excl


def _scalar_predict(rows, see, sp):
    out, excl = _scalar_cascade(rows, see, sp)
    NO = rows.shape[0]
    p = np.zeros(256)
    w = 1.0
    for i in range(NO - 1, -1, -1):
        o = out[i]
        if o["has"]:
            p += w * (1.0 - o["esc"]) * o["row"] / max(o["total"], 1.0)
            w *= o["esc"]
    nex = int((~excl).sum())
    if nex > 0:
        p += w * (~excl) / nex
    else:
        p += w / 256.0
    return p


def _scalar_update(rows, see, sp, c):
    """Returns (new integer rows, new see) for ONE stream."""
    out, _ = _scalar_cascade(rows.astype(float), see, sp)
    NO = rows.shape[0]
    found = [out[i]["has"] and out[i]["row"][c] > 0 for i in range(NO)]
    higher = [any(found[j] for j in range(i + 1, NO)) for i in range(NO)]
    see = see.copy()
    for i in range(NO):
        if out[i]["has"] and not higher[i]:
            target = 0.0 if found[i] else 1.0
            see[i, out[i]["bucket"]] += np.float32(
                sp.see_lr * (target - out[i]["esc"])
            )
    new = rows.astype(np.int64).copy()
    for i in range(NO):
        if (not sp.update_exclusion) or (not higher[i]):
            new[i, c] += sp.inc
        if new[i].sum() > sp.rescale_total:
            new[i] = (new[i] + 1) >> 1
    return new, see


def _device_ppm_fixture(seed=0, matching_tags=True):
    spec = g.tiny_spec(with_lstm=True)
    meta = build_meta(spec)
    S = 2
    st = init_state(meta, S)
    rng = np.random.RandomState(seed)
    from gmix_tpu.core.meta import PPM_ROW_W, PPM_TAG_LANE

    stm = dict(st["stm"])
    # random-but-plausible table contents, contexts, and SEE state; the owner
    # tag rides in row lane PPM_TAG_LANE
    tbl = np.zeros((S, meta.ppm_total_rows, PPM_ROW_W), np.uint16)
    tbl[:, :, :256] = rng.binomial(1, 0.1, (S, meta.ppm_total_rows, 256)).astype(
        np.uint16
    ) * rng.randint(1, 300, (S, meta.ppm_total_rows, 256)).astype(np.uint16)
    ctx = rng.randint(0, 2**31, (S, meta.n_ctx)).astype(np.uint32)
    stm["ctx"] = jnp.asarray(ctx)
    stm["ppm_see"] = jnp.asarray(
        rng.normal(scale=0.3, size=stm["ppm_see"].shape).astype(np.float32)
    )
    if matching_tags:
        # rows owned by the current contexts (tag-verified hashing): give each
        # addressed row its context's tag so the rows read as live
        cv = ctx[:, meta.ppm_slots]
        h = (cv & meta.ppm_masks[None, :]).astype(np.int64) + meta.ppm_row_offsets[None, :]
        for s in range(S):
            tbl[s, h[s], PPM_TAG_LANE] = ((cv[s] >> 24) & 255).astype(np.uint16)
    stm["ppm_tbl"] = jnp.asarray(tbl)
    return spec, meta, stm


def test_ppm_predict_matches_scalar():
    spec, meta, stm = _device_ppm_fixture()
    sp = spec.ppm
    out = jax.jit(lambda s: _ppm_predict(s, meta))(stm)
    probs = np.asarray(out["ppm_probs"])
    rows = np.asarray(_ppm_rows(stm, stm["ctx"], meta)[1]).astype(float)
    see = np.asarray(stm["ppm_see"])
    for s in range(rows.shape[0]):
        want = _scalar_predict(rows[s], see[s], sp)
        np.testing.assert_allclose(probs[s], want, rtol=2e-5, atol=2e-7)
        assert abs(probs[s].sum() - 1.0) < 1e-4


def test_ppm_update_matches_scalar():
    spec, meta, stm = _device_ppm_fixture(seed=1)
    sp = spec.ppm
    h = np.asarray(_ppm_rows(stm, stm["ctx"], meta)[0])
    rows_before = np.asarray(_ppm_rows(stm, stm["ctx"], meta)[1])
    see_before = np.asarray(stm["ppm_see"])
    # pick a byte present at the middle order for stream 0 (exercises update
    # exclusion) and an unseen byte for stream 1 (full escape chain)
    c0 = int(np.argmax(rows_before[0, 1]))
    c1 = int(np.argmin(rows_before[1].sum(axis=0)))
    completed = jnp.asarray(np.array([c0, c1], np.uint32))
    out = jax.jit(lambda s, c: _ppm_update(s, c, meta))(stm, completed)
    tbl_after = np.asarray(out["ppm_tbl"])
    see_after = np.asarray(out["ppm_see"])
    for s, c in ((0, c0), (1, c1)):
        want_rows, want_see = _scalar_update(rows_before[s], see_before[s], sp, c)
        got_rows = tbl_after[s][h[s]][:, :256]
        np.testing.assert_array_equal(got_rows, want_rows.astype(np.uint16))
        np.testing.assert_allclose(see_after[s], want_see, rtol=1e-5, atol=1e-7)


def test_ppm_exclusion_flags_change_behavior():
    """Sanity: switching exclusion/update-exclusion off must change outputs
    (the flags are live, not dead config)."""
    import dataclasses

    spec, meta, stm = _device_ppm_fixture(seed=2)
    p_on = np.asarray(jax.jit(lambda s: _ppm_predict(s, meta))(stm)["ppm_probs"])
    spec_off = dataclasses.replace(
        spec, ppm=dataclasses.replace(spec.ppm, exclusion=False)
    )
    meta_off = build_meta(spec_off)
    p_off = np.asarray(
        jax.jit(lambda s: _ppm_predict(s, meta_off))(stm)["ppm_probs"]
    )
    assert not np.allclose(p_on, p_off)


def test_ppm_tag_collision_reads_empty_and_reclaims():
    """Tag-verified rows: a colliding context (different tag) must read the
    row as EMPTY (uniform prediction contribution), and updating through it
    must reclaim the row - new tag, counts reset to just the observed byte."""
    spec, meta, stm = _device_ppm_fixture(seed=3, matching_tags=False)
    sp = spec.ppm
    # all tags are 0 but the random contexts' high bytes are ~never 0, so
    # every row is a collision: prediction must be exactly uniform
    out = jax.jit(lambda s: _ppm_predict(s, meta))(stm)
    np.testing.assert_allclose(
        np.asarray(out["ppm_probs"]), np.full((2, 256), 1.0 / 256), rtol=1e-6
    )
    # update with byte 77: rows at the addressed indices must be reclaimed
    h = np.asarray(_ppm_rows(stm, stm["ctx"], meta)[0])
    completed = jnp.asarray(np.array([77, 200], np.uint32))
    upd = jax.jit(lambda s, c: _ppm_update(s, c, meta))(stm, completed)
    from gmix_tpu.core.meta import PPM_TAG_LANE

    cv = np.asarray(stm["ctx"])[:, meta.ppm_slots]
    want_tag = ((cv >> 24) & 255).astype(np.uint16)
    for s, c in ((0, 77), (1, 200)):
        got_rows = np.asarray(upd["ppm_tbl"])[s][h[s]][:, :256]
        got_tags = np.asarray(upd["ppm_tbl"])[s][h[s]][:, PPM_TAG_LANE]
        np.testing.assert_array_equal(got_tags, want_tag[s])
        want = np.zeros((len(sp.orders), 256), np.uint16)
        want[:, c] = sp.inc
        np.testing.assert_array_equal(got_rows, want)


def test_roll_hash_invariant():
    """After processing a known byte string, each rolling-hash state must
    equal sum_i window[i]*B^i mod 2^32 over exactly the last `order` bytes,
    and the published context must be its murmur finalisation."""
    from gmix_tpu.core.step import make_chunk_fn_raw

    spec = g.tiny_spec(with_lstm=True)
    meta = build_meta(spec)
    chunk = 30
    data = np.frombuffer(b"the quick brown fox jumps over", np.uint8).reshape(1, -1)
    fn = jax.jit(make_chunk_fn_raw(meta, chunk, learn=True, bit_scan=True))
    st = init_state(meta, 1)
    db = jnp.asarray(data)
    cb = jnp.zeros((1, 4096), jnp.uint8)
    st, db, cb, _w, _n = fn(st, db, cb, jnp.int32(0), jnp.asarray(False))
    stm = st["stm"]
    # boundary work for byte t runs at the START of step t, so after the chunk
    # the roll state covers bytes [0, chunk-1) (the last byte is not yet shifted)
    hist = data[0, : chunk - 1][::-1]  # hist[0] = most recent completed byte
    for k, rc in enumerate(spec.roll_ctxs):
        want = 0
        for i in range(rc.order):
            want = (want + int(hist[i]) * pow(ROLL_BASE, i, 1 << 32)) & M32
        got = int(np.asarray(stm["roll_h"])[0, k])
        assert got == want, f"{rc.name}: {got:#x} != {want:#x}"
        slot = meta.slots[rc.name]
        want_ctx = int(np.asarray(murmur3_u32(jnp.uint32(want))))
        assert int(np.asarray(stm["ctx"])[0, slot]) == want_ctx
