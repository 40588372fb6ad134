"""Fused Pallas kernel for the 8 bit sub-steps of one byte.

The jnp sub-step path (core/step.py `sub_step`) is ~1500 small XLA ops per
byte whose intermediates round-trip through HBM: the (S, 2M, 256) state->
logit table alone is re-read 8x per byte by the one-hot lookups, and the
round-4 profile attributes ~540 us/byte at S=128 to the op tail plus several
hundred us to this redundant bandwidth. This kernel runs the ENTIRE 8-sub-step
body (indirect predict/learn, match predict/learn, PPM/LSTM interval bit
predictions, the 3-layer GLN mixer forward+SGD, SSE/APM, the arithmetic coder,
metrics) as ONE Pallas program: every working set is loaded into VMEM once
per byte, the 8 sub-steps run entirely on-chip, and the updated arrays are
written back once. Gathers/scatters of arena rows and all byte-boundary work
(PPM byte update/predict, LSTM forward/perceive, contexts) stay outside in
XLA, which already handles them well.

EXACT TRANSPLANT: the kernel executes the same expressions in the same order
as the jnp path, including the deferred per-bit write stacks and their
register corrections (see _byte_step's carry comment), so interpret-mode
execution on CPU is bit-identical to the jnp path - asserted by
tests/test_fused.py. On the TPU the Mosaic compiler may round fused
multiply-adds differently from XLA, so archives written with the fused path
are self-consistent (encode and decode both use it) but are not guaranteed
bit-compatible with jnp-path archives; the choice is per-process
(GMIX_FUSED) and must match between a stream's encode and decode.

Pallas constraints shaping the code (see /opt/skills/guides/pallas_guide.md):
kernels cannot capture jnp constants, so the state-machine tables and
per-model learning rates arrive as broadcast-const INPUTS and every scalar
constant is a weak-typed python literal; iota is always >= 2D; constant-index
gathers are expressed as static column stacks.

Reference mapping: the per-bit hot loop src/runner/runner-utils.cpp:50-65 /
predictor.cpp:360-387, restructured as SURVEY.md 7 prescribes.

STATUS (round 5, measured on the v5e): the kernel compiles and round-trips
exactly (tiny full-feature spec, encode+decode byte-identical). Ladder of
measurements at the bench shape (scaled-11, S=128, chunk 500):
  B=8  (16 grid steps): 3324 us/byte
  B=16 ( 8 grid steps): 2960 us/byte  (input/output aliasing halves VMEM;
        still 652 KB past Mosaic's default 16 MiB scoped-VMEM budget, so
        the call raises vmem_limit_bytes - the v5e core has 128 MiB)
  B=32: the AOT compiler does not terminate within 10 minutes
  jnp path (XLA), same shape: 2018 us/byte
So the fused path remains ~47% SLOWER than XLA's schedule of the same
computation: the per-grid-step cost is dominated by the kernel's many small
one-hot placement matmuls (8 sub-steps x ~30 placements, each a skinny
(B,256)x(256,lanes) dot), which XLA instead fuses into its surrounding
elementwise graph. Halving the grid steps bought only 11%, i.e. the body,
not the step overhead, is the cost. Kept opt-in (GMIX_FUSED=1): byte-exact,
useful as a Mosaic reference implementation, not the production path. A
win here needs replacing one-hot placement dots with vector shuffles or
scatter-free lane arithmetic, not more VMEM.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.sigmoid import clamp_prob, logistic, logit, pow_det
from .meta import APM_BINS, APM_SPAN, Meta

F32 = jnp.float32
U32 = jnp.uint32
I32 = jnp.int32

_CHECK_MASKS = np.array([1, 128, 64, 32, 16, 8, 4, 2], np.uint32)
_PRED_MASKS = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.uint32)
_CODER_WIN = 40
WIN_PAD = 64  # win arrays padded to a lane-friendly width
# the f32 value of (1f - 3e-6f), as an exact python double (weight decay)
_WDECAY = float(np.float32(1.0) - np.float32(3e-6))

# sc lane indices (packed per-stream scalars, uint32)
SC_DATA, SC_LB, SC_R1, SC_DECODE, SC_NOTFIRST = 0, 1, 2, 3, 4
# coder-regs lane indices (packed, uint32)
CR_X1, CR_X2, CR_X, CR_WPOS, CR_RPOS, CR_ACC, CR_BITS, CR_NEWBIT = range(8)


def _tree_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Fixed-binary-tree sum over the last axis (see step.py _tree_sum)."""
    n = x.shape[-1]
    p = 1 << max(n - 1, 0).bit_length()
    if p != n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, p - n)])
    while x.shape[-1] > 1:
        h = x.shape[-1] // 2
        x = x[..., :h] + x[..., h:]
    return x[..., 0]


def _tree_sum_ax1(x: jnp.ndarray) -> jnp.ndarray:
    """Fixed-tree sum over axis 1 of a (B, 8, X) array by static slicing -
    the float result is identical to _tree_sum(moveaxis(x, 1, -1)) (same
    pairing), but avoids a small-minor-dim transpose that crashes Mosaic's
    layout inference."""
    while x.shape[1] > 1:
        h = x.shape[1] // 2
        x = x[:, :h] + x[:, h:]
    return x[:, 0]


def _place(parts, total):
    """Assemble a (..., total) lane vector from (array, lane_offset) parts
    via one-hot placement matmuls: out lane (off+k) receives arr[..., k].
    Each output lane sums exactly one nonzero product, so values are exact.
    (Both jnp.pad and jnp.concatenate on the minor dim lower to a Mosaic
    concatenate that crashes on operands with lane-offset layouts; the MXU
    dot path lowers cleanly.)"""
    out = None
    for arr, off in parts:
        w = arr.shape[-1]
        if w == 0:
            continue
        ki = jax.lax.broadcasted_iota(I32, (w, total), 0)
        wi = jax.lax.broadcasted_iota(I32, (w, total), 1)
        pm = jnp.where(wi == ki + off, 1.0, 0.0).astype(arr.dtype)
        pa = jnp.einsum("...k,kw->...w", arr, pm, preferred_element_type=arr.dtype)
        out = pa if out is None else out + pa
    return out


def _cat(parts, axis=1):
    """Concatenate, dropping zero-sized operands (Mosaic requires positive
    vector sizes)."""
    parts = [p for p in parts if p.shape[axis] > 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _strict_lower(n: int) -> jnp.ndarray:
    """(n, n) f32 strictly-lower-triangular ones, built from iota compares
    (jnp.ones/tril constants cannot be captured by a Pallas kernel)."""
    ri = jax.lax.broadcasted_iota(I32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(I32, (n, n), 1)
    return jnp.where(ci < ri, 1.0, 0.0).astype(F32)


def _tri_solve(Lmat: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Nilpotent-doubling solve of y = d + strict_lower(L) y (step.py)."""
    n = Lmat.shape[-1]
    if n <= 1:
        return d
    A = Lmat * _strict_lower(n)[None]
    y = d + _tree_sum(A * d[:, None, :])
    cover = 2
    while cover < n:
        A = jnp.einsum("sij,sjk->sik", A, A, preferred_element_type=F32)
        y = y + _tree_sum(A * y[:, None, :])
        cover *= 2
    return y


def _io_layout(meta: Meta, learn: bool, analysis: bool):
    """(inputs, outputs): lists of (name, shape_tail, dtype, kind); kind "s"
    = stream-blocked leading dim, "c" = broadcast constant (full shape =
    shape_tail, same block for every grid step)."""
    spec = meta.spec
    M = len(spec.indirects)
    NM = len(spec.matches)
    K = meta.mix_n0 + meta.mix_n1 + 1
    WP = meta.mix_width_pad
    Kst, Kp = len(meta.mix_st_ix), len(meta.mix_pos_ix)
    Kcd, Kpd, Klm = len(meta.mix_cd_ix), len(meta.mix_pd_ix), len(meta.mix_lm_ix)
    Tlm = int(sum(meta.mix_lm_sizes)) if Klm else 0
    NA = len(spec.apm)

    ins: List = [
        ("sc", (8,), U32, "s"),
        ("coder", (8,), U32, "s"),
        ("win_r", (WIN_PAD,), U32, "s"),
        ("ent", (1,), F32, "s"),
        ("mix_lrs", (1, K), F32, "c"),
    ]
    outs: List = [
        ("coder", (8,), U32, "s"),
        ("win_w", (WIN_PAD,), U32, "s"),
        ("bitregs", (8,), U32, "s"),
        ("ent", (1,), F32, "s"),
    ]
    if M:
        ins += [
            ("ind_blk", (M, 256), I32, "s"),
            ("ind_rot", (M,), U32, "s"),
            ("p_tbl", (2 * M, 256), F32, "s"),
            ("ind_lrs", (1, 2 * M), F32, "c"),
        ]
        if learn:
            ins += [("ns_next", (2, 256), I32, "c"), ("rm_next", (2, 256), I32, "c")]
            outs += [("ind_blk", (M, 256), I32, "s"), ("p_tbl", (2 * M, 256), F32, "s")]
    if Kst:
        ins.append(("rows_st", (Kst, WP), F32, "s"))
        if learn:
            outs.append(("rows_st", (Kst, WP), F32, "s"))
    if Kp:
        ins.append(("rows_pos", (Kp * 8, WP), F32, "s"))
        if learn:
            outs.append(("rows_pos", (Kp * 8, WP), F32, "s"))
    if Kcd:
        ins.append(("rows_cd", (Kcd, WP), F32, "s"))
        if learn:
            outs.append(("rows_cd", (Kcd, WP), F32, "s"))
    if Kpd:
        ins.append(("blocks_pd", (Kpd * 8, WP), F32, "s"))
        if learn:
            outs.append(("blocks_pd", (Kpd * 8, WP), F32, "s"))
    if Klm:
        ins.append(("lm_tbl", (Tlm, WP), F32, "s"))
        if learn:
            outs.append(("lm_tbl", (Tlm, WP), F32, "s"))
    ins.append(("max_steps", (K,), U32, "s"))
    if learn:
        outs.append(("max_steps", (K,), U32, "s"))
    if NA:
        ins.append(("apm_rows", (NA, 8 * APM_BINS), F32, "s"))
        if learn:
            outs.append(("apm_rows", (NA, 8 * APM_BINS), F32, "s"))
    if spec.ppm is not None:
        ins += [("ppm_probs", (256,), F32, "s"), ("ppm_regs", (4,), I32, "s")]
        outs.append(("ppm_regs", (4,), I32, "s"))
    if spec.lstm is not None:
        ins += [("lstm_probs", (256,), F32, "s"), ("lstm_regs", (4,), I32, "s")]
        outs.append(("lstm_regs", (4,), I32, "s"))
    if NM:
        ins += [
            ("match_len", (NM,), I32, "s"),
            ("match_byte", (NM,), U32, "s"),
            ("mt_pred", (NM, 256), F32, "s"),
            ("mt_cnt", (NM, 256), I32, "s"),
            ("match_limits", (1, NM), I32, "c"),
        ]
        outs.append(("match_len", (NM,), I32, "s"))
        if learn:
            outs += [("mt_pred", (NM, 256), F32, "s"), ("mt_cnt", (NM, 256), I32, "s")]
    if analysis:
        from .meta import analysis_names

        nc = len(analysis_names(spec))
        ins.append(("ema", (nc,), F32, "s"))
        outs.append(("ema", (nc,), F32, "s"))
    return ins, outs


def _kernel_body(meta: Meta, learn: bool, analysis: bool, in_specs, out_specs, refs):
    """The 8 unrolled sub-steps on VMEM refs. Mirrors step.py sub_step +
    the byte-end deferred-write application, expression for expression."""
    spec = meta.spec
    in_names = [n for n, _, _, _ in in_specs]
    out_names = [n for n, _, _, _ in out_specs]
    r = {n: ref for n, ref in zip(in_names, refs[: len(in_names)])}
    o = {n: ref for n, ref in zip(out_names, refs[len(in_names):])}

    M = len(spec.indirects)
    NM = len(spec.matches)
    n0, n1 = meta.mix_n0, meta.mix_n1
    K = n0 + n1 + 1
    WP = meta.mix_width_pad
    SL = meta.mix_step_lane
    nskip = len(spec.skip_connection_cols)
    Kst, Kp = len(meta.mix_st_ix), len(meta.mix_pos_ix)
    Kcd, Kpd, Klm = len(meta.mix_cd_ix), len(meta.mix_pd_ix), len(meta.mix_lm_ix)
    NA = len(spec.apm)

    sc = r["sc"][:]
    B = sc.shape[0]
    data_byte = sc[:, SC_DATA]
    last_byte = sc[:, SC_LB]
    recent1 = sc[:, SC_R1]
    decode = sc[:, SC_DECODE] != 0  # (B,) bool
    not_first = sc[:, SC_NOTFIRST] != 0

    coder = r["coder"][:]
    x1, x2, x = coder[:, CR_X1], coder[:, CR_X2], coder[:, CR_X]
    wpos, rpos = coder[:, CR_WPOS], coder[:, CR_RPOS]
    acc = coder[:, CR_ACC]
    bits_seen = coder[:, CR_BITS]
    new_bit = coder[:, CR_NEWBIT]
    wpos0, rpos0 = wpos, rpos

    win_r = r["win_r"][:]  # (B, WIN_PAD)
    win_w = jnp.zeros((B, WIN_PAD), U32)
    ent = r["ent"][:][:, 0]
    if analysis:
        ema = r["ema"][:]
    mix_lrs = r["mix_lrs"][:]  # (1, K)

    lane_u = jax.lax.broadcasted_iota(U32, (1, 1, 256), 2)
    lane_i = jax.lax.broadcasted_iota(I32, (1, 1, 256), 2)
    win_lanes = jax.lax.broadcasted_iota(U32, (1, WIN_PAD), 1)
    arange8 = jax.lax.broadcasted_iota(I32, (1, 8, 1), 1)

    if M:
        ind_blk0 = r["ind_blk"][:]  # (B, M, 256) i32, byte-start snapshot
        ind_rot = r["ind_rot"][:]
        p_tbl0 = r["p_tbl"][:]
        ind_lrs = r["ind_lrs"][:]  # (1, 2M)
        if learn:
            ns_next = r["ns_next"][:]  # (2, 256) i32, row b = next-state on bit b
            rm_next = r["rm_next"][:]
    if NM:
        mt_pred0 = r["mt_pred"][:]
        mt_cnt0 = r["mt_cnt"][:]
        match_len = r["match_len"][:]
        match_byte = r["match_byte"][:]
        match_limits = r["match_limits"][:]  # (1, NM)
    rows_stable = r["rows_st"][:] if Kst else jnp.zeros((B, 0, WP), F32)
    # per-bit-position python lists: all j-indexed reads/writes are static
    # slices/concats (Mosaic has neither scatter nor dynamic_update_slice)
    if Kp:
        _rp = r["rows_pos"][:]  # (B, Kp*8, WP), kp-major
        rows_pos_j = [
            jnp.stack([_rp[:, kp * 8 + jj] for kp in range(Kp)], axis=1)
            for jj in range(8)
        ]
    else:
        rows_pos_j = [jnp.zeros((B, 0, WP), F32)] * 8
    rows_cd = r["rows_cd"][:] if Kcd else jnp.zeros((B, 0, WP), F32)
    if Kpd:
        _bp = r["blocks_pd"][:]  # (B, Kpd*8, WP), kpd-major
        blocks_pd_j = [
            jnp.stack([_bp[:, kp * 8 + jj] for kp in range(Kpd)], axis=1)
            for jj in range(8)
        ]
    else:
        blocks_pd_j = [jnp.zeros((B, 0, WP), F32)] * 8
    if Klm:
        lm_all = r["lm_tbl"][:]
        lm_offs = np.concatenate([[0], np.cumsum(np.asarray(meta.mix_lm_sizes))]).astype(int)
        lm_tbls = tuple(lm_all[:, lm_offs[i] : lm_offs[i + 1]] for i in range(Klm))
    else:
        lm_tbls = ()
    max_steps = r["max_steps"][:]
    if NA:
        apm_st = [r["apm_rows"][:][:, a] for a in range(NA)]  # (B, 8*APM_BINS) each
    if spec.ppm is not None:
        ppm_probs = r["ppm_probs"][:]
        pr = r["ppm_regs"][:]
        ppm_top, ppm_bot, ppm_mid = pr[:, 0], pr[:, 1], pr[:, 2]
    if spec.lstm is not None:
        lstm_probs = r["lstm_probs"][:]
        lr_ = r["lstm_regs"][:]
        l_top, l_bot, l_mid = lr_[:, 0], lr_[:, 1], lr_[:, 2]

    longest = jnp.zeros((B,), U32)
    bit_ctx = jnp.zeros((B,), U32)
    lb_ctx = jnp.zeros((B,), U32)
    slb_ctx = jnp.zeros((B,), U32)

    # deferred per-bit write stacks (identical to the jnp path's carry)
    if learn and M:
        ib_lane = jnp.zeros((B, 8, M), I32) - 1
        ib_del = jnp.zeros((B, 8, M), I32)
        pt_slot = jnp.zeros((B, 8, 2 * M), I32) - 1
        pt_del = jnp.zeros((B, 8, 2 * M), F32)
    if learn and NM:
        mp_slot = jnp.zeros((B, 8, NM), I32) - 1
        mp_del = jnp.zeros((B, 8, NM), F32)
        mc_del = jnp.zeros((B, 8, NM), I32)

    def interval_pred(probs, top, bot, mid, nb, first):
        if not first:
            nbi = nb.astype(I32)
            bot = jnp.where(nbi == 1, mid + 1, bot)
            top = jnp.where(nbi == 1, top, mid)
        mid = bot + (top - bot) // 2
        ar = jax.lax.broadcasted_iota(I32, (1, 256), 1)
        num = _tree_sum(jnp.where((ar >= mid[:, None] + 1) & (ar <= top[:, None]), probs, 0.0))
        den = num + _tree_sum(jnp.where((ar >= bot[:, None]) & (ar <= mid[:, None]), probs, 0.0))
        p = jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.5)
        return jnp.where(den != 0, logit(p), 0.0), top, bot, mid

    sl_is = jax.lax.broadcasted_iota(I32, (1, 1, WP), 2) == SL

    # staged truncation for Mosaic-bug bisection (GMIX_FUSED_DBG):
    # 1 = I/O only, 2 = + model predictions & coder, 3 = + mixer forward,
    # 4 = + APM, 99 (default) = full kernel
    _dbg = int(os.environ.get("GMIX_FUSED_DBG", "99"))

    for j in (range(8) if _dbg >= 2 else range(0)):
        prev8 = arange8 < j  # (1, 8, 1) bool
        inc = jnp.where(not_first | (j > 0), 1, 0).astype(U32)
        bits_seen = bits_seen + inc
        bit_ctx = (acc + (1 << j)) - 1
        lb_ctx = (last_byte << 8) + bit_ctx
        slb_ctx = (recent1 << 8) + bit_ctx

        # ---- indirect predict (indirect.cpp:28-45) ----
        if M:
            lane_sel = (bit_ctx[:, None] + ind_rot) & 255
            eq_lane = lane_u == lane_sel[:, :, None]
            pair = jnp.sum(jnp.where(eq_lane, ind_blk0, 0), axis=2)
            ns_raw, rm_raw = pair & 255, pair >> 8
            # int concat + compare: concatenating BOOL vectors crashes
            # Mosaic ("Invalid vector register cast")
            active_ind = jnp.concatenate(
                [(ns_raw != 255).astype(I32), (rm_raw != 0).astype(I32)], axis=1
            ) == 1
            st_eff = jnp.concatenate([jnp.where(ns_raw == 255, 0, ns_raw), rm_raw], axis=1)
            eq_state = lane_i == st_eff[:, :, None]
            p_cur = jnp.sum(jnp.where(eq_state, p_tbl0, 0.0), axis=2)
            if learn:
                same_pt = pt_slot == st_eff[:, None, :]
                p_cur = p_cur + _tree_sum_ax1(pt_del * (same_pt & prev8))
            ind_preds = jnp.where(active_ind, p_cur, 0.0)
            # static column interleave ([ns|rm] halves -> ns0,rm0,ns1,rm1...):
            # Mosaic's layout inference rejects the (B,M,2)->(B,2M) reshape
            ind_pair = jnp.stack(
                [ind_preds[:, (k % 2) * M + k // 2] for k in range(2 * M)], axis=1
            )
        else:
            ind_pair = jnp.zeros((B, 0), F32)

        # ---- match predict (match.cpp:25-74) ----
        if NM:
            if j > 0:
                check_mask = int(_CHECK_MASKS[j])
                hit = new_bit[:, None] == ((match_byte & check_mask) != 0).astype(U32)
                match_len = jnp.where(hit, jnp.minimum(match_len + 1, 255), 0)
            pred_mask = int(_PRED_MASKS[j])
            mlen = match_len
            active = mlen > 2
            eq_len = lane_i == mlen[:, :, None]
            mp = jnp.sum(jnp.where(eq_len, mt_pred0, 0.0), axis=2)
            if learn:
                same_mp = mp_slot == mlen[:, None, :]
                mp = mp + _tree_sum_ax1(mp_del * (same_mp & prev8))
            p_prob = jnp.where((match_byte & pred_mask) != 0, mp, 1.0 - mp)
            match_preds = jnp.where(active, logit(p_prob), 0.0)
            # i32 reduce then cast: Mosaic has no unsigned-int reductions
            longest = jnp.max(mlen // 32, axis=1).astype(U32)
        else:
            match_preds = jnp.zeros((B, 0), F32)

        # ---- PPM / LSTM interval bit predictions ----
        head = []
        if spec.ppm is not None:
            lg, ppm_top, ppm_bot, ppm_mid = interval_pred(
                ppm_probs, ppm_top, ppm_bot, ppm_mid, new_bit, j == 0
            )
            head.append(lg[:, None])
        if spec.lstm is not None:
            lg, l_top, l_bot, l_mid = interval_pred(
                lstm_probs, l_top, l_bot, l_mid, new_bit, j == 0
            )
            head.append(lg[:, None])
        hp = [(h, i) for i, h in enumerate(head)]
        nh = len(head)
        preds = _place(
            hp + [(ind_pair, nh), (match_preds, nh + ind_pair.shape[1])],
            meta.n_pred,
        )

        # ---- mixers forward (mixer.cpp:51-106) ----
        if _dbg < 3:
            pp = jnp.pad(preds, [(0, 0), (0, 128 - preds.shape[1])])
            while pp.shape[-1] > 1:
                hh = pp.shape[-1] // 2
                pp = pp[..., :hh] + pp[..., hh:]
            final_logit = pp[..., 0]
            y0 = jnp.zeros((B, n0), F32)
            y1 = jnp.zeros((B, n1), F32)
            prob = clamp_prob(logistic(final_logit))
        else:
            skip_preds = (
                jnp.stack([preds[:, int(c)] for c in spec.skip_connection_cols], axis=1)
                if nskip
                else jnp.zeros((B, 0), F32)
            )
            parts = [rows_stable]
            if Kp:
                parts.append(rows_pos_j[j])
            parts.append(rows_cd)
            if Kpd:
                parts.append(blocks_pd_j[j])
            lm_ohs = []
            if Klm:
                lm_rows = []
                for i in range(Klm):
                    T = lm_tbls[i].shape[1]
                    # 3D one-hot built at rank (bool minor-dim insertion is not
                    # lowerable): (1, T, 1) iota vs (B, 1, 1) value
                    oh3 = (jax.lax.broadcasted_iota(U32, (1, T, 1), 1)
                           == longest[:, None, None])
                    lm_ohs.append(oh3)
                    lm_rows.append(jnp.sum(jnp.where(oh3, lm_tbls[i], 0.0), axis=1))
                parts.append(jnp.stack(lm_rows, axis=1))
            # per-column sources in concat order (3D axis-1 concats hit a
            # Mosaic "offset mismatch" bug; stacks of 2D columns lower fine)
            srcs = (
                [rows_stable[:, i] for i in range(Kst)]
                + [rows_pos_j[j][:, i] for i in range(Kp)]
                + [rows_cd[:, i] for i in range(Kcd)]
                + [blocks_pd_j[j][:, i] for i in range(Kpd)]
                + lm_rows
            )
            inv_perm = np.asarray(meta.mix_perm)  # concat[perm] = k-order
            rows = jnp.stack([srcs[int(inv_perm[k])] for k in range(K)], axis=1)
            stepv = jax.lax.bitcast_convert_type(rows[:, :, SL], U32)
            rows_f = jnp.where(sl_is, 0.0, rows)

            if meta.prefix_lane0 >= 0:
                i8 = jax.lax.broadcasted_iota(I32, (1, 8), 1)
                sh = jnp.clip(j - 1 - i8, 0, 31).astype(U32)
                bits8 = (acc[:, None] >> sh) & 1
                pfx = jnp.where(i8 < j, 2.0 * bits8.astype(I32).astype(F32) - 1.0, 0.0)
                npf = 8
            else:
                pfx = jnp.zeros((B, 0), F32)
                npf = 0

            base0 = _place([(preds, 0), (pfx, meta.n_pred + n0)], WP)
            d0 = _tree_sum(rows_f[:, :n0] * base0[:, None, :])
            y0 = _tri_solve(rows_f[:, :n0, meta.n_pred : meta.n_pred + n0], d0) if n0 > 1 else d0
            base1 = _place(
                [(y0, 0), (skip_preds, n0 + n1), (pfx, n0 + n1 + nskip)], WP
            )
            d1 = _tree_sum(rows_f[:, n0 : n0 + n1] * base1[:, None, :])
            y1 = _tri_solve(rows_f[:, n0 : n0 + n1, n0 : n0 + n1], d1) if n1 > 1 else d1
            base2 = _place(
                [(y0, 0), (y1, n0), (skip_preds, n0 + n1), (pfx, n0 + n1 + nskip)], WP
            )
            final_logit = _tree_sum(rows_f[:, K - 1] * base2)
            prob = clamp_prob(logistic(final_logit))

        # ---- SSE/APM chain (config.ApmStage) ----
        if NA and _dbg >= 4:
            nb_lane = jax.lax.broadcasted_iota(I32, (1, APM_BINS), 1)
            apm_slices, apm_wvs, apm_pvs = [], [], []
            apm_l, apm_p = final_logit, prob
            for a in range(NA):
                row = apm_st[a][:, j * APM_BINS : (j + 1) * APM_BINS]
                pos = (jnp.clip(apm_l, -APM_SPAN, APM_SPAN) + APM_SPAN) * (
                    (APM_BINS - 1) / (2 * APM_SPAN)
                )
                i0 = jnp.minimum(pos.astype(I32), APM_BINS - 2)
                w = pos - i0.astype(F32)
                wv = jnp.where(nb_lane == i0[:, None], 1.0 - w[:, None], 0.0) + jnp.where(
                    nb_lane == i0[:, None] + 1, w[:, None], 0.0
                )
                pv = jnp.sum(row * wv, axis=1)
                wgt = float(meta.apm_weights[a])
                apm_p = clamp_prob(wgt * pv + (1.0 - wgt) * apm_p)
                apm_l = logit(apm_p)
                apm_slices.append(row)
                apm_wvs.append(wv)
                apm_pvs.append(pv)
            prob = apm_p

        # ---- arithmetic coder (ops/coder.py coder_bit, inlined with
        # python-literal masks; integer math is exact so the values are
        # identical to the jnp path) ----
        enc_bit = (data_byte >> (7 - j)) & 1
        p16 = (1.0 + 65534.0 * prob).astype(I32).astype(U32)  # via i32: Mosaic lacks f32->u32
        d_rng = x2 - x1
        xmid = x1 + (d_rng >> 16) * p16 + (((d_rng & 0xFFFF) * p16) >> 16)
        dec_bit = (x <= xmid).astype(U32)
        bit = jnp.where(decode, dec_bit, enc_bit)
        take = bit.astype(bool)
        x2 = jnp.where(take, xmid, x2)
        x1 = jnp.where(take, x1, xmid + 1)
        k4 = jax.lax.broadcasted_iota(U32, (1, 4), 1)
        off_r = (rpos - rpos0)[:, None] + k4
        sel_r = off_r[:, :, None] == win_lanes[None, :, :]  # (B,4,WIN_PAD)
        in_bytes = jnp.sum(
            jnp.where(sel_r, win_r.astype(I32)[:, None, :], 0), axis=2
        ).astype(U32)  # i32 reduce: Mosaic has no unsigned-int reductions
        emits = []
        nrenorm = jnp.zeros((B,), I32)
        for i in range(4):
            cond = ((x1 ^ x2) & np.uint32(0xFF000000)) == 0
            emits.append(jnp.where(cond, x2 >> 24, 0).astype(U32))
            x1 = jnp.where(cond, x1 << 8, x1)
            x2 = jnp.where(cond, (x2 << 8) | 255, x2)
            x = jnp.where(cond & decode, (x << 8) | in_bytes[:, i], x)
            nrenorm = nrenorm + cond.astype(I32)
        emits = jnp.stack(emits, axis=1)  # (B, 4)
        dec_col = sc[:, SC_DECODE : SC_DECODE + 1]  # (B, 1) u32
        valid = (k4 < nrenorm.astype(U32)[:, None]) & (dec_col == 0)
        off_w = (wpos - wpos0)[:, None] + k4
        sel_w = off_w[:, :, None] == win_lanes[None, :, :]
        valid3 = (k4[:, :, None] < nrenorm.astype(U32)[:, None, None]) & (
            dec_col[:, :, None] == 0
        )
        win_w = win_w + jnp.sum(
            jnp.where(sel_w & valid3, emits.astype(I32)[:, :, None], 0),
            axis=1,
        ).astype(U32)  # i32 reduce: Mosaic has no unsigned-int reductions
        wpos = wpos + jnp.where(decode, 0, nrenorm).astype(U32)
        rpos = rpos + jnp.where(decode, nrenorm, 0).astype(U32)

        p_bit = jnp.where(bit == 1, prob, 1.0 - prob)
        ent = ent - jnp.log2(p_bit)
        if analysis:
            col_logits = _place(
                [(preds, 0), (y0, meta.n_pred), (y1, meta.n_pred + n0),
                 (final_logit[:, None], meta.n_pred + n0 + n1)],
                meta.n_pred + n0 + n1 + 1,
            )
            p_cols = jnp.clip(logistic(col_logits), 0.01, 0.99)
            pb_cols = jnp.where(bit[:, None] == 1, p_cols, 1.0 - p_cols)
            ema = ema + 1e-5 * (-jnp.log2(pb_cols) - ema)

        bitf = bit.astype(I32).astype(F32)

        if learn and NA and _dbg >= 4:
            for a in range(NA):
                new_row = apm_slices[a] + float(meta.apm_lrs[a]) * (
                    bitf - apm_pvs[a]
                )[:, None] * apm_wvs[a]
                keep = jax.lax.broadcasted_iota(I32, (1, 8 * APM_BINS), 1)
                inj = (keep >= j * APM_BINS) & (keep < (j + 1) * APM_BINS)
                apm_st[a] = jnp.where(
                    inj, _place([(new_row, j * APM_BINS)], 8 * APM_BINS), apm_st[a]
                )

        if learn and M:
            delta = (bitf[:, None] - logistic(p_cur)) * ind_lrs
            bsel = bit[:, None, None] == 1  # expand the u32, not the bool

            ns_nx = jnp.where(bsel, ns_next[1][None, None, :], ns_next[0][None, None, :])
            rm_nx = jnp.where(bsel, rm_next[1][None, None, :], rm_next[0][None, None, :])
            new_ns = jnp.sum(jnp.where(eq_state[:, :M], ns_nx, 0), axis=2)
            new_rm = jnp.sum(jnp.where(eq_state[:, M:], rm_nx, 0), axis=2)
            new_pair = new_ns | (new_rm << 8)

            sel_j = arange8 == j  # (1, 8, 1)

            def put8(stack, col):
                # where-select over the 8-axis: Mosaic lowers neither
                # scatter nor dynamic_update_slice
                return jnp.where(sel_j, col.astype(stack.dtype)[:, None, :], stack)

            ib_lane = put8(ib_lane, lane_sel.astype(I32))
            ib_del = put8(ib_del, new_pair - pair)
            pt_slot = put8(pt_slot, st_eff)
            pt_del = put8(pt_del, delta)

            if NM:
                hit2 = (bit[:, None] == ((match_byte & pred_mask) != 0).astype(U32)).astype(F32)
                cnt = jnp.sum(jnp.where(eq_len, mt_cnt0, 0), axis=2)
                cnt = cnt + _tree_sum_ax1(mc_del * (same_mp & prev8))
                grow = cnt < match_limits
                cnt_new = jnp.where(grow, cnt + 1, cnt)
                lr = 1.0 / jnp.where(grow, cnt_new, match_limits).astype(F32)
                mp_new = mp + (hit2 - mp) * lr
                upd_on = mlen > 2
                mp_slot = put8(mp_slot, mlen)
                mp_del = put8(mp_del, jnp.where(upd_on, mp_new - mp, 0.0))
                mc_del = put8(mc_del, jnp.where(upd_on & grow, 1, 0))

        if learn:
            # ---- mixer SGD (mixer.cpp:108-176; mirrors step.py exactly) ----
            steps_f = bits_seen.astype(I32).astype(F32)  # via i32: Mosaic lacks u32->f32
            decay_global = 0.9 / pow_det(1e-7 * steps_f + 0.8, 0.8)
            y_all = _place(
                [(y0, 0), (y1, n0), (final_logit[:, None], n0 + n1)], K
            )
            novelty = 1.5 - stepv.astype(I32).astype(F32) / max_steps.astype(I32).astype(F32)
            upd = (
                decay_global[:, None] * novelty * mix_lrs
                * (logistic(y_all) - bitf[:, None])
            )
            # in-layer input block: base vector with lanes [off, off+n)
            # replaced by the strict-lower y terms - built with a lane mask
            # (broadcast_to of strided slices miscompiles in Mosaic)
            lane_wp = jax.lax.broadcasted_iota(I32, (1, 1, WP), 2)

            def layer_inputs(base, y, n, off):
                if n == 0:
                    return jnp.zeros((B, 0, WP), F32)
                mid = _place([(y[:, None, :] * _strict_lower(n)[None], off)], WP)
                inside = (lane_wp >= off) & (lane_wp < off + n)
                return jnp.where(inside, mid, base[:, None, :] + jnp.zeros((B, n, WP), F32))

            in0 = layer_inputs(base0, y0, n0, meta.n_pred)
            in1 = layer_inputs(base1, y1, n1, n0)
            inputs = jnp.stack(
                [in0[:, i] for i in range(n0)] + [in1[:, i] for i in range(n1)]
                + [base2], axis=1
            )
            w_new = rows - upd[:, :, None] * inputs
            steps_new = stepv + 1
            wd = (steps_new & 1023) == 0
            w_new = w_new * jnp.where(wd, _WDECAY, 1.0)[:, :, None]
            w_new = jnp.where(
                sl_is, jax.lax.bitcast_convert_type(steps_new, F32)[:, :, None], w_new
            )

            def cols(ix):
                return jnp.stack([w_new[:, int(k)] for k in ix], axis=1)

            if Kst:
                rows_stable = cols(meta.mix_st_ix)
            if Kp:
                rows_pos_j[j] = cols(meta.mix_pos_ix)
            if Kcd:
                rows_cd = cols(meta.mix_cd_ix)
            if Kpd:
                blocks_pd_j[j] = cols(meta.mix_pd_ix)
            if Klm:
                lm_tbls = tuple(
                    jnp.where(
                        lm_ohs[i],
                        w_new[:, int(meta.mix_lm_ix[i])][:, None, :],
                        lm_tbls[i],
                    )
                    for i in range(Klm)
                )
            # i32 max then cast: Mosaic cannot legalize arith.maxui
            max_steps = jnp.maximum(
                max_steps.astype(I32), steps_new.astype(I32)
            ).astype(U32)

        new_bit = bit
        acc = (acc << 1) | bit

    # ---- apply the deferred stacks (identical to step.py byte-end) ----
    if learn and M:
        ib = ind_blk0
        pt = p_tbl0
        for jj in range(8):
            ib = ib + ib_del[:, jj][:, :, None] * (lane_i == ib_lane[:, jj][:, :, None])
            pt = pt + pt_del[:, jj][:, :, None] * (lane_i == pt_slot[:, jj][:, :, None])
        o["ind_blk"][:] = ib
        o["p_tbl"][:] = pt
    if learn and NM:
        mtp, mtc = mt_pred0, mt_cnt0
        for jj in range(8):
            eq = lane_i == mp_slot[:, jj][:, :, None]
            mtp = mtp + mp_del[:, jj][:, :, None] * eq
            mtc = mtc + mc_del[:, jj][:, :, None] * eq
        o["mt_pred"][:] = mtp
        o["mt_cnt"][:] = mtc

    # ---- pack outputs ----
    o["coder"][:] = jnp.stack([x1, x2, x, wpos, rpos, acc, bits_seen, new_bit], axis=1)
    o["win_w"][:] = win_w
    zeros = jnp.zeros((B,), U32)
    o["bitregs"][:] = jnp.stack(
        [bit_ctx, lb_ctx, slb_ctx, longest, zeros, zeros, zeros, zeros], axis=1
    )
    o["ent"][:] = ent[:, None]
    if analysis:
        o["ema"][:] = ema
    if learn:
        if Kst:
            o["rows_st"][:] = rows_stable
        if Kp:
            o["rows_pos"][:] = jnp.stack(
                [rows_pos_j[jj][:, kp] for kp in range(Kp) for jj in range(8)], axis=1
            )
        if Kcd:
            o["rows_cd"][:] = rows_cd
        if Kpd:
            o["blocks_pd"][:] = jnp.stack(
                [blocks_pd_j[jj][:, kp] for kp in range(Kpd) for jj in range(8)], axis=1
            )
        if Klm:
            o["lm_tbl"][:] = (
                lm_tbls[0] if Klm == 1 else jnp.stack(
                    [t[:, i] for t in lm_tbls for i in range(t.shape[1])], axis=1
                )
            )
        o["max_steps"][:] = max_steps
        if NA:
            o["apm_rows"][:] = jnp.stack(apm_st, axis=1)
    if spec.ppm is not None:
        z = jnp.zeros((B,), I32)
        o["ppm_regs"][:] = jnp.stack([ppm_top, ppm_bot, ppm_mid, z], axis=1)
    if spec.lstm is not None:
        z = jnp.zeros((B,), I32)
        o["lstm_regs"][:] = jnp.stack([l_top, l_bot, l_mid, z], axis=1)
    if NM:
        o["match_len"][:] = match_len


def const_inputs(meta: Meta, learn: bool) -> Dict[str, jnp.ndarray]:
    """The broadcast-constant kernel inputs for a spec (host-built once)."""
    from ..ops.tables import nonstationary_table, run_map_table

    spec = meta.spec
    out: Dict[str, jnp.ndarray] = {
        "mix_lrs": jnp.asarray(meta.mix_lrs)[None, :],
    }
    if spec.indirects:
        out["ind_lrs"] = jnp.asarray(meta.ind_lrs)[None, :]
        if learn:
            ns = np.asarray(nonstationary_table(), np.int32)
            rm = np.asarray(run_map_table(), np.int32)
            out["ns_next"] = jnp.asarray(np.stack([ns[0::2], ns[1::2]]))
            out["rm_next"] = jnp.asarray(np.stack([rm[0::2], rm[1::2]]))
    if spec.matches:
        out["match_limits"] = jnp.asarray(meta.match_limits, jnp.int32)[None, :]
    return out


def call_fused(spec, learn: bool, analysis: bool, S: int, inputs: Dict) -> Dict:
    """Trace-time entry used by step._byte_step: run the fused kernel on the
    packed inputs. Non-TPU backends run the kernel in interpret mode (same
    expressions through XLA - bit-identical to the jnp path there)."""
    from .meta import build_meta

    interpret = jax.default_backend() != "tpu"
    fn = get_fused_fn(spec, learn, analysis, S, interpret)
    meta = build_meta(spec)
    full = dict(inputs)
    full.update(const_inputs(meta, learn))
    return fn(full)


@functools.lru_cache(maxsize=16)
def get_fused_fn(meta_key, learn: bool, analysis: bool, S: int, interpret: bool):
    """Build the pallas_call wrapper for (spec, learn, analysis, S). The grid
    blocks over streams with the largest power-of-2 block <= 8 dividing S."""
    from .meta import build_meta

    meta = build_meta(meta_key)
    cap = int(os.environ.get("GMIX_FUSED_B", "16"))
    B = 1
    while B * 2 <= min(S, cap) and S % (B * 2) == 0:
        B *= 2
    ins, outs = _io_layout(meta, learn, analysis)

    def kernel(*refs):
        _kernel_body(meta, learn, analysis, ins, outs, refs)

    def spec_for(tail, kind):
        if kind == "c":
            return pl.BlockSpec(tail, (lambda i, _n=len(tail): (0,) * _n),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((B,) + tail, (lambda i, _t=tail: (i,) + (0,) * len(_t)),
                            memory_space=pltpu.VMEM)

    in_specs = [spec_for(tail, kind) for _, tail, _, kind in ins]
    out_specs = [spec_for(tail, kind) for _, tail, _, kind in outs]
    out_shape = [jax.ShapeDtypeStruct((S,) + tail, dt) for _, tail, dt, _ in outs]

    # alias every stream-blocked array that appears as both input and
    # output: halves the kernel's VMEM footprint, which is what allows
    # B=16 stream blocks (the callers always rebuild the input arrays, so
    # donation is safe)
    out_pos = {n: i for i, (n, _, _, k) in enumerate(outs) if k == "s"}
    aliases = {}
    for i, (n, tail, dt, kind) in enumerate(ins):
        j = out_pos.get(n)
        if kind == "s" and j is not None and outs[j][1] == tail and outs[j][2] == dt:
            aliases[i] = j
    # B=16 blocks overflow Mosaic's default 16 MiB scoped-VMEM budget by
    # ~0.6 MiB; the v5e core has 128 MiB of VMEM, so raise the kernel's
    # limit instead of shrinking the block (GMIX_FUSED_VMEM_MB to override)
    vmem_mb = int(os.environ.get("GMIX_FUSED_VMEM_MB", "32"))
    call = pl.pallas_call(
        kernel,
        grid=(S // B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )

    in_names = [n for n, _, _, _ in ins]
    out_names = [n for n, _, _, _ in outs]

    def fn(inputs: Dict):
        args = [inputs[n] for n in in_names]
        res = call(*args)
        return {n: v for n, v in zip(out_names, res)}

    return fn
