"""The fused per-bit codec step: the reference's Predict/Encode/Perceive/Learn
bit loop (src/runner/runner-utils.cpp:50-65) restructured as one scanned,
stream-batched TPU program.

Key design properties (SURVEY.md 7):

- Scan is over BITS with the sub-step index j = bit & 7 traced; all
  byte-boundary work (context hashing, interval/indirect-hash updates, PPM,
  LSTM forward, match pointer chase) runs under `lax.cond(j == 0)` and the
  byte-end learn work (history append, match table write, LSTM perceive)
  under `lax.cond(j == 7)`. This keeps the compiled body ~8x smaller than
  unrolling the 8 sub-steps (XLA:CPU compile time of the unrolled form was
  pathological) while executing the heavy blocks only when due.
- Encode and decode are the same traced program; `decode` is a traced scalar
  that selects the bit source. This makes encoder/decoder model-state
  divergence structurally impossible.
- Heterogeneous model instances run as bucketed gather/compute/scatter over
  (S, M, T) tables; the 33-mixer GLN runs as a batched base matvec plus a
  short in-layer triangular chain (mixer.cpp:51-106, the "earlier mixers in
  the same layer" term).
- The reference's active-model protocol (short-term-memory.cpp:187-197: a
  model predicting exactly logit 0 is excluded from mixing and updates) is
  realised densely: a 0 logit contributes 0 to every dot product and receives
  a 0 weight update, so no index lists are needed.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnsembleSpec
from ..ops import coder as coder_ops
from ..ops.murmur import murmur3_u32, murmur3_u64
from ..ops.sigmoid import clamp_prob, logistic, logit
from ..ops.tables import nonstationary_table, run_map_table
from .meta import Meta

F32 = jnp.float32
U32 = jnp.uint32
I32 = jnp.int32


def _set(d: Dict, **kw) -> Dict:
    out = dict(d)
    out.update(kw)
    return out


def _iar(x: jnp.ndarray) -> jnp.ndarray:
    """uint -> int32 for indexing."""
    return x.astype(I32)


# ---------------------------------------------------------------------------
# byte-boundary work (sub-step j == 0)
# ---------------------------------------------------------------------------


def _boundary(stm: Dict, ltm: Dict, t: jnp.ndarray, meta: Meta) -> Tuple[Dict, Dict]:
    spec = meta.spec
    S = stm["bits_seen"].shape[0]
    slots = meta.slots
    not_first = t > 0

    # --- complete the previous byte (BasicContexts::ByteUpdate) ---
    completed = stm["acc"]

    # --- PPM count update with the completed byte, against the PRE-update
    # contexts (mirrors ModPPMD::Predict's ppmd_UpdateByte(last_byte) at the
    # byte boundary, mod_ppmd.cpp:1649-1660) ---
    if spec.ppm is not None:
        stm = _ppm_update(stm, completed, meta)

    last_byte = jnp.where(not_first, completed, stm["last_byte"])
    recent = jnp.where(
        not_first,
        jnp.concatenate([completed[:, None], stm["recent"][:, :-1]], axis=1),
        stm["recent"],
    )
    ctx = stm["ctx"]
    ctx = ctx.at[:, slots["last_byte"]].set(last_byte)
    for i in range(1, 10):
        ctx = ctx.at[:, slots[f"recent_{i}"]].set(recent[:, i])

    # --- interval contexts (interval-context.cpp:17-23) ---
    if spec.interval_ctxs:
        maps = jnp.asarray(meta.interval_maps, I32)  # (NI, 256)
        vals = jnp.take(maps, _iar(last_byte), axis=1).T.astype(U32)  # (S, NI)
        islots = meta.interval_slots
        old = ctx[:, islots]
        shifts = jnp.asarray(meta.interval_shifts, U32)[None, :]
        masks = jnp.asarray(meta.interval_masks, U32)[None, :]
        ctx = ctx.at[:, islots].set(masks & ((old << shifts) + vals))

    # --- skip hashes (skip-context.cpp:9-19) ---
    if spec.skip_ctxs:
        hashes = []
        for offs in meta.skip_offsets:
            n = len(offs)
            lo = jnp.zeros((S,), U32)
            hi = jnp.zeros((S,), U32)
            for k, o in enumerate(offs):
                b = recent[:, o]
                p = 8 * (n - 1 - k)
                if p < 32:
                    lo = lo | (b << U32(p))
                else:
                    hi = hi | (b << U32(p - 32))
            hashes.append(murmur3_u64(lo, hi))
        ctx = ctx.at[:, meta.skip_slots].set(jnp.stack(hashes, axis=1))

    # --- indirect-hash contexts (indirect-hash.cpp:16-31) ---
    if spec.ihash_ctxs:
        ih_oc = stm["ih_outer_ctx"]
        ih_oh = stm["ih_outer_hash"]
        s_ix = jnp.arange(S)[:, None]
        for b in meta.ih_buckets:
            key = f"b{b.table_bits}"
            tbl = stm["ih"][key]  # (S, M, T)
            M = len(b.ctx_idxs)
            Tmask = U32((1 << b.table_bits) - 1)
            m_ix = jnp.arange(M)[None, :]
            cols = jnp.asarray(np.array(b.ctx_idxs, np.int32))
            old_hash = ih_oh[:, cols]
            old_idx = _iar(old_hash & Tmask)
            inner = tbl[s_ix, m_ix, old_idx]
            imask = jnp.asarray(b.inner_mods, U32)[None, :] - U32(1)
            inner_new = ((inner & imask) << U32(8)) + last_byte[:, None]
            tbl = tbl.at[s_ix, m_ix, old_idx].set(inner_new, unique_indices=True)
            omask = jnp.asarray(b.outer_mods, U32)[None, :] - U32(1)
            outer_new = ((ih_oc[:, cols] & omask) << U32(8)) + last_byte[:, None]
            new_hash = murmur3_u64(outer_new, jnp.zeros_like(outer_new))
            new_idx = _iar(new_hash & Tmask)
            out_ctx = murmur3_u32(tbl[s_ix, m_ix, new_idx])
            ih_oc = ih_oc.at[:, cols].set(outer_new)
            ih_oh = ih_oh.at[:, cols].set(new_hash)
            ctx = ctx.at[:, jnp.asarray(b.out_slots)].set(out_ctx)
            stm = _set(stm, ih=_set(stm["ih"], **{key: tbl}))
        stm = _set(stm, ih_outer_ctx=ih_oc, ih_outer_hash=ih_oh)

    stm = _set(stm, last_byte=last_byte, recent=recent, acc=jnp.zeros_like(completed), ctx=ctx)

    # --- PPM next-byte distribution from the updated contexts (fills
    # ppm_probs, which the LSTM consumes as aux input) ---
    if spec.ppm is not None:
        stm = _ppm_predict(stm, meta)

    # --- LSTM byte forward (lstm.cpp:91-122, lstm-layer.cpp:198-241) ---
    if spec.lstm is not None:
        stm, ltm = _lstm_forward(stm, ltm, meta)

    return stm, ltm


def _ppm_update(stm: Dict, completed: jnp.ndarray, meta: Meta) -> Dict:
    sp = meta.spec.ppm
    S = completed.shape[0]
    s_ix = jnp.arange(S)
    ctx_old = stm["ctx"]
    new = {}
    for i, tb in enumerate(meta.ppm_bits):
        key = f"o{i}"
        tbl = stm["ppm"][key]  # (S, T, 256) uint16
        h = _iar(ctx_old[:, int(meta.ppm_slots[i])] & U32((1 << tb) - 1))
        row = tbl[s_ix, h].astype(jnp.int32)
        row = row.at[s_ix, _iar(completed)].add(sp.inc)
        total = jnp.sum(row, axis=1)
        row = jnp.where((total > sp.rescale_total)[:, None], (row + 1) >> 1, row)
        new[key] = tbl.at[s_ix, h].set(row.astype(jnp.uint16))
    return _set(stm, ppm=new)


def _ppm_predict(stm: Dict, meta: Meta) -> Dict:
    """PPM-C style escape blending, lowest order first (no exclusions)."""
    S = stm["bits_seen"].shape[0]
    s_ix = jnp.arange(S)
    ctx = stm["ctx"]
    p = jnp.full((S, 256), 1.0 / 256, F32)
    for i, tb in enumerate(meta.ppm_bits):
        tbl = stm["ppm"][f"o{i}"]
        h = _iar(ctx[:, int(meta.ppm_slots[i])] & U32((1 << tb) - 1))
        row = tbl[s_ix, h].astype(F32)  # (S, 256)
        total = jnp.sum(row, axis=1)
        distinct = jnp.sum(row > 0, axis=1).astype(F32)
        denom = jnp.maximum(total + distinct, 1.0)
        blend = row / denom[:, None] + (distinct / denom)[:, None] * p
        p = jnp.where((total > 0)[:, None], blend, p)
    return _set(
        stm,
        ppm_probs=p,
        ppm_top=jnp.full((S,), 255, I32),
        ppm_bot=jnp.zeros((S,), I32),
    )


def _interval_bit_pred(probs, top, bot, mid, new_bit, j):
    """Byte-distribution -> per-bit probability via the narrowing [bot, top]
    interval (lstm-model.cpp:17-48; ModPPMD uses the identical scheme).
    j is the traced bit sub-index; at j==0 the interval was just reset.
    Returns (masked logit, top, bot, mid)."""
    nb = new_bit.astype(I32)
    bot2 = jnp.where(nb == 1, mid + 1, bot)
    top2 = jnp.where(nb == 1, top, mid)
    shrink = j > 0
    bot = jnp.where(shrink, bot2, bot)
    top = jnp.where(shrink, top2, top)
    mid = bot + (top - bot) // 2
    ar = jnp.arange(256)[None, :]
    num = jnp.sum(jnp.where((ar >= mid[:, None] + 1) & (ar <= top[:, None]), probs, 0.0), axis=1)
    den = num + jnp.sum(jnp.where((ar >= bot[:, None]) & (ar <= mid[:, None]), probs, 0.0), axis=1)
    p = jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), F32(0.5))
    return jnp.where(den != 0, logit(p), F32(0.0)), top, bot, mid


def _lstm_forward(stm: Dict, ltm: Dict, meta: Meta) -> Tuple[Dict, Dict]:
    ls = meta.spec.lstm
    lw, lst = ltm["lstm"], stm["lstm"]
    C, Hz, OUT = ls.num_cells, ls.horizon, ls.output_size
    S = stm["bits_seen"].shape[0]
    e = lst["epoch"]

    aux = stm["ppm_probs"]  # (S, 256): PPM byte distribution (uniform when PPM off)
    li = jnp.concatenate(
        [aux, lst["hidden"][:, :C], jnp.ones((S, 1), F32)], axis=1
    )  # (S, LI) = stored layer input
    sym = _iar(stm["last_byte"])

    gw = lw["gate_w"]  # (S, 3, C, RW)
    w_sym = jnp.take_along_axis(gw, sym[:, None, None, None], axis=3)[..., 0]  # (S,3,C)
    f = w_sym + jnp.einsum("sgcr,sr->sgc", gw[:, :, :, OUT:], li, preferred_element_type=F32)
    ivar = jax.lax.rsqrt(jnp.mean(f * f, axis=2) + F32(1e-5))  # (S,3)
    norm = f * ivar[:, :, None]
    pre = norm * lw["gamma"] + lw["beta"]
    forget = logistic(pre[:, 0])
    innode = jnp.tanh(pre[:, 1])
    outg = logistic(pre[:, 2])
    in_gate = F32(1.0) - forget  # CIFG (lstm-layer.cpp:212)
    last_state = lst["cell"]
    cell = last_state * forget + innode * in_gate
    tanh_c = jnp.tanh(cell)
    hidden = jnp.concatenate([outg * tanh_c, jnp.ones((S, 1), F32)], axis=1)

    logits = jnp.einsum("soc,sc->so", lw["out_w"][:, e], hidden, preferred_element_type=F32)
    maxv = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), F32(0.0))  # lstm.cpp:105-113
    probs = jnp.exp(logits - maxv)
    probs = probs / jnp.sum(probs, axis=1, keepdims=True)

    gate_state = jnp.stack([forget, innode, outg], axis=1)  # (S,3,C)
    lst = _set(
        lst,
        layer_input=lst["layer_input"].at[:, e].set(li),
        norm=lst["norm"].at[:, :, e].set(norm),
        ivar=lst["ivar"].at[:, :, e].set(ivar),
        gate_state=lst["gate_state"].at[:, :, e].set(gate_state),
        tanh_state=lst["tanh_state"].at[:, e].set(tanh_c),
        in_gate=lst["in_gate"].at[:, e].set(in_gate),
        last_state=lst["last_state"].at[:, e].set(last_state),
        outputs=lst["outputs"].at[:, e].set(probs),
        cell=cell,
        hidden=hidden,
        probs=probs,
        top=jnp.full((S,), 255, I32),
        bot=jnp.zeros((S,), I32),
        epoch=(e + 1) % Hz,
    )
    ctx = stm["ctx"].at[:, meta.slots["lstm_ctx"]].set(jnp.argmax(probs, axis=1).astype(U32))
    return _set(stm, lstm=lst, ctx=ctx), ltm


def _lstm_perceive(stm: Dict, ltm: Dict, inp: jnp.ndarray, lr_gate, meta: Meta):
    """Lstm::Perceive (lstm.cpp:52-89) + LstmLayer::BackwardPass (lstm-layer.cpp:252-354)."""
    ls = meta.spec.lstm
    lst, lw = stm["lstm"], ltm["lstm"]
    C, Hz, OUT = ls.num_cells, ls.horizon, ls.output_size
    LI = ls.input_size + C + 1
    S = inp.shape[0]
    s_ix = jnp.arange(S)
    e_cur = lst["epoch"]
    last_e = (e_cur - 1) % Hz
    old_input = lst["in_hist"][:, last_e]
    frozen = lr_gate == 0  # generation mode: Perceive is never called (lstm-model.cpp:50-59)
    in_hist = lst["in_hist"].at[:, last_e].set(jnp.where(frozen, old_input, inp))
    lst = _set(lst, in_hist=in_hist)

    def bptt(args):
        lst, lw = args
        gw = lw["gate_w"]  # (S,3,C,RW)
        gamma, beta = lw["gamma"], lw["beta"]
        clip = F32(ls.grad_clip)

        def epoch_step(carry, epoch):
            stored, state_err, upd_w, upd_g, upd_b = carry
            out_err = lst["outputs"][:, epoch] - jax.nn.one_hot(in_hist[:, epoch], OUT, dtype=F32)
            he = jnp.einsum("so,soc->sc", out_err, lw["out_w"][:, epoch, :, :C],
                            preferred_element_type=F32)
            is_last = epoch == (Hz - 1)
            stored = jnp.where(is_last, he, stored + he)
            state_err = jnp.where(is_last, jnp.zeros_like(state_err), state_err)

            fg = lst["gate_state"][:, 0, epoch]
            inn = lst["gate_state"][:, 1, epoch]
            og = lst["gate_state"][:, 2, epoch]
            ts = lst["tanh_state"][:, epoch]
            ig = lst["in_gate"][:, epoch]
            out_err_g = ts * stored * og * (1.0 - og)
            state_err = state_err + stored * og * (1.0 - ts * ts)
            in_err = state_err * ig * (1.0 - inn * inn)
            fg_err = (lst["last_state"][:, epoch] - inn) * state_err * fg * ig

            not_first = epoch > 0
            state_err = jnp.where(not_first, state_err * fg, state_err)
            stored_next = jnp.where(not_first, jnp.zeros_like(stored), stored)

            errs = jnp.stack([fg_err, in_err, out_err_g], axis=1)  # (S,3,C)
            norm = lst["norm"][:, :, epoch]  # (S,3,C)
            ivar = lst["ivar"][:, :, epoch]  # (S,3)
            upd_g = upd_g + errs * norm
            upd_b = upd_b + errs
            err2 = errs * gamma * ivar[:, :, None]
            err2 = err2 - (jnp.sum(err2 * norm, axis=2, keepdims=True) / C) * norm
            # hidden backprop through the hidden block of the weight rows
            # (transpose_[i][j] = weights[j][OUT+IN+i], lstm-layer.cpp:311,330-338)
            w_hid = gw[:, :, :, OUT + ls.input_size : OUT + ls.input_size + C]  # (S,3,C,C)
            hid_grad = jnp.einsum("sgc,sgch->sh", err2, w_hid, preferred_element_type=F32)
            stored_next = jnp.where(not_first, stored_next + hid_grad, stored_next)

            # gradient accumulation: d w[i, sym] += err_i ; d w[i, OUT+j] += err_i * input_j
            in_sym = jnp.where(epoch > 0, in_hist[:, (epoch - 1) % Hz], old_input)
            li = lst["layer_input"][:, epoch]  # (S, LI)
            g_in = jnp.einsum("sgc,sl->sgcl", err2, li, preferred_element_type=F32)  # (S,3,C,LI)
            onehot = jax.nn.one_hot(in_sym, OUT, dtype=F32)
            g_sym = jnp.einsum("sgc,so->sgco", err2, onehot, preferred_element_type=F32)
            upd_w = upd_w + jnp.concatenate([g_sym, g_in], axis=3)

            state_err = jnp.clip(state_err, -clip, clip)
            stored_next = jnp.clip(stored_next, -clip, clip)
            return (stored_next, state_err, upd_w, upd_g, upd_b), ()

        init = (
            lst["stored_err"],
            lst["state_err"],
            jnp.zeros((S, 3, C, OUT + LI), F32),
            jnp.zeros((S, 3, C), F32),
            jnp.zeros((S, 3, C), F32),
        )
        (stored, state_err, upd_w, upd_g, upd_b), _ = jax.lax.scan(
            epoch_step, init, jnp.arange(Hz - 1, -1, -1)
        )

        t_new = jnp.minimum(lst["update_steps"] + 1, ls.update_limit)
        tf = t_new.astype(F32)
        alpha = F32(ls.lr * 0.1) * jax.lax.rsqrt(F32(5e-5) * tf + F32(1.0))
        b1, b2, eps = F32(ls.adam_beta1), F32(ls.adam_beta2), F32(ls.adam_eps)

        def adam(g, m, v, w):
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            mh = m / (1.0 - jnp.power(b1, tf))
            vh = v / (1.0 - jnp.power(b2, tf))
            return m, v, w - alpha * mh / jnp.sqrt(vh + eps)

        gm, gv, gwn = adam(upd_w, lw["gate_m"], lw["gate_v"], gw)
        gmm, gmv, gamman = adam(upd_g, lw["gamma_m"], lw["gamma_v"], gamma)
        bm, bv, betan = adam(upd_b, lw["beta_m"], lw["beta_v"], beta)
        lw2 = _set(lw, gate_w=gwn, gate_m=gm, gate_v=gv, gamma=gamman, gamma_m=gmm,
                   gamma_v=gmv, beta=betan, beta_m=bm, beta_v=bv)
        lst2 = _set(lst, stored_err=stored, state_err=state_err,
                    hidden_err=jnp.zeros_like(lst["hidden_err"]),
                    update_steps=t_new)
        return lst2, lw2

    do_bptt = (e_cur == 0) & (lr_gate > 0)
    lst, lw = jax.lax.cond(do_bptt, bptt, lambda a: a, (lst, lw))

    # per-byte output-layer SGD (lstm.cpp:81-88): copies last epoch's weights
    # into the current slot and applies the step; fully skipped when frozen.
    err = lst["outputs"][:, last_e] - jax.nn.one_hot(inp, OUT, dtype=F32)
    w_last = lw["out_w"][s_ix, last_e]  # (S, OUT, C+1)
    w_new = w_last - F32(ls.lr) * jnp.einsum(
        "so,sc->soc", err, lst["hidden"], preferred_element_type=F32
    )
    w_cur = lw["out_w"][s_ix, e_cur]
    out_w = lw["out_w"].at[s_ix, e_cur].set(jnp.where(frozen, w_cur, w_new))
    return _set(stm, lstm=lst), _set(ltm, lstm=_set(lw, out_w=out_w))


# ---------------------------------------------------------------------------
# per-bit step (j = bit index & 7, traced)
# ---------------------------------------------------------------------------

_NS_NEXT = nonstationary_table()
_RM_NEXT = run_map_table()
# match-model bit masks by sub-step: the check mask tests the PREVIOUS bit
# (match.cpp:29 runs before bit_pos_ /= 2), the pred mask the current one.
_CHECK_MASKS = np.array([1, 128, 64, 32, 16, 8, 4, 2], np.uint32)
_PRED_MASKS = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.uint32)


def _bit_step(
    stm: Dict,
    ltm: Dict,
    coder: Dict,
    metrics: Dict,
    data_buf: jnp.ndarray,
    code_buf: jnp.ndarray,
    t: jnp.ndarray,
    j: jnp.ndarray,
    decode: jnp.ndarray,
    learn_enabled,
    meta: Meta,
    sample_u=None,
    inv_temp=None,
):
    spec = meta.spec
    slots = meta.slots
    S = stm["bits_seen"].shape[0]
    s_ix = jnp.arange(S)
    j_u = j.astype(U32)
    is_j0 = j == 0
    is_j7 = j == 7

    # --- byte boundary (all byte-level models) ---
    def run_boundary(op):
        stm, ltm = op
        return _boundary(stm, ltm, t, meta)

    stm, ltm = jax.lax.cond(is_j0, run_boundary, lambda op: op, (stm, ltm))
    data_byte = jax.lax.dynamic_slice_in_dim(data_buf, t, 1, axis=1)[:, 0].astype(U32)

    # bits_seen counts every bit except the very first (basic-contexts.cpp:23-28);
    # it doubles as the per-mixer steps_ counter (they are equal by construction).
    first_bit = (t == 0) & is_j0
    bits_seen = jnp.where(first_bit, stm["bits_seen"], stm["bits_seen"] + U32(1))

    acc = stm["acc"]
    bit_ctx = ((U32(1) << j_u) + acc) - U32(1)  # recent_bits - 1
    last_byte = stm["last_byte"]
    ctx = stm["ctx"]
    ctx = ctx.at[:, slots["bit_ctx"]].set(bit_ctx)
    ctx = ctx.at[:, slots["lb_recent"]].set((last_byte << U32(8)) + bit_ctx)
    ctx = ctx.at[:, slots["slb_recent"]].set((stm["recent"][:, 1] << U32(8)) + bit_ctx)

    preds = jnp.zeros((S, meta.n_pred), F32)
    aux: Dict = {}
    ns_next = jnp.asarray(_NS_NEXT)
    rm_next = jnp.asarray(_RM_NEXT)

    # ---- indirect models: bucketed gather (indirect.cpp:28-45) ----
    # per bucket: paired u8 state tables + combined state->logit table
    for b in meta.ind_buckets:
        key = f"b{b.table_bits}"
        mem = ltm["ind"][key]
        M, T = len(b.model_idxs), b.table_size
        cvals = ctx[:, jnp.asarray(b.ctx_slots)]  # (S, M)
        idx = _iar(((cvals << U32(8)) + bit_ctx[:, None]) & U32(T - 1))
        m_ix = jnp.arange(M)[None, :]
        ns_s = _iar(mem["ns_t"][s_ix[:, None], m_ix, idx])  # (S, M)
        rm_s = _iar(mem["rm_t"][s_ix[:, None], m_ix, idx])
        states = jnp.concatenate([ns_s, rm_s], axis=1)  # (S, 2M)
        p_all = jnp.take_along_axis(mem["p"], states[:, :, None], axis=2)[..., 0]
        active = jnp.concatenate(
            [states[:, :M] != 255, states[:, M:] != 0], axis=1
        )  # ns: 255 = unseen; rm: 0 = unseen
        cols = jnp.concatenate([jnp.asarray(b.ns_cols), jnp.asarray(b.rm_cols)])
        preds = preds.at[:, cols].set(jnp.where(active, p_all, F32(0.0)))
        aux[key] = (idx, states)

    # ---- match models (match.cpp:25-74) ----
    if spec.matches:
        NM = len(spec.matches)
        check_mask = jnp.asarray(_CHECK_MASKS)[j]
        hit = stm["new_bit"][:, None] == ((stm["match_byte"] & check_mask) != 0).astype(U32)
        mlen = jnp.where(hit, jnp.minimum(stm["match_len"] + 1, 255), 0)

        def match_boundary(op):
            mlen, mptr, mbyte = op
            # byte-boundary pointer logic (match.cpp:38-58)
            mlen = jnp.where(mptr == (stm["hist_n"] - U32(1))[:, None], 0, mlen)
            tbl_ptr = jnp.zeros((S, NM), U32)
            for b in meta.match_buckets:
                tb = ltm["match_tbl"][f"b{b.table_bits}"]  # (S, Mb, T)
                cv = ctx[:, jnp.asarray(b.ctx_slots)]
                ix = _iar(cv & U32((1 << b.table_bits) - 1))
                got = tb[s_ix[:, None], jnp.arange(len(b.model_idxs))[None, :], ix]
                tbl_ptr = tbl_ptr.at[:, jnp.asarray(np.array(b.model_idxs, np.int32))].set(got)
            mptr = jnp.where(mlen < 8, tbl_ptr, mptr + U32(1))
            hb = ltm["hist"][s_ix[:, None], _iar(mptr & U32(meta.history_size - 1))]
            mbyte = jnp.where((stm["hist_n"] > 0)[:, None], hb.astype(U32), mbyte)
            return mlen, mptr, mbyte

        mlen, mptr, mbyte = jax.lax.cond(
            is_j0, match_boundary, lambda op: op,
            (mlen, stm["match_ptr"], stm["match_byte"]),
        )
        pred_mask = jnp.asarray(_PRED_MASKS)[j]
        active = mlen > 2
        mp = jnp.take_along_axis(ltm["match_pred"], mlen[:, :, None], axis=2)[..., 0]
        p_prob = jnp.where((mbyte & pred_mask) != 0, mp, F32(1.0) - mp)
        preds = preds.at[:, jnp.asarray(meta.match_cols)].set(
            jnp.where(active, logit(p_prob), F32(0.0))
        )
        longest = jnp.max((mlen // 32).astype(U32), axis=1)  # match.cpp:71-73
        ctx = ctx.at[:, slots["longest_match"]].set(longest)
        stm = _set(stm, match_ptr=mptr, match_byte=mbyte, match_len=mlen)
        aux["match"] = (mlen, mbyte, pred_mask)
    else:
        longest = jnp.zeros((S,), U32)

    # ---- PPM bit prediction (ModPPMD::Predict bit split, mod_ppmd.cpp:1662-1682) ----
    if spec.ppm is not None:
        lg, ptop, pbot, pmid = _interval_bit_pred(
            stm["ppm_probs"], stm["ppm_top"], stm["ppm_bot"], stm["ppm_mid"],
            stm["new_bit"], j,
        )
        preds = preds.at[:, spec.ppm_col].set(lg)
        stm = _set(stm, ppm_top=ptop, ppm_bot=pbot, ppm_mid=pmid)

    # ---- LSTM bit prediction (lstm-model.cpp:17-48) ----
    if spec.lstm is not None:
        lst = stm["lstm"]
        lg, top, bot, mid = _interval_bit_pred(
            lst["probs"], lst["top"], lst["bot"], lst["mid"], stm["new_bit"], j
        )
        preds = preds.at[:, spec.lstm_col].set(lg)
        stm = _set(stm, lstm=_set(lst, top=top, bot=bot, mid=mid))

    # ---- mixers (mixer.cpp:51-106) ----
    stm = _set(stm, ctx=ctx, bits_seen=bits_seen)
    mix_rows, mix_idx, mix_steps, ys, layer_bases = [], [], [], [], []
    n0 = meta.mix_layers[0].n
    n1 = meta.mix_layers[1].n
    nskip = len(spec.skip_connection_cols)
    skip_preds = (
        preds[:, jnp.asarray(np.array(spec.skip_connection_cols, np.int32))]
        if nskip
        else jnp.zeros((S, 0), F32)
    )
    for ml in meta.mix_layers:
        # gather weight rows + step counts for every mixer of the layer, k-order
        rows = jnp.zeros((S, ml.n, ml.width_pad), F32)
        idxs = jnp.zeros((S, ml.n), I32)
        stepv = jnp.zeros((S, ml.n), U32)
        cvals = ctx[:, jnp.asarray(ml.ctx_slots)]  # (S, K)
        for tb, ks in ml.buckets.items():
            key = f"l{ml.layer}b{tb}"
            mem = ltm["mix"][key]
            kcols = jnp.asarray(np.array(ks, np.int32))
            ix = _iar(cvals[:, kcols] & U32((1 << tb) - 1))
            kb = jnp.arange(len(ks))[None, :]
            rows = rows.at[:, kcols].set(mem["w"][s_ix[:, None], kb, ix])
            stepv = stepv.at[:, kcols].set(mem["steps"][s_ix[:, None], kb, ix])
            idxs = idxs.at[:, kcols].set(ix)
        # base input vector (zeros in the in-layer triangular region)
        if ml.layer == 0:
            base = jnp.concatenate(
                [preds, jnp.zeros((S, ml.width_pad - meta.n_pred), F32)], axis=1
            )
            tri0 = meta.n_pred
        elif ml.layer == 1:
            base = jnp.concatenate(
                [ys[0], jnp.zeros((S, n1), F32), skip_preds,
                 jnp.zeros((S, ml.width_pad - n0 - n1 - nskip), F32)],
                axis=1,
            )
            tri0 = n0
        else:
            base = jnp.concatenate(
                [ys[0], ys[1], skip_preds,
                 jnp.zeros((S, ml.width_pad - n0 - n1 - nskip), F32)],
                axis=1,
            )
            tri0 = None
        dot_base = jnp.einsum("skw,sw->sk", rows, base, preferred_element_type=F32)
        if tri0 is None or ml.n == 1:
            y = dot_base
        else:
            outs = []
            for k in range(ml.n):
                yk = dot_base[:, k]
                if k > 0:
                    prev = jnp.stack(outs, axis=1)  # (S, k)
                    yk = yk + jnp.einsum(
                        "sk,sk->s", rows[:, k, tri0 : tri0 + k], prev,
                        preferred_element_type=F32,
                    )
                outs.append(yk)
            y = jnp.stack(outs, axis=1)
        ys.append(y)
        mix_rows.append(rows)
        mix_idx.append(idxs)
        mix_steps.append(stepv)
        layer_bases.append(base)

    final_logit = ys[2][:, 0]
    prob = clamp_prob(logistic(final_logit))

    # ---- arithmetic coder (encoder.cpp:10-25 / decoder.cpp:19-39, fused) ----
    if sample_u is None:
        enc_bit = (data_byte >> (U32(7) - j_u)) & U32(1)
    else:
        # temperature sampling (runner-utils.cpp:202-206)
        p_temp = logistic(logit(prob) * inv_temp)
        enc_bit = (sample_u < p_temp).astype(U32)
    rpos = coder["rpos"]
    look_ix = _iar(rpos[:, None] + U32(np.arange(4))[None, :])
    in_bytes = code_buf[s_ix[:, None], jnp.minimum(look_ix, code_buf.shape[1] - 1)].astype(U32)
    in_bytes = jnp.where(look_ix < code_buf.shape[1], in_bytes, U32(0))  # EOF reads 0
    cst = coder_ops.CoderState(coder["x1"], coder["x2"], coder["x"])
    bit, cst, emits, nrenorm = coder_ops.coder_bit(
        cst, coder_ops.discretize(prob), enc_bit, in_bytes, decode
    )
    # encoder writes; decoder only advances its read cursor
    wpos = coder["wpos"]
    w_ix = wpos[:, None] + U32(np.arange(4))[None, :]
    valid = (U32(np.arange(4))[None, :] < nrenorm.astype(U32)[:, None]) & jnp.logical_not(decode)
    w_ix = jnp.where(valid, w_ix, U32(code_buf.shape[1]))  # OOB -> dropped
    code_buf = code_buf.at[s_ix[:, None], _iar(w_ix)].set(
        emits.astype(code_buf.dtype), mode="drop"
    )
    coder = {
        "x1": cst.x1,
        "x2": cst.x2,
        "x": cst.x,
        "wpos": wpos + jnp.where(decode, U32(0), nrenorm.astype(U32)),
        "rpos": rpos + jnp.where(decode, nrenorm.astype(U32), U32(0)),
    }

    # cumulative cross-entropy metric (bits) (runner.cpp:96-101)
    p_bit = jnp.where(bit == 1, prob, F32(1.0) - prob)
    metrics = _set(metrics, ent=metrics["ent"] - jnp.log2(p_bit))

    # per-column analysis EMA over model predictions, L0/L1 mixer outputs and
    # the final output (Predictor::UpdateEntropy alpha=1e-5, predictor.cpp:439-469)
    col_logits = jnp.concatenate([preds, ys[0], ys[1], final_logit[:, None]], axis=1)
    p_cols = clamp_prob(logistic(col_logits))
    pb_cols = jnp.where((bit == 1)[:, None], p_cols, F32(1.0) - p_cols)
    metrics = _set(
        metrics,
        ema=metrics["ema"] + F32(1e-5) * (-jnp.log2(pb_cols) - metrics["ema"]),
    )

    # ---- Perceive + Learn ----
    bitf = bit.astype(F32)
    lr_gate = jnp.asarray(learn_enabled, F32)  # 0 disables all learning (generation)
    cur_byte = (acc << U32(1)) | bit  # completed byte value when j == 7

    # indirect Learn (indirect.cpp:47-70)
    for b in meta.ind_buckets:
        key = f"b{b.table_bits}"
        mem = ltm["ind"][key]
        M = len(b.model_idxs)
        m2_ix = jnp.arange(2 * M)[None, :]
        idx, states = aux[key]
        lrs = jnp.tile(jnp.asarray(b.lrs)[None, :], (1, 2)) * lr_gate
        # ns state 255 (unseen) learns/advances from slot 0 (indirect.cpp:49-51)
        st_eff = jnp.concatenate(
            [jnp.where(states[:, :M] == 255, 0, states[:, :M]), states[:, M:]],
            axis=1,
        )
        p_cur = jnp.take_along_axis(mem["p"], st_eff[:, :, None], axis=2)[..., 0]
        p_new = p_cur + (bitf[:, None] - logistic(p_cur)) * lrs
        st_gated = jnp.where(lr_gate > 0, st_eff, 256)  # OOB -> frozen
        p_tbl = mem["p"].at[s_ix[:, None], m2_ix, st_gated].set(p_new, mode="drop")
        # state advance: ns half via the nonstationary table, rm half via the
        # run-map table (both 256x2 -> flattened 512-entry next tables)
        new_ns = jnp.take(ns_next, st_eff[:, :M] * 2 + _iar(bit)[:, None]).astype(jnp.uint8)
        new_rm = jnp.take(rm_next, st_eff[:, M:] * 2 + _iar(bit)[:, None]).astype(jnp.uint8)
        m_ix = jnp.arange(M)[None, :]
        idx_gated = jnp.where(lr_gate > 0, idx, b.table_size)
        ns_t = mem["ns_t"].at[s_ix[:, None], m_ix, idx_gated].set(new_ns, mode="drop")
        rm_t = mem["rm_t"].at[s_ix[:, None], m_ix, idx_gated].set(new_rm, mode="drop")
        ltm = _set(ltm, ind=_set(ltm["ind"], **{key: {"ns_t": ns_t, "rm_t": rm_t, "p": p_tbl}}))

    # match per-bit Learn (match.cpp:79-90)
    if spec.matches:
        NM = len(spec.matches)
        m_ix = jnp.arange(NM)[None, :]
        mlen, mbyte, pred_mask = aux["match"]
        hit2 = (bit[:, None] == ((mbyte & pred_mask) != 0).astype(U32)).astype(F32)
        cnt = jnp.take_along_axis(ltm["match_cnt"], mlen[:, :, None], axis=2)[..., 0]
        limits = jnp.asarray(meta.match_limits)[None, :]
        grow = cnt < limits
        cnt_new = jnp.where(grow, cnt + 1, cnt)
        lr = F32(1.0) / jnp.where(grow, cnt_new, limits).astype(F32) * lr_gate
        mp = jnp.take_along_axis(ltm["match_pred"], mlen[:, :, None], axis=2)[..., 0]
        mp_new = mp + (hit2 - mp) * lr
        upd_len = jnp.where((mlen > 2) & (lr_gate > 0), mlen, 256)  # gate via OOB drop
        match_pred = ltm["match_pred"].at[s_ix[:, None], m_ix, upd_len].set(mp_new, mode="drop")
        match_cnt = ltm["match_cnt"].at[s_ix[:, None], m_ix, upd_len].set(cnt_new, mode="drop")
        ltm = _set(ltm, match_pred=match_pred, match_cnt=match_cnt)

    # ---- byte-end Learn: history append, match pointer write, LSTM perceive ----
    def byte_end(op):
        stm, ltm = op
        hist_n = stm["hist_n"]
        append = (longest < 2) & (lr_gate > 0)
        hpos = jnp.where(append, hist_n & U32(meta.history_size - 1), U32(meta.history_size))
        ltm = _set(
            ltm,
            hist=ltm["hist"].at[s_ix, _iar(hpos)].set(
                cur_byte.astype(ltm["hist"].dtype), mode="drop"
            ),
        )
        hist_n = hist_n + append.astype(U32)
        stm = _set(stm, hist_n=hist_n)
        if spec.matches:
            write = (longest < 2) & (lr_gate > 0)
            newp = hist_n - U32(1)  # position of the just-appended byte
            mt = dict(ltm["match_tbl"])
            for b in meta.match_buckets:
                kk = f"b{b.table_bits}"
                cv = ctx[:, jnp.asarray(b.ctx_slots)]
                ix = _iar(cv & U32((1 << b.table_bits) - 1))
                ix = jnp.where(write[:, None], ix, 1 << b.table_bits)
                mt[kk] = mt[kk].at[
                    s_ix[:, None], jnp.arange(len(b.model_idxs))[None, :], ix
                ].set(jnp.broadcast_to(newp[:, None], ix.shape), mode="drop")
            ltm = _set(ltm, match_tbl=mt)
        if spec.lstm is not None:
            stm, ltm = _lstm_perceive(stm, ltm, _iar(cur_byte), lr_gate, meta)
        return stm, ltm

    stm, ltm = jax.lax.cond(is_j7, byte_end, lambda op: op, (stm, ltm))

    # mixer Learn (mixer.cpp:108-176)
    steps_f = bits_seen.astype(F32)
    decay_global = F32(0.9) / jnp.power(F32(1e-7) * steps_f + F32(0.8), F32(0.8))  # (S,)
    mixer_base = 0
    max_steps = ltm["mix_max_steps"]
    new_mix = dict(ltm["mix"])
    for li_, ml in enumerate(meta.mix_layers):
        rows, idxs, stepv = mix_rows[li_], mix_idx[li_], mix_steps[li_]
        y = ys[li_]
        ms_cols = jnp.arange(mixer_base, mixer_base + ml.n)
        ms = max_steps[:, ms_cols].astype(F32)  # (S, K)
        novelty = F32(1.5) - stepv.astype(F32) / ms
        upd = (
            decay_global[:, None]
            * novelty
            * jnp.asarray(ml.lrs)[None, :]
            * (logistic(y) - bitf[:, None])
            * lr_gate
        )  # (S, K)
        # input matrix: base + in-layer triangular part
        base = layer_bases[li_]
        inputs = jnp.broadcast_to(base[:, None, :], (base.shape[0], ml.n, ml.width_pad))
        if ml.layer in (0, 1) and ml.n > 1:
            tri0 = meta.n_pred if ml.layer == 0 else n0
            tril = jnp.tril(jnp.ones((ml.n, ml.n), F32), k=-1)  # i<k strictly
            tri_in = y[:, None, :] * tril[None, :, :]  # (S, K, K)
            inputs = inputs.at[:, :, tri0 : tri0 + ml.n].set(tri_in)
        w_new = rows - upd[:, :, None] * inputs
        steps_new = stepv + U32(1)
        wd = (steps_new & U32(1023)) == 0
        w_new = w_new * jnp.where(wd, F32(1.0) - F32(3e-6), F32(1.0))[:, :, None]
        ms_new = jnp.maximum(max_steps[:, ms_cols], steps_new)
        max_steps = max_steps.at[:, ms_cols].set(
            jnp.where(lr_gate > 0, ms_new, max_steps[:, ms_cols])
        )
        for tb, ks in ml.buckets.items():
            key = f"l{ml.layer}b{tb}"
            mem = new_mix[key]
            kcols = jnp.asarray(np.array(ks, np.int32))
            kb = jnp.arange(len(ks))[None, :]
            ix = idxs[:, kcols]
            ix = jnp.where(lr_gate > 0, ix, 1 << tb)
            new_mix[key] = {
                "w": mem["w"].at[s_ix[:, None], kb, ix].set(w_new[:, kcols], mode="drop"),
                "steps": mem["steps"].at[s_ix[:, None], kb, ix].set(
                    steps_new[:, kcols], mode="drop"
                ),
            }
        mixer_base += ml.n
    ltm = _set(ltm, mix=new_mix, mix_max_steps=max_steps)

    # advance bit registers; write the reconstructed byte at byte end (decode
    # reconstructs; encode rewrites the identical value - one unified program)
    stm = _set(stm, new_bit=bit, acc=(acc << U32(1)) | bit)
    data_buf = jax.lax.cond(
        is_j7,
        lambda db: jax.lax.dynamic_update_slice_in_dim(
            db, cur_byte.astype(db.dtype)[:, None], t, axis=1
        ),
        lambda db: db,
        data_buf,
    )
    return stm, ltm, coder, metrics, data_buf, code_buf


# ---------------------------------------------------------------------------
# chunk scans
# ---------------------------------------------------------------------------


def make_chunk_fn(meta: Meta, chunk: int):
    """Build the jitted chunk processor.

    fn(state, data_buf, code_buf, t0, decode, learn_enabled) ->
        (state, data_buf, code_buf)
    processes `chunk` bytes (chunk*8 bits) starting at byte offset t0.
    """

    def bit_scan_step(carry, b):
        state, data_buf, code_buf, decode, learn_enabled = carry
        t = (b >> 3).astype(jnp.int32)
        j = (b & 7).astype(jnp.int32)
        stm, ltm, coder, metrics = (
            state["stm"], state["ltm"], state["coder"], state["metrics"],
        )
        stm, ltm, coder, metrics, data_buf, code_buf = _bit_step(
            stm, ltm, coder, metrics, data_buf, code_buf, t, j, decode,
            learn_enabled, meta,
        )
        return (
            {"stm": stm, "ltm": ltm, "coder": coder, "metrics": metrics},
            data_buf,
            code_buf,
            decode,
            learn_enabled,
        ), ()

    def chunk_fn(state, data_buf, code_buf, t0, decode, learn_enabled):
        carry = (state, data_buf, code_buf, decode, learn_enabled)
        bits = t0.astype(jnp.int32) * 8 + jnp.arange(chunk * 8, dtype=jnp.int32)
        carry, _ = jax.lax.scan(bit_scan_step, carry, bits)
        return carry[0], carry[1], carry[2]

    return jax.jit(chunk_fn, donate_argnums=(0, 1, 2))


def make_gen_chunk_fn(meta: Meta, chunk: int):
    """Jitted generation chunk: temperature sampling with learning gated off
    (runner-utils.cpp:196-215). fn(state, data_buf, t0, u, inv_temp) ->
    (state, data_buf); u is (chunk*8, S) uniforms."""

    def bit_scan_step(carry, xs):
        b, u = xs
        state, data_buf, code_buf, inv_temp = carry
        t = (b >> 3).astype(jnp.int32)
        j = (b & 7).astype(jnp.int32)
        stm, ltm, coder, metrics = (
            state["stm"], state["ltm"], state["coder"], state["metrics"],
        )
        stm, ltm, coder, metrics, data_buf, code_buf = _bit_step(
            stm, ltm, coder, metrics, data_buf, code_buf, t, j,
            jnp.asarray(False), jnp.asarray(0.0, F32), meta,
            sample_u=u, inv_temp=inv_temp,
        )
        return (
            {"stm": stm, "ltm": ltm, "coder": coder, "metrics": metrics},
            data_buf,
            code_buf,
            inv_temp,
        ), ()

    def gen_fn(state, data_buf, t0, u, inv_temp):
        S = data_buf.shape[0]
        code_buf = jnp.zeros((S, 8), jnp.uint8)  # sink; all writes dropped
        bits = t0.astype(jnp.int32) * 8 + jnp.arange(chunk * 8, dtype=jnp.int32)
        carry = (state, data_buf, code_buf, inv_temp)
        carry, _ = jax.lax.scan(bit_scan_step, carry, (bits, u))
        return carry[0], carry[1]

    return jax.jit(gen_fn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=64)
def get_chunk_fn(spec: EnsembleSpec, chunk: int):
    """Process-wide compile cache: one jitted chunk program per (spec, chunk)."""
    from .meta import build_meta

    return make_chunk_fn(build_meta(spec), chunk)


@functools.lru_cache(maxsize=16)
def get_gen_chunk_fn(spec: EnsembleSpec, chunk: int):
    from .meta import build_meta

    return make_gen_chunk_fn(build_meta(spec), chunk)
