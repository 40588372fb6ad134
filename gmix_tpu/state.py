"""Codec state as a pytree of batched arrays.

The reference's ShortTermMemory / LongTermMemory object graphs
(src/memory/short-term-memory.h, long-term-memory.h) become one nested dict of
arrays with a leading stream axis S. Every array is functionally updated inside
the scan; checkpointing, copying, and multi-device sharding all fall out of the
pytree structure (SURVEY.md 7, design point 1).

Lazy allocations in the reference (mixer rows, state tables) become dense
zero/sentinel-initialised arrays with identical semantics: an unseen mixer
context has all-zero weights and therefore outputs 0 exactly like a missing
MixerData (mixer.cpp:53-55); unseen indirect contexts hold the sentinel states
255/0 (long-term-memory.h:11-16).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .core.meta import Meta

DEFAULT_SEED = 0xDEADBEEF


def init_state(meta: Meta, num_streams: int, seed: int = DEFAULT_SEED) -> Dict:
    spec = meta.spec
    S = num_streams
    f32, u32, i32, u8 = jnp.float32, jnp.uint32, jnp.int32, jnp.uint8

    stm: Dict = {
        "bits_seen": jnp.zeros((S,), u32),
        "new_bit": jnp.zeros((S,), u32),
        "acc": jnp.zeros((S,), u32),  # bits of the in-flight byte (MSB-first value)
        "last_byte": jnp.zeros((S,), u32),
        "recent": jnp.zeros((S, 16), u32),  # recent[:, i] = byte i-ago (i=0: last)
        "ctx": jnp.zeros((S, meta.n_ctx), u32),
        "hist_n": jnp.zeros((S,), u32),
        "ppm_probs": jnp.full((S, 256), 1.0 / 256, f32),
    }
    if spec.matches:
        nm = len(spec.matches)
        stm["match_ptr"] = jnp.zeros((S, nm), u32)
        stm["match_byte"] = jnp.zeros((S, nm), u32)
        stm["match_len"] = jnp.zeros((S, nm), i32)
    if spec.ihash_ctxs:
        nih = len(spec.ihash_ctxs)
        stm["ih_outer_ctx"] = jnp.zeros((S, nih), u32)
        stm["ih_outer_hash"] = jnp.zeros((S, nih), u32)

    ltm: Dict = {}

    # --- indirect models ---
    # Per bucket: one u8 state table pair [ns | rm] stacked on the model axis
    # (ns init 255 = never seen, rm init 0; long-term-memory.h:11-16) and the
    # shared 256-entry state->logit tables. Power-of-two T keeps XLA:TPU's
    # vectorized scatter emitter engaged (see core/meta.py note).
    ind = {}
    for b in meta.ind_buckets:
        M, T = len(b.model_idxs), b.table_size
        ind[f"b{b.table_bits}"] = {
            "ns_t": jnp.full((S, M, T), 255, u8),
            "rm_t": jnp.zeros((S, M, T), u8),
            "p": jnp.zeros((S, 2 * M, 256), f32),
        }
    ltm["ind"] = ind

    # --- mixers ---
    mix = {}
    n_mixers_total = 0
    for ml in meta.mix_layers:
        n_mixers_total += ml.n
        for tb, ks in ml.buckets.items():
            mix[f"l{ml.layer}b{tb}"] = {
                "w": jnp.zeros((S, len(ks), 1 << tb, ml.width_pad), f32),
                "steps": jnp.zeros((S, len(ks), 1 << tb), u32),
            }
    ltm["mix"] = mix
    ltm["mix_max_steps"] = jnp.ones((S, n_mixers_total), u32)  # mixer.cpp:8

    # --- match models ---
    if spec.matches:
        nm = len(spec.matches)
        mt = {}
        for b in meta.match_buckets:
            mt[f"b{b.table_bits}"] = jnp.zeros((S, len(b.model_idxs), 1 << b.table_bits), u32)
        ltm["match_tbl"] = mt
        # predictions[i] = 0.5 + (i+0.5)/512, counts = 1 (match.cpp:19-23)
        pred0 = 0.5 + (np.arange(256, dtype=np.float32) + 0.5) / 512.0
        ltm["match_pred"] = jnp.broadcast_to(jnp.asarray(pred0, f32), (S, nm, 256)).copy()
        ltm["match_cnt"] = jnp.ones((S, nm, 256), i32)

    # --- indirect-hash tables: model-member state, serialized short-term in
    # the reference (indirect-hash.cpp:33-54 via predictor.cpp:396-399) and
    # still updating during generation ---
    if spec.ihash_ctxs:
        ih = {}
        for b in meta.ih_buckets:
            ih[f"b{b.table_bits}"] = jnp.zeros((S, len(b.ctx_idxs), 1 << b.table_bits), u32)
        stm["ih"] = ih

    # --- dedup history ring ---
    ltm["hist"] = jnp.zeros((S, meta.history_size), u8)

    # --- PPM byte model (device-native ModPPMD equivalent). The tables live
    # in SHORT-term memory mirroring the reference, whose entire PPMD heap is
    # serialized as short-term state and keeps updating during generation
    # (mod_ppmd.cpp:1-6, tester.cpp:358-366) ---
    if spec.ppm is not None:
        stm["ppm"] = {
            f"o{i}": jnp.zeros((S, 1 << o.table_bits, 256), jnp.uint16)
            for i, o in enumerate(spec.ppm.orders)
        }
        stm["ppm_top"] = jnp.full((S,), 255, i32)
        stm["ppm_bot"] = jnp.zeros((S,), i32)
        stm["ppm_mid"] = jnp.full((S,), 127, i32)

    # --- LSTM ---
    if spec.lstm is not None:
        ls = spec.lstm
        C, Hz = ls.num_cells, ls.horizon
        LI = ls.input_size + C + 1  # [aux, hidden, bias]
        RW = ls.output_size + LI  # weight row: [one-hot symbol | input vec]
        # Xavier-uniform like lstm-layer.cpp:179-195 (our own PRNG; encoder and
        # decoder both derive the identical init from the fixed seed).
        val = math.sqrt(6.0 / float(ls.input_size + ls.output_size))
        key = jax.random.PRNGKey(seed)
        gate_w = jax.random.uniform(key, (3, C, RW), f32, -val, val)
        gate_w = gate_w.at[0, :, RW - 1].set(1.0)  # forget-gate bias column = 1
        ltm["lstm"] = {
            "gate_w": jnp.broadcast_to(gate_w, (S, 3, C, RW)).copy(),
            "gate_m": jnp.zeros((S, 3, C, RW), f32),
            "gate_v": jnp.zeros((S, 3, C, RW), f32),
            "gamma": jnp.ones((S, 3, C), f32),
            "beta": jnp.zeros((S, 3, C), f32),
            "gamma_m": jnp.zeros((S, 3, C), f32),
            "gamma_v": jnp.zeros((S, 3, C), f32),
            "beta_m": jnp.zeros((S, 3, C), f32),
            "beta_v": jnp.zeros((S, 3, C), f32),
            "out_w": jnp.zeros((S, Hz, ls.output_size, C + 1), f32),
        }
        hidden = jnp.zeros((S, C + 1), f32).at[:, C].set(1.0)  # bias lane (lstm.cpp:31)
        layer_input = jnp.zeros((S, Hz, LI), f32).at[:, :, LI - 1].set(1.0)
        stm["lstm"] = {
            "probs": jnp.full((S, 256), 1.0 / 256, f32),  # byte-level output
            "top": jnp.full((S,), 255, i32),
            "bot": jnp.zeros((S,), i32),
            "mid": jnp.full((S,), 127, i32),
            "cell": jnp.zeros((S, C), f32),
            "hidden": hidden,
            "hidden_err": jnp.zeros((S, C), f32),
            "state_err": jnp.zeros((S, C), f32),
            "stored_err": jnp.zeros((S, C), f32),
            "norm": jnp.zeros((S, 3, Hz, C), f32),
            "ivar": jnp.zeros((S, 3, Hz), f32),
            "gate_state": jnp.zeros((S, 3, Hz, C), f32),
            "tanh_state": jnp.zeros((S, Hz, C), f32),
            "in_gate": jnp.zeros((S, Hz, C), f32),
            "last_state": jnp.zeros((S, Hz, C), f32),
            "layer_input": layer_input,
            "in_hist": jnp.zeros((S, Hz), i32),
            "outputs": jnp.full((S, Hz, ls.output_size), 1.0 / ls.output_size, f32),
            "epoch": jnp.zeros((), i32),
            "update_steps": jnp.zeros((), i32),
        }

    coder = {
        "x1": jnp.zeros((S,), u32),
        "x2": jnp.full((S,), 0xFFFFFFFF, u32),
        "x": jnp.zeros((S,), u32),
        "wpos": jnp.zeros((S,), u32),
        "rpos": jnp.zeros((S,), u32),
    }

    # metrics: cumulative cross-entropy (bits) + per-column analysis EMA
    # (reference: Predictor::UpdateEntropy alpha=1e-5, predictor.cpp:439-469);
    # columns = predictions + L0/L1 mixer outputs + final (core.meta.analysis_names)
    n_cols = (
        meta.n_pred + meta.mix_layers[0].n + meta.mix_layers[1].n + 1
    )
    metrics = {
        "ent": jnp.zeros((S,), f32),
        "ema": jnp.full((S, n_cols), 1.0, f32),
    }

    return {"stm": stm, "ltm": ltm, "coder": coder, "metrics": metrics}


def state_bytes(state) -> int:
    """Total size of the state pytree in bytes."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(state))
