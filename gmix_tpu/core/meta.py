"""Static kernel-layout metadata derived from an EnsembleSpec.

Heterogeneous model instances are grouped into *buckets* of equal table size so
each bucket is one batched gather/scatter over a (S, M_bucket, T) array - the
TPU-native replacement for the reference's per-instance virtual dispatch
(src/predictor.cpp:360-387). Everything here is host-side numpy, baked into the
jitted step as constants.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..config import EnsembleSpec

LANE = 128  # pad mixer weight rows to the TPU lane width


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class IndBucket:
    table_bits: int
    table_size: int  # (1<<tb)*256 + 1
    model_idxs: Tuple[int, ...]  # indices into spec.indirects
    ctx_slots: np.ndarray  # (M,) int32
    lrs: np.ndarray  # (M,) float32
    ns_cols: np.ndarray  # (M,) prediction columns (nonstationary)
    rm_cols: np.ndarray  # (M,) prediction columns (run map)


@dataclass
class MixLayer:
    layer: int
    n: int
    width: int  # unpadded input width
    width_pad: int
    lrs: np.ndarray  # (n,) float32 in k-order
    ctx_slots: np.ndarray  # (n,) int32 in k-order
    table_sizes: np.ndarray  # (n,) int64 in k-order
    # buckets: table_bits -> (k-positions in this layer)
    buckets: Dict[int, Tuple[int, ...]] = field(default_factory=dict)


@dataclass
class MatchBucket:
    table_bits: int
    model_idxs: Tuple[int, ...]
    ctx_slots: np.ndarray


@dataclass
class IhBucket:
    table_bits: int
    ctx_idxs: Tuple[int, ...]  # indices into spec.ihash_ctxs
    out_slots: np.ndarray  # output context slots
    outer_mods: np.ndarray  # (M,) uint32: 1 << 8*(outer_order-1)
    inner_mods: np.ndarray  # (M,) uint32


@dataclass
class Meta:
    spec: EnsembleSpec
    slots: Dict[str, int]
    n_ctx: int
    n_pred: int
    ind_buckets: List[IndBucket]
    mix_layers: List[MixLayer]  # [L0, L1, L2]
    match_buckets: List[MatchBucket]
    match_ctx_slots: np.ndarray  # (n_match,) in model order
    match_limits: np.ndarray  # (n_match,) int32
    match_cols: np.ndarray  # (n_match,) prediction columns
    ih_buckets: List[IhBucket]
    skip_offsets: List[Tuple[int, ...]]  # per skip ctx
    skip_slots: np.ndarray
    interval_maps: np.ndarray  # (n_interval, 256) int32 quantisation maps
    interval_shifts: np.ndarray
    interval_masks: np.ndarray
    interval_slots: np.ndarray
    history_size: int
    ppm_slots: np.ndarray  # (n_orders,) ctx slots, lowest order first
    ppm_bits: Tuple[int, ...]


def analysis_names(spec: EnsembleSpec) -> List[str]:
    """Column names of the per-bit analysis EMA (reference: EnableAnalysis /
    UpdateEntropy, predictor.cpp:422-469): one per prediction column, one per
    mixer output (L0/L1), and the final output."""
    names: List[str] = []
    if spec.use_ppm:
        names.append("ppm")
    if spec.lstm is not None:
        names.append("lstm")
    for m in spec.indirects:
        names += [f"{m.name}.ns", f"{m.name}.rm"]
    names += [m.name for m in spec.matches]
    names += [m.name for m in spec.mixers_in_layer(0)]
    names += [m.name for m in spec.mixers_in_layer(1)]
    names.append("final")
    return names


def build_meta(spec: EnsembleSpec) -> Meta:
    spec.validate()
    names = spec.ctx_names()
    slots = {n: i for i, n in enumerate(names)}

    # --- indirect buckets ---
    by_bits: Dict[int, List[int]] = {}
    for i, m in enumerate(spec.indirects):
        by_bits.setdefault(m.table_bits, []).append(i)
    ind_buckets = []
    for tb in sorted(by_bits):
        idxs = tuple(by_bits[tb])
        # NOTE: the reference sizes these tables (1<<tb)*256 + 1 to break
        # modular collision alignment (indirect.cpp:15-19). An odd-sized table
        # blocks XLA:TPU's vectorized scatter emitter (it falls back to a
        # serialized slab-copy loop, ~20x whole-program slowdown), so we keep
        # the table a power of two; contexts are murmur-hashed already, which
        # provides the decorrelation the +1 was for.
        ind_buckets.append(
            IndBucket(
                table_bits=tb,
                table_size=(1 << tb) * 256,
                model_idxs=idxs,
                ctx_slots=np.array([slots[spec.indirects[i].ctx] for i in idxs], np.int32),
                lrs=np.array([spec.indirects[i].lr for i in idxs], np.float32),
                ns_cols=np.array([spec.ind_col0 + 2 * i for i in idxs], np.int32),
                rm_cols=np.array([spec.ind_col0 + 2 * i + 1 for i in idxs], np.int32),
            )
        )

    # --- mixer layers ---
    mix_layers = []
    for layer in range(3):
        ms = spec.mixers_in_layer(layer)
        width = spec.mixer_width(layer)
        ml = MixLayer(
            layer=layer,
            n=len(ms),
            width=width,
            width_pad=_round_up(max(width, 1), LANE),
            lrs=np.array([m.lr for m in ms], np.float32),
            ctx_slots=np.array([slots[m.ctx] for m in ms], np.int32),
            table_sizes=np.array([1 << m.table_bits for m in ms], np.int64),
        )
        buckets: Dict[int, List[int]] = {}
        for k, m in enumerate(ms):
            buckets.setdefault(m.table_bits, []).append(k)
        ml.buckets = {tb: tuple(ks) for tb, ks in sorted(buckets.items())}
        mix_layers.append(ml)

    # --- match buckets ---
    mby: Dict[int, List[int]] = {}
    for i, m in enumerate(spec.matches):
        mby.setdefault(m.table_bits, []).append(i)
    match_buckets = [
        MatchBucket(
            table_bits=tb,
            model_idxs=tuple(idxs),
            ctx_slots=np.array([slots[spec.matches[i].ctx] for i in idxs], np.int32),
        )
        for tb, idxs in sorted(mby.items())
    ]

    # --- indirect-hash buckets ---
    iby: Dict[int, List[int]] = {}
    for i, c in enumerate(spec.ihash_ctxs):
        iby.setdefault(c.table_bits, []).append(i)
    ih_buckets = []
    for tb, idxs in sorted(iby.items()):
        cs = [spec.ihash_ctxs[i] for i in idxs]
        ih_buckets.append(
            IhBucket(
                table_bits=tb,
                ctx_idxs=tuple(idxs),
                out_slots=np.array([slots[c.name] for c in cs], np.int32),
                outer_mods=np.array([1 << (8 * (c.outer_order - 1)) for c in cs], np.uint32),
                inner_mods=np.array([1 << (8 * (c.inner_order - 1)) for c in cs], np.uint32),
            )
        )

    # --- interval contexts ---
    n_int = len(spec.interval_ctxs)
    interval_maps = np.zeros((max(n_int, 1), 256), np.int32)
    interval_shifts = np.zeros((max(n_int, 1),), np.int32)
    interval_masks = np.zeros((max(n_int, 1),), np.uint32)
    for i, c in enumerate(spec.interval_ctxs):
        interval_maps[i] = np.arange(256) // c.divisor
        max_value = 255 // c.divisor
        shift = 1
        while (1 << shift) <= max_value:
            shift += 1  # interval-context.cpp:12-13
        interval_shifts[i] = shift
        interval_masks[i] = (1 << c.num_bits) - 1

    return Meta(
        spec=spec,
        slots=slots,
        n_ctx=len(names),
        n_pred=spec.num_predictions,
        ind_buckets=ind_buckets,
        mix_layers=mix_layers,
        match_buckets=match_buckets,
        match_ctx_slots=np.array([slots[m.ctx] for m in spec.matches], np.int32),
        match_limits=np.array([m.limit for m in spec.matches], np.int32),
        match_cols=np.array(
            [spec.match_col0 + i for i in range(len(spec.matches))], np.int32
        ),
        ih_buckets=ih_buckets,
        skip_offsets=[c.offsets for c in spec.skip_ctxs],
        skip_slots=np.array([slots[c.name] for c in spec.skip_ctxs], np.int32),
        interval_maps=interval_maps,
        interval_shifts=interval_shifts,
        interval_masks=interval_masks,
        interval_slots=np.array(
            [slots[c.name] for c in spec.interval_ctxs], np.int32
        ),
        history_size=1 << spec.history_bits,
        ppm_slots=np.array(
            [slots[o.ctx] for o in (spec.ppm.orders if spec.ppm else ())], np.int32
        ),
        ppm_bits=tuple(o.table_bits for o in (spec.ppm.orders if spec.ppm else ())),
    )
