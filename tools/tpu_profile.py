"""Roofline + trace capture for the per-byte codec step on the real TPU.

Reports, for a given (profile, streams, chunk):
- XLA cost analysis of the compiled chunk program (FLOPs, bytes accessed),
- measured steady-state chunk latency (compile excluded),
- achieved FLOP/s and HBM bandwidth vs the chip's peaks -> which wall the
  step is actually against (v5e: ~197 TF/s bf16, ~819 GB/s HBM),
- per-bit latency decomposition (us/bit, bytes/bit, flops/bit).

Optionally captures a jax.profiler trace (GMIX_PROFILE_DIR=...) for offline
op-level inspection with tensorboard's profile plugin.

Usage: python tools/tpu_profile.py [S ...]   (default 16)
Env: GMIX_SCALE_PROFILE (default scaled-12), GMIX_SCALE_CHUNK (default 500),
     GMIX_PROFILE_DIR (no trace capture if unset)
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmix_tpu.config import reference_spec, scale_tables
from gmix_tpu.core.codec import Predictor
from gmix_tpu.state import state_bytes

# TPU v5e (1 chip) peaks; adjust per target chip
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = 49e12
PEAK_HBM_BPS = 819e9


def run(streams: int, spec, chunk: int):
    pred = Predictor(spec, streams)
    data = np.random.default_rng(0).integers(0, 256, (streams, chunk * 4), np.uint8)
    data_buf = jnp.asarray(data)
    code_buf = jnp.zeros((streams, chunk * 40 + 4096), jnp.uint8)
    fn = pred.chunk_fn(chunk)
    dec = jnp.asarray(False)

    state, data_buf, code_buf, _w, _n = fn(pred.state, data_buf, code_buf, jnp.int32(0), dec)
    jax.block_until_ready(state["metrics"]["ent"])

    # cost analysis of the compiled executable
    cost = {}
    try:
        lowered = fn.lower(state, data_buf, code_buf, jnp.int32(chunk), dec)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        cost = {k: float(v) for k, v in ca.items() if isinstance(v, (int, float))}
    except Exception as e:  # cost analysis is best-effort per backend
        cost = {"error": str(e)[:200]}

    trace_dir = os.environ.get("GMIX_PROFILE_DIR")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    reps = 2
    for r in range(1, 1 + reps):
        state, data_buf, code_buf, _w, _n = fn(state, data_buf, code_buf, jnp.int32(chunk * r), dec)
    jax.block_until_ready(state["metrics"]["ent"])
    dt = (time.time() - t0) / reps
    if trace_dir:
        jax.profiler.stop_trace()

    bits = chunk * 8
    flops = cost.get("flops", 0.0)
    byts = cost.get("bytes accessed", 0.0)
    out = {
        "streams": streams,
        "chunk": chunk,
        "state_gb": round(state_bytes(pred.state) / 1e9, 2),
        "chunk_ms": round(dt * 1e3, 1),
        "us_per_bit": round(dt / bits * 1e6, 2),
        "enc_mbps": round(streams * chunk / dt / 1e6, 4),
        "flops_per_bit": round(flops / bits) if flops else None,
        "bytes_per_bit": round(byts / bits) if byts else None,
        "achieved_gflops": round(flops / dt / 1e9, 1) if flops else None,
        "achieved_gbps": round(byts / dt / 1e9, 1) if byts else None,
        "pct_peak_f32": round(100 * flops / dt / PEAK_F32_FLOPS, 2) if flops else None,
        "pct_peak_hbm": round(100 * byts / dt / PEAK_HBM_BPS, 2) if byts else None,
    }
    print(json.dumps(out), flush=True)
    del pred, state, data_buf, code_buf
    return out


if __name__ == "__main__":
    profile = os.environ.get("GMIX_SCALE_PROFILE", "scaled-12")
    chunk = int(os.environ.get("GMIX_SCALE_CHUNK", 500))
    bits = int(profile.split("-")[1])
    spec = scale_tables(reference_spec(), bits, history_bits=min(24, bits + 4))
    for s in [int(a) for a in sys.argv[1:]] or [16]:
        run(s, spec, chunk)
