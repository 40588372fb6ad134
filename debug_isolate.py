"""Progressive component isolation for the roundtrip bug (throwaway)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
import gmix_tpu as g
from gmix_tpu.config import *
from gmix_tpu.core.codec import Predictor, compress_bytes, decompress_bytes, entropy_bits

data = (b"the quick brown fox jumps over the lazy dog. " * 20)[:512]

def base(**kw):
    d = dict(
        skip_ctxs=(), interval_ctxs=(), ihash_ctxs=(),
        indirects=(IndirectModel("ind_1b", "last_byte", 4, 0.02),),
        matches=(), lstm=None, ppm=None, history_bits=10,
        mixers=(
            MixerModel("m0", "zero", 0.005, 0, 0),
            MixerModel("m1", "zero", 0.0035, 1, 0),
            MixerModel("mf", "zero", 0.0005, 2, 0),
        ),
    )
    d.update(kw)
    s = EnsembleSpec(**d)
    s.validate()
    return s

def trial(name, spec, chunk=128):
    pred_e = Predictor(spec, 1)
    blob = compress_bytes(data, spec, num_streams=1, chunk=chunk, pred=pred_e)
    ent = entropy_bits(pred_e)
    pred_d = Predictor(spec, 1)
    out = decompress_bytes(blob, spec, chunk=chunk, pred=pred_d)
    ok = out == data
    print(f"[{name}] bytes={len(blob)} ent/byte={ent/len(data):.3f} roundtrip={ok}", flush=True)
    if not ok:
        # first divergent byte
        o = np.frombuffer(out, np.uint8); d0 = np.frombuffer(data, np.uint8)
        bad = np.nonzero(o != d0)[0]
        print("  first bad byte:", bad[0] if len(bad) else None, "of", len(data), flush=True)
        # compare final states
        le = jax.tree_util.tree_leaves_with_path(pred_e.state)
        ld = jax.tree_util.tree_leaves_with_path(pred_d.state)
        for (pe, ae), (pd, ad) in zip(le, ld):
            ae, ad = np.asarray(ae), np.asarray(ad)
            if not np.array_equal(ae, ad):
                print("  DIFF:", jax.tree_util.keystr(pe), ae.dtype, ae.shape, flush=True)
    return ok

trial("A: 1 indirect + 3 zero mixers", base())
trial("B: +h2 skip ctx + indirect", base(
    skip_ctxs=(SkipCtx("h2", (0, 1)),),
    indirects=(IndirectModel("i1", "last_byte", 4, 0.02), IndirectModel("i2", "h2", 6, 0.02)),
))
trial("C: +interval+ihash", base(
    skip_ctxs=(SkipCtx("h2", (0, 1)),),
    interval_ctxs=(IntervalCtx("int_16_4", 16, 4),),
    ihash_ctxs=(IndirectHashCtx("ih_1_6_1", 1, 6, 1),),
    indirects=(IndirectModel("i1", "last_byte", 4, 0.02), IndirectModel("i3", "ih_1_6_1", 4, 1/200)),
    mixers=(
        MixerModel("m0", "last_byte", 0.005, 0, 8),
        MixerModel("m0b", "int_16_4", 0.005, 0, 4),
        MixerModel("m1", "bit_ctx", 0.003, 1, 8),
        MixerModel("mf", "zero", 0.0005, 2, 0),
    ),
))
trial("D: +match", base(
    skip_ctxs=(SkipCtx("h2", (0, 1)),),
    indirects=(IndirectModel("i1", "last_byte", 4, 0.02),),
    matches=(MatchModel("match_2b", "h2", 8),),
))
trial("E: tiny full (no lstm)", g.tiny_spec(False))
trial("F: tiny full + lstm", g.tiny_spec(True))
