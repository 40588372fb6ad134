"""End-to-end roundtrip tests (reference: tester.cpp TestCompression /
TestDecompressionWithRestart)."""
import numpy as np
import pytest

import gmix_tpu as g

TEXT = (
    b"It is a truth universally acknowledged, that a single man in possession "
    b"of a good fortune, must be in want of a wife. " * 24
)


@pytest.mark.parametrize("streams,chunk", [(2, 128)])
def test_roundtrip_tiny(streams, chunk):
    spec = g.tiny_spec(with_lstm=False)
    data = TEXT[:1500]
    blob = g.compress_bytes(data, spec, num_streams=streams, chunk=chunk)
    assert g.decompress_bytes(blob, spec, chunk=chunk) == data
    # online learning must actually compress repetitive text
    assert len(blob) < len(data)


def test_roundtrip_lstm():
    spec = g.tiny_spec(with_lstm=True)
    data = TEXT[:1024]
    blob = g.compress_bytes(data, spec, num_streams=1, chunk=256)
    assert g.decompress_bytes(blob, spec, chunk=256) == data


def test_roundtrip_binary():
    rng = np.random.RandomState(0)
    data = rng.bytes(2048)
    spec = g.tiny_spec(with_lstm=False)
    blob = g.compress_bytes(data, spec, num_streams=2, chunk=128)
    assert g.decompress_bytes(blob, spec, chunk=128) == data


def test_roundtrip_empty_and_tiny_inputs():
    spec = g.tiny_spec(with_lstm=False)
    assert g.decompress_bytes(g.compress_bytes(b"", spec, 2, 128), spec, chunk=128) == b""
    for n in (1, 2, 127, 128, 129):
        data = TEXT[:n]
        blob = g.compress_bytes(data, spec, num_streams=2, chunk=128)
        assert g.decompress_bytes(blob, spec, chunk=128) == data


def test_code_buffer_overflow_raises():
    """An undersized code buffer must raise, never silently drop output
    bytes (the coder keeps a sticky per-stream overflow flag checked at the
    end of the run)."""
    import jax.numpy as jnp

    from gmix_tpu.core.codec import Predictor, run_chunks

    spec = g.tiny_spec(with_lstm=False)
    rng = np.random.RandomState(42)
    data = np.frombuffer(rng.bytes(1024), np.uint8).reshape(1, 1024)
    pred = Predictor(spec, 1)
    data_buf = jnp.asarray(data)
    code_buf = jnp.zeros((1, 64), jnp.uint8)  # ~16x too small for random data
    with pytest.raises(RuntimeError, match="overflow"):
        run_chunks(pred, data_buf, code_buf, 1024, decode=False, chunk=128)


def test_entropy_reported():
    from gmix_tpu.core.codec import Predictor, compress_bytes, entropy_bits

    spec = g.tiny_spec(with_lstm=False)
    pred = Predictor(spec, 2)
    data = TEXT[:1024]
    compress_bytes(data, spec, 2, 128, pred=pred)
    ent = entropy_bits(pred)
    assert 0 < ent < 8.0 * 1100  # less than 8 bits/byte incl. padding
