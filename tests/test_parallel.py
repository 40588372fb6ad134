"""Multi-device tests on the 8-way virtual CPU mesh: data-parallel stream
sharding (the framework's scaling axis - SURVEY.md 2) and the driver's
multi-chip dry run."""
import jax
import numpy as np
import pytest

import gmix_tpu as g


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8


def test_sharded_roundtrip():
    from gmix_tpu.core.codec import Predictor, compress_bytes, decompress_bytes
    from gmix_tpu.parallel.mesh import make_mesh, stream_sharding

    mesh = make_mesh(8)
    sh = stream_sharding(mesh)
    spec = g.tiny_spec(with_lstm=False)
    data = (b"sharded streams compress independently and gather in order. " * 40)[:2048]

    pe = Predictor(spec, 8, sharding=sh)
    blob = compress_bytes(data, spec, num_streams=8, chunk=64, pred=pe)
    pd = Predictor(spec, 8, sharding=sh)
    out = decompress_bytes(blob, spec, chunk=64, pred=pd)
    assert out == data


def test_sharded_matches_unsharded():
    """Sharding must not change the bytes: the per-stream programs are
    identical, so the archive is bit-identical with and without a mesh.
    This is SURVEY.md 7 hard-part 1 (cross-compilation determinism) and is a
    hard assertion — a rounding divergence here would mean archives are not
    portable across device topologies."""
    from gmix_tpu.core.codec import Predictor, compress_bytes
    from gmix_tpu.parallel.mesh import make_mesh, stream_sharding

    spec = g.tiny_spec(with_lstm=False)
    data = (b"determinism across shardings " * 60)[:1024]
    blob_plain = compress_bytes(data, spec, num_streams=8, chunk=64)
    mesh = make_mesh(8)
    pe = Predictor(spec, 8, sharding=stream_sharding(mesh))
    blob_mesh = compress_bytes(data, spec, num_streams=8, chunk=64, pred=pe)
    assert blob_mesh == blob_plain


def test_broadcast_pretrained():
    from gmix_tpu.core.codec import Predictor, compress_bytes
    from gmix_tpu.parallel.mesh import broadcast_pretrained

    spec = g.tiny_spec(with_lstm=False)
    data = (b"pretrain on one stream, fan out to many. " * 30)[:1024]
    p1 = Predictor(spec, 1)
    compress_bytes(data, spec, 1, 64, pred=p1)

    p8 = Predictor(spec, 8)
    p8.state = broadcast_pretrained(p1.state, 8)
    for leaf in jax.tree_util.tree_leaves(p8.state):
        if leaf.ndim >= 1:
            assert leaf.shape[0] in (8,)
    # warm-started streams all predict like the trained one
    import jax.numpy as jnp

    p8.state["coder"] = {k: jnp.zeros((8,), jnp.uint32) if k != "x2"
                         else jnp.full((8,), 0xFFFFFFFF, jnp.uint32)
                         for k in ("x1", "x2", "x", "wpos", "rpos")}
    p8.state["metrics"] = jax.tree_util.tree_map(jnp.zeros_like, p8.state["metrics"])
    blob = compress_bytes(data, spec, 8, 64, pred=p8)
    from gmix_tpu.core.codec import decompress_bytes

    # decoding needs the same warm start on the other side
    pd = Predictor(spec, 8)
    pd.state = broadcast_pretrained(p1.state, 8)
    # the 1-stream checkpoint carries POST-encode coder registers; decode
    # needs a fresh coder (decompress_bytes then primes x and rpos itself)
    pd.state["coder"] = {k: jnp.zeros((8,), jnp.uint32) if k != "x2"
                         else jnp.full((8,), 0xFFFFFFFF, jnp.uint32)
                         for k in ("x1", "x2", "x", "wpos", "rpos")}
    pd.state["metrics"] = jax.tree_util.tree_map(jnp.zeros_like, pd.state["metrics"])
    # fresh coder regs for decode priming are set inside decompress_bytes
    out = decompress_bytes(blob, spec, chunk=64, pred=pd)
    assert out == data


def test_dryrun_multichip():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec_ = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(mod)
    mod.dryrun_multichip(8)
