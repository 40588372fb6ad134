"""gmix_tpu: a TPU-native context-mixing lossless codec (JAX/XLA/Pallas).

Brand-new implementation of the byronknoll/gmix architecture - a ~120-model
context-mixing ensemble fused by a 3-layer gated linear network driving a
binary arithmetic coder, learning online during compression - redesigned for
TPU execution: batched independent streams, byte-level scans with unrolled bit
sub-steps, bucketed gather/scatter model kernels, and data-parallel stream
sharding across device meshes.

See SURVEY.md for the reference structural analysis this is built against.
"""
import os as _os

# Persistent XLA compilation cache: this box has 2 CPUs and compiles of the
# fused codec step take minutes; caching makes every repeat invocation (tests,
# CLI, bench) near-instant. Disable with GMIX_NO_COMPILE_CACHE=1.
if not _os.environ.get("GMIX_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get("GMIX_COMPILE_CACHE", "/root/.cache/jax_gmix")
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

from .config import (  # noqa: F401
    EnsembleSpec,
    LstmSpec,
    best_spec,
    reference_spec,
    scale_tables,
    tiny_spec,
)
from .core.codec import (  # noqa: F401
    Predictor,
    compress_bytes,
    decompress_bytes,
    entropy_bits,
    generate_bytes,
)

__version__ = "0.1.0"
