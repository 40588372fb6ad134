"""Driver benchmark: encode+decode throughput at roundtrip-exactness on the
real TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline = the reference gmix binary (single CPU core, measured locally and
recorded in data/baseline_measured.json by tools/measure_reference.py; the
upstream publishes no numbers - BASELINE.md).

Environment knobs:
  GMIX_BENCH_BYTES    corpus size        (default 1048576)
  GMIX_BENCH_STREAMS  parallel streams   (default 16)
  GMIX_BENCH_CHUNK    scan chunk bytes   (default 4096)
  GMIX_BENCH_PROFILE  ensemble profile   (default scaled-14)
"""
import json
import os
import sys
import time


def _corpus(n: int) -> bytes:
    path = os.path.join(os.path.dirname(__file__), "data", "corpus_1m.bin")
    if os.path.exists(path):
        data = open(path, "rb").read()
    else:
        # deterministic fallback: the reference's own text assets
        data = open("/root/reference/dictionary/english.dic", "rb").read()
        data += open("/root/reference/article_order/enwik9_article_order", "rb").read()
    while len(data) < n:
        data += data
    return data[:n]


def main():
    n = int(os.environ.get("GMIX_BENCH_BYTES", 1 << 20))
    streams = int(os.environ.get("GMIX_BENCH_STREAMS", 16))
    chunk = int(os.environ.get("GMIX_BENCH_CHUNK", 4096))
    profile = os.environ.get("GMIX_BENCH_PROFILE", "scaled-14")

    import jax

    from gmix_tpu.config import reference_spec, scale_tables, tiny_spec
    from gmix_tpu.core.codec import (
        Predictor,
        compress_bytes,
        decompress_bytes,
        entropy_bits,
    )

    if profile == "ref":
        spec = reference_spec()
    elif profile == "tiny":
        spec = tiny_spec(True)
    else:
        bits = int(profile.split("-")[1])
        spec = scale_tables(reference_spec(), bits, history_bits=min(24, bits + 4))

    data = _corpus(n)
    dev = jax.devices()[0]
    sys.stderr.write(f"bench: {n} bytes, {streams} streams, chunk {chunk}, "
                     f"profile {profile}, device {dev}\n")

    # warm-up/compile on a small slice so timed runs measure steady state
    warm = data[: streams * chunk]
    pred_w = Predictor(spec, streams)
    compress_bytes(warm, spec, streams, chunk, pred=pred_w)

    pred_e = Predictor(spec, streams)
    t0 = time.time()
    blob = compress_bytes(data, spec, streams, chunk, pred=pred_e)
    jax.block_until_ready(pred_e.state["metrics"]["ent"])
    t_enc = time.time() - t0

    pred_d = Predictor(spec, streams)
    t0 = time.time()
    out = decompress_bytes(blob, spec, chunk, pred=pred_d)
    t_dec = time.time() - t0

    exact = out == data
    ent = entropy_bits(pred_e) / len(data)
    mbps = 2 * len(data) / (t_enc + t_dec) / 1e6

    base_path = os.path.join(os.path.dirname(__file__), "data", "baseline_measured.json")
    vs = 0.0
    if os.path.exists(base_path):
        base = json.load(open(base_path))
        ref_mbps = base.get("ref_encdec_mbps", 0.0)
        if ref_mbps > 0:
            vs = mbps / ref_mbps

    sys.stderr.write(
        f"bench: {len(data)} -> {len(blob)} bytes ({8*len(blob)/len(data):.4f} bpb, "
        f"model {ent:.4f} bpb), enc {t_enc:.1f}s dec {t_dec:.1f}s, exact={exact}\n"
    )
    if not exact:
        print(json.dumps({"metric": "corpus encode+decode MB/s (ROUNDTRIP FAILED)",
                          "value": 0.0, "unit": "MB/s", "vs_baseline": 0.0}))
        return 1
    print(json.dumps({
        "metric": f"corpus-1M encode+decode MB/s per chip ({profile}, {streams} streams)",
        "value": round(mbps, 4),
        "unit": "MB/s",
        "vs_baseline": round(vs, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
