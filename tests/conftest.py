"""Test harness: force a CLEAN CPU backend with 8 virtual devices.

The container's sitecustomize (PYTHONPATH=/root/.axon_site) registers the axon
TPU PJRT plugin in every interpreter. Empirically, merely having that plugin
registered corrupts CPU-backend numerics in this image (a plain jnp.where
returns wrong values) and intermittently hangs host transfers. The only robust
fix is to not load the plugin at all for CPU test runs, so if we detect it on
the import path we re-exec pytest with a scrubbed environment.

Real-TPU validation runs separately (bench.py and __graft_entry__ use the axon
backend directly).
"""
import os
import sys

if "axon_site" in os.environ.get("PYTHONPATH", ""):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
