"""Subprocess helper for test_bench_backend.py::test_stable_seed_*.

Simulates the axon tunnel's session-varying compile_options bytes by
mixing a per-run NONCE into jax's compile_options hash, then compiles a
small program with the persistent cache + stable-key seed store
enabled.  Prints CACHE_DIR_ENTRIES=<n> and RESULT=<sum> for the parent
test to assert on; the stable-seed shim itself prints
"compcache: seeded ..." on a stable-store hit.

Usage: python helper_stable_seed.py <repo_store_root>
Env:   NONCE (required), SRT_CACHE_DIR (required), SRT_CCACHE_REPO
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
repo_store_root = sys.argv[1]

import jax

jax.config.update("jax_platforms", "cpu")

from jax._src import cache_key as ck

_orig_hash_co = ck._hash_serialized_compile_options


def _noisy(hash_obj, compile_options_obj, strip_device_assignment=False):
    _orig_hash_co(hash_obj, compile_options_obj, strip_device_assignment)
    hash_obj.update(os.environ["NONCE"].encode())


ck._hash_serialized_compile_options = _noisy

from shader_ray_tpu.utils import compcache

compcache._repo_cache_dir = lambda subdir: os.path.join(
    repo_store_root, subdir)
path = compcache.enable_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


@jax.jit
def f(x):
    return jnp.sin(x @ x.T).sum() * 3.0


x = jnp.asarray(np.arange(64.0, dtype=np.float32).reshape(8, 8))
r = float(f(x))
print("RESULT=%r" % r)
entries = [n for n in os.listdir(path) if n.endswith("-cache")]
print("CACHE_DIR_ENTRIES=%d" % len(entries))
for n in entries:
    print("ENTRY=%s" % n)
