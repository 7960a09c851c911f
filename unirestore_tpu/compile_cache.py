"""One shared persistent XLA compilation cache for every entry point.

This platform's remote compile server leaks memory across large compiles
within one client session (CLAUDE.md): the workaround everywhere is to
compile each big module in its own subprocess INTO the persistent cache
and have the measuring/training run load from it. That only works if
`bench.py`, `tools/bench_train.py`, `tools/eval_cache_quality.py` and
`Trainer.fit` all point at the SAME directory — hence a single helper
instead of four hand-copied literals.
"""

import os

DEFAULT_DIR = "/tmp/unirestore_jax_cache"


def cache_dir() -> str:
    return os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)


def enable_compile_cache() -> str | None:
    """Point jax at the shared persistent compilation cache.

    Returns the directory, or None if the backend rejects the option
    (exotic backends without cache support — the cache simply stays
    off)."""
    import jax
    d = cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        # cache EVERYTHING, not just modules whose pure compile time
        # exceeds jax's 1 s default: on this platform the remote-compile
        # RPC round trip costs 15 s (healthy tunnel) to minutes (degraded)
        # even for a sub-second compile, so a "too small to cache" module
        # still pays the full tunnel tax on every run — notably bench.py's
        # preflight matmul, whose cold path has measured > 300 s on a
        # degraded tunnel (2026-08-20) against a 300 s preflight timeout
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # bound growth: with min_compile_time 0 every module is cached, so
        # the shared dir accretes across bench/train/eval runs (measured
        # 5.2 GiB after one heavy session). jax's built-in LRU eviction
        # kicks in above jax_compilation_cache_max_size; 16 GiB sits far
        # above a session's working set, so warm production modules are
        # never evicted mid-round while /tmp growth stays bounded. (The
        # name is jax_compilation_cache_max_size — an earlier revision
        # passed a nonexistent jax_persistent_cache_max_size, which this
        # try/except silently no-op'd.)
        try:
            jax.config.update("jax_compilation_cache_max_size",
                              16 * 1024 ** 3)
        except Exception:
            pass  # older jax without eviction support: cache still works
    except Exception:
        return None
    return d
