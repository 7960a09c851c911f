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
    except Exception:
        return None
    return d
