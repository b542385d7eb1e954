"""JAX persistent compilation cache helper.

The insert program (full descent while_loop inside a fori_loop) is
compile-heavy (~40-100 s cold on TPU); enabling the persistent cache makes
every subsequent process start warm.  Scripts and the bench call this once
at startup.
"""

import os


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 0.0) -> None:
    """``min_compile_secs=0``: persist EVERY compiled program.  The axon
    remote-compile path can return from ``backend_compile`` quickly while
    the real compile completes lazily (surfacing at first execution), so
    jax's measured compile time under-reports and the default 0.3 s
    threshold silently skipped the cache write for exactly the programs
    that cost minutes (the insert program: observed compiled-but-never-
    persisted across two round-4 bench runs while small query programs
    persisted fine)."""
    import jax

    # default the cache INSIDE the repo (gitignored): /tmp does not
    # survive environment restarts, and a wiped cache re-pays the remote
    # compile service's 2 s - 5 min per program on the next run.  When the
    # package is installed (site-packages parent may be unwritable) fall
    # back to a per-user cache dir.
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    path = path or os.environ.get("RAG_COBWEB_TPU_JAX_CACHE", default)
    try:
        os.makedirs(path, exist_ok=True)
        if not os.access(path, os.W_OK):
            raise OSError(f"{path} not writable")
    except OSError:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "rag_cobweb_tpu", "jax")
        os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass  # older jax without the knobs: carry on uncached
