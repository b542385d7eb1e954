"""JAX persistent compilation cache helper.

The insert program (full descent while_loop inside a fori_loop) is
compile-heavy (~40-100 s cold on TPU); enabling the persistent cache makes
every subsequent process start warm.  Scripts and the bench call this once
at startup.
"""

import os


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 0.3) -> None:
    import jax

    path = path or os.environ.get(
        "RAG_COBWEB_TPU_JAX_CACHE", "/tmp/rag_cobweb_tpu_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass  # older jax without the knobs: carry on uncached
