"""JAX runtime helpers: persistent compilation cache, backend queries.

One fused-kernel variant is compiled per (sampling mode, batch size); TPU
compiles are expensive (tens of seconds), so the persistent compilation
cache makes them one-time per machine.  This replaces the reference's
repeated per-batch ``pim.load(DPU_BINARY)`` (reference:
src/decoder_host.cpp:268 — identified in SURVEY.md section 7 as overhead
not to replicate).
"""

from __future__ import annotations

import os
import tempfile
import threading

_lock = threading.Lock()
_initialized = False


def ensure_compilation_cache() -> None:
    """Enable the persistent compilation cache (idempotent, best-effort)."""
    global _initialized
    with _lock:
        if _initialized:
            return
        _initialized = True
        if os.environ.get("PIM_JPEG_TPU_NO_COMPILE_CACHE") == "1":
            return
        try:
            import jax
            if jax.default_backend() != "tpu":
                # CPU AOT cache entries are machine-specific: reusing a blob
                # compiled on a different host CPU risks SIGILL.  Only the
                # (expensive, portable) TPU Mosaic compiles are cached.
                return
            cache_dir = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(tempfile.gettempdir(), "pim_jpeg_tpu",
                             "jax_cache"))
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # cache is an optimization only
