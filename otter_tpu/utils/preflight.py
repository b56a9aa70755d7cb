"""Device preflight: probe accelerator liveness from a subprocess.

The remote-TPU tunnel used in some environments can hang a process during
backend initialization; probing from a disposable subprocess (with timeout
and retries) lets benches and pipelines fall back to CPU instead of hanging.
"""

from __future__ import annotations

import subprocess
import sys
import time


PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "print(float((jnp.ones((8,128))*2).sum()), jax.devices()[0].platform)"
)


def probe_device(timeout_s: float = 90.0) -> str:
    """Returns the live platform name ('tpu', 'axon', 'cpu', ...) or ''
    when the accelerator backend does not come up within the timeout."""
    try:
        res = subprocess.run([sys.executable, "-c", PROBE_CODE],
                             capture_output=True, timeout=timeout_s,
                             text=True)
        if res.returncode == 0 and res.stdout.strip():
            return res.stdout.strip().split()[-1]
    except (subprocess.TimeoutExpired, OSError):
        pass
    return ""


def wait_for_device(retries: int = 3, timeout_s: float = 90.0,
                    sleep_s: float = 20.0) -> str:
    for attempt in range(retries):
        plat = probe_device(timeout_s)
        if plat:
            return plat
        if attempt + 1 < retries:
            time.sleep(sleep_s)
    return ""


def device_roundtrip_ms(n: int = 3) -> float:
    """Min dispatch+materialize latency of a trivial device op, in ms.

    Distinguishes a direct-attached accelerator (<1 ms) from a network
    tunnel (tens of ms); used to decide whether chatty device paths (e.g.
    per-batch consensus cigar kernels) can beat the host engines."""
    import numpy as np
    import jax.numpy as jnp

    x = jnp.zeros((8, 128), dtype=jnp.int32)
    np.asarray(x + 1)  # warm (compile + first transfer)
    best = float("inf")
    for _ in range(max(1, n)):
        t0 = time.perf_counter()
        np.asarray(x + 1)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best


_CACHE_SET = False


def ensure_compile_cache() -> None:
    """Activate the persistent compile cache EXPLICITLY: on this axon
    image the JAX_COMPILATION_CACHE_DIR env var alone does not stick
    (same quirk as jax_platforms — the sitecustomize wins), so remote
    compiles (~20-60 s/kernel shape) silently re-run every process
    without this. Idempotent; safe pre- or post-backend-init."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    import os

    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_SET = True
    except Exception:
        pass
