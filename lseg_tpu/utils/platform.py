"""Make the JAX_PLATFORMS env var effective for CLI entry points.

The ambient environment pre-registers the TPU PJRT plugin via a
sitecustomize hook and exports JAX_PLATFORMS before the interpreter
starts, so re-exporting the variable for a child process is silently
ignored: jax still initializes the TPU backend, and if the tunnel/relay
is unreachable the process hangs at first device use instead of falling
back. `jax.config.update("jax_platforms", ...)` IS honored at any point
before backend initialization, so CLIs call this helper first thing in
main() to turn the conventional `JAX_PLATFORMS=cpu python demo.py ...`
invocation into the config update it needs to be.

No-op when the variable is unset (the ambient default platform wins) or
when a backend is already initialized (tests' conftest handles itself).
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_env"]


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized; too late to switch
