"""Device discovery with a watchdog.

Through the remote-TPU tunnel, ``jax.devices()`` *hangs indefinitely* when
the tunnel is down (observed >400 s, CLAUDE.md) instead of raising — so a
user launching training against a dead tunnel sees a silent freeze. Every
user-facing entry point (cli.py, bench.py) funnels device discovery
through :func:`require_devices`, turning the hang into an actionable error
after a bounded wait. Compiles and execution are NOT under this timeout —
only the initial discovery, which normally returns in seconds even on a
cold connect.
"""

from __future__ import annotations


class DeviceDiscoveryTimeout(RuntimeError):
    """jax.devices() did not return within the watchdog window."""


def require_devices(timeout_s: float = 900.0):
    """Return ``jax.devices()``, raising :class:`DeviceDiscoveryTimeout`
    (with remediation steps) if discovery does not complete in time.

    Default 900 s: after a ~1 h idle gap the FIRST contact through a
    HEALTHY tunnel was measured at 625.7 s before recovering on its own
    (CLAUDE.md round 5) — a 600 s watchdog declared that live tunnel dead.
    The window must sit above the cold-warm-up worst case.

    Honors ``PICKLEBOT_PLATFORM`` (e.g. ``cpu``) before probing, so the
    remediation step in the timeout message works for *every* entry point
    that funnels through here — not just cli.py."""
    import os
    import threading

    platform = os.environ.get("PICKLEBOT_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    got = {}

    def probe():
        import jax
        try:
            got["devices"] = jax.devices()
        except BaseException as e:  # noqa: BLE001 — surface backend errors
            got["error"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "error" in got:
        raise got["error"]
    if "devices" not in got:
        raise DeviceDiscoveryTimeout(
            f"device discovery (jax.devices()) hung for {timeout_s:.0f}s — "
            "the TPU tunnel is unreachable (note: the first contact after "
            "a long idle gap can itself take 10+ min before recovering). "
            "Set PICKLEBOT_PLATFORM=cpu to run on the host CPU, or restore "
            "the TPU connection and retry.")
    return got["devices"]
