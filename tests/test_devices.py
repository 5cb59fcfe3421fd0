"""Device-discovery watchdog (utils/devices.py): the remote-TPU tunnel
hangs jax.devices() forever when down — entry points must fail actionably
after a bounded wait instead."""

import time

import pytest

from picklebot_tpu.utils.devices import (DeviceDiscoveryTimeout,
                                         require_devices)


def test_require_devices_returns_devices():
    devs = require_devices(timeout_s=60.0)
    assert len(devs) >= 1


def test_require_devices_times_out_on_hang(monkeypatch):
    import jax

    def hang():
        time.sleep(30)

    monkeypatch.setattr(jax, "devices", hang)
    t0 = time.time()
    with pytest.raises(DeviceDiscoveryTimeout, match="PICKLEBOT_PLATFORM"):
        require_devices(timeout_s=0.2)
    assert time.time() - t0 < 5.0


def test_require_devices_surfaces_backend_errors(monkeypatch):
    import jax

    def boom():
        raise RuntimeError("backend exploded")

    monkeypatch.setattr(jax, "devices", boom)
    with pytest.raises(RuntimeError, match="backend exploded"):
        require_devices(timeout_s=5.0)
