"""Metrics tests: our tfevents files must be readable by real TensorBoard,
and windowed_average must match the reference's get_average."""

import numpy as np
import pytest

from picklebot_tpu.train.metrics import (SummaryWriter, crc32c,
                                         windowed_average)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_tfevents_readable_by_tensorboard(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing."
                             "event_accumulator")
    logdir = str(tmp_path / "run")
    w = SummaryWriter(logdir)
    for step in range(5):
        w.add_scalar("training loss", 2.5 - 0.1 * step, step)
        w.add_scalar("training accuracy", 0.1 * step, step)
    w.close()

    acc = tb.EventAccumulator(logdir)
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert "training loss" in tags and "training accuracy" in tags
    losses = acc.Scalars("training loss")
    assert len(losses) == 5
    np.testing.assert_allclose(losses[0].value, 2.5, rtol=1e-6)
    np.testing.assert_allclose(losses[4].value, 2.1, rtol=1e-6)
    assert losses[4].step == 4


def test_windowed_average_matches_reference_get_average():
    torch = pytest.importorskip("torch")

    def ref_get_average(loss_list, window_size=1000):
        partial_size = len(loss_list) % window_size
        if partial_size > 0:
            if len(loss_list) > partial_size:
                avg = torch.tensor(
                    loss_list[:-partial_size]).view(-1, 1000).mean(1)
                avg_p = torch.tensor(
                    loss_list[-partial_size:]).view(-1, partial_size).mean(1)
                return torch.cat((avg, avg_p)).numpy()
            return torch.tensor(
                loss_list).view(-1, partial_size).mean(1).numpy()
        return torch.tensor(loss_list).view(-1, 1000).mean(1).numpy()

    rng = np.random.RandomState(0)
    for n in (5, 1000, 1500, 2000, 2345):
        vals = rng.rand(n).tolist()
        np.testing.assert_allclose(windowed_average(vals),
                                   ref_get_average(vals), rtol=1e-6)
