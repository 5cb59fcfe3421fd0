"""Training-dynamics parity: N full train steps vs torch, same weights/data.

The strongest end-to-end fidelity check short of real-data convergence:
convert a reference model's initial weights, run identical batches through
torch (CE + AdamW, fp32) and through our train step, and require losses and
updated parameters to match. This exercises the whole stack — forward
(train-mode BN), backward, and optimizer — through every layer.

Dropout is disabled on both sides (masks can't be matched across
frameworks); everything else runs exactly as in training.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)
needs_ref = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "config")),
                               reason="reference checkout not available")

from picklebot_tpu.core.module import DtypePolicy  # noqa: E402
from picklebot_tpu.models.mobilenet3d import MobileNetSmall3D  # noqa: E402
from picklebot_tpu.ops.linear import ChannelDropout  # noqa: E402
from picklebot_tpu.train.checkpoint import import_torch_state_dict  # noqa: E402
from picklebot_tpu.train.key_maps import mobilenet3d_key_map  # noqa: E402
from picklebot_tpu.train.optim import AdamW  # noqa: E402
from picklebot_tpu.train.step import create_train_state, make_train_step  # noqa: E402


@needs_ref
@pytest.mark.golden
@pytest.mark.slow
def test_two_train_steps_match_torch(rng, monkeypatch):
    from mobilenet import MobileNetSmall3D as TorchSmall

    torch.manual_seed(0)
    tmodel = TorchSmall(num_classes=13)
    tmodel.train()
    for m in tmodel.modules():  # disable dropout on both sides
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout3d)):
            m.p = 0.0
    monkeypatch.setattr(ChannelDropout, "forward",
                        lambda self, cx, x: x)

    lr, wd = 1e-3, 1e-2
    topt = torch.optim.AdamW(tmodel.parameters(), lr=lr, weight_decay=wd)
    crit = torch.nn.CrossEntropyLoss()

    ours = MobileNetSmall3D(num_classes=13)
    opt = AdamW(weight_decay=wd)
    state = create_train_state(ours, opt, 0)
    variables = import_torch_state_dict(
        {k: v.detach().float().numpy() for k, v in
         tmodel.state_dict().items()},
        {"params": state.params, "state": state.model_state},
        key_map=mobilenet3d_key_map)
    state = state._replace(params=variables["params"],
                           model_state=variables["state"])
    step = make_train_step(ours, opt, "CE", lambda e: jnp.float32(lr),
                           policy=DtypePolicy.f32(), donate=False)

    torch_losses, our_losses = [], []
    for i in range(2):
        feats = rng.randint(0, 255, (4, 6, 32, 32, 3)).astype(np.uint8)
        labels = rng.randint(0, 13, (4,)).astype(np.int64)

        tx = (torch.from_numpy(feats).permute(0, 4, 1, 2, 3).float() / 255)
        topt.zero_grad()
        tloss = crit(tmodel(tx), torch.from_numpy(labels))
        tloss.backward()
        topt.step()
        torch_losses.append(float(tloss))

        state, metrics = step(state, jnp.asarray(feats)[None],
                              jnp.asarray(labels.astype(np.int32))[None],
                              jax.random.key(i))
        our_losses.append(float(metrics["loss"][0]))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-4, atol=2e-4)

    # updated parameters must track torch's after both steps. Tolerance
    # rationale: Adam normalizes each element by sqrt(v), so for degenerate
    # parameters whose true gradient is ~0 — notably conv biases immediately
    # followed by BatchNorm (the stem's bias is mathematically redundant) —
    # both frameworks amplify pure float noise to a full ~lr-sized update in
    # an arbitrary direction. Bound is therefore ~2 steps x 2*lr; genuine
    # conversion/training bugs show up at weight scale (~0.06), 15x larger
    # (e.g. the torch-numpy buffer aliasing this test originally caught).
    final = import_torch_state_dict(
        {k: v.detach().float().numpy() for k, v in
         tmodel.state_dict().items()},
        {"params": jax.device_get(state.params),
         "state": jax.device_get(state.model_state)},
        key_map=mobilenet3d_key_map)
    for (pa, pb) in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(final["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=5e-3, atol=4e-3)
    # BN running statistics track torch's too (they inherit the shifted
    # activations caused by the noise-amplified degenerate biases above, so
    # the bound matches the parameter bound scaled by momentum)
    for (sa, sb) in zip(jax.tree_util.tree_leaves(state.model_state),
                        jax.tree_util.tree_leaves(final["state"])):
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-3, atol=1e-3)
