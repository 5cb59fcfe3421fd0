"""Round-trip export (pytree -> .pth -> pytree) and determinism tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from picklebot_tpu.train.checkpoint import (export_torch_state_dict,
                                            import_torch_state_dict)


@pytest.mark.golden
def test_export_roundtrip_movinet():
    torch = pytest.importorskip("torch")
    from picklebot_tpu.models.movinet import MoViNetA2
    from picklebot_tpu.train.key_maps import movinet_key_map

    model = MoViNetA2(num_classes=13)
    v = model.init(0)
    # our flat paths -> torch keys: invert the movinet table + SE rewrite
    reverse = {
        "stem_conv.w": "block1.0.weight",
        "stem_bn.scale": "block1.1.weight",
        "stem_bn.bias": "block1.1.bias",
        "stem_bn.mean": "block1.1.running_mean",
        "stem_bn.var": "block1.1.running_var",
        "head_conv.w": "conv.0.weight",
        "head_bn.scale": "conv.1.weight",
        "head_bn.bias": "conv.1.bias",
        "head_bn.mean": "conv.1.running_mean",
        "head_bn.var": "conv.1.running_var",
        "fc1.w": "classifier.2.weight",
        "fc1.b": "classifier.2.bias",
        "fc1_bn.scale": "classifier.3.weight",
        "fc1_bn.bias": "classifier.3.bias",
        "fc1_bn.mean": "classifier.3.running_mean",
        "fc1_bn.var": "classifier.3.running_var",
        "fc2.w": "classifier.6.weight",
        "fc2.b": "classifier.6.bias",
    }
    from picklebot_tpu.core.module import flatten_dict
    # SE dense params -> torch se conv stacks
    for path in flatten_dict(v["params"]):
        if ".squeeze_excite." in path:
            prefix, leaf = path.rsplit(".", 1)
            idx = {"w1": "1", "b1": "1", "w2": "3", "b2": "3"}[leaf]
            kind = "weight" if leaf.startswith("w") else "bias"
            reverse[path] = f"{prefix}.se.{idx}.{kind}"

    sd = export_torch_state_dict(v, reverse_map=reverse)
    # SE weights exported as (O, I) dense; the importer expects torch conv
    # (O, I, 1, 1, 1) or (O, I); (O, I) converts via the dense rule — fine.
    v2 = import_torch_state_dict(
        {k: t.numpy() for k, t in sd.items()}, model.init(1),
        key_map=movinet_key_map)
    for a, b in zip(jax.tree_util.tree_leaves(v["params"]),
                    jax.tree_util.tree_leaves(v2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_is_deterministic(rng):
    """Same seeds -> bit-identical params after training steps (the
    reference's determinism story is torch.manual_seed + cudnn flags;
    ours is by construction)."""
    from picklebot_tpu.train.optim import AdamW8bit, cosine_annealing_lr
    from picklebot_tpu.train.step import create_train_state, make_train_step
    from tests.test_train_step import TinyVideoNet, _data

    feats, labels = _data(rng)

    def run():
        model = TinyVideoNet()
        opt = AdamW8bit(weight_decay=1e-4, min_8bit_size=8)
        step = make_train_step(model, opt, "CE",
                               cosine_annealing_lr(1e-3, 10), donate=False)
        state = create_train_state(model, opt, 1234)
        for i in range(3):
            state, _ = step(state, feats, labels, jax.random.key(i))
        return state

    a, b = run(), run()
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.golden
def test_movinet_stream_pth_load():
    """Regression: a torch MoViNet .pth must load into the STREAM wrapper
    (keys handled by default rules need the 'net.' prefix too)."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    import os
    if not os.path.isdir("/root/reference/config"):
        pytest.skip("reference unavailable")
    from movinet import MoViNetA2 as TMoViNet
    from picklebot_tpu.models.movinet import MoViNetA2Stream
    from picklebot_tpu.train.key_maps import key_map_for

    torch.manual_seed(0)
    tmodel = TMoViNet(num_classes=13)
    sd = {k: v.detach().float().numpy()
          for k, v in tmodel.state_dict().items()}
    model = MoViNetA2Stream(num_classes=13)
    v = import_torch_state_dict(sd, model.init(0),
                                key_map=key_map_for("MoViNetA2Stream"))
    # spot check one ordinary (default-rule) key landed under net.
    np.testing.assert_allclose(
        np.asarray(v["params"]["net"]["block2"]["0"]["expand"]["w"]
                   ).transpose(4, 3, 0, 1, 2),
        sd["block2.0.expand.weight"], rtol=1e-6)


def test_square_linear_weight_transposed():
    """Regression: torch (d, d) Linear weights must transpose on import
    even though the shape coincidentally matches."""
    from picklebot_tpu.train.checkpoint import _convert_leaf
    v = np.arange(9, dtype=np.float32).reshape(3, 3)
    target = jnp.zeros((3, 3))
    out = _convert_leaf("fc.weight", v, target)
    np.testing.assert_array_equal(out, v.T)
