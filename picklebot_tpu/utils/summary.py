"""Model summaries: per-module parameter tables + compiled cost analysis.

The torchinfo/torchsummary analog the reference lacks: walk the Module
tree for exact per-submodule parameter counts, then lower the jitted
forward AOT (no data, no device traffic — jax.jit(...).lower().compile())
and read XLA's cost analysis for FLOPs and bytes accessed. The FLOP
number is the compiled program's (post-fusion, including any folded
execution), so it reflects what actually runs, not a paper estimate.

Usage:
  python -m picklebot_tpu.utils.summary <config.json> [--frames 32]
      [--size 224] [--batch 1] [--train]
"""

from __future__ import annotations

import argparse
import json
import sys


def count_params(tree) -> int:
    import numpy as np
    total = 0
    for leaf in _leaves(tree):
        total += int(np.prod(np.shape(leaf)))
    return total


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


def param_table(model, variables=None):
    """[(name, params, frac)] per top-level child + ('total', N, 1.0)."""
    variables = variables or model.init(0)
    params = variables["params"]
    rows = []
    total = count_params(params)
    for name in model.named_children():
        if name in params:
            rows.append((name, count_params(params[name])))
    # params attached directly to the root (rare)
    accounted = sum(n for _, n in rows)
    if accounted < total:
        rows.append(("(root)", total - accounted))
    return [(n, c, c / max(total, 1)) for n, c in rows] + \
        [("total", total, 1.0)]


def cost_summary(model, input_shape, policy=None, train=False,
                 variables=None, model_name=""):
    """Compiled-forward cost analysis: {'flops', 'bytes accessed', ...}.

    AOT lowering on abstract shapes — no input data, no device traffic
    (params become ShapeDtypeStructs via their host-numpy dtypes; a
    jnp.asarray here would commit every leaf through the remote-TPU
    tunnel, see CLAUDE.md); works on CPU and TPU alike.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from picklebot_tpu.core.module import DtypePolicy
    policy = policy or DtypePolicy.f32()
    variables = variables or model.init(0)

    def fwd(variables, x):
        if model_name == "MoViNetA2Stream":
            carry = model.init_stream(x.shape[0], x.shape[2], x.shape[3],
                                      dtype=policy.compute_dtype)
            (logits, _), _ = model.apply(
                variables, x, carry, train=train, policy=policy,
                rng=jax.random.key(0) if train else None)
            return logits
        out = model.apply(variables, x, train=train, policy=policy,
                          rng=jax.random.key(0) if train else None)
        return out[0]

    specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        variables)
    x_spec = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
    compiled = jax.jit(fwd).lower(specs, x_spec).compile()
    ca = compiled.cost_analysis() or {}
    return {k: ca[k] for k in ("flops", "bytes accessed")
            if k in ca}


def format_summary(model, input_shape, policy=None, train=False,
                   model_name=""):
    variables = model.init(0)
    rows = param_table(model, variables)
    lines = [f"{'module':<14} {'params':>12}  share"]
    for name, n, frac in rows:
        lines.append(f"{name:<14} {n:>12,}  {frac:6.1%}")
    cost = cost_summary(model, input_shape, policy=policy, train=train,
                        variables=variables, model_name=model_name)
    if "flops" in cost:
        per = cost["flops"] / max(input_shape[0], 1)
        lines.append(f"forward flops  {cost['flops'] / 1e9:,.2f} GFLOP "
                     f"({per / 1e9:,.2f}/sample, compiled, post-fusion)")
    if "bytes accessed" in cost:
        lines.append(f"bytes accessed {cost['bytes accessed'] / 1e6:,.1f} MB")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description="Model summary")
    p.add_argument("config")
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--train", action="store_true",
                   help="summarize the train-mode forward")
    args = p.parse_args(argv)

    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.utils.config import load_config

    config = load_config(args.config)
    # the summary traces the forward under plain jit (no mesh):
    # summarize the replicated equivalent (same params/FLOPs)
    from picklebot_tpu.utils.config import replicated_equivalent
    config = replicated_equivalent(config)
    model = initialize_model(config)
    if config.model_name == "MobileViTV2":
        shape = (args.batch, args.size, args.size, 3)
    else:
        shape = (args.batch, args.frames, args.size, args.size, 3)
    print(f"# {config.model_name} input {shape}")
    print(format_summary(model, shape, train=args.train,
                         model_name=config.model_name))
    return 0


if __name__ == "__main__":
    sys.exit(main())
