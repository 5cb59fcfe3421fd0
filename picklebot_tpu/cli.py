"""CLI entry point: ``python -m picklebot_tpu.cli <config.json>``.

Parity with reference train.py:346-365: one positional config arg, prints the
precision/device banner, optional cProfile of the whole run dumped to
train_stats.prof (the reference profiles unconditionally; here it's the
--profile flag or ``"profile": true`` in the config — always-on profiling
costs real Python-side throughput). Adds --steps to cap work for smoke runs.
"""

from __future__ import annotations

import argparse
import cProfile
import pstats
from pstats import SortKey


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train a model with the specified config")
    parser.add_argument("config", type=str, help="Path to config file")
    parser.add_argument("--profile", action="store_true",
                        help="cProfile the run -> train_stats.prof "
                             "(reference behavior)")
    parser.add_argument("--steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--jax-profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of the whole "
                             "run to this dir (TensorBoard-viewable); "
                             "combine with --steps to bound it")
    args = parser.parse_args(argv)

    import os

    import jax

    # explicit platform pin (the environment TPU plugin outranks
    # JAX_PLATFORMS, so honor our own variable before backend init)
    if os.environ.get("PICKLEBOT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PICKLEBOT_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PICKLEBOT_CACHE_DIR",
                                     "/tmp/picklebot_jax_cache"))

    from picklebot_tpu.train.loop import train
    from picklebot_tpu.utils.config import load_config

    config = load_config(args.config)
    # bounded device discovery: a dead TPU tunnel hangs jax.devices()
    # forever (utils/devices.py) — fail with remediation steps instead
    from picklebot_tpu.utils.devices import require_devices
    dev = require_devices()[0]
    dtype = "bfloat16" if config.use_autocast else "float32"
    print(f"Using {dtype} on {dev.platform} ({dev.device_kind})")

    def run():
        if args.jax_profile_dir:
            from picklebot_tpu.utils.profiling import trace
            with trace(args.jax_profile_dir):
                return train(config, max_steps=args.steps)
        return train(config, max_steps=args.steps)

    if args.profile or config.profile:
        profiler = cProfile.Profile()
        result = profiler.runcall(run)
        stats = pstats.Stats(profiler)
        stats.sort_stats(SortKey.TIME)
        stats.dump_stats("train_stats.prof")
        print("profile dumped to train_stats.prof")
    else:
        result = run()
    return result


if __name__ == "__main__":
    main()
