"""Checkpoint conversion CLI: torch ``.pth`` ↔ Orbax, both directions.

The standalone face of train/checkpoint.py's converter (the reference's
``state_dict_converter`` at train.py:38-44 only strips torch.compile
prefixes; the actual cross-framework conversion is a capability it
lacks). Direction is inferred from the output suffix:

  # torch weights -> native Orbax snapshot (params + BN state, step 0)
  python -m picklebot_tpu.convert weights.pth --config cfg.json --out ck/

  # native snapshot (or another .pth) -> torch state_dict
  python -m picklebot_tpu.convert ck/step_0 --config cfg.json \
      --out weights.pth [--like reference_ckpt.pth]

``--like`` names torch keys exactly like an existing reference
checkpoint (build_reverse_map over its keys); without it the default
inverse naming rules apply — both load strict=True into the live
reference modules (tests/test_export_torch_load.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Convert checkpoints between torch .pth and Orbax")
    p.add_argument("src", help="source: torch .pth or an Orbax step dir")
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True,
                   help=".pth -> torch export; anything else -> Orbax dir")
    p.add_argument("--like", default=None,
                   help="a torch .pth whose key names the export should "
                        "mirror exactly")
    p.add_argument("--ema", action="store_true",
                   help="convert the EMA weights (ema_params) from an "
                        "Orbax snapshot trained with ema_decay > 0 "
                        "(same contract as serve/export --ema)")
    args = p.parse_args(argv)

    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.train.key_maps import export_rank_for, key_map_for
    from picklebot_tpu.utils.config import load_config

    config = load_config(args.config)
    key_map = key_map_for(config.model_name)

    if args.src.endswith(".pth"):
        if args.ema:
            raise SystemExit("--ema applies to Orbax snapshots only "
                             "(.pth files hold a single weight set)")
        # only the .pth import needs the fresh-init target tree (shapes to
        # graft into); the Orbax path restores a complete tree, so a full
        # host init of every leaf there is pure waste
        variables = initialize_model(config).init(config.seed)
        variables = ckpt.load_pth(args.src, variables, key_map=key_map)
    else:
        payload = ckpt.restore_checkpoint(args.src, None)
        params = payload["params"]
        if args.ema:
            if payload.get("ema_params") is None:
                raise SystemExit(
                    "--ema: this snapshot has no ema_params (train with "
                    "config ema_decay > 0)")
            params = payload["ema_params"]
        variables = {"params": params,
                     "state": payload["model_state"]}

    if args.out.endswith(".pth"):
        reverse = None
        if args.like:
            reverse = ckpt.build_reverse_map(
                ckpt.load_torch_state_dict(args.like).keys(), key_map)
        ckpt.save_pth(args.out, variables, reverse_map=reverse,
                      rank_map=export_rank_for(config.model_name))
        out_path = args.out
        kind = "torch"
    else:
        out_path = ckpt.save_checkpoint(args.out, 0,
                                        {"params": variables["params"],
                                         "model_state": variables["state"]})
        kind = "orbax"
    print(json.dumps({"converted": args.src, "to": out_path,
                      "format": kind, "model": config.model_name}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
