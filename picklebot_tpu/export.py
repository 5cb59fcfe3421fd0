"""AOT deployment artifacts: a serialized StableHLO predictor in one file.

The TPU-native analog of the reference's deployment surface —
`torch.compile(mode='max-autotune-no-cudagraphs')` at train.py:179-182 and
the HuggingFace demo space the README links for serving: instead of a
Python module tree + checkpoint that must be re-assembled and re-traced at
serving time, `export` lowers the jitted predictor ONCE (jax.export →
StableHLO) with the trained weights baked in as constants and writes a
single self-contained artifact. Loading needs jax only — no model zoo, no
checkpoint machinery, no config — and runs on every platform the artifact
was lowered for (default: tpu + cpu).

The batch dimension is exported SYMBOLICALLY by default (shape
polymorphism), so one artifact serves any batch size without re-export;
frames/height/width stay static (XLA static-shape discipline — the same
t_bucket padding contract the data pipeline enforces).

Artifact format: a zip with `metadata.json` (model/task facts the server
needs: num_classes, criterion, frames, size, dtype policy, jax version)
and `predict.shlo` (jax.export serialization). Input contract:
uint8 (B, frames, size, size, 3) RGB clips; output: float32 logits
(B, num_classes) — preprocessing (/255, optional mean/std) is compiled in.

Usage:
  python -m picklebot_tpu.export <config.json> --checkpoint ck \
      --out model.pbz [--frames 32] [--size 224] [--batch -1]
  python -m picklebot_tpu.serve --exported model.pbz clip1.mp4 ...
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import zipfile

METADATA_NAME = "metadata.json"
BLOB_NAME = "predict.shlo"


def build_predict_fn(model, variables, policy, mean, std, model_name):
    """Closure uint8 clips -> f32 logits with weights baked in (the same
    math as serve.py's batched path, train/step.py:make_predict_fn)."""
    import jax.numpy as jnp

    from picklebot_tpu.train.step import preprocess

    def predict(features):
        x = preprocess(features, policy.compute_dtype, mean, std)
        if model_name == "MoViNetA2Stream":
            # whole-clip pass == one chunk with fresh stream buffers
            carry = model.init_stream(x.shape[0], x.shape[2], x.shape[3],
                                      dtype=policy.compute_dtype)
            (logits, _), _ = model.apply(variables, x, carry, train=False,
                                         policy=policy)
        else:
            logits, _ = model.apply(variables, x, train=False, policy=policy)
        return logits.astype(jnp.float32)

    return predict


def export_predictor(model, variables, policy, *, frames, size,
                     mean=None, std=None, model_name="", batch=None,
                     platforms=("tpu", "cpu")):
    """Lower the predictor AOT and return a jax.export.Exported.

    batch=None exports a symbolic batch dim ("b"); an int pins it.
    MobileViTV2 (the zoo's 2D image classifier) exports an image input
    (B, size, size, 3); every other model a clip (B, frames, size, size, 3).
    """
    import jax
    from jax import export as jexport

    predict = build_predict_fn(model, variables, policy, mean, std,
                               model_name)
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch)
    shape = ((b, size, size, 3) if model_name == "MobileViTV2"
             else (b, frames, size, size, 3))
    spec = jax.ShapeDtypeStruct(shape, jax.numpy.uint8)
    try:
        return jexport.export(jax.jit(predict),
                              platforms=list(platforms))(spec)
    except ValueError as e:
        if "interpret mode" in str(e) and len(platforms) > 1:
            raise ValueError(
                "multi-platform export failed because a Pallas TPU kernel "
                "is on this model's path (MobileViT selects the "
                "head-packed flash-attention kernel at N>=512 tokens) and "
                "Mosaic lowers for TPU only — export with "
                "platforms=('tpu',) / --platforms tpu") from e
        raise


def save_artifact(path, exported, meta: dict):
    """Write the single-file zip artifact."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(METADATA_NAME, json.dumps(meta, indent=1))
        z.writestr(BLOB_NAME, exported.serialize())
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_artifact(path):
    """(jitted callable uint8 clips -> f32 logits, metadata dict).

    Needs only jax — deserialization rebuilds the computation from
    StableHLO; the weights are constants inside it.
    """
    import jax
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read(METADATA_NAME))
        exported = jexport.deserialize(bytearray(z.read(BLOB_NAME)))
    return jax.jit(exported.call), meta


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export an AOT StableHLO serving artifact")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=None,
                   help="spatial input size (default: config.input_size "
                        "if set, else 224). serve --exported host-resizes "
                        "mismatched clips to this")
    p.add_argument("--batch", type=int, default=-1,
                   help="-1 (default): symbolic batch dim; N: pinned")
    p.add_argument("--ema", action="store_true",
                   help="bake the EMA weights (ema_params) into the "
                        "artifact instead of the raw params")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    args = p.parse_args(argv)

    import jax

    from picklebot_tpu.core.module import DtypePolicy
    from picklebot_tpu.models.registry import initialize_model
    from picklebot_tpu.train import checkpoint as ckpt
    from picklebot_tpu.train.key_maps import key_map_for
    from picklebot_tpu.utils.config import load_config

    config = load_config(args.config)
    # export lowers under plain jit (no mesh): strip to the replicated
    # equivalent (TP/SP/PP/EP change execution layout, not weights)
    from picklebot_tpu.utils.config import replicated_equivalent
    config = replicated_equivalent(config)
    model = initialize_model(config)
    variables = model.init(config.seed)
    if args.checkpoint.endswith(".pth"):
        if args.ema:
            # .pth files hold one weight set — baking them under --ema
            # would silently bake raw weights
            raise SystemExit(
                "--ema requires an Orbax snapshot (ema_params is part of "
                "the training state); a .pth file has no EMA stream")
        variables = ckpt.load_pth(args.checkpoint, variables,
                                  key_map=key_map_for(config.model_name))
    else:
        payload = ckpt.restore_checkpoint(args.checkpoint, None)
        params = payload["params"]
        if args.ema:
            if payload.get("ema_params") is None:
                raise SystemExit(
                    "--ema: this snapshot has no ema_params (train with "
                    "config ema_decay > 0)")
            params = payload["ema_params"]
        variables = {"params": params,
                     "state": payload["model_state"]}
    policy = DtypePolicy.bf16() if config.use_autocast else DtypePolicy.f32()
    mean = config.mean if config.apply_mean_std else None
    std = config.std if config.apply_mean_std else None
    # the model trained at config.input_size sees exactly that shape here;
    # serve --exported host-resizes any other clip to `size`
    size = args.size or config.input_size or 224

    exported = export_predictor(
        model, variables, policy, frames=args.frames, size=size,
        mean=mean, std=std, model_name=config.model_name,
        batch=None if args.batch == -1 else args.batch,
        platforms=tuple(args.platforms.split(",")))
    meta = {
        "model_name": config.model_name,
        "num_classes": config.num_classes,
        "criterion": config.criterion,
        "frames": (None if config.model_name == "MobileViTV2"
                   else args.frames),
        "size": size,
        "batch": args.batch,
        # serve --exported strides its decode to this rate (the host-side
        # half of the training pipeline's config.sample_fps)
        "sample_fps": config.sample_fps,
        "platforms": args.platforms.split(","),
        "compute_dtype": str(policy.compute_dtype.__name__
                             if hasattr(policy.compute_dtype, "__name__")
                             else policy.compute_dtype),
        "jax_version": jax.__version__,
        "input": ("uint8 (B, size, size, 3) RGB"
                  if config.model_name == "MobileViTV2"
                  else "uint8 (B, frames, size, size, 3) RGB"),
        "output": "float32 logits (B, num_classes)",
    }
    save_artifact(args.out, exported, meta)
    print(json.dumps({"exported": args.out,
                      "platforms": meta["platforms"],
                      "batch": "symbolic" if args.batch == -1 else args.batch,
                      "bytes": __import__("os").path.getsize(args.out)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
