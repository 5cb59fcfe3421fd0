"""On-device training-time data augmentation (in-graph, per-sample).

The reference trains with no augmentation at all (its dataloader decodes
and pads only — /root/reference/dataloader.py:38-63, train.py:102-108);
this is a production-training extension. TPU-first design: augmentation
runs INSIDE the jitted train step on the already-device-resident uint8
batch (after the /255 preprocess), so it fuses with the step and costs
the host nothing — host-side augmentation would bottleneck on the
1-core data plane long before the chip stalls.

Three standard video augmentations, all shape-static (XLA-friendly) and
per-sample (keys split from the step's position-keyed rng, so runs are
deterministic and bit-identical under mid-epoch resume):

  * horizontal flip (p=0.5 per clip) — `augment_flip: true`
  * random spatial crop with zero padding P — `augment_crop: P`
    (pad H/W by P, slice a random (H, W) window per clip: translation
    jitter up to +-P pixels, output shape unchanged)
  * brightness jitter — `augment_brightness: b` (per-clip scale drawn
    uniformly from [1-b, 1+b])

Eval and serving never augment. With every knob at its default the train
step is bit-identical to the unaugmented one (the dropout key derivation
is untouched; augmentation keys are salted off the same micro key).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Augment(NamedTuple):
    """Static augmentation plan (trace-time constants)."""
    flip: bool = False
    crop: int = 0
    brightness: float = 0.0

    def enabled(self) -> bool:
        return bool(self.flip or self.crop > 0 or self.brightness > 0)


# Salt separating augmentation keys from the dropout stream (which
# consumes the micro key itself) — any fixed constant works; this one is
# documented so the stream is reproducible across versions.
_AUG_SALT = 0x41554731  # "AUG1"


def apply_augment(x: jax.Array, aug: Augment, key: jax.Array) -> jax.Array:
    """Augment a (B, T, H, W, C) float batch per-sample.

    ``key`` is the micro-step rng; callers pass the same key they hand the
    model for dropout — the salt keeps the two streams independent.

    Execution form (measured on-chip, scripts/probe_augment_cost.py, bench
    shapes bs=16 T=32 224²): this pass-based form — where-flip,
    pad + per-sample dynamic_slice, scale — costs 4.3 ms on the 32 ms
    Large3D train step with all three augmentations on. A "fused"
    single-gather rewrite (flip+crop as one advanced-index gather with
    clamped indices, brightness multiplied into the mask) was measured
    2.5x WORSE (89.7 vs 35.9 ms steps): per-sample dynamic gathers lower
    to slow scalar loops on TPU, while where/pad/dynamic_slice stay
    vectorized. Don't re-fuse without re-measuring."""
    key = jax.random.fold_in(key, _AUG_SALT)
    b = x.shape[0]
    k_flip, k_crop, k_bright = jax.random.split(key, 3)

    if aug.flip:
        m = jax.random.bernoulli(k_flip, 0.5, (b,))
        x = jnp.where(m[:, None, None, None, None],
                      x[:, :, :, ::-1, :], x)

    if aug.crop > 0:
        p = int(aug.crop)
        t, h, w, c = x.shape[1:]
        xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)))
        oy = jax.random.randint(k_crop, (b,), 0, 2 * p + 1)
        ox = jax.random.randint(jax.random.fold_in(k_crop, 1), (b,),
                                0, 2 * p + 1)

        def crop_one(clip, y, xo):
            return jax.lax.dynamic_slice(clip, (0, y, xo, 0), (t, h, w, c))

        x = jax.vmap(crop_one)(xp, oy, ox)

    if aug.brightness > 0:
        s = 1.0 + jax.random.uniform(
            k_bright, (b,), minval=-aug.brightness, maxval=aug.brightness)
        x = x * s[:, None, None, None, None].astype(x.dtype)

    return x
