"""On-device spatial resize for the preprocessing graph.

The north-star data path (BASELINE.json): "clip decode, frame sampling,
resize, and normalization become an on-device XLA preprocessing graph".
The reference has no resize at all — its dataloader feeds dataset-native
frames (reference dataloader.py:46-56) and the committed dataset happens to
be 224x224. Here ``resize_frames`` runs INSIDE the jitted train/eval/serve
programs, so native-resolution clips (480p/720p/1080p) stream to the chip
as uint8 and are resampled at HBM speed instead of on the (single-core)
host: jax.image.resize lowers to two separable weight-matrix contractions
(H then W) that XLA maps onto the MXU and fuses with the /255 cast.

Semantics match torchvision's ``Resize((s, s), antialias=True)``: bilinear
(tent filter), antialiased on downscale, aspect ratio NOT preserved —
same output-geometry CONVENTION as the offline tool
(scripts/preprocess_dataset.py, cv2 INTER_AREA) but a different resampling
kernel: INTER_AREA is a box filter, so pixels differ slightly on
non-integer downscale. The cross-kernel skew is bounded end-to-end by
tests/test_resize.py (argmax parity + logits atol on smooth AND textured
clips vs the serve --exported host-resize path); for strict
train-vs-offline pixel identity, preprocess offline and train at native
size instead of mixing the two paths. Linear in the pixels, so it commutes
exactly with the affine mean/std normalization applied after it.
"""

from __future__ import annotations

import jax


def resize_frames(x: jax.Array, size: int) -> jax.Array:
    """(..., H, W, C) -> (..., size, size, C).

    Identity (no-op in the graph) when the input is already size x size.
    Bilinear with antialiasing — on downscale the kernel footprint widens
    by the scale factor, the correct resampling for 720p -> 224 (plain
    bilinear would alias, i.e. subsample). Leading dims (accum, batch,
    time) pass through untouched.
    """
    h, w = x.shape[-3], x.shape[-2]
    size = int(size)
    if h == size and w == size:
        return x
    shape = x.shape[:-3] + (size, size, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear", antialias=True)
