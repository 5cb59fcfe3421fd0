"""Per-model torch-key → pytree-path maps for checkpoint conversion.

Most keys convert via the default rules in checkpoint.py (weight/bias
renames, BN running stats, SE conv stacks, LSTM). These tables cover the
places where our TPU-native structure legitimately differs from the torch
module tree: classifier 1x1 convs that became Dense heads, Sequential
conv+BN stems unrolled into named children, etc.

Used by ``load_pth(..., key_map=key_map_for(model_name))`` and the training
loop's ``config.checkpoint`` path (reference train.py:230-235).
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Tuple


def _se_rewrite(tk: str) -> Optional[Tuple[str, bool]]:
    """'...<se-module>.se.{1,3}.{weight,bias}' -> '...<se-module>.{w,b}{1,2}'
    for SE blocks named other than the default 'se' child handled in
    checkpoint.py (bottlenecks name theirs squeeze_excite)."""
    if ".squeeze_excite.se." in tk:
        prefix, rest = tk.split(".se.", 1)
        idx, kind = rest.split(".")
        n = {"1": "1", "3": "2"}[idx]
        return (f"{prefix}.{'w' if kind == 'weight' else 'b'}{n}", False)
    return None


def _bn_triplet(torch_prefix: str, ours: str):
    return {
        f"{torch_prefix}.weight": (f"{ours}.scale", False),
        f"{torch_prefix}.bias": (f"{ours}.bias", False),
        f"{torch_prefix}.running_mean": (f"{ours}.mean", True),
        f"{torch_prefix}.running_var": (f"{ours}.var", True),
        f"{torch_prefix}.num_batches_tracked": ("", True),
    }


_MOBILENET3D_TABLE = {
    # classifier 1x1 convs on pooled features -> Dense heads
    "classifier.1.weight": ("fc1.w", False),
    "classifier.1.bias": ("fc1.b", False),
    "classifier.3.weight": ("fc2.w", False),
    "classifier.3.bias": ("fc2.b", False),
    # stem / head _ConvBNAct children
    "block1.0.weight": ("block1.conv.w", False),
    "block1.0.bias": ("block1.conv.b", False),
    **_bn_triplet("block1.1", "block1.bn"),
    "block6.0.weight": ("block6.conv.w", False),
    "block6.0.bias": ("block6.conv.b", False),
    **_bn_triplet("block6.1", "block6.bn"),
    # Small3D block4 conv/SE/BN unrolled
    "block4.0.weight": ("b4_conv.w", False),
    "block4.0.bias": ("b4_conv.b", False),
    "block4.1.se.1.weight": ("b4_se.w1", False),
    "block4.1.se.1.bias": ("b4_se.b1", False),
    "block4.1.se.3.weight": ("b4_se.w2", False),
    "block4.1.se.3.bias": ("b4_se.b2", False),
    **_bn_triplet("block4.2", "b4_bn"),
}


def mobilenet3d_key_map(tk: str):
    if tk in _MOBILENET3D_TABLE:
        return _MOBILENET3D_TABLE[tk]
    return _se_rewrite(tk)


_MOVINET_TABLE = {
    "block1.0.weight": ("stem_conv.w", False),
    **_bn_triplet("block1.1", "stem_bn"),
    "conv.0.weight": ("head_conv.w", False),
    **_bn_triplet("conv.1", "head_bn"),
    "classifier.2.weight": ("fc1.w", False),
    "classifier.2.bias": ("fc1.b", False),
    **_bn_triplet("classifier.3", "fc1_bn"),
    "classifier.6.weight": ("fc2.w", False),
    "classifier.6.bias": ("fc2.b", False),
}


def movinet_key_map(tk: str):
    if tk in _MOVINET_TABLE:
        return _MOVINET_TABLE[tk]
    return _se_rewrite(tk)


def movinet_stream_key_map(tk: str):
    """Same weights grafted under the stream wrapper's 'net' child. Must
    resolve EVERY key itself (returning None would let the default rules
    produce an unprefixed path)."""
    from picklebot_tpu.train.checkpoint import _default_key_map
    mapped = movinet_key_map(tk)
    if mapped is None:
        # streaming bottlenecks wrap the depthwise conv in CausalConv3d,
        # adding one nesting level: blockN.i.conv.* -> blockN.i.conv.conv.*
        m = re.fullmatch(r"(block\d+\.\d+)\.conv\.weight", tk)
        if m:
            mapped = (f"{m.group(1)}.conv.conv.w", False)
        else:
            mapped = _default_key_map(tk)
    path, is_state = mapped
    return (f"net.{path}", is_state) if path else (path, is_state)


def mobilevit_key_map(tk: str):
    # trunk stages are Sequential(conv, vit-block): torch trunk.N.0/.1 and
    # our ModuleList keep identical indices, so generic rules cover most keys
    table = {
        "to_logits.0.0.weight": ("to_logits_conv.conv.w", False),
        "to_logits.0.1.running_mean": ("to_logits_conv.bn.mean", True),
        "to_logits.0.1.running_var": ("to_logits_conv.bn.var", True),
        "to_logits.0.1.num_batches_tracked": ("", True),
        "to_logits.2.weight": ("head.w", False),
    }
    if tk in table:
        return table[tk]
    # conv_nxn_bn/conv_1x1_bn Sequentials: '<name>.0.weight' conv,
    # '<name>.1.*' BN(affine=False -> state only)
    m = re.match(r"^(.*(?:conv1|conv2|conv3|conv4))\.0\.weight$", tk)
    if m:
        return (f"{m.group(1)}.conv.w", False)
    m = re.match(r"^(.*(?:conv1|conv2|conv3|conv4))\.1\.running_(mean|var)$",
                 tk)
    if m:
        return (f"{m.group(1)}.bn.{m.group(2)}", True)
    if re.match(r"^.*\.1\.num_batches_tracked$", tk):
        return ("", True)
    # transformer: torch 'transformer.layers.N.0.*' attention,
    # 'transformer.layers.N.1.*' feedforward
    m = re.match(r"^(.*)\.transformer\.layers\.(\d+)\.0\.to_qkv\.weight$", tk)
    if m:
        return (f"{m.group(1)}.transformer.attns.{m.group(2)}.to_qkv.w",
                False)
    m = re.match(r"^(.*)\.transformer\.layers\.(\d+)\.0\.to_out\.0\.weight$",
                 tk)
    if m:
        return (f"{m.group(1)}.transformer.attns.{m.group(2)}.to_out.w",
                False)
    m = re.match(r"^(.*)\.transformer\.layers\.(\d+)\.1\.net\.0\.weight$", tk)
    if m:
        return (f"{m.group(1)}.transformer.ffs.{m.group(2)}.fc1.w", False)
    m = re.match(r"^(.*)\.transformer\.layers\.(\d+)\.1\.net\.3\.weight$", tk)
    if m:
        return (f"{m.group(1)}.transformer.ffs.{m.group(2)}.fc2.w", False)
    return _se_rewrite(tk)


_MOBILENET2D_TABLE = {
    # Large2D head: block6 Sequential(conv, bn, hs, avgpool) -> b6_* children
    "block6.0.weight": ("b6_conv.w", False),
    "block6.0.bias": ("b6_conv.b", False),
    **_bn_triplet("block6.1", "b6_bn"),
    # Small2D head: block4 Sequential(conv, SE, bn, hs, avgpool) -> b4_*
    "block4.0.weight": ("b4_conv.w", False),
    "block4.0.bias": ("b4_conv.b", False),
    "block4.1.se.1.weight": ("b4_se.w1", False),
    "block4.1.se.1.bias": ("b4_se.b1", False),
    "block4.1.se.3.weight": ("b4_se.w2", False),
    "block4.1.se.3.bias": ("b4_se.b2", False),
    **_bn_triplet("block4.2", "b4_bn"),
    # classifier Sequential(Linear) -> Dense
    "classifier.0.weight": ("classifier.w", False),
    "classifier.0.bias": ("classifier.b", False),
    # block1 Sequential(conv, bn, hs) -> _ConvBNAct2D children
    "block1.0.weight": ("block1.conv.w", False),
    "block1.0.bias": ("block1.conv.b", False),
    **_bn_triplet("block1.1", "block1.bn"),
}


def mobilenet2d_key_map(tk: str):
    # NB: Small2D's block4 table entries only exist on Small2D; unmatched
    # table keys simply never occur for the other model.
    if tk in _MOBILENET2D_TABLE:
        return _MOBILENET2D_TABLE[tk]
    return _se_rewrite(tk)


def mobilevitv2_key_map(tk: str):
    # torch nests the layer list as 'transformer.layer.N'; ours is
    # 'transformer.N'
    if ".transformer.layer." in tk:
        tk2, _ = (tk.replace(".transformer.layer.", ".transformer."), True)
        # re-run default-style renames on the rewritten key by returning a
        # path with generic suffix rules applied manually:
        if tk2.endswith(".weight"):
            return (tk2[:-len(".weight")] + ".w", False)
        if tk2.endswith(".bias"):
            return (tk2[:-len(".bias")] + ".b", False)
    return _se_rewrite(tk)


KEY_MAPS = {
    "MobileNetLarge3D": mobilenet3d_key_map,
    "MobileNetSmall3D": mobilenet3d_key_map,
    "MoViNetA2": movinet_key_map,
    "MoViNetA2Stream": movinet_stream_key_map,
    "MobileViT": mobilevit_key_map,
    "MobileViTV2": mobilevitv2_key_map,
    "MobileNetLarge2D": mobilenet2d_key_map,
    "MobileNetSmall2D": mobilenet2d_key_map,
}


def key_map_for(model_name: str) -> Optional[Callable]:
    return KEY_MAPS.get(model_name)


# --------------------------------------------------------------------------
# export rank maps: torch_key -> declared torch parameter rank
# --------------------------------------------------------------------------
# Our 1x1 convs on pooled/flattened features are Dense (in, out); the
# reference declares them Conv3d/Conv2d with (O, I, 1, ...) weights
# (mobilenet.py:15-26 SE stacks, mobilenet.py:185-190 classifier convs).
# export_torch_state_dict consults these so torch load_state_dict(strict)
# accepts the export.

_SE_WEIGHT = re.compile(r".*\.se\.[13]\.weight$")


def _export_ranks_3d(tk: str) -> Optional[int]:
    return 5 if _SE_WEIGHT.match(tk) else None


def mobilenet3d_export_ranks(tk: str) -> Optional[int]:
    # classifier.1/.3 are Conv3d(…, kernel_size=1) (mobilenet.py:185-190)
    if re.fullmatch(r"classifier\.[13]\.weight", tk):
        return 5
    return _export_ranks_3d(tk)


def mobilenet2d_export_ranks(tk: str) -> Optional[int]:
    return 4 if _SE_WEIGHT.match(tk) else None


def mobilevitv2_export_ranks(tk: str) -> Optional[int]:
    # reference uses Conv2d(k=1) where our channels-last impl uses Dense:
    # LinearSelfAttention qkv/out (mobilevitv2.py:13,20) and the FFN convs
    # (mobilevitv2.py:66,76). Top-level 'conv1' (a real 3x3) never reaches
    # the rank map (it exports from a 4D leaf).
    if re.search(r"\.(qkv_proj|out_proj|conv1|conv2)\.weight$", tk):
        return 4
    return None


EXPORT_RANK_MAPS = {
    "MobileNetLarge3D": mobilenet3d_export_ranks,
    "MobileNetSmall3D": mobilenet3d_export_ranks,
    "MoViNetA2": _export_ranks_3d,
    "MoViNetA2Stream": _export_ranks_3d,
    "MobileViT": _export_ranks_3d,
    "MobileViTV2": mobilevitv2_export_ranks,
    "MobileNetLarge2D": mobilenet2d_export_ranks,
    "MobileNetSmall2D": mobilenet2d_export_ranks,
}


def export_rank_for(model_name: str) -> Optional[Callable]:
    return EXPORT_RANK_MAPS.get(model_name)
