"""Parameter freezing for fine-tuning (transfer learning).

The reference repo has no freezing support, but its intended workflow —
warm-starting from a trained ``.pth`` (reference train.py:141-156 loads
``checkpoint_path`` state dicts) and continuing training — is exactly the
setting where a user wants to freeze the backbone and train only the
head.  This module supplies the mask; ``make_train_step`` (step.py)
applies it with torch ``requires_grad=False`` + AdamW semantics:

  * frozen leaves contribute **no gradient** (their grads are zeroed
    before any cross-replica reduction, so DP/ZeRO reductions and the
    global clipping norm see exactly what torch's ``clip_grad_norm_``
    would — only trainable parameters);
  * frozen leaves take **no optimizer update at all** — in particular no
    decoupled weight decay, which would otherwise shrink a frozen weight
    every step even at zero gradient (torch's AdamW skips params whose
    ``.grad`` is None);
  * optimizer moments of frozen leaves stay identically zero, so the
    8-bit codec and ZeRO flat slices need no special casing.

BatchNorm *running statistics* of frozen modules still update, matching
torch, where ``requires_grad_(False)`` does not touch BN buffers (only
``.eval()`` does).

Masks are per-leaf Python bools (a static property of the program), so
XLA dead-code-eliminates the entire update chain of a frozen leaf —
freezing is free at runtime and *reduces* step cost for large frozen
fractions.
"""
from __future__ import annotations

import fnmatch
from typing import Any, List, Sequence, Tuple

import jax

PyTree = Any


def param_path(key_path) -> str:
    """Dotted path string for a tree_flatten_with_path key path.

    The param tree is nested dicts (core/module.py), so key entries are
    DictKeys: ``[('block1', 'w')] -> 'block1.w'``.
    """
    parts = []
    for k in key_path:
        # DictKey has .key; SequenceKey has .idx (lists inside params are
        # not used today, but stay robust)
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            parts.append(str(k))
    return ".".join(parts)


def _matches(path: str, pattern: str) -> bool:
    """A pattern freezes a leaf if it names the leaf, names an ancestor
    module (prefix at a '.' boundary), or glob-matches the dotted path
    (fnmatch: ``'features.*'``, ``'*bn*'``)."""
    if path == pattern or path.startswith(pattern + "."):
        return True
    if any(c in pattern for c in "*?[") and fnmatch.fnmatchcase(path, pattern):
        return True
    return False


def freeze_mask(params: PyTree, patterns: Sequence[str]) -> PyTree:
    """Per-leaf boolean mask (True = frozen), same treedef as ``params``.

    Every pattern must match at least one leaf — a typo (or another
    model's module name) fails loudly at build time instead of silently
    training the full network (same stance as Config's fold_span
    validation).
    """
    patterns = list(patterns)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [param_path(kp) for kp, _ in flat]
    used = [False] * len(patterns)
    mask = []
    for path in paths:
        frozen = False
        for i, pat in enumerate(patterns):
            if _matches(path, pat):
                frozen = True
                used[i] = True
        mask.append(frozen)
    unused = [p for p, u in zip(patterns, used) if not u]
    if unused:
        sample = ", ".join(sorted({p.split(".")[0] for p in paths})[:12])
        raise ValueError(
            f"freeze_params patterns {unused!r} match no parameter "
            f"(module names include: {sample}, ...)")
    if all(mask):
        raise ValueError("freeze_params froze every parameter — nothing "
                         "left to train")
    return jax.tree_util.tree_unflatten(treedef, mask)


def frozen_summary(params: PyTree, mask: PyTree) -> Tuple[int, int, int, int]:
    """(frozen_leaves, total_leaves, frozen_param_count, total_param_count)
    — for the one-line training log."""
    leaves = jax.tree_util.tree_leaves(params)
    flags: List[bool] = jax.tree_util.tree_leaves(mask)
    frozen_n = sum(int(l.size) for l, f in zip(leaves, flags) if f)
    total_n = sum(int(l.size) for l in leaves)
    return sum(flags), len(flags), frozen_n, total_n
