"""Checkpointing: Orbax for native state + torch ``.pth`` interop.

Native checkpoints (params / optimizer state / BN state / step / LR schedule
position) go through Orbax — unlike the reference, which saves only the model
``state_dict`` and silently restarts the schedule on resume (train.py:316-318,
230-235; its ``start_epoch`` is assigned the checkpoint *path* and never
used).

Torch interop loads a reference ``.pth`` zip (weights-only pickle) into our
pytree so logits can be compared within float tolerance, and exports back.
Key mapping is mechanical because our nested-dict paths mirror torch
state_dict keys; only tensor layouts change:

  conv   torch (O, I/g, k...)        -> ours (k..., I/g, O)
  dense  torch (O, I)                -> ours (I, O)
  1x1-conv-as-dense torch (O, I, 1..)-> ours (I, O)
  SE     se.1/se.3 conv weights      -> w1/w2 dense weights
  BN     weight/bias/running_mean/var-> scale/bias + state mean/var
  LSTM   weight_ih_l{k} (4H, in)     -> w_ih_l{k} (in, 4H)

``state_dict_converter`` parity: torch.compile's ``_orig_mod.`` prefixes are
stripped like reference train.py:38-44.

ZeRO note: under ``zero_sharding`` (parallel/zero.py) the optimizer moment
leaves are saved in their rank-stacked layout (n_data, ...). Resuming at a
different data-parallel degree — or with zero_sharding toggled — works:
train/loop.py detects the saved layout and converts it host-side via
``zero.zero_reshard`` (fp32 moments exact; 8-bit blocks requantize within
one codec quantum). Params are layout-independent either way.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from picklebot_tpu.core.module import (Variables, flatten_dict,
                                       unflatten_dict)


# --------------------------------------------------------------------------
# torch .pth -> pytree
# --------------------------------------------------------------------------

def strip_compile_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference train.py:38-44: drop torch.compile's '_orig_mod.' prefix."""
    out = {}
    for k, v in state_dict.items():
        out[k[len("_orig_mod."):] if k.startswith("_orig_mod.") else k] = v
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth into numpy arrays (host-side tool; torch-cpu only)."""
    import torch  # local import: torch is a host-side interop dep only
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = strip_compile_prefix(sd)
    return {k: v.detach().to(torch.float32).numpy()
            for k, v in sd.items() if isinstance(v, torch.Tensor)}


def _convert_leaf(torch_key: str, value: np.ndarray,
                  target: jax.Array) -> np.ndarray:
    """Convert one torch tensor to our layout, guided by the target shape.

    Layout-specific conversions are tried BEFORE the pass-through: torch 2D
    weights are always (out, in), so a square Linear weight must still be
    transposed even though its shape coincidentally equals the target's.
    """
    v = value
    # conv weight (O, I, k...) -> (k..., I, O)
    if v.ndim >= 3 and target.ndim == v.ndim:
        perm = tuple(range(2, v.ndim)) + (1, 0)
        vt = np.transpose(v, perm)
        if vt.shape == target.shape:
            return vt
    # 1x1 conv used as dense: (O, I, 1...) -> (I, O)
    if v.ndim > 2 and all(d == 1 for d in v.shape[2:]):
        vt = v.reshape(v.shape[0], v.shape[1]).T
        if vt.shape == target.shape:
            return vt
    # dense / lstm weights: (O, I) -> (I, O)
    if v.ndim == 2 and v.T.shape == target.shape:
        return v.T
    # pass-through (1D params/state and anything already in our layout)
    if v.ndim == target.ndim and v.shape == target.shape:
        return v
    raise ValueError(
        f"Cannot convert {torch_key}: torch shape {v.shape} -> "
        f"target {target.shape}")


def _default_key_map(torch_key: str) -> Tuple[str, bool]:
    """Map a torch state_dict key to (our flat path, is_state).

    Returns the path into params (is_state=False) or state (True).
    """
    k = torch_key
    is_state = False
    # BatchNorm
    if k.endswith(".running_mean"):
        return k[:-len("running_mean")] + "mean", True
    if k.endswith(".running_var"):
        return k[:-len("running_var")] + "var", True
    if k.endswith(".num_batches_tracked"):
        return "", True  # dropped
    # SE blocks: torch 'se.1.weight' / 'se.3.weight' conv stack -> w1/w2
    k = re.sub(r"\bse\.1\.weight$", "w1", k)
    k = re.sub(r"\bse\.1\.bias$", "b1", k)
    k = re.sub(r"\bse\.3\.weight$", "w2", k)
    k = re.sub(r"\bse\.3\.bias$", "b2", k)
    # generic weight/bias
    if k.endswith(".weight"):
        k = k[:-len(".weight")] + ".w"
    elif k.endswith(".bias"):
        k = k[:-len(".bias")] + ".b"
    # LSTM: torch 'lstm.weight_ih_l0' -> 'lstm.w_ih_l0'
    k = re.sub(r"\.weight_(ih|hh)_l(\d+)$", r".w_\1_l\2", k)
    k = re.sub(r"\.bias_(ih|hh)_l(\d+)$", r".b_\1_l\2", k)
    return k, is_state


# Transient per-step telemetry published through the module-state channel
# (MoE load-balance aux losses, ops/moe.py) — not persistent statistics:
# never exported to .pth and dropped when found in one (the torch format
# carries weights + BN stats only).
TRANSIENT_STATE_LEAVES = ("aux_loss",)


def import_torch_state_dict(
        sd: Dict[str, np.ndarray], variables: Variables,
        key_map=None, strict: bool = True,
        partial: bool = False, stats: Optional[dict] = None) -> Variables:
    """Graft a torch state_dict onto an initialized variables pytree.

    ``key_map(torch_key) -> (flat_path, is_state) | None`` lets models remap
    structurally-renamed layers (e.g. classifier convs that became Dense).
    BatchNorm affine params map weight->scale, bias->bias within params.

    ``partial=True`` (transfer learning): a torch leaf whose shape cannot
    convert to the target's (e.g. a head trained at a different class
    count) keeps the fresh initialization instead of raising — pair with
    ``strict=False`` so donor-only keys are skipped too.

    ``stats``: pass a dict to receive ``grafted_params``/``grafted_state``
    (leaf counts actually transferred) and ``unused`` (skipped torch keys).
    Partial callers MUST check grafted_params > 0 — with strict=False a
    wrong/foreign donor otherwise grafts ZERO leaves and trains silently
    from fresh init (the Orbax path raises; this keeps .pth symmetric).
    """
    flat_params = flatten_dict(variables["params"])
    flat_state = flatten_dict(variables["state"])
    new_params = dict(flat_params)
    new_state = dict(flat_state)
    unused = []
    n_grafted_params = n_grafted_state = 0
    for tk, v in sd.items():
        if tk.rsplit(".", 1)[-1] in TRANSIENT_STATE_LEAVES:
            continue
        mapped = key_map(tk) if key_map else None
        if mapped is None:
            path, is_state = _default_key_map(tk)
        else:
            path, is_state = mapped
        if path == "":
            continue  # intentionally dropped
        # NB: the explicit np copy below is load-bearing — torch's
        # .detach().float().numpy() is zero-copy for f32 tensors and JAX's
        # CPU backend can alias numpy buffers, so without it our params
        # would silently alias LIVE torch weights (mutated by torch
        # optimizers). Caught by tests/test_training_parity.py.
        if is_state:
            if path not in flat_state:
                if strict:
                    raise KeyError(f"{tk} -> state path {path} not found")
                unused.append(tk)
                continue
            try:
                conv = _convert_leaf(tk, v, flat_state[path])
            except ValueError:
                if not partial:
                    raise
                unused.append(tk)
                continue
            # host-side numpy (NOT jnp.asarray): a device commit here is
            # one tunnel RPC per leaf on the remote-TPU platform, and the
            # whole init pipeline is host-numpy by design (CLAUDE.md)
            new_state[path] = np.array(conv, dtype=flat_state[path].dtype,
                                       copy=True)
            n_grafted_state += 1
        else:
            # BN affine: our param names are scale/bias, torch weight/bias
            if path not in flat_params:
                alt = None
                if path.endswith(".w"):
                    alt = path[:-2] + ".scale"
                elif path.endswith(".b"):
                    alt = path[:-2] + ".bias"
                if alt and alt in flat_params:
                    path = alt
                else:
                    if strict:
                        raise KeyError(f"{tk} -> param path {path} not found")
                    unused.append(tk)
                    continue
            try:
                conv = _convert_leaf(tk, v, flat_params[path])
            except ValueError:
                if not partial:
                    raise
                unused.append(tk)
                continue
            new_params[path] = np.array(conv, dtype=flat_params[path].dtype,
                                        copy=True)
            n_grafted_params += 1
    if unused:
        print(f"[checkpoint] {len(unused)} torch keys unused: {unused[:8]}...")
    if stats is not None:
        stats["grafted_params"] = n_grafted_params
        stats["grafted_state"] = n_grafted_state
        stats["unused"] = list(unused)
    return {"params": unflatten_dict(new_params),
            "state": unflatten_dict(new_state)}


def load_pth(path: str, variables: Variables, key_map=None,
             strict: bool = True, partial: bool = False,
             stats: Optional[dict] = None) -> Variables:
    """One-call reference-checkpoint import (north-star parity gate)."""
    return import_torch_state_dict(load_torch_state_dict(path), variables,
                                   key_map=key_map, strict=strict,
                                   partial=partial, stats=stats)


def graft_matching(donor: Any, fresh: Any):
    """Transfer-learning merge: each donor leaf whose flat path exists in
    ``fresh`` with the SAME shape replaces the fresh leaf (cast to the fresh
    dtype); everything else keeps the fresh initialization.

    Returns ``(merged, grafted, skipped)`` — ``grafted`` the transferred
    paths, ``skipped`` a list of ``(path, reason)`` for donor leaves that
    did not land (unknown path or shape mismatch, e.g. a classifier head
    at a different ``num_classes``). The torch recipe this replaces is
    "delete the mismatched keys, then load_state_dict(strict=False)" —
    the reference has no fine-tune entry of its own (train.py loads
    checkpoints only as full weight sets).
    """
    df = flatten_dict(donor)
    ff = flatten_dict(fresh)
    merged = dict(ff)
    grafted, skipped = [], []
    for path in sorted(df):
        leaf = df[path]
        if path not in ff:
            skipped.append((path, "no matching leaf in the fresh model"))
            continue
        tgt = np.asarray(ff[path])
        src = np.asarray(leaf)
        if src.shape != tgt.shape:
            skipped.append(
                (path, f"donor shape {src.shape} != fresh {tgt.shape}"))
            continue
        merged[path] = src.astype(tgt.dtype, copy=False)
        grafted.append(path)
    return unflatten_dict(merged), grafted, skipped


# --------------------------------------------------------------------------
# pytree -> torch .pth (export for the reference ecosystem / HF demo)
# --------------------------------------------------------------------------

def build_reverse_map(torch_keys, key_map=None) -> Dict[str, str]:
    """{our_flat_path: torch_key} for export, derived from the SAME forward
    key_map used on import — enumerate the torch model's state_dict keys and
    invert. Guarantees export/import key symmetry for any model that has a
    working import map (every model in train/key_maps.py)."""
    reverse: Dict[str, str] = {}
    for tk in torch_keys:
        mapped = key_map(tk) if key_map else None
        if mapped is None:
            mapped = _default_key_map(tk)
        path, _ = mapped
        if path:
            reverse[path] = tk
    return reverse


def export_torch_state_dict(variables: Variables,
                            reverse_map: Optional[Dict[str, str]] = None,
                            rank_map=None,
                            add_num_batches_tracked: bool = True
                            ) -> Dict[str, Any]:
    """Inverse of import: our pytree -> a torch state_dict-shaped dict.

    Layout transposes are inferred from rank: conv (k..., I, O) -> (O, I,
    k...), dense (I, O) -> (O, I). Key renames invert the default rules;
    ``reverse_map`` overrides {our_flat_path: torch_key} for model-specific
    structure (build one with ``build_reverse_map``).

    ``rank_map(torch_key) -> int | None`` states the rank the reference
    module declares for that parameter (``key_maps.export_rank_for``): our
    1x1-conv-as-Dense weights (SE layers, MobileNet3D classifier heads) are
    2D ``(in, out)`` but torch declares Conv3d/Conv2d ``(O, I, 1, 1, 1)`` —
    without the reshape ``load_state_dict`` raises on the size mismatch even
    with strict=False. ``add_num_batches_tracked`` synthesizes the torch BN
    bookkeeping tensor (dropped on import) so strict=True loads succeed.
    Weights trained here can be served by the reference code —
    golden-tested by loading into the actual reference modules
    (tests/test_export_torch_load.py).
    """
    import torch
    flat_params = flatten_dict(variables["params"])
    flat_state = flatten_dict(variables["state"])
    out: Dict[str, Any] = {}

    def to_torch_layout(v: np.ndarray, torch_key: str) -> np.ndarray:
        # copy: device_get can alias read-only JAX buffers, and torch
        # tensors over non-writable numpy arrays are undefined behavior
        v = np.array(v, np.float32, copy=True)
        if v.ndim >= 3:  # conv (k..., I, O) -> (O, I, k...)
            perm = (v.ndim - 1, v.ndim - 2) + tuple(range(v.ndim - 2))
            return np.transpose(v, perm)
        if v.ndim == 2:  # dense (I, O) -> (O, I)
            vt = v.T
            want = rank_map(torch_key) if rank_map else None
            if want and want > 2:  # torch declares a 1x1 conv here
                vt = vt.reshape(vt.shape + (1,) * (want - 2))
            return vt
        return v

    def default_torch_key(path: str, is_state: bool) -> str:
        if reverse_map:
            if path in reverse_map:
                return reverse_map[path]
            # mirror the importer's alias: torch weight/bias -> our
            # scale/bias on norm layers (import_torch_state_dict alt paths)
            if path.endswith(".scale") and \
                    path[:-len("scale")] + "w" in reverse_map:
                return reverse_map[path[:-len("scale")] + "w"]
            if path.endswith(".bias") and \
                    path[:-len("bias")] + "b" in reverse_map:
                return reverse_map[path[:-len("bias")] + "b"]
        if is_state:
            if path.endswith(".mean"):
                return path[:-len("mean")] + "running_mean"
            if path.endswith(".var"):
                return path[:-len("var")] + "running_var"
            return path
        k = path
        k = re.sub(r"\.w_(ih|hh)_l(\d+)$", r".weight_\1_l\2", k)
        k = re.sub(r"\.b_(ih|hh)_l(\d+)$", r".bias_\1_l\2", k)
        if k != path:
            return k
        if k.endswith(".w") or k.endswith(".scale"):
            return k.rsplit(".", 1)[0] + ".weight"
        if k.endswith(".b") or k.endswith(".bias"):
            return k.rsplit(".", 1)[0] + ".bias"
        return k

    for path, v in flat_params.items():
        tk = default_torch_key(path, False)
        out[tk] = torch.from_numpy(
            to_torch_layout(np.asarray(jax.device_get(v)), tk))
    for path, v in flat_state.items():
        if path.rsplit(".", 1)[-1] in TRANSIENT_STATE_LEAVES:
            continue
        tk = default_torch_key(path, True)
        out[tk] = torch.from_numpy(
            np.array(jax.device_get(v), np.float32, copy=True))
        if add_num_batches_tracked and tk.endswith(".running_mean"):
            out[tk[:-len("running_mean")] + "num_batches_tracked"] = \
                torch.zeros((), dtype=torch.int64)
    return out


def save_pth(path: str, variables: Variables, reverse_map=None,
             rank_map=None):
    import torch
    torch.save(export_torch_state_dict(variables, reverse_map=reverse_map,
                                       rank_map=rank_map),
               path)


# --------------------------------------------------------------------------
# Orbax native checkpoints
# --------------------------------------------------------------------------

_CKPTR = None  # shared checkpointer so async saves can drain across calls


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(directory: str, step: int, payload: Any,
                    block: bool = True,
                    minor: Optional[int] = None) -> str:
    """Save a full training snapshot (params, opt state, BN state, step).

    ``minor`` names a mid-epoch snapshot ``step_<step>_<minor>`` (after
    ``minor`` optimizer steps of epoch ``step``); see latest_checkpoint
    for the ordering.

    ``block=False`` returns once the host-side snapshot is taken and lets
    orbax write in the background (training overlaps the disk/SSD I/O);
    the next save — or :func:`wait_for_checkpoints` — drains it. Orbax
    writes to a temp dir and renames, so an interrupted async write never
    leaves a directory that restore would mistake for a checkpoint."""
    directory = os.path.abspath(directory)
    name = f"step_{step}" if minor is None else f"step_{step}_{minor}"
    path = os.path.join(directory, name)
    ckptr = _checkpointer()
    # np.asarray snapshots device_get'd leaves; host numpy passes through
    # (the caller hands freshly-fetched arrays, nothing aliases the live
    # training state)
    payload = jax.tree_util.tree_map(np.asarray, payload)
    ckptr.save(path, payload, force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def wait_for_checkpoints() -> None:
    """Drain any in-flight async save (no-op when none is pending)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def restore_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a snapshot; ``target=None`` returns the raw saved pytree
    (numpy leaves) — used by serving, which doesn't know the optimizer."""
    ckptr = _checkpointer()
    if target is None:
        return ckptr.restore(os.path.abspath(path))
    return ckptr.restore(os.path.abspath(path), target=target)


def prune_epochs(directory: str, keep: int) -> None:
    """Delete all but the newest ``keep`` END-of-epoch snapshots
    (``step_<e>`` dirs; mid-epoch ``step_<e>_<n>`` ones are
    prune_midepoch's business). ``keep`` <= 0 disables pruning — the
    reference's behavior (one .pth per eval interval, never deleted,
    train.py:316-318) and ours by default."""
    if keep <= 0 or not os.path.isdir(directory):
        return
    snaps = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            snaps.append((int(m.group(1)), name))
    snaps.sort()
    for _, name in snaps[:max(0, len(snaps) - keep)]:
        import shutil
        shutil.rmtree(os.path.join(directory, name), ignore_errors=True)


def prune_midepoch(directory: str, keep: int = 1) -> None:
    """Delete all but the newest ``keep`` MID-epoch snapshots
    (``step_<e>_<n>`` dirs) so checkpoint_every_steps doesn't accumulate
    one snapshot per interval. End-of-epoch ``step_<e>`` snapshots are
    never touched. Safe alongside async saves: orbax waits for the prior
    in-flight save before starting a new one and writes through a tmp-dir
    rename, so every dir matching the pattern is a complete snapshot and
    the in-flight one is invisible here."""
    if not os.path.isdir(directory):
        return
    snaps = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)_(\d+)", name)
        if m:
            snaps.append(((int(m.group(1)), int(m.group(2))), name))
    snaps.sort()
    for _, name in snaps[:max(0, len(snaps) - keep)]:
        import shutil
        shutil.rmtree(os.path.join(directory, name), ignore_errors=True)


def latest_checkpoint(directory: str) -> Optional[str]:
    """Newest snapshot in ``directory``, by training progress.

    Two name forms coexist: ``step_<epoch>`` (end-of-epoch saves; the state
    inside has epoch+1) and ``step_<epoch>_<n>`` (mid-epoch saves after n
    optimizer steps of that epoch, config checkpoint_every_steps). An
    end-of-epoch save strictly dominates any mid-epoch save of the same
    epoch, so it sorts as (epoch, +inf)."""
    if not os.path.isdir(directory):
        return None
    best = None  # ((epoch, n), name)
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)(?:_(\d+))?", name)
        if not m:
            continue
        key = (int(m.group(1)),
               int(m.group(2)) if m.group(2) else float("inf"))
        if best is None or key > best[0]:
            best = (key, name)
    if best is None:
        return None
    return os.path.join(directory, best[1])
