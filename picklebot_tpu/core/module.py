"""Functional pytree module system — the core of picklebot-tpu.

Design: a Module is a *specification* (hyperparameters + named children), built
eagerly in ``__init__`` like PyTorch, but it never owns arrays. Parameters and
mutable state (BatchNorm statistics, MoViNet stream buffers) live in plain
nested-dict pytrees produced by ``Module.init(key)`` and threaded functionally
through ``Module.apply(variables, x, ...)``:

    model = MobileNetLarge3D(num_classes=13)
    variables = model.init(jax.random.key(0))     # {'params': ..., 'state': ...}
    logits, new_state = model.apply(variables, x, train=True, rng=dropout_key)

Everything is a pure function of its inputs, so ``jax.jit``, ``jax.grad``,
``jax.lax.scan`` (gradient accumulation), and ``shard_map`` (data parallelism)
compose without ceremony. Nested-dict paths mirror PyTorch ``state_dict`` keys
(``block1.0.weight`` ↔ ``params['block1']['0']['w']``), which makes the
``.pth`` → pytree checkpoint converter (picklebot_tpu/train/checkpoint.py) a
simple key walk.

This replaces the reference's ``torch.nn.Module`` layer (capability map:
/root/reference/mobilenet.py, movinet.py, mobilevit.py are all nn.Module
hierarchies) with an explicit-state design that is idiomatic under XLA: no
in-place mutation, no Python-side control flow inside jit.
"""

from __future__ import annotations

import zlib
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

PyTree = Any
Variables = Dict[str, PyTree]  # {'params': ..., 'state': ...}


def _name_key(rng: jax.Array, name: str) -> jax.Array:
    """Deterministically derive a child RNG from a stable hash of its name."""
    return jax.random.fold_in(rng, zlib.crc32(name.encode()) & 0x7FFFFFFF)


def _name_seed(seed: int, name: str) -> int:
    """Child init seed: crc32 chain over the module path (host-side)."""
    return zlib.crc32(name.encode(), seed & 0xFFFFFFFF) & 0xFFFFFFFF


def _deep_merge(old, new):
    out = dict(old) if old else {}
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def as_seed(seed_or_key) -> int:
    """Accept an int seed (incl. numpy integer scalars) or a jax PRNG key
    (tests/back-compat)."""
    import numbers
    if isinstance(seed_or_key, numbers.Integral):
        # numbers.Integral, not int: np.int64(1234) is not a Python int
        # and would fall into the key branch with a confusing TypeError
        return int(seed_or_key)
    import numpy as np
    data = np.asarray(jax.random.key_data(seed_or_key)).reshape(-1)
    return int(data[-1]) & 0xFFFFFFFF


class DtypePolicy:
    """Mixed-precision policy (replaces torch.amp autocast, train.py:263-265).

    On TPU, bfloat16 is native: parameters are stored in ``param_dtype``
    (float32 master copies) and cast to ``compute_dtype`` at use inside
    matmul/conv ops. Normalization statistics stay float32 (matching
    autocast's behavior of running BN in fp32). No GradScaler is needed for
    bf16 — a documented divergence from the reference's redundant scaler.
    """

    def __init__(self, param_dtype=jnp.float32, compute_dtype=jnp.float32):
        self.param_dtype = param_dtype
        self.compute_dtype = compute_dtype

    @property
    def matmul_precision(self) -> str:
        """float32 compute implies exact (HIGHEST) dot/conv precision —
        JAX's 'default' silently downcasts matmul/conv inputs, which breaks
        checkpoint logit-parity. bf16 compute keeps the fast default."""
        return "float32" if self.compute_dtype == jnp.float32 else "default"

    @staticmethod
    def bf16() -> "DtypePolicy":
        return DtypePolicy(jnp.float32, jnp.bfloat16)

    @staticmethod
    def f32() -> "DtypePolicy":
        return DtypePolicy(jnp.float32, jnp.float32)


class Ctx:
    """Per-apply execution context: binds one module's params/state slice.

    Composite modules' ``forward(cx, x)`` call children via ``cx(child, x)``;
    the context routes each child its sub-pytrees, collects updated state, and
    threads RNG + train flag + dtype policy down the tree.
    """

    __slots__ = ("module", "params", "state", "train", "rng", "policy",
                 "new_state", "_rng_counter", "remat_depth")

    def __init__(self, module: "Module", params, state, train: bool,
                 rng: Optional[jax.Array], policy: DtypePolicy,
                 remat_depth: int = 0):
        self.module = module
        self.params = params if params is not None else {}
        self.state = state if state is not None else {}
        self.train = train
        self.rng = rng
        self.policy = policy
        self.new_state: Dict[str, Any] = {}
        self._rng_counter = 0
        self.remat_depth = remat_depth

    # -- RNG ---------------------------------------------------------------
    def next_rng(self) -> jax.Array:
        if self.rng is None:
            raise ValueError(
                "This module needs an rng (dropout in train mode) but none "
                "was passed to apply(..., rng=...).")
        key = jax.random.fold_in(self.rng, self._rng_counter)
        self._rng_counter += 1
        return key

    # -- child dispatch ------------------------------------------------------
    def __call__(self, child: "Module", *args, **kwargs):
        # resolve possibly-nested children (e.g. self.stem[i] inside a
        # ModuleList registered as 'stem') to their dotted path
        path = self.module._child_path(child)
        params, state = self.params, self.state
        rng = self.rng
        for name in path:
            params = params.get(name) if params else None
            state = state.get(name) if state else None
            rng = None if rng is None else _name_key(rng, name)

        if self.remat_depth > 0:
            # activation rematerialization (apply(..., remat=N)): wrap this
            # child-module call in jax.checkpoint, so backward recomputes
            # its activations from the block inputs instead of storing them
            # — the HBM-for-FLOPs trade that lets long clips fit. N levels
            # of the child-call tree are wrapped (N=1: each of the root's
            # blocks; N=2: recursively their children too). Traced kwargs
            # would be closure-captured (saved, not recomputed) — all
            # current forwards pass arrays positionally. NOTE: the memory
            # saving is realized by XLA:TPU's memory-aware scheduler
            # (recompute placed just before each block's backward);
            # XLA:CPU hoists the recomputes and shows no saving
            # (scripts/probe_remat.py) — verify HBM effects on-chip.
            depth = self.remat_depth - 1

            def run(params, state, rng, *args):
                sub = Ctx(child, params, state, self.train, rng, self.policy,
                          remat_depth=depth)
                out = child.forward(sub, *args, **kwargs)
                return out, sub.collected_state()

            out, collected = jax.checkpoint(run)(params, state, rng, *args)
        else:
            sub = Ctx(child, params, state, self.train, rng, self.policy)
            out = child.forward(sub, *args, **kwargs)
            collected = sub.collected_state()
        if collected is not None:
            node = self.new_state
            for name in path[:-1]:
                node = node.setdefault(name, {})
            node[path[-1]] = collected
        return out

    def collected_state(self):
        """Deep-merged state after forward: child updates overlay old state
        without dropping untouched siblings."""
        if not self.state and not self.new_state:
            return None
        return _deep_merge(self.state, self.new_state)

    # -- leaf helpers --------------------------------------------------------
    def param(self, name: str):
        return self.params[name]

    def get_state(self, name: str):
        return self.state[name]

    def put_state(self, name: str, value):
        self.new_state[name] = value


class Module:
    """Base class. Subclasses build children/hyperparams in ``__init__``.

    Leaf modules override ``param_spec()`` / ``state_spec()`` (returning
    name → init-fn dicts) and ``forward(cx, x)``. Composites only build
    children and override ``forward``.
    """

    def __init__(self):
        object.__setattr__(self, "_children", {})

    # -- child tracking (PyTorch-style attribute registration) ---------------
    def __setattr__(self, name: str, value):
        if isinstance(value, Module):
            self._children[name] = value
        elif isinstance(value, (list, tuple)) and value and all(
                isinstance(v, Module) for v in value):
            # wrap in an implicit ModuleList: registering dotted 'name.i'
            # keys here would make init_params store literal dotted dict
            # keys while Ctx/_child_path walk nested dicts — params would
            # init at params['name.0'] but apply via params['name']['0'].
            # The WRAP becomes the attribute too: keeping the raw list
            # would let `self.blocks.append(m)` mutate the attribute while
            # registration kept the snapshot (KeyError at trace time with
            # no hint); on the ModuleList, append registers.
            value = ModuleList(value)
            self._children[name] = value
        object.__setattr__(self, name, value)

    def _child_name(self, child: "Module") -> str:
        for name, c in self._children.items():
            if c is child:
                return name
        raise KeyError(
            f"{child!r} is not a registered child of {type(self).__name__}")

    def _child_path(self, child: "Module"):
        """Dotted-path segments to a (possibly nested) descendant module."""
        for name, c in self._children.items():
            if c is child:
                return name.split(".")
            try:
                return name.split(".") + c._child_path(child)
            except KeyError:
                continue
        raise KeyError(
            f"{child!r} is not a descendant of {type(self).__name__}")

    def named_children(self):
        return dict(self._children)

    # -- leaf overrides --------------------------------------------------------
    def param_spec(self) -> Dict[str, Callable[[jax.Array], jax.Array]]:
        """name → fn(key) -> array. Leaves with params override this."""
        return {}

    def state_spec(self) -> Dict[str, Callable[[], jax.Array]]:
        """name → fn() -> array. Leaves with mutable state override this."""
        return {}

    def forward(self, cx: Ctx, *args, **kwargs):
        raise NotImplementedError(type(self).__name__)

    # -- init / apply -----------------------------------------------------------
    # Initialization is host-side (numpy): instant, deterministic, no device
    # round-trips or XLA compile. Params transfer in one device_put later.
    def init_params(self, seed) -> PyTree:
        seed = as_seed(seed)
        spec = self.param_spec()
        out: Dict[str, Any] = {}
        for name, fn in spec.items():
            out[name] = fn(_name_seed(seed, name))
        for name, child in self._children.items():
            sub = child.init_params(_name_seed(seed, name))
            if sub:
                out[name] = sub
        return out

    def init_state(self) -> PyTree:
        out: Dict[str, Any] = {}
        for name, fn in self.state_spec().items():
            out[name] = fn()
        for name, child in self._children.items():
            sub = child.init_state()
            if sub:
                out[name] = sub
        return out

    def _assert_no_shared_children(self):
        """Weight sharing is not supported: one Module instance registered
        at two tree positions gets two INDEPENDENT param copies at init,
        but _child_path resolves every forward call to the first position
        — the second copy silently gets zero grads while weight decay
        drifts it. Fail loudly at init instead."""
        seen: Dict[int, str] = {}

        def walk(mod, path):
            for name, child in mod._children.items():
                p = f"{path}.{name}" if path else name
                if id(child) in seen:
                    raise ValueError(
                        f"{type(child).__name__} instance is registered at "
                        f"both '{seen[id(child)]}' and '{p}': weight "
                        "sharing is not supported — construct a separate "
                        "instance per site")
                seen[id(child)] = p
                walk(child, p)

        walk(self, "")

    def init(self, seed) -> Variables:
        """seed: int or jax PRNG key. Returns host-numpy variable pytrees."""
        self._assert_no_shared_children()
        return {"params": self.init_params(seed), "state": self.init_state()}

    def apply(self, variables: Variables, *args, train: bool = False,
              rng: Optional[jax.Array] = None,
              policy: Optional[DtypePolicy] = None, remat: int = 0,
              **kwargs):
        """Pure forward pass. Returns ``(out, new_state)``.

        ``remat=N`` wraps the first N levels of child-module calls in
        ``jax.checkpoint``: backward recomputes those blocks' activations
        instead of storing them (config key ``remat``; the TPU answer to
        activation memory the reference has no equivalent for)."""
        policy = policy or DtypePolicy.f32()
        cx = Ctx(self, variables.get("params"), variables.get("state"),
                 train, rng, policy, remat_depth=int(remat))
        with jax.default_matmul_precision(policy.matmul_precision):
            out = self.forward(cx, *args, **kwargs)
        new_state = cx.collected_state()
        return out, (new_state if new_state is not None else {})


class Sequential(Module):
    """Ordered chain; children named '0', '1', ... (mirrors nn.Sequential so
    converted torch state_dict keys line up, e.g. reference mobilenet.py:140)."""

    def __init__(self, *layers: Module):
        super().__init__()
        # bypass __setattr__'s implicit-ModuleList wrap (would recurse);
        # children register under bare indices to match torch naming
        object.__setattr__(self, "layers", list(layers))
        for i, l in enumerate(layers):
            self._children[str(i)] = l

    def forward(self, cx: Ctx, x):
        for i in range(len(self.layers)):
            x = cx(self.layers[i], x)
        return x

    def __iter__(self):
        return iter(self.layers)

    def __getitem__(self, i):
        return self.layers[i]


class ModuleList(Module):
    """List container with torch-style integer child names."""

    def __init__(self, mods: Sequence[Module] = ()):
        super().__init__()
        object.__setattr__(self, "mods", list(mods))  # no implicit re-wrap
        for i, m in enumerate(self.mods):
            self._children[str(i)] = m

    def append(self, m: Module):
        self.mods.append(m)
        self._children[str(len(self.mods) - 1)] = m

    def __iter__(self):
        return iter(self.mods)

    def __len__(self):
        return len(self.mods)

    def __getitem__(self, i):
        return self.mods[i]


class Lambda(Module):
    """Stateless function as a module (e.g. activations inside Sequential)."""

    def __init__(self, fn: Callable):
        super().__init__()
        self.fn = fn

    def forward(self, cx: Ctx, x):
        return self.fn(x)


def param_count(params: PyTree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def flatten_dict(tree: PyTree, sep: str = ".") -> Dict[str, jax.Array]:
    """Nested dict → {'a.b.c': leaf} (torch state_dict-style keys)."""
    out = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}{sep}{k}" if prefix else str(k), v)
        else:
            out[prefix] = node

    rec("", tree)
    return out


def unflatten_dict(flat: Dict[str, Any], sep: str = ".") -> PyTree:
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out
