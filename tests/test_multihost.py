"""Multi-host simulation: 2 processes x 4 virtual CPU devices each.

The JAX-native analog of a 2-node torchrun test: each process runs
jax.distributed.initialize, sees its per-host CSV shard, and the shard_map
train step's pmean spans all 8 devices across both processes. Spawned as
real subprocesses (a process boundary is the point).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.data.dataset import ClipDataset
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.train.optim import AdamW, cosine_annealing_lr
from picklebot_tpu.train.step import create_train_state, make_train_step
from tests.test_train_step import TinyVideoNet

# per-host dataset shard (DistributedSampler analog)
ds = ClipDataset("", "", backend="synthetic", synthetic_len=16,
                 synthetic_shape=(4, 16, 16),
                 shard=jax.process_index(), num_shards=jax.process_count())
assert len(ds) == 8

from jax.experimental import multihost_utils

model = TinyVideoNet()
opt = AdamW(weight_decay=1e-4)
mesh = make_mesh(data=8)
step = make_train_step(model, opt, "CE", cosine_annealing_lr(1e-3, 10),
                       policy=DtypePolicy.f32(), mesh=mesh, donate=False)
# host-local -> global: every host holds the same full value (replicated)
state = multihost_utils.host_local_array_to_global_array(
    jax.device_get(create_train_state(model, opt, 0)), mesh, P())

# each host contributes its local half of the global batch (ragged clips
# go through the production collate)
from picklebot_tpu.data.dataset import pad_collate
clips, lbls = zip(*[ds[i] for i in range(8)])
local, labels_l = pad_collate(list(clips), list(lbls), t_bucket=4,
                              max_frames=4)
local = local[None]
labels_l = labels_l.astype(np.int32)[None]
gshape = (1, 16) + local.shape[2:]
feats = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(None, "data")), local.astype(np.uint8), gshape)
labels = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(None, "data")), labels_l, (1, 16))

# replicated PRNG key: built inside jit from a replicated seed scalar
seed = multihost_utils.host_local_array_to_global_array(
    np.zeros((), np.int32), mesh, P())
key = jax.jit(jax.random.key,
              out_shardings=NamedSharding(mesh, P()))(seed)

state, metrics = step(state, feats, labels, key)
loss = float(np.mean(multihost_utils.process_allgather(metrics["loss"],
                                                       tiled=True)))
samples = float(np.asarray(multihost_utils.process_allgather(
    metrics["samples"], tiled=True)).reshape(-1)[0])
assert samples == 16.0, samples
assert np.isfinite(loss), loss
print(f"HOST{proc_id} OK loss={loss:.4f} samples={samples}")
"""


_TRAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.device_count() == 8, jax.device_count()

import numpy as np
from picklebot_tpu.train.loop import train
from picklebot_tpu.utils.config import Config

os.chdir(sys.argv[2])
cfg = Config(
    model_name="MobileNetSmall3D", learning_rate=1e-3, batch_size=1,
    max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
    criterion="CE", num_classes=13, effective_batch_size=2,
    data_backend="synthetic", synthetic_len=16, synthetic_shape=(8, 32, 32),
    t_bucket=8, max_frames=8, num_workers=2, optimizer="adamw8bit",
    data_parallel=8, checkpoint_dir="ckpt", log_dir="runs").validate()
summary = train(cfg, max_steps=1)
assert np.isfinite(summary["final_val_loss"]), summary
# full val set = both hosts' shards (8 + 8), every sample counted once
assert summary["val_samples"] == 16.0, summary
print(f"HOST{proc_id} TRAINLOOP OK val_loss={summary['final_val_loss']:.4f}")
"""


_TP_TRAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.device_count() == 8, jax.device_count()

import numpy as np
from picklebot_tpu.train.loop import train
from picklebot_tpu.utils.config import Config

os.chdir(sys.argv[2])
# DP x TP across hosts: mesh (data=4, model=2); each host's 4 devices cover
# two whole data rows, TP groups stay host-local (round-2 VERDICT item 8:
# train() used to raise on this combination)
cfg = Config(
    model_name="MobileViT", learning_rate=1e-3, batch_size=1,
    max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
    criterion="CE", num_classes=13, effective_batch_size=4,
    dims=[64, 80, 96],
    channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320],
    data_backend="synthetic", synthetic_len=8, synthetic_shape=(4, 32, 32),
    t_bucket=4, max_frames=4, num_workers=1, optimizer="adamw8bit",
    data_parallel=4, model_parallel=2,
    checkpoint_dir="ckpt", log_dir="runs").validate()
summary = train(cfg, max_steps=1)
assert np.isfinite(summary["final_val_loss"]), summary
assert summary["val_samples"] == 8.0, summary
print(f"HOST{proc_id} TPTRAIN OK val_loss={summary['final_val_loss']:.4f}")
"""


_EP_TRAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.device_count() == 8, jax.device_count()

import numpy as np
from picklebot_tpu.train.loop import train
from picklebot_tpu.utils.config import Config

os.chdir(sys.argv[2])
# DP x EP across hosts: mesh (data=4, expert=2); each host's 4 devices
# cover two whole data rows, EP groups (and their all_to_all exchanges —
# moe_dispatch='tokens') stay host-local
cfg = Config(
    model_name="MobileViT", learning_rate=1e-3, batch_size=1,
    max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
    criterion="CE", num_classes=13, effective_batch_size=4,
    dims=[16, 16, 16],
    channels=[8, 8, 8, 8, 16, 16, 16, 16, 16, 16, 32],
    data_backend="synthetic", synthetic_len=8, synthetic_shape=(4, 32, 32),
    t_bucket=4, max_frames=4, num_workers=1, optimizer="adamw8bit",
    data_parallel=4, moe_experts=4, expert_parallel=2,
    moe_dispatch="tokens", attention_backend="xla",
    checkpoint_dir="ckpt", log_dir="runs").validate()
summary = train(cfg, max_steps=1)
assert np.isfinite(summary["final_val_loss"]), summary
assert summary["val_samples"] == 8.0, summary
print(f"HOST{proc_id} EPTRAIN OK val_loss={summary['final_val_loss']:.4f}")
"""


_ZERO_TRAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.device_count() == 8, jax.device_count()

import numpy as np
from picklebot_tpu.train.loop import train
from picklebot_tpu.utils.config import Config

os.chdir(sys.argv[2])
# ZeRO-DP across hosts: mesh (data=8) spanning both processes; each host
# places its devices' 1/8 optimizer-state slices (parallel/zero.py), the
# reduce-scatter/all-gather pair crosses the process boundary
cfg = Config(
    model_name="MobileNetSmall3D", learning_rate=1e-3, batch_size=1,
    max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
    criterion="CE", num_classes=13, effective_batch_size=2,
    data_backend="synthetic", synthetic_len=16, synthetic_shape=(8, 32, 32),
    t_bucket=8, max_frames=8, num_workers=2, optimizer="adamw8bit",
    data_parallel=8, zero_sharding=True,
    checkpoint_dir="ckpt", log_dir="runs").validate()
summary = train(cfg, max_steps=1)
assert np.isfinite(summary["final_val_loss"]), summary
assert summary["val_samples"] == 16.0, summary
print(f"HOST{proc_id} ZEROTRAIN OK val_loss={summary['final_val_loss']:.4f}")
"""


_DCN_TRAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/picklebot_jax_cache")
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.device_count() == 8, jax.device_count()

import numpy as np
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.train.loop import train
from picklebot_tpu.utils.config import Config

# multi-slice layout: each PROCESS stands in for a DCN-connected slice
# (process_is_granule semantics). With dcn_data=2, every TP pair and the
# inner data stride must be process-local; only the outer data stride
# crosses the process (DCN) boundary.
mesh = make_mesh(data=4, model=2, dcn_data=2)
pidx = np.vectorize(lambda d: d.process_index)(mesh.devices)
rows = pidx.reshape(4, 2)
assert (rows[:2] == 0).all() and (rows[2:] == 1).all(), rows

os.chdir(sys.argv[2])
cfg = Config(
    model_name="MobileViT", learning_rate=1e-3, batch_size=1,
    max_iters=1, eval_interval=1, weight_decay=5e-4, use_autocast=False,
    criterion="CE", num_classes=13, effective_batch_size=4,
    dims=[64, 80, 96],
    channels=[16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320],
    data_backend="synthetic", synthetic_len=8, synthetic_shape=(4, 32, 32),
    t_bucket=4, max_frames=4, num_workers=1, optimizer="adamw8bit",
    data_parallel=4, model_parallel=2, dcn_data_parallel=2,
    checkpoint_dir="ckpt", log_dir="runs").validate()
summary = train(cfg, max_steps=1)
assert np.isfinite(summary["final_val_loss"]), summary
assert summary["val_samples"] == 8.0, summary
print(f"HOST{proc_id} DCNTRAIN OK val_loss={summary['final_val_loss']:.4f}")
"""


_AUTOTUNE_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
proc_id = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2

from picklebot_tpu.utils import autotune as at
from picklebot_tpu.utils.config import Config

calls = []
def fake_measure(config, plan, mode, shape, steps=5, warmup=2):
    calls.append(plan)
    spans = at.plan_candidates(config.model_name)
    return 100.0 + spans.index(plan)      # last candidate wins
at.measure_plan = fake_measure
os.environ["PICKLEBOT_AUTOTUNE_CACHE"] = os.path.join(
    sys.argv[2], f"cache{proc_id}.json")

cfg = Config(model_name="MobileNetSmall3D", autotune=True, batch_size=2,
             effective_batch_size=2, data_backend="synthetic",
             synthetic_shape=(2, 32, 32)).validate()
tuned = at.autotune_config(cfg, mode="train")
# only process 0 measures; the winner reaches both via broadcast
assert (len(calls) > 0) == (proc_id == 0), (proc_id, calls)
expect = at.plan_candidates(cfg.model_name)[-1]
assert (tuned.early_fold, tuned.fold_span) == expect, (
    proc_id, tuned.early_fold, tuned.fold_span)
assert tuned.autotune is False
print(f"HOST{proc_id} AUTOTUNE OK plan={tuned.fold_span}")
"""


def _run_two_process(tmp_path, worker_src, ok_marker, extra_args=()):
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(worker_src.replace("%PORT%", str(port)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.environ.get("PYTHONPATH", "") + ":" +
               os.getcwd())
    import concurrent.futures as cf
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), *map(str, extra_args)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    with cf.ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(lambda pr: pr.communicate(timeout=540)[0], p)
                for p in procs]
        outs = [f.result() for f in futs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out[-3000:]}"
        assert f"HOST{i} {ok_marker}" in out, out[-2000:]


@pytest.mark.slow
def test_two_process_train_loop(tmp_path):
    """train(config) itself across 2 processes: global mesh sizing, per-host
    data shards assembled into global arrays, synchronized batch counts, and
    full-val-set eval (ADVICE r1: train() was single-host-only)."""
    _run_two_process(tmp_path, _TRAIN_WORKER, "TRAINLOOP OK",
                     extra_args=(tmp_path,))


@pytest.mark.slow
def test_two_process_train_loop_tp(tmp_path):
    """train(config) across 2 processes WITH tensor parallelism: mesh
    (data=4, model=2), MobileViT FFN shards spanning host-local TP groups,
    per-host data assembly, full-val-set eval (round-3 VERDICT item 8)."""
    _run_two_process(tmp_path, _TP_TRAIN_WORKER, "TPTRAIN OK",
                     extra_args=(tmp_path,))


@pytest.mark.slow
def test_two_process_train_loop_ep(tmp_path):
    """train(config) across 2 processes WITH expert parallelism: mesh
    (data=4, expert=2), MoE expert banks sharded host-locally, the
    token-sharded all_to_all dispatch running inside the multi-process
    step, 8-bit per-shard moments, full-val-set eval."""
    _run_two_process(tmp_path, _EP_TRAIN_WORKER, "EPTRAIN OK",
                     extra_args=(tmp_path,))


@pytest.mark.slow
def test_two_process_train_loop_zero(tmp_path):
    """train(config) across 2 processes WITH ZeRO optimizer-state sharding:
    mesh (data=8) spanning both hosts, each device holding a 1/8 moment
    slice, the reduce-scatter + all-gather pair crossing the process
    boundary, 8-bit per-slice quantized blocks."""
    _run_two_process(tmp_path, _ZERO_TRAIN_WORKER, "ZEROTRAIN OK",
                     extra_args=(tmp_path,))


@pytest.mark.slow
def test_two_process_train_loop_dcn(tmp_path):
    """train(config) across 2 processes with a HYBRID multi-slice mesh
    (dcn_data_parallel=2, data=4, model=2): each process is a stand-in
    slice, TP pairs and the inner data stride stay process-local, the
    outer data stride (gradient all-reduce) crosses the boundary."""
    _run_two_process(tmp_path, _DCN_TRAIN_WORKER, "DCNTRAIN OK",
                     extra_args=(tmp_path,))


@pytest.mark.slow
def test_two_process_autotune_broadcast(tmp_path):
    """autotune_config across 2 processes: process 0 measures (stubbed),
    process 1 never does, and both end with the identical broadcast plan —
    independent noisy searches could desync the compiled collectives."""
    _run_two_process(tmp_path, _AUTOTUNE_WORKER, "AUTOTUNE OK",
                     extra_args=(tmp_path,))


@pytest.mark.slow
def test_two_process_training(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("%PORT%", str(port)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=os.environ.get("PYTHONPATH", "") + ":" +
               os.getcwd())
    # drain both pipes concurrently: sequential communicate() could deadlock
    # if the other worker fills its pipe mid-collective
    import concurrent.futures as cf
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    with cf.ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(lambda pr: pr.communicate(timeout=480)[0], p)
                for p in procs]
        outs = [f.result() for f in futs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {i} failed:\n{out[-3000:]}"
        assert f"HOST{i} OK" in out, out[-2000:]
