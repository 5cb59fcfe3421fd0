"""The training runtime: ``train(config)`` (reference train.py:186-343).

Epoch loop with: per-epoch shuffling (set_epoch), grad-accumulation
super-batches through the jitted sharded train step, per-microbatch
TensorBoard scalars with the reference's tag names, periodic eval +
checkpoint, Ctrl-C graceful finish with a final save, and windowed-average
statistics artifacts (statistics/*.npy like the reference's committed run).

TPU-first differences from the reference, all documented:
  * the whole effective batch is one jitted call (scan over microbatches)
    instead of a Python loop with .backward() per batch — no .item() syncs
    in the hot loop (the reference lost 87 s of 1150 s to those);
  * data parallelism is a sharded mesh dimension, not DDP process groups;
  * checkpoints are Orbax (params + optimizer + BN state + epoch), so resume
    actually resumes (the reference restarts schedule/optimizer);
    ``config.checkpoint`` may also point at a torch ``.pth`` for weights-only
    warm starts (converted on the fly);
  * eval metrics are aggregated across all replicas (the reference logs
    rank 0's shard only).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from picklebot_tpu.core.module import DtypePolicy
from picklebot_tpu.data.dataset import ClipDataset
from picklebot_tpu.data.loader import DataLoader, accumulate_batches, device_prefetch
from picklebot_tpu.models.registry import initialize_model
from picklebot_tpu.parallel.mesh import make_mesh
from picklebot_tpu.train import checkpoint as ckpt
from picklebot_tpu.train.key_maps import key_map_for
from picklebot_tpu.train.metrics import SummaryWriter, windowed_average
from picklebot_tpu.train.optim import OPTIMIZERS, cosine_annealing_lr
from picklebot_tpu.train.step import (TrainState, create_train_state,
                                      make_eval_step, make_train_step)
from picklebot_tpu.utils.config import Config


def _make_datasets(config: Config):
    shard, num_shards = jax.process_index(), jax.process_count()
    kwargs = dict(backend=config.data_backend, shard=shard,
                  num_shards=num_shards,
                  synthetic_shape=config.synthetic_shape,
                  synthetic_len=config.synthetic_len)
    train_ds = ClipDataset(config.train_annotations_file, config.video_paths,
                           **kwargs)
    val_ds = ClipDataset(config.val_annotations_file, config.video_paths,
                         **kwargs)
    return train_ds, val_ds


def train(config: Config, max_steps: Optional[int] = None) -> dict:
    """Returns a summary dict (final losses/accuracies) for tests/CLI."""
    n_dev = jax.local_device_count()
    mp = max(1, config.model_parallel)
    n_data = config.data_parallel or max(1, n_dev // mp)
    n_data = max(1, min(n_data, n_dev // mp if mp > 1 else n_dev))
    mesh = make_mesh(data=n_data, model=mp) \
        if (n_data > 1 or mp > 1) else None
    policy = DtypePolicy.bf16() if config.use_autocast else DtypePolicy.f32()

    model = initialize_model(config)
    optimizer = OPTIMIZERS[config.optimizer](
        weight_decay=config.weight_decay)
    schedule = cosine_annealing_lr(config.learning_rate, config.max_iters)

    state = create_train_state(model, optimizer, config.seed)
    state_specs = None
    if mp > 1:
        from picklebot_tpu.parallel.mesh import (MOBILEVIT_TP_RULES,
                                                 train_state_specs)
        state_specs = train_state_specs(state, MOBILEVIT_TP_RULES)

    mean = config.mean if config.apply_mean_std else None
    std = config.std if config.apply_mean_std else None
    train_step = make_train_step(model, optimizer, config.criterion,
                                 schedule, policy=policy, mesh=mesh,
                                 mean=mean, std=std, state_specs=state_specs)
    eval_step = make_eval_step(model, config.criterion, policy=policy,
                               mesh=mesh, mean=mean, std=std,
                               state_specs=state_specs)

    # ---- checkpoint restore (orbax) / torch warm start (.pth) ----
    start_epoch = 0
    if config.checkpoint:
        print(f"Loading checkpoint {config.checkpoint}...")
        if config.checkpoint.endswith(".pth"):
            variables = {"params": state.params, "state": state.model_state}
            variables = ckpt.load_pth(config.checkpoint, variables,
                                      key_map=key_map_for(config.model_name))
            state = state._replace(params=variables["params"],
                                   model_state=variables["state"])
        else:
            payload = ckpt.restore_checkpoint(
                config.checkpoint, state._asdict())
            state = TrainState(**payload)
            start_epoch = int(state.epoch)
        print(f"Loaded checkpoint at epoch {start_epoch}")

    # ---- placement ----
    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        super_sharding = NamedSharding(mesh, P(None, "data"))
        eval_sharding = NamedSharding(mesh, P("data"))
        if state_specs is not None:  # TP: honor per-leaf param shardings
            state = jax.device_put(state, jax.tree_util.tree_map(
                lambda sp: NamedSharding(mesh, sp), state_specs,
                is_leaf=lambda x: isinstance(x, P)))
        else:
            state = jax.device_put(state, replicated)
    else:
        super_sharding = eval_sharding = None

    # ---- data ----
    train_ds, val_ds = _make_datasets(config)
    global_batch = config.batch_size * (n_data if mesh is not None else 1)
    accum = config.grad_accum_steps
    train_loader = DataLoader(train_ds, global_batch, shuffle=True,
                              num_workers=config.num_workers,
                              t_bucket=config.t_bucket,
                              max_frames=config.max_frames,
                              seed=config.seed, drop_last=True)
    val_loader = DataLoader(val_ds, global_batch, shuffle=False,
                            num_workers=config.num_workers,
                            t_bucket=config.t_bucket,
                            max_frames=config.max_frames, drop_last=True)
    print(f"Using {accum} gradient accumulation steps for a total effective "
          f"batch size of {config.effective_batch_size}")

    # ---- logging ----
    is_main = jax.process_index() == 0
    writer = SummaryWriter(os.path.join(config.log_dir, config.run_name())) \
        if is_main else None
    os.makedirs(config.checkpoint_dir, exist_ok=True)
    start_time = time.time()
    print(f"Training... started: {time.ctime(start_time)}")

    def put_super(batch):
        feats, labels = batch  # (accum, global_batch, T, H, W, C)
        if super_sharding is not None:
            return (jax.device_put(feats, super_sharding),
                    jax.device_put(labels, super_sharding))
        return jax.device_put((feats, labels))

    rng = jax.random.key(config.seed)
    global_step = 0
    train_losses_hist, train_acc_hist = [], []
    all_losses: list = []
    val_losses, val_percent = [], []
    summary = {}

    def run_eval(epoch):
        tot_loss, tot_correct, tot_n, batches = 0.0, 0.0, 0.0, 0
        print("Evaluating...")
        it = iter(val_loader)
        if eval_sharding is not None:
            it = (tuple(jax.device_put(a, eval_sharding) for a in b)
                  for b in it)
        for feats, labels in it:
            out = eval_step(state, feats, labels)
            tot_loss += float(out["loss"])
            tot_correct += float(out["correct"])
            tot_n += float(out["samples"])
            batches += 1
        if batches == 0:
            return float("nan"), float("nan")
        return tot_loss / batches, tot_correct / max(tot_n, 1)

    try:
        for epoch in range(start_epoch, config.max_iters):
            train_loader.set_epoch(epoch)
            epoch_correct, epoch_samples = 0.0, 0.0
            batch_losses, batch_acc = [], []
            pending = []  # (metrics, step_base) awaiting host readout

            def drain(m, step_base):
                nonlocal epoch_correct, epoch_samples, global_step
                losses = np.asarray(m["loss"])
                corrects = np.asarray(m["correct"])
                per_micro = losses.shape[0]
                micro_samples = float(m["samples"]) / per_micro
                for j in range(per_micro):
                    epoch_correct += float(corrects[j])
                    epoch_samples += micro_samples
                    batch_losses.append(float(losses[j]))
                    all_losses.append(float(losses[j]))
                    batch_acc.append(epoch_correct / max(epoch_samples, 1))
                    if writer:
                        writer.add_scalar("training loss", losses[j],
                                          step_base + j)
                        writer.add_scalar("training accuracy",
                                          epoch_correct / max(epoch_samples,
                                                              1),
                                          step_base + j)

            feed = accumulate_batches(iter(train_loader), accum)
            feed = device_prefetch(feed, put_super, depth=2)
            for feats, labels in feed:
                rng, sub = jax.random.split(rng)
                if mesh is not None:
                    sub = jax.device_put(sub, replicated)
                state, metrics = train_step(state, feats, labels, sub)
                # defer host sync by one step to keep the device busy
                pending.append((metrics, global_step))
                global_step += accum
                if len(pending) > 1:
                    drain(*pending.pop(0))
                if max_steps is not None and \
                        global_step >= max_steps * accum:
                    break
            for item in pending:
                drain(*item)

            state = state._replace(epoch=state.epoch + 1)  # scheduler.step()
            if batch_losses:
                train_losses_hist.extend(windowed_average(batch_losses))
                train_acc_hist.extend(windowed_average(batch_acc))

            if epoch % config.eval_interval == 0 or \
                    epoch == config.max_iters - 1:
                val_loss, val_accuracy = run_eval(epoch)
                val_losses.append(val_loss)
                val_percent.append(val_accuracy)
                if is_main:
                    tl = train_losses_hist[-1] if train_losses_hist \
                        else float("nan")
                    ta = train_acc_hist[-1] if train_acc_hist else float("nan")
                    print(f"Step {epoch}: Train Loss: {tl:.4f}, "
                          f"Val Loss: {val_loss:.4f}")
                    print(f"Step {epoch}: Train Accuracy: {ta * 100:.2f}%, "
                          f"Val Accuracy: {val_accuracy * 100:.2f}%")
                    if writer:
                        writer.add_scalar("val loss", val_loss, epoch)
                        writer.add_scalar("val accuracy", val_accuracy, epoch)
                    ckpt.save_checkpoint(
                        os.path.join(config.checkpoint_dir,
                                     config.model_name),
                        epoch, jax.device_get(state)._asdict())

            elapsed = time.time() - start_time
            done = epoch - start_epoch + 1
            remaining = (config.max_iters - epoch - 1) * (elapsed / done)
            if is_main:
                print(f"Iter [{epoch + 1}/{config.max_iters}] - Elapsed "
                      f"Time: {elapsed:.2f}s - Remaining Time: "
                      f"[{remaining:.2f}]")
            if max_steps is not None:
                break
    except KeyboardInterrupt:
        if is_main and train_losses_hist:
            print(f"Keyboard interrupt,\nFinal Train Loss: "
                  f"{train_losses_hist[-1]:.4f}")
    finally:
        if is_main:
            final_dir = os.path.join(config.checkpoint_dir,
                                     f"{config.run_name()}_finished")
            ckpt.save_checkpoint(final_dir, int(jax.device_get(state.epoch)),
                                 jax.device_get(state)._asdict())
            stats_dir = "statistics"
            os.makedirs(stats_dir, exist_ok=True)
            base = f"{config.run_name()}_finished"
            np.save(os.path.join(stats_dir, f"{base}_train_losses.npy"),
                    np.asarray(train_losses_hist).reshape(-1, 1))
            np.save(os.path.join(stats_dir, f"{base}_train_percent.npy"),
                    np.asarray(train_acc_hist).reshape(-1, 1))
            np.save(os.path.join(stats_dir, f"{base}_val_losses.npy"),
                    np.asarray(val_losses))
            np.save(os.path.join(stats_dir, f"{base}_val_percent.npy"),
                    np.asarray(val_percent))
            print("Model and statistics saved!")
            if writer:
                writer.close()

    summary.update(
        final_train_loss=train_losses_hist[-1] if train_losses_hist
        else None,
        final_val_loss=val_losses[-1] if val_losses else None,
        final_val_accuracy=val_percent[-1] if val_percent else None,
        global_step=global_step,
        train_losses=all_losses,
    )
    return summary
