"""The training loop — functional replacement for the reference's
PyTorch-Lightning Trainer + LSegmentationModule
(reference: utils.py:16-46, modules/lsegmentation_module.py).

One process drives all local devices via jit/SPMD; multi-host runs the
same loop per process with `jax.distributed.initialize()` done by the
caller. Auto-resume, periodic validation with pixAcc/mIoU, last+best
checkpoints, and CSV/stdout logging.
"""

from __future__ import annotations

import functools
import os
import signal
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import numpy as np

from lseg_tpu.train.checkpoint import CheckpointManager
from lseg_tpu.train.step import make_eval_step, make_train_step


@dataclass
class FitConfig:
    max_epochs: int = 240
    ignore_index: int = -1
    accumulate: int = 1
    log_every: int = 10
    ckpt_dir: str = "checkpoints/default"
    resume: bool = True
    val_every: int = 1
    # experiment-tracking sinks (reference utils.py:36-43 dual loggers):
    # TB via tensorboardX when present; wandb gated on availability
    tensorboard: bool = True
    wandb: bool = False
    exp_name: str = "lseg"


class CSVLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")
        self._header_written = os.path.getsize(path) > 0

    def log(self, row: dict):
        if not self._header_written:
            self._f.write(",".join(row.keys()) + "\n")
            self._header_written = True
        self._f.write(",".join(str(v) for v in row.values()) + "\n")
        self._f.flush()


@functools.lru_cache(maxsize=8)
def _jitted_train_step(ignore_index: int, accumulate: int):
    # cached per (ignore_index, accumulate): repeated fit() calls (the
    # resume path, tests) reuse one jitted callable, so XLA's trace
    # cache hits instead of recompiling the step. Bounded so long-lived
    # sweep processes don't pin unboundedly many executables.
    return jax.jit(make_train_step(ignore_index, accumulate),
                   donate_argnums=(0,))


@functools.lru_cache(maxsize=8)
def _jitted_eval_step(ignore_index: int):
    return jax.jit(make_eval_step(ignore_index))


def fit(
    state,
    train_loader,
    text_features,
    cfg: FitConfig,
    val_loader=None,
    nclass: Optional[int] = None,
    log: Callable[[str], None] = print,
):
    """Run the full training schedule; returns the final state."""
    train_step = _jitted_train_step(cfg.ignore_index, cfg.accumulate)
    eval_step = _jitted_eval_step(cfg.ignore_index)
    ckpt = CheckpointManager(cfg.ckpt_dir)
    csv = CSVLogger(os.path.join(cfg.ckpt_dir, "metrics.csv"))
    from lseg_tpu.utils.sinks import make_sinks

    sinks = make_sinks(cfg.ckpt_dir, exp_name=cfg.exp_name,
                       tensorboard=cfg.tensorboard, wandb=cfg.wandb)

    start_epoch = 0
    if cfg.resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            saved = (ckpt.latest_metrics() or {}).get("epoch")
            if saved is not None:
                # exact: the checkpoint records the epoch it closed
                start_epoch = int(saved) + 1
            else:  # legacy checkpoints: infer from the step counter
                steps_per_epoch = max(len(train_loader), 1)
                start_epoch = int(state.step) // steps_per_epoch
            log(f"resumed from step {int(state.step)} "
                f"(epoch {start_epoch})")

    # Preemption handling (the reference's SLURM USR1 requeue trap,
    # fewshot_data/sbatch_run.sh): on SIGTERM/SIGUSR1, finish the
    # current epoch's checkpoint and exit cleanly so the job can resume.
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        log(f"signal {signum}: will checkpoint and stop")

    prev_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGUSR1):
        try:
            prev_handlers[sig] = signal.signal(sig, _request_stop)
        except (ValueError, OSError):  # non-main thread
            pass

    for epoch in range(start_epoch, cfg.max_epochs):
        # per-epoch shuffle reseed (the reference's DistributedSampler
        # set_epoch); without it the shuffle order repeats identically
        # every epoch and after every resume
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        t0 = time.time()
        last_loss = float("nan")
        n_steps = 0
        for batch in train_loader:
            state, metrics = train_step(state, batch, text_features)
            n_steps += 1
            # device sync (float()) only at log points: the step stream
            # stays async between them
            if n_steps % cfg.log_every == 0:
                last_loss = float(metrics["loss"])
                log(f"epoch {epoch} step {n_steps} "
                    f"loss {last_loss:.4f}")
        epoch_time = time.time() - t0

        row = {
            "epoch": epoch,
            "loss": last_loss,
            "epoch_time_s": round(epoch_time, 2),
            "val_acc": "",
            "val_miou": "",
        }

        if val_loader is not None and (epoch + 1) % cfg.val_every == 0:
            correct = labeled = 0.0
            inter = union = None
            for batch in val_loader:
                m = eval_step(state, batch, text_features)
                correct += float(m["correct"])
                labeled += float(m["labeled"])
                i = np.asarray(m["inter"], np.float64)
                u = np.asarray(m["union"], np.float64)
                inter = i if inter is None else inter + i
                union = u if union is None else union + u
            eps = np.spacing(1.0)
            val_acc = correct / (eps + labeled)
            val_miou = float(np.mean(inter / (eps + union)))
            row["val_acc"], row["val_miou"] = val_acc, val_miou
            log(
                f"epoch {epoch} val pixAcc {val_acc:.4f} "
                f"mIoU {val_miou:.4f} ({epoch_time:.1f}s)"
            )
            ckpt.save(int(state.step), state,
                      {"val_acc": val_acc, "val_miou": val_miou,
                       "epoch": float(epoch)})
        else:
            ckpt.save(int(state.step), state, {"epoch": float(epoch)})

        csv.log(row)
        sinks.scalars(epoch, {
            k: v for k, v in row.items()
            if k != "epoch" and v != "" and v == v
        })
        if stop_requested["flag"]:
            log(f"stopping after epoch {epoch} (preemption)")
            break

    for sig, h in prev_handlers.items():
        signal.signal(sig, h)
    ckpt.wait()
    sinks.close()
    return state
