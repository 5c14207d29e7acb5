"""The task-incremental trainer.

Re-design of reference core/trainer.py:259-720 with TPU-native execution:

  * each task's data (train arrays + concatenated replay buffer) is moved to
    device once; batching = in-graph gathers by a permutation matrix;
  * a full epoch runs as ONE ``lax.scan``-compiled XLA program (per-step
    Python dispatch only for methods that opt out via ``scan_safe=False``);
  * the per-step learning rate is streamed in as data, so every scheduler in
    the reference zoo (incl. PatienceSchedule's loss-reactive decay and
    per-iteration CosineAnnealingWarmUp, reference trainer.py:397-404,590-591)
    reuses one compiled program;
  * evaluation is a jitted argmax pass; accuracy bookkeeping reproduces the
    reference's acc_table / forgetting / BWT / per-task prints
    (reference trainer.py:340-532, 616-720);
  * data-parallel scaling: batches are sharded over the mesh's ``data`` axis,
    parameters replicated; XLA inserts the gradient psum (this replaces the
    reference's disabled DDP path, trainer.py:37-38).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from libcontinual_tpu.core.buffer import LinearBuffer, build_buffer
from libcontinual_tpu.core.metrics import compute_bwt, compute_frgt, count_parameters
from libcontinual_tpu.core.optim import make_schedule
from libcontinual_tpu.data.continual import TaskData, build_stream
from libcontinual_tpu.parallel.mesh import make_mesh
from libcontinual_tpu.registry import METHODS
from libcontinual_tpu.utils import get_logger, init_seed

# method modules register themselves on import
import libcontinual_tpu.methods  # noqa: F401


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class Trainer:
    #: optional ``(task_idx, epoch_idx, state, step_losses) -> None`` called
    #: after every training epoch — a read-only observation point for
    #: diagnostics and the differential lockstep tests
    epoch_hook = None

    def __init__(self, config: Dict[str, Any], workdir: Optional[str] = None):
        from libcontinual_tpu.utils import jaxcache

        jaxcache.enable()
        self.config = config
        self.log = get_logger(workdir or config.get("save_path") or None)
        self.log.event("config", **{k: v for k, v in config.items()
                                    if not isinstance(v, (list, dict))})
        self.log.info(
            "method=%s backbone=%s dataset=%s tasks=%d (%d+%dx)",
            config["classifier"]["name"], config["backbone"]["name"],
            config.get("dataset"), config["task_num"],
            config["init_cls_num"], config["inc_cls_num"],
        )
        init_seed(int(config.get("seed", 0)), bool(config.get("deterministic", True)))

        mesh_cfg = config.get("mesh") or {}
        self.mesh = make_mesh(
            int(mesh_cfg.get("data", -1)), int(mesh_cfg.get("model", 1))
        )
        # record the mesh so the fused Pallas attention kernels engage:
        # directly on a single device, via shard_map over the 'data' axis on
        # multi-device meshes (ops/attention.py)
        from libcontinual_tpu.ops.attention import (
            set_active_mesh, set_active_mesh_devices,
        )

        set_active_mesh_devices(self.mesh.data_size * self.mesh.model_size)
        set_active_mesh(self.mesh.mesh)
        self.task_num = int(config["task_num"])
        self.init_cls_num = int(config["init_cls_num"])
        self.inc_cls_num = int(config["inc_cls_num"])
        self.batch_size = int(config["batch_size"])
        d = self.mesh.data_size
        # per-mode batch-size overrides (reference dataloader.py:97-100),
        # both rounded for even data-axis sharding
        self.batch_size = _ceil_div(
            int(config.get("train_batch_size", self.batch_size)), d
        ) * d
        if self.batch_size != int(config.get("train_batch_size",
                                             config["batch_size"])):
            self.log.info("batch_size rounded to %d for %d-way data sharding",
                          self.batch_size, d)
        self.test_batch_size = _ceil_div(
            int(config.get("test_batch_size", self.batch_size)), d
        ) * d
        self.val_per_epoch = int(config.get("val_per_epoch", 1))
        self.setting = config.get("setting", "task-agnostic")
        self.init_epoch = int(config.get("init_epoch", config["epoch"]))
        self.inc_epoch = int(config["epoch"])

        self.train_stream, cls_map = build_stream(config, "train")
        self.test_stream, _ = build_stream(config, "test", cls_map)

        method_name = config["classifier"]["name"]
        self.method = METHODS.get(method_name)(config, self.mesh)
        if self.setting == "task-aware" and not self.method.supports_task_aware:
            raise ValueError(
                f"{method_name} does not support setting: task-aware"
            )
        self.method.class_names = getattr(self.train_stream, "class_names", [])
        self.buffer: LinearBuffer = build_buffer(config)

        h, w, c = self.train_stream.task(0).images.shape[1:]
        rng = jax.random.PRNGKey(int(config.get("seed", 0)))
        self.state = self.method.init_state(rng, (h, w, c))
        if self.mesh.model_size > 1:
            # tensor parallelism: column/row-shard transformer MLPs over the
            # 'model' axis (parallel/tp.py); GSPMD propagates activation
            # shardings and inserts the post-fc2 psum
            self.state = jax.device_put(
                self.state, self.mesh.param_sharding(self.state)
            )

        self._jit_cache: Dict[Any, Any] = {}
        self._dev_data_cache: Dict[int, Any] = {}
        self._dev_cache_bytes = 0

        method = self.method

        def eval_scan(state, images, labels, idx, weights, task_id):
            def body(correct, xs):
                bidx, w = xs
                batch = {
                    "image": jnp.take(images, bidx, axis=0),
                    "label": jnp.take(labels, bidx, axis=0),
                }
                preds = method.eval_step(state, batch, task_id)
                correct = correct + jnp.sum(
                    (preds == batch["label"]).astype(jnp.float32) * w
                )
                return correct, ()

            total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (idx, weights))
            return total

        # one dispatch per (task, data-size): the whole eval pass runs as a
        # scan on device (each host round-trip costs ~35 ms on this tunnel).
        # Eval programs are cached per method.eval_jit_key() so methods whose
        # eval trace grows with the learned-task count (CL-LoRA's per-task
        # diagonal forwards) don't pay the full task_num fan-out from task 0.
        self._eval_scan_raw = eval_scan

        self.acc_table = np.zeros((self.task_num, self.task_num))
        self.epoch_scan = bool(config.get("epoch_scan", True)) and self.method.scan_safe

        ck = config.get("checkpoint") or {}
        self.ckpt_dir = ck.get("dir") or "" if ck.get("enable") else ""
        self._resume_from = -1
        if self.ckpt_dir:
            from libcontinual_tpu.core import ckpt

            last = ckpt.latest_task(self.ckpt_dir)
            if last is not None:
                # the checkpoint after task `last` holds the optimizer state
                # of the tx that trained that task — rebuild the restore
                # template with the matching chain (init_state used task 0's,
                # which may differ structurally under init_optimizer)
                tmpl = self.state.replace(
                    opt_state=self.method._tx_for_task(last).init(
                        self.state.params
                    )
                )
                self.state, self.acc_table = ckpt.restore(
                    self.ckpt_dir, last, tmpl, self.buffer, self.method
                )
                # restored arrays come back committed to the checkpoint's
                # placement; re-lay them out on THIS trainer's mesh so a
                # cross-topology resume (save on n devices, restore on m)
                # doesn't feed single-device-committed params into programs
                # whose batch inputs are sharded over the new mesh
                self.state = jax.device_put(
                    self.state, self.mesh.param_sharding(self.state)
                )
                self._resume_from = last
                self.log.info("resumed from checkpoint after task %d", last)

    def _eval_scan(self, *args):
        key = ("eval_scan", self.method.eval_jit_key())
        if key not in self._jit_cache:
            # a FRESH closure per key: jax's pjit cache keys on the wrapped
            # function's identity + avals, so jitting the same raw function
            # under a new key would silently REUSE the previous key's trace
            # (the reason the train-side caches below also build new
            # closures per entry)
            raw = self._eval_scan_raw

            def eval_scan_keyed(*a):
                return raw(*a)

            self._jit_cache[key] = jax.jit(eval_scan_keyed)
        return self._jit_cache[key](*args)

    def _eval_fn(self, *args):
        key = ("eval_step", self.method.eval_jit_key())
        if key not in self._jit_cache:
            method = self.method

            def eval_step_keyed(*a):
                return method.eval_step(*a)

            self._jit_cache[key] = jax.jit(eval_step_keyed)
        return self._jit_cache[key](*args)

    # ------------------------------------------------------------- jitted fns

    def _features(self, state, images):
        x = self.method.augment(None, images, train=False)
        return self.method.herding_features(state, x)

    def _feature_fn(self, *args):
        # keyed like the eval programs: herding_features may be bounded by
        # the learned-task count (DER's active-prefix stack)
        key = ("features", self.method.eval_jit_key())
        if key not in self._jit_cache:
            raw = self._features

            def features_keyed(*a):
                return raw(*a)

            self._jit_cache[key] = jax.jit(features_keyed)
        return self._jit_cache[key](*args)

    def _get_epoch_fn(self, tx):
        key = ("epoch", id(tx), self.method.jit_key())
        if key not in self._jit_cache:
            method = self.method

            def epoch_fn(state, images, labels, perm, weights, lrs):
                def body(st, xs):
                    idx, wgt, lr = xs
                    batch = {
                        "image": jnp.take(images, idx, axis=0),
                        "label": jnp.take(labels, idx, axis=0),
                        "weight": wgt,
                    }
                    st, m = method.train_step(st, batch, lr, tx=tx)
                    m = dict(m, w=jnp.sum(wgt))
                    return st, m

                return jax.lax.scan(body, state, (perm, weights, lrs))

            self._jit_cache[key] = jax.jit(epoch_fn, donate_argnums=(0,))
        return self._jit_cache[key]

    def _get_step_fn(self, tx):
        key = ("step", id(tx), self.method.jit_key())
        if key not in self._jit_cache:
            method = self.method

            def step_fn(state, batch, lr):
                st, m = method.train_step(state, batch, lr, tx=tx)
                return st, dict(m, w=jnp.sum(batch["weight"]))

            self._jit_cache[key] = jax.jit(step_fn, donate_argnums=(0,))
        return self._jit_cache[key]

    # ------------------------------------------------------------------- data

    def _epoch_indices(self, n: int, epoch_seed: int):
        """Shuffled, padded index matrix + weights (pad positions weigh 0).
        The shuffle runs in the C++ host engine when built (deterministic
        xorshift Fisher-Yates); the python fallback reproduces the exact same
        stream, so seeded runs match across environments."""
        from libcontinual_tpu.data import native

        perm = native.shuffled_indices(n, epoch_seed)
        steps = _ceil_div(n, self.batch_size)
        total = steps * self.batch_size
        pad = total - n
        # wrap as many times as needed: tasks smaller than batch_size/2
        # (oneshot/fewshot imbalance profiles) need more than one repetition
        idx = np.resize(perm, total) if pad else perm
        weights = np.ones(total, np.float32)
        if pad:
            weights[n:] = 0.0
        return (
            idx.reshape(steps, self.batch_size).astype(np.int32),
            weights.reshape(steps, self.batch_size),
        )

    def _device_task_data(self, td: TaskData, cache: bool = False):
        # ``cache=True`` (eval paths) memoizes the device copy per TaskData
        # object: test sets are immutable, and re-uploading every _validate
        # (x epochs x tasks) wastes hundreds of host->device transfers per
        # run. Train data stays uncached (concat task data is rebuilt per
        # task; caching would pin stale device arrays).
        if cache:
            key = id(td)
            hit = self._dev_data_cache.get(key)
            if hit is not None and hit[0] is td:
                return hit[1], hit[2]
        rep = self.mesh.replicated_sharding()
        images = jax.device_put(np.ascontiguousarray(td.images), rep)
        labels = jax.device_put(np.ascontiguousarray(td.labels.astype(np.int32)), rep)
        if cache:
            # bounded: pinning every test set in HBM is only free when test
            # sets are small (CIFAR-geometry). Budget via eval_cache_mb
            # (default 512 MiB); beyond it, fall back to per-eval uploads.
            nbytes = td.images.nbytes + 4 * len(td.labels)
            budget = int(self.config.get("eval_cache_mb", 512)) * 2**20
            if self._dev_cache_bytes + nbytes <= budget:
                self._dev_data_cache[id(td)] = (td, images, labels)
                self._dev_cache_bytes += nbytes
        return images, labels

    def _shard_step_arrays(self, idx, weights):
        sh = NamedSharding(self.mesh.mesh, P(None, "data"))
        return jax.device_put(idx, sh), jax.device_put(weights, sh)

    # ------------------------------------------------------------------ train

    def _train_task(self, task_idx: int, task_data: TaskData, sched, epochs: int) -> None:
        method = self.method
        tx = method._tx_for_task(task_idx)
        n = len(task_data)
        if epochs <= 0:
            return
        # commit the state to the mesh layout before entering the jitted
        # epoch: task boundaries rebuild parts of mvars on the host
        # (class means, projection bases), and jit keys on argument
        # placement — a mixed committed/uncommitted tree costs one extra
        # trace+compile per distinct boundary signature (measured via the
        # end_to_end retrace audit: 4 epoch-program traces for 2 data
        # shapes). A no-op when everything is already laid out.
        self.state = jax.device_put(
            self.state, self.mesh.param_sharding(self.state)
        )
        images, labels = self._device_task_data(task_data)
        seed = int(self.config.get("seed", 0))
        profile = bool(self.config.get("profile")) and task_idx == 0

        for epoch_idx in range(epochs):
            # fresh shuffle stream per TASK as well as per epoch (the
            # reference's per-task DataLoaders reshuffle from torch's global
            # RNG; a task-free seed would replay identical batch orders
            # across equal-sized tasks)
            idx, weights = self._epoch_indices(
                n, seed + task_idx * 100003 + epoch_idx
            )
            lrs = sched.step_lrs(epoch_idx)
            steps = idx.shape[0]
            if len(lrs) < steps:
                lrs = np.resize(lrs, steps)
            lrs = lrs[:steps].astype(np.float32)
            idx_d, w_d = self._shard_step_arrays(idx, weights)

            t0 = time.perf_counter()
            ctx = contextlib.nullcontext()
            if profile and epoch_idx == 1:
                try:  # profiler may be unsupported on experimental platforms
                    ctx = jax.profiler.trace(
                        self.config.get("save_path") or "/tmp/jax-trace"
                    )
                except Exception as e:  # pragma: no cover
                    self.log.info("profiler unavailable: %s", e)
            with ctx:
                if self.epoch_scan:
                    fn = self._get_epoch_fn(tx)
                    self.state, ms = fn(self.state, images, labels, idx_d, w_d, lrs)
                    ms = jax.device_get(ms)
                else:
                    fn = self._get_step_fn(tx)
                    accs, losses, ws = [], [], []
                    for s in range(steps):
                        batch = {
                            "image": jnp.take(images, idx_d[s], axis=0),
                            "label": jnp.take(labels, idx_d[s], axis=0),
                            "weight": w_d[s],
                        }
                        self.state, m = fn(self.state, batch, jnp.float32(lrs[s]))
                        losses.append(m["loss"])
                        accs.append(m["acc"])
                        ws.append(m["w"])
                    ms = {
                        "loss": np.asarray(jax.device_get(losses)),
                        "acc": np.asarray(jax.device_get(accs)),
                        "w": np.asarray(jax.device_get(ws)),
                    }
            jax.block_until_ready(self.state.params)
            dt = time.perf_counter() - t0

            wsum = float(np.sum(ms["w"])) or 1.0
            ep_loss = float(np.sum(np.asarray(ms["loss"]) * np.asarray(ms["w"])) / wsum)
            ep_acc = float(np.sum(np.asarray(ms["acc"]) * np.asarray(ms["w"])) / wsum)
            if self.epoch_hook is not None:
                # diagnostics hook: (task, epoch, state, per-step losses).
                # The differential lockstep tests use it to capture epoch
                # endpoint states for piecewise comparison against the
                # executing reference.
                self.epoch_hook(
                    task_idx, epoch_idx, self.state, np.asarray(ms["loss"])
                )
            ips = wsum / dt
            self.log.info(
                "Task %d epoch [%d/%d] lr %.5f | loss %.4f acc %.2f | %.0f img/s",
                task_idx, epoch_idx, epochs, float(lrs[0]), ep_loss, ep_acc * 100, ips,
            )
            self.log.event(
                "train_epoch", task=task_idx, epoch=epoch_idx, loss=ep_loss,
                acc=ep_acc, images_per_sec=ips, lr=float(lrs[0]),
            )

            if (
                method.validate_enabled
                and self.val_per_epoch > 0
                and (epoch_idx + 1) % self.val_per_epoch == 0
                and bool(self.config.get("eval_with_test", True))
                and epochs > 1
                and epoch_idx + 1 < epochs
            ):
                res = self._validate(task_idx)
                self.log.info(
                    " * val: avg %.2f per-task %s", res["avg_acc"], res["per_task_acc"]
                )

            sched.observe(ep_loss)
            if sched.should_stop():
                self.log.info("PatienceSchedule lr below stopping_lr; ending task")
                break

    # ------------------------------------------------------------------- eval

    def _eval_task_data(self, td: TaskData, task_id: int):
        n = len(td)
        bs = self.test_batch_size
        steps = _ceil_div(n, bs)
        total = steps * bs
        pad = total - n
        idx = np.arange(total) % n  # wrap; padded tail weighs 0
        weights = np.ones(total, np.float32)
        if pad:
            weights[n:] = 0.0
        images, labels = self._device_task_data(td, cache=True)
        idx_d, w_d = self._shard_step_arrays(
            idx.reshape(steps, bs).astype(np.int32),
            weights.reshape(steps, bs),
        )
        tid = jnp.asarray(task_id, jnp.int32)
        correct = float(
            self._eval_scan(self.state, images, labels, idx_d, w_d, tid)
        )
        return int(round(correct)), n

    def _validate(self, task_idx: int) -> Dict[str, Any]:
        """Per-task accuracies on tasks 0..task_idx
        (reference trainer.py:616-720; our eval is deterministic so the
        testing_per_task True/False paths coincide)."""
        per_task_acc: List[float] = []
        correct_all, count_all = 0, 0
        for t, td in enumerate(self.test_stream.tasks_up_to(task_idx)):
            tid = t if self.setting == "task-aware" else -1
            c, n = self._eval_task_data(td, tid)
            correct_all += c
            count_all += n
            per_task_acc.append(round(c * 100.0 / max(n, 1), 2))
        return {
            "avg_acc": round(correct_all * 100.0 / max(count_all, 1), 2),
            "per_task_acc": per_task_acc,
        }

    # -------------------------------------------------------------- main loop

    def train_loop(self) -> Dict[str, Any]:
        cfg = self.config
        t_begin = time.time()
        method = self.method
        batch_last_acc_list = np.zeros(self.task_num)
        task_last_acc_list = np.zeros(self.task_num)
        frgt_list, bwt_list = [], []
        for t in range(self._resume_from + 1):  # restored-task stats
            row = self.acc_table[t, : t + 1]
            task_last_acc_list[t] = float(np.mean(row))
            # sample-weighted average: weight each task row by its test-set
            # size so resumed runs report the same batch stats as straight
            # runs (per-task mean only matches when test sizes are equal)
            sizes = np.asarray(
                [len(self.test_stream.task(i)) for i in range(t + 1)],
                np.float64,
            )
            batch_last_acc_list[t] = float(
                np.sum(row * sizes) / max(np.sum(sizes), 1.0)
            )
            if t > 1:  # match the live loop's ``task_idx > 1`` condition
                frgt_list.append(compute_frgt(self.acc_table, row, t))
                bwt_list.append(compute_bwt(self.acc_table, row, t))

        for task_idx in range(self.task_num):
            if task_idx <= self._resume_from:
                continue  # completed before resume
            self.log.info("================ Task %d start ================", task_idx)
            lo, hi = self.train_stream.class_range(task_idx)
            task_data = self.train_stream.task(task_idx)

            self.state = method.start_task(self.state, task_idx, lo, hi)
            self.state = method.before_task(self.state, task_idx, task_data)

            # LinearBuffer-family replay: concatenate exemplars into the task
            # data (reference trainer.py:305-322)
            train_data = task_data
            custom = method.build_train_data(task_data, self.buffer, task_idx)
            if custom is not None:
                # method-specific stage-1 data (BiC's held-out split)
                train_data = custom
            elif (
                method.concat_buffer
                and self.buffer.buffer_size > 0
                and task_idx > 0
                and len(self.buffer) > 0
            ):
                bd = self.buffer.as_task_data()
                if bd is not None:
                    train_data = task_data.concat(bd)

            self.state = method.reset_optimizer(self.state, task_idx)
            steps_per_epoch = _ceil_div(len(train_data), self.batch_size)
            epochs = method.epochs_for_task(
                task_idx, self.init_epoch if task_idx == 0 else self.inc_epoch
            )
            sched = method.override_schedule(task_idx, steps_per_epoch, epochs)
            if sched is None:
                sched = make_schedule(cfg, steps_per_epoch, epochs, task_idx)

            n_params = count_parameters(self.state.params)
            self.log.info(
                "training samples: %d | params: %d", len(train_data), n_params
            )

            self._train_task(task_idx, train_data, sched, epochs)

            self.state = method.after_task(self.state, task_idx, task_data)

            # buffer update (reference trainer.py:409-418)
            if method.concat_buffer:
                self.buffer.total_classes += (
                    self.init_cls_num if task_idx == 0 else self.inc_cls_num
                )
                if self.buffer.buffer_size > 0:
                    self.buffer.update(
                        task_data,
                        feature_fn=lambda im: self._batched_features(im),
                        seed=int(cfg.get("seed", 0)) + task_idx,
                    )
                    self.state = method.on_buffer_updated(
                        self.state, task_idx, self.buffer
                    )

            # method-owned extra phases (e.g. BiC stage-2 bias training)
            self.state = method.extra_phases(self, self.state, task_idx, task_data)

            res = self._validate(task_idx)
            per_task_acc = np.asarray(res["per_task_acc"])
            batch_last_acc_list[task_idx] = res["avg_acc"]
            task_last_acc_list[task_idx] = float(np.mean(per_task_acc))
            self.acc_table[task_idx, : task_idx + 1] = per_task_acc
            frgt = compute_frgt(self.acc_table, self.acc_table[task_idx], task_idx)
            bwt = compute_bwt(self.acc_table, self.acc_table[task_idx], task_idx)
            if task_idx > 1:
                frgt_list.append(frgt)
                bwt_list.append(bwt)
            self.log.info(
                "================ Task %d result ================", task_idx
            )
            self.log.info(
                " * [Batch] last avg acc: %.2f | [Task] last avg acc: %.2f",
                res["avg_acc"], task_last_acc_list[task_idx],
            )
            self.log.info(" * frgt %.3f bwt %.2f", frgt, bwt)
            self.log.info(" * per-task acc: %s", res["per_task_acc"])
            self.log.event(
                "task_done", task=task_idx, avg_acc=res["avg_acc"],
                per_task_acc=res["per_task_acc"], frgt=frgt, bwt=bwt,
            )
            if self.ckpt_dir:
                from libcontinual_tpu.core import ckpt

                ckpt.save(
                    self.ckpt_dir, task_idx, self.state, self.acc_table,
                    self.buffer, self.method,
                    keep=int((self.config.get("checkpoint") or {}).get("keep", 0)),
                )

        t_idx = self.task_num - 1
        overall = {
            "acc_table": self.acc_table,
            "last_avg_acc": float(batch_last_acc_list[t_idx]),
            "batch_ovr_avg_acc": float(np.mean(batch_last_acc_list)),
            "task_ovr_avg_acc": float(
                np.sum(
                    np.sum(self.acc_table[: t_idx + 1], axis=1)
                    / np.arange(1, t_idx + 2)
                )
                / (t_idx + 1)
            ),
            "ovr_frgt": float(np.mean(frgt_list)) if frgt_list else float("inf"),
            "ovr_bwt": float(np.mean(bwt_list)) if bwt_list else float("-inf"),
            "time_sec": time.time() - t_begin,
        }
        overall["fps"] = self._compute_fps()
        self.log.info("================ Overall ================")
        self.log.info(
            " * last avg acc %.2f | overall avg acc %.2f | frgt %.3f | bwt %.2f",
            overall["last_avg_acc"], overall["batch_ovr_avg_acc"],
            overall["ovr_frgt"], overall["ovr_bwt"],
        )
        self.log.info(
            " * time %.1fs | inference fps %.0f", overall["time_sec"], overall["fps"]
        )
        self.log.event("run_done", **{k: v for k, v in overall.items() if k != "acc_table"})
        return overall

    # ------------------------------------------------------------------ misc

    def _batched_features(self, images_uint8: np.ndarray) -> np.ndarray:
        outs = []
        bs = self.batch_size
        n = len(images_uint8)
        for s in range(_ceil_div(n, bs)):
            chunk = images_uint8[s * bs : (s + 1) * bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            f = np.asarray(self._feature_fn(self.state, jnp.asarray(chunk)))
            outs.append(f[: bs - pad] if pad else f)
        return np.concatenate(outs)

    def _compute_fps(self) -> float:
        """Inference throughput probe (reference utils.py:235-257 runs 100
        single-image inferences; we time the jitted eval step)."""
        td = self.test_stream.task(0)
        bidx = np.arange(min(self.batch_size, len(td)))
        if len(bidx) < self.batch_size:
            bidx = np.resize(bidx, self.batch_size)
        batch = {
            "image": jnp.asarray(td.images[bidx]),
            "label": jnp.asarray(td.labels[bidx].astype(np.int32)),
        }
        tid = jnp.asarray(-1, jnp.int32)
        np.asarray(self._eval_fn(self.state, batch, tid))  # warmup/compile
        n_iter = 30
        t0 = time.perf_counter()
        for _ in range(n_iter):
            preds = self._eval_fn(self.state, batch, tid)
        np.asarray(preds)  # value fetch = real sync on the axon transport
        dt = time.perf_counter() - t0
        return n_iter * self.batch_size / dt


