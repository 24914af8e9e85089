"""Training orchestration — the reference's Trainer classes
(train_process/Trainer*.py) rebuilt around one jitted step per method.

Per-iteration work on the host is reduced to: pull two host batches,
device_put them sharded, call the compiled step, stash the (device)
metrics. Scalars are fetched once per epoch (the reference syncs dozens of
.item()s per iteration), CSV/tensorboard writes happen at epoch
granularity with per-iteration rows preserved, and the NaN guard
(reference :298-299 etc.) runs on the fetched batch of scalars.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from uda_clr_tpu.config import Config
from uda_clr_tpu.data.fundus import FundusSegmentation
from uda_clr_tpu.data.pipeline import BatchLoader
from uda_clr_tpu.data.synthetic import SyntheticFundus
from uda_clr_tpu.data import wire
from uda_clr_tpu.data.transforms import eval_transforms, train_transforms
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
from uda_clr_tpu.train import checkpoint as ckpt_lib
from uda_clr_tpu.train import optim as optim_lib
from uda_clr_tpu.train.state import create_train_state
from uda_clr_tpu.train.steps import make_eval_step, make_train_step
from uda_clr_tpu.utils.logging import CsvLogger, ScalarWriter, StepTimer
from uda_clr_tpu.utils.metrics import dice_coeff_2label, pixel_acc
from uda_clr_tpu.utils.ramps import get_current_consistency_weight

_ADVERSARIAL_METHODS = {"adversarial", "posal", "prototype", "prototype_full", "prototype_mt", "mean_teacher", "bcdm"}


class _NoopSink:
    """Write-nothing stand-in for CsvLogger/ScalarWriter on non-main
    processes (multi-process DP keeps logging single-writer)."""

    def __getattr__(self, name):
        return lambda *a, **k: None


class Trainer:
    def __init__(self, cfg: Config, datasets: dict | None = None):
        """``datasets``: optional {'source','target','val'} override (tests);
        otherwise built from cfg.data (synthetic or fundus directories)."""
        self.cfg = cfg
        self.method = cfg.method.method
        # multi-process DP (config-gated; parallel/distributed.py): MUST
        # run before anything touches a jax backend in this process
        from uda_clr_tpu.parallel import distributed as dist_lib

        self._dist = dist_lib
        self._multiprocess = dist_lib.maybe_initialize(cfg.run)
        self._is_main = jax.process_index() == 0
        # a full-step TPU compile costs minutes over this environment's
        # relay; the on-disk executable cache makes stage-2 / resumed /
        # repeated runs of the same config start in seconds
        # (utils/benchmarking.py — same call every bench entry point makes)
        from uda_clr_tpu.utils.benchmarking import enable_persistent_compile_cache

        enable_persistent_compile_cache()
        os.makedirs(cfg.run.out_dir, exist_ok=True)
        if self._is_main:
            with open(os.path.join(cfg.run.out_dir, "config.yaml"), "w") as f:
                f.write(cfg.to_yaml())

        mesh_shape = cfg.run.mesh_shape
        if mesh_shape is None:
            # largest device count that divides the per-step batch, so the
            # data axis shards evenly (static shapes, no padding)
            n = len(jax.devices())
            while cfg.data.batch_size % n:
                n -= 1
            mesh_shape = (n,)
        self.mesh = get_mesh(mesh_shape)
        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)
        if self._multiprocess and cfg.run.viz_every:
            # train-viz pulls batch-sharded per-pixel arrays to the host,
            # which a process can't do for non-addressable shards
            cfg.run.viz_every = 0

        size = cfg.data.image_size
        wire_fmt = cfg.data.wire
        if datasets is not None:
            self.ds_s = datasets["source"]
            self.ds_t = datasets.get("target", datasets["source"])
            self.ds_val = datasets.get("val", self.ds_t)
        elif cfg.data.synthetic:
            n = cfg.data.synthetic_size
            self.ds_s = SyntheticFundus(
                n, size + 28, seed=1, transform=train_transforms(size, wire=wire_fmt)
            )
            self.ds_t = SyntheticFundus(
                n, size + 28, seed=2, transform=train_transforms(size, wire=wire_fmt)
            )
            self.ds_val = SyntheticFundus(
                max(n // 2, 2), size + 28, seed=3, transform=eval_transforms(size, wire=wire_fmt)
            )
        else:
            self.ds_s = FundusSegmentation(
                cfg.data.data_dir, cfg.data.dataset_source, "train",
                train_transforms(size, wire=wire_fmt),
            )
            self.ds_t = FundusSegmentation(
                cfg.data.data_dir, cfg.data.dataset_target, "train",
                train_transforms(size, wire=wire_fmt),
            )
            self.ds_val = FundusSegmentation(
                cfg.data.data_dir, cfg.data.dataset_target, "test",
                eval_transforms(size, wire=wire_fmt),
            )

        bs = cfg.data.batch_size
        nw = cfg.data.num_workers
        lb = cfg.data.loader_backend
        # multi-process: every process derives the same global batches and
        # loads only its rows (globally-keyed per-sample rngs); the val
        # loader stays unsharded — validation runs replicated (below)
        pi, pc = (jax.process_index(), jax.process_count()) if self._multiprocess else (0, 1)
        self.loader_s = BatchLoader(
            self.ds_s, bs, shuffle=True, seed=cfg.run.seed, num_workers=nw, backend=lb,
            process_index=pi, process_count=pc,
        )
        self.loader_t = BatchLoader(
            self.ds_t, bs, shuffle=False, seed=cfg.run.seed + 1, num_workers=nw, backend=lb,
            process_index=pi, process_count=pc,
        )
        self.loader_val = BatchLoader(
            self.ds_val, bs, shuffle=False, drop_last=False, num_workers=nw, backend=lb
        )

        dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
        self.model = DeepLab(
            num_classes=cfg.model.num_classes,
            backbone=cfg.model.backbone,
            output_stride=cfg.model.output_stride,
            norm=cfg.model.norm,
            dtype=dtype,
            remat=cfg.model.remat,
        )
        state = create_train_state(
            self.model,
            jax.random.PRNGKey(cfg.run.seed),
            (bs, size, size, 3),
            cfg.optim,
            with_teacher=(self.method == "mean_teacher"),
            with_proto_bank=(self.method == "prototype"),
            with_cls2=(self.method == "bcdm"),
        )
        if self.method == "prototype" and cfg.method.prototype_bank_path:
            bank = np.load(cfg.method.prototype_bank_path)
            state = state.replace(
                proto_bank={k: jnp.asarray(bank[k], jnp.float32) for k in ("bu", "cup", "disc")}
            )
        self.state = self._put_replicated(state)

        self._steps = {}  # (proto_phase,) -> compiled step
        self._eval_step = make_eval_step(self.model, dtype)

        # non-main processes keep every metric/guard live but write no
        # files (single-writer logging; checkpoints likewise below)
        self.csv = CsvLogger(cfg.run.out_dir) if self._is_main else _NoopSink()
        self.writer = ScalarWriter(cfg.run.out_dir) if self._is_main else _NoopSink()
        self.timer = StepTimer()
        self.epoch = 0
        self.iteration = -1  # last completed global step; -1 = none yet
        self._profiled = False  # run.profile captures one window per run
        self.best_mean_dice = 0.0
        self.best_epoch = -1
        self.last_throughput = 0.0

        if cfg.run.initial_resume:
            self._initial_resume(cfg.run.initial_resume)
        if cfg.method.pseudo_from_initial:
            # Freeze the post-initial-resume generator as the pseudo-label
            # model (Trainer_prototype_woTN's model_geninitial_pesudolabel,
            # built from --initial_resume in train_use_fix_initial.py:184-199).
            # jnp.copy, not an alias: the jitted step donates the state, and
            # donating the same underlying buffer twice (gen_* and initial_*)
            # is an XLA runtime error.
            self.state = self.state.replace(
                initial_params=jax.tree.map(jnp.copy, self.state.gen_params),
                initial_stats=jax.tree.map(jnp.copy, self.state.gen_stats),
            )
        if cfg.run.resume:
            self._resume(cfg.run.resume)

        # The target stream's position equals the number of completed steps
        # (one target batch per step for the adversarial-family methods), so
        # starting it at the restored iteration+1 makes resume
        # trajectory-EXACT: batches, their per-sample augmentation seeds,
        # and hence losses/params continue bit-for-bit as if uninterrupted
        # (tests/test_train_e2e.py::test_resume_is_trajectory_exact).
        # ★ deviation: the reference re-creates its DataLoaders on resume
        # (train_use_fix_initial.py:168-177,228-256), silently restarting
        # the target cycle (Trainer_prototype_full.py:279-283).
        self._target_iter = self.loader_t.forever(start_batch=self.iteration + 1)

    # ------------------------------------------------------------------
    def _initial_resume(self, path: str):
        """Warm-start the generator (and discriminators when present) from a
        pre-trained checkpoint — the reference's BEAL bootstrap
        (``--initial_resume``, train_use_fix_initial.py:183-199). Accepts a
        reference torch ``.pth(.tar)`` (converted via uda_clr_tpu.convert,
        filtered-merge semantics) or an orbax checkpoint of this framework.
        """
        from uda_clr_tpu.convert.torch_import import load_reference_checkpoint, merge_pretrained

        state = jax.device_get(self.state)
        if path.endswith((".pth", ".pth.tar")):
            conv = load_reference_checkpoint(path, self.cfg.model.output_stride)
            if "gen" in conv:
                params, stats = conv["gen"]
                new_params, n1 = merge_pretrained(state.gen_params, params)
                new_stats, n2 = merge_pretrained(state.gen_stats, stats)
                state = state.replace(gen_params=new_params, gen_stats=new_stats)
                print(f"initial_resume: merged {n1} param / {n2} stat tensors from {path}")
            if "dis" in conv:
                d, _ = merge_pretrained(state.dis_params, conv["dis"])
                state = state.replace(dis_params=d)
            if "dis2" in conv:
                d, _ = merge_pretrained(state.dis2_params, conv["dis2"])
                state = state.replace(dis2_params=d)
        else:
            d, tag = os.path.split(path.rstrip("/"))
            restored, meta = ckpt_lib.restore_checkpoint(d, tag, state)
            state = state.replace(
                gen_params=restored.gen_params, gen_stats=restored.gen_stats,
                dis_params=restored.dis_params, dis2_params=restored.dis2_params,
            )
            # the meta sidecar is a separate file from the orbax directory;
            # a checkpoint dir copied without it restores fine but has no
            # epoch/metric to report — don't fabricate one
            if meta:
                provenance = (f"epoch {meta.get('epoch')}, best_mean_dice "
                              f"{float(meta.get('best_mean_dice', 0.0)):.4f}")
            else:
                provenance = "no meta sidecar found; params/stats restored"
            print(f"initial_resume: warm-started gen/dis/dis2 from {path} "
                  f"({provenance})")
        self.state = self._put_replicated(state)

    def _resume(self, tag_or_dir: str):
        if os.path.isdir(tag_or_dir) and ckpt_lib.latest_checkpoint(tag_or_dir) is not None:
            ckpt_dir = tag_or_dir
            tag = ckpt_lib.latest_checkpoint(ckpt_dir)
        else:
            ckpt_dir = os.path.join(self.cfg.run.out_dir, "checkpoints")
            tag = tag_or_dir
        state, meta = ckpt_lib.restore_checkpoint(ckpt_dir, tag, self.state)
        self.state = self._put_replicated(state)
        self.epoch = int(meta.get("epoch", -1)) + 1
        self.best_mean_dice = float(meta.get("best_mean_dice", 0.0))
        # restore the global iteration counter so TB/CSV step numbering
        # continues (the reference restores it, train_use_fix_initial.py:305-306;
        # train_epoch INCREMENTS from here rather than recomputing
        # batch_idx + epoch*len(loader), so the restored value stays live
        # even if the loader length changed between runs)
        self.iteration = int(meta.get("iteration", self.epoch * len(self.loader_s) - 1))

    def _put_replicated(self, state):
        """Replicate the TrainState over the mesh. Multi-process: the
        state is identical on every process (same PRNGKey / same restored
        checkpoint), so each re-stages its host copy as one logical
        global replicated array set."""
        if not self._multiprocess:
            return jax.device_put(state, self._replicated)
        host = jax.device_get(state)
        return jax.tree.map(
            lambda x: self._dist.put_global(np.asarray(x), self._replicated), host
        )

    def _get_step(self, proto_phase: bool):
        key = (proto_phase,)
        if key not in self._steps:
            self._steps[key] = make_train_step(
                self.model, self.cfg, self.method, proto_phase=proto_phase
            )
        return self._steps[key]

    def _device_batch(self, batch_s: dict, batch_t: dict | None) -> dict:
        out = {
            "image_s": batch_s["image"],
            "map_s": batch_s["map"],
            "boundary_s": batch_s["boundary"],
        }
        if batch_t is not None:
            out["image_t"] = batch_t["image"]
        if self.method == "mean_teacher":
            out["consistency_weight"] = np.float32(
                get_current_consistency_weight(
                    self.epoch, self.cfg.method.consistency, self.cfg.method.consistency_rampup
                )
            )
        sh = self._batch_sharding
        # put_global == device_put in single-process mode; multi-process,
        # `out` holds this process's rows of the global batch
        return {
            k: self._dist.put_global(v, sh) if getattr(v, "ndim", 0) > 1 else v
            for k, v in out.items()
        }

    # ------------------------------------------------------------------
    def train_epoch(self):
        cfg = self.cfg
        past_warmup = self.epoch > cfg.method.warmup_epoch
        proto_phase = (
            self.method in ("prototype_full", "prototype_mt")
            and cfg.method.use_pid
            and past_warmup
        ) or (self.method == "prototype" and past_warmup)
        step = self._get_step(proto_phase)
        lr_gen = optim_lib.gen_lr_schedule(
            self.epoch, cfg.optim.lr_gen, cfg.optim.lr_step_epochs, cfg.optim.lr_decrease_rate
        )
        lr_dis = cfg.optim.lr_dis
        needs_target = self.method in _ADVERSARIAL_METHODS

        # run.profile: capture one XLA trace window (steps 3..8 of the first
        # trained epoch — past compile, inside steady state; clamped for
        # shorter epochs) into out_dir/profile, readable with
        # utils/xplane.py or TensorBoard.
        if cfg.run.profile and not self._profiled:
            n_steps = len(self.loader_s)
            prof_start = 3 if n_steps > 3 else 0
            prof_stop = min(8, n_steps - 1)
        else:
            prof_start, prof_stop = -1, -1
        prof_open = False

        self.timer.start()
        pending = []
        viz_pending = []
        viz_every = cfg.run.viz_every
        for batch_idx, batch_s in enumerate(self.loader_s.epoch(self.epoch)):
            self.iteration += 1
            batch_t = next(self._target_iter) if needs_target else None
            batch = self._device_batch(batch_s, batch_t)
            if batch_idx == prof_start:
                # On the tunneled-TPU relay block_until_ready is NOT a
                # sound barrier (CLAUDE.md); a data-dependent scalar fetch
                # of the last step's loss is — it forces every queued step
                # to finish so the trace window starts clean.
                if pending:
                    float(pending[-1][1]["loss_all"])
                else:
                    jax.block_until_ready(self.state)
                jax.profiler.start_trace(os.path.join(cfg.run.out_dir, "profile"))
                prof_open = True
            self.state, metrics = step(self.state, batch, lr_gen, lr_dis, self.epoch)
            if self._multiprocess:
                # one collective program in flight at a time: two async
                # executions can initialize their cross-process (gloo)
                # communicators in different orders on different
                # processes and deadlock the rendezvous; on a real TPU
                # pod the hardware stream orders collectives and this
                # barrier would be unnecessary
                jax.block_until_ready(metrics["loss_all"])
            if batch_idx == prof_stop:
                float(metrics["loss_all"])  # drain the window (see above)
                jax.profiler.stop_trace()
                self._profiled, prof_open = True, False
            viz = metrics.pop("_viz", None)
            if viz is not None and viz_every and self.iteration % viz_every == 0:
                # keep the device tiles + the host copies of the raw batch;
                # fetched/written after the epoch, off the step's hot path
                viz_pending.append((self.iteration, batch_s, batch_t, viz))
            pending.append((self.iteration, metrics))
            self.timer.add_images(batch_s["image"].shape[0])

        if prof_open:
            # epoch shorter than the profile window: close the trace cleanly
            if pending:
                float(pending[-1][1]["loss_all"])
            else:
                jax.block_until_ready(self.state)
            jax.profiler.stop_trace()
            self._profiled = True

        # one host sync per epoch for all scalars
        fetched = jax.device_get([m for _, m in pending])
        rows = []
        sums: dict[str, float] = {}
        for (iteration, _), m in zip(pending, fetched):
            m = {k: float(v) for k, v in m.items()}
            if not np.isfinite(m.get("loss_all", 0.0)):
                bad = sorted(k for k, v in m.items() if not np.isfinite(v))
                raise ValueError(
                    f"loss is nan while training (non-finite: {bad}; "
                    f"iteration {iteration}; metrics: {m})"
                )
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
                self.writer.add_scalar(f"train/{k}", v, iteration)
            rows.append({"epoch": self.epoch, "iteration": iteration, **m})
        self.csv.write_train_rows(rows)
        for iteration, b_s, b_t, viz in viz_pending:
            self._write_train_images(iteration, b_s, b_t, jax.device_get(viz))

        dt, ips = self.timer.stop()
        self.last_throughput = ips
        n = max(len(rows), 1)
        means = {k: v / n for k, v in sums.items()}
        self.writer.add_scalar("lr_gen", lr_gen, self.epoch * len(self.loader_s))
        print(
            f"[Epoch: {self.epoch}] lr:{lr_gen:.6f} "
            + " ".join(f"{k}:{v:.4f}" for k, v in sorted(means.items()))
            + f"  {ips:.2f} img/s  time:{dt:.1f}s"
        )
        return means

    # ------------------------------------------------------------------
    def _write_train_images(self, iteration, batch_s, batch_t, viz):
        """The reference's every-30-iterations tensorboard image grids
        (Trainer_prototype_full.py:307-325,519-575): first image of the
        batch, per-channel, min-max normalized. GT/image tiles come from the
        host batch; prediction/std/confidence tiles from the step's device
        viz slices. Tags match the reference's."""
        w = self.writer
        # wire-format (uint8) batches carry raw values; decode the few
        # host-consumed tiles (first image of the batch) before plotting
        img_s = wire.decode_array("image", batch_s["image"][0])
        map_s = wire.decode_array("map", batch_s["map"][0])
        bnd_s = wire.decode_array("boundary", batch_s["boundary"][0])
        w.add_image("DomainS/image", (img_s + 1.0) * 0.5, iteration)
        w.add_image("DomainS/target_cup", map_s[..., 0], iteration)
        w.add_image("DomainS/target_disc", map_s[..., 1], iteration)
        w.add_image("DomainS/target_boundary", bnd_s[..., 0], iteration)
        w.add_image("DomainS/prediction_cup", viz["pred_s"][..., 0], iteration)
        w.add_image("DomainS/prediction_disc", viz["pred_s"][..., 1], iteration)
        w.add_image("DomainS/prediction_boundary", viz["pred_b_s"][..., 0], iteration)
        if batch_t is not None and "pred_t" in viz:
            img_t = wire.decode_array("image", batch_t["image"][0])
            w.add_image("DomainT/image", (img_t + 1.0) * 0.5, iteration)
            if "map" in batch_t:
                map_t = wire.decode_array("map", batch_t["map"][0])
                w.add_image("DomainT/target_cup", map_t[..., 0], iteration)
                w.add_image("DomainT/target_disc", map_t[..., 1], iteration)
            w.add_image("DomainT/prediction_cup", viz["pred_t"][..., 0], iteration)
            w.add_image("DomainT/prediction_disc", viz["pred_t"][..., 1], iteration)
            w.add_image("DomainT/boundaryT", viz["bnd_t_raw"][..., 0], iteration)
        if "std_t" in viz:
            w.add_image("DomainT/target_cup_std_map", viz["std_t"][..., 0], iteration)
            w.add_image("DomainT/target_disc_std_map", viz["std_t"][..., 1], iteration)
            w.add_image("DomainT/mask_0", viz["conf_t"][..., 0], iteration)
            w.add_image("DomainT/mask_1", viz["conf_t"][..., 1], iteration)

    # ------------------------------------------------------------------
    def validate(self):
        variables = {"params": self.state.gen_params, "batch_stats": self.state.gen_stats}
        tot = {"loss": 0.0, "cup_dice": 0.0, "disc_dice": 0.0, "cup_pa": 0.0,
               "disc_pa": 0.0, "cup_iou": 0.0, "disc_iou": 0.0}
        n_batches = 0
        val_strips = []
        bs = self.cfg.data.batch_size
        for batch in self.loader_val.epoch(0):
            # pad the final partial batch up to the compiled batch size
            # (repeat the last image) so eval keeps ONE jitted shape; the
            # pad images are masked out of loss and metrics below.
            n_valid = batch["image"].shape[0]
            image, map_t = batch["image"], batch["map"]
            if n_valid < bs:
                reps = [1] * (n_valid - 1) + [bs - n_valid + 1]
                image = np.repeat(image, reps, axis=0)
                map_t = np.repeat(map_t, reps, axis=0)
            # shard the (padded, fixed-shape) eval batch over the data axis
            # so validation uses every chip like training does; uint8
            # wire batches cross as-is and decode inside the eval step.
            # Multi-process: validation runs REPLICATED instead (every
            # process holds the full val batch and computes the full
            # metrics redundantly — sharded eval logits would not be
            # host-readable across processes), so the best-model decision
            # below is identical everywhere without any communication.
            sh_val = self._replicated if self._multiprocess else self._batch_sharding
            image = self._dist.put_global(image, sh_val)
            map_t = self._dist.put_global(map_t, sh_val)
            logits, _, per_image_loss = self._eval_step(variables, image, map_t)
            logits = np.asarray(logits)[:n_valid]
            loss = float(np.mean(np.asarray(per_image_loss)[:n_valid]))
            map_host = wire.decode_array("map", batch["map"])
            if self.cfg.run.save_val_images and len(val_strips) < 8:
                from uda_clr_tpu.utils.visualize import joint_val_image

                probs = 1.0 / (1.0 + np.exp(-logits[0]))
                img01 = (wire.decode_array("image", batch["image"][0]) + 1.0) * 0.5
                val_strips.append(joint_val_image(img01, probs, map_host[0]))
            if not np.isfinite(loss):
                raise ValueError("loss is nan while validating")
            cup_d, disc_d = dice_coeff_2label(logits, map_host)
            pa_cup, pa_disc, iou_cup, iou_disc = pixel_acc(logits, map_host)
            tot["loss"] += loss
            tot["cup_dice"] += cup_d
            tot["disc_dice"] += disc_d
            tot["cup_pa"] += pa_cup
            tot["disc_pa"] += pa_disc
            tot["cup_iou"] += iou_cup
            tot["disc_iou"] += iou_disc
            n_batches += 1
        for k in tot:
            tot[k] /= max(n_batches, 1)

        if val_strips and self._is_main:
            from uda_clr_tpu.utils.visualize import save_val_img

            save_val_img(self.cfg.run.out_dir, self.epoch, val_strips)

        step = self.epoch * len(self.loader_s)
        self.writer.add_scalar("val_data/loss_CE", tot["loss"], step)
        self.writer.add_scalar("val_data/val_CUP_dice", tot["cup_dice"], step)
        self.writer.add_scalar("val_data/val_DISC_dice", tot["disc_dice"], step)
        self.writer.add_scalar("val_data/val_CUP_PA", tot["cup_pa"], step)
        self.writer.add_scalar("val_data/val_DISC_PA", tot["disc_pa"], step)
        self.writer.add_scalar("val_data/val_CUP_IOU", tot["cup_iou"], step)
        self.writer.add_scalar("val_data/val_DISC_IOU", tot["disc_iou"], step)

        mean_dice = tot["cup_dice"] + tot["disc_dice"]
        ckpt_dir = os.path.join(self.cfg.run.out_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        # best/cadence tracking runs on every process (validation metrics
        # are replica-identical by construction) and EVERY process calls
        # save: orbax's save is itself a collective (it runs
        # sync_global_processes internally and deadlocks if only one
        # process joins); it coordinates the single writer itself. Only
        # the meta.json sidecar is main-only (checkpoint.py).
        if mean_dice > self.best_mean_dice:
            self.best_epoch = self.epoch + 1
            self.best_mean_dice = mean_dice
            ckpt_lib.save_checkpoint(
                ckpt_dir, self.state, self.epoch, self.best_mean_dice,
                f"checkpoint_{self.best_epoch}", iteration=self.iteration,
            )
        elif (self.epoch + 1) % self.cfg.run.checkpoint_every == 0:
            ckpt_lib.save_checkpoint(
                ckpt_dir, self.state, self.epoch, self.best_mean_dice,
                f"checkpoint_{self.epoch + 1}", iteration=self.iteration,
            )
        self.csv.write_valid_row(
            self.epoch, self.iteration, tot["loss"], tot["cup_dice"], tot["disc_dice"],
            self.best_epoch,
        )
        self.writer.add_scalar("best_model_epoch", self.best_epoch, step)
        return tot

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        stop_epoch = cfg.run.stop_epoch if cfg.run.stop_epoch is not None else cfg.run.max_epoch
        for epoch in range(self.epoch, cfg.run.max_epoch):
            self.epoch = epoch
            self.train_epoch()
            if epoch == stop_epoch:
                print(f"Stop epoch at {stop_epoch}")
                break
            if (epoch + 1) % cfg.run.interval_validate == 0:
                self.validate()
        self.writer.close()
