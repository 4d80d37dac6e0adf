#!/usr/bin/env python
"""Full ArtiBoost training with online exploration + synthesis.

Parity: ``train/train_artiboost.py`` in the reference — builds dataset ->
model -> optimizer -> criterion -> evaluator -> ArtiBoostLoader; per
epoch: ``prepare()`` -> train epoch pass -> ``step_eval()`` (mining) ->
checkpoint; every ``--test_freq`` epochs an eval pass on the test split.

TPU-native differences: the train step is one donated pjit program over
the mesh data axis; synthetic batches are rendered on device inside the
input pipeline (no render processes); checkpoints are orbax pytrees.

Usage:
    python train/train_artiboost.py --cfg config/ho3dv2_clasbased_artiboost.yaml \
        --exp_id my_exp [--batch_size 128] [--resume exp/...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import artiboost_tpu.datasets  # noqa: F401  (registers all dataset types)
from artiboost_tpu.artiboost import ArtiBoostLoader
from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.datasets.hoquery import Queries, SynthQueries
from artiboost_tpu.metrics import build_evaluator
from artiboost_tpu.models import build_arch
from artiboost_tpu.opt import parse_args, parse_extra_args
from artiboost_tpu.parallel import (
    create_train_state,
    get_mesh,
    make_eval_step,
    make_fused_train_step,
    make_mixed_train_step,
    make_train_step,
    build_optimizer,
    shard_batch,
)
from artiboost_tpu.utils import profiling
from artiboost_tpu.utils.etqdm import etqdm
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import TrainMode
from artiboost_tpu.utils.prefetch import prefetch
from artiboost_tpu.utils.recorder import Recorder
from artiboost_tpu.utils.registry import DATASET, build_from_cfg
from artiboost_tpu.utils.summarizer import Summarizer


def _to_device_batch(batch):
    return {k: (_to_device_batch(v) if isinstance(v, dict) else jnp.asarray(v))
            for k, v in batch.items() if not isinstance(v, (str, list))}


def _ensure_synth_ids(batch):
    """Real-data batches carry id -1 / synth 0 flags for the val metrics."""
    B = batch[Queries.IMAGE].shape[0]
    for q, fill in ((SynthQueries.IS_SYNTH, 0), (SynthQueries.OBJ_ID, -1),
                    (SynthQueries.PERSP_ID, -1), (SynthQueries.GRASP_ID, -1)):
        if q not in batch:
            batch[q] = jnp.full((B,), fill, jnp.int32)
    return batch


def _pipelined_parts(parts, synth_jit, gen, key):
    """(real, sidx) -> (real, rendered_synth) with the render for item N+1
    dispatched BEFORE item N is yielded: the synth render of the next step
    sits in the device queue behind the current step's fwd/bwd instead of
    serializing ahead of it inside one program (double-buffering; the
    TPU-native shape of the reference render farm's latency hiding,
    ``anakin/artiboost/render_infra.py:14-59``)."""
    buf = None
    for real, sidx in parts:
        cur = None
        if sidx is not None:
            key, kr = jax.random.split(key)
            cur = synth_jit(kr, gen, sidx)
        if buf is not None:
            yield buf
        buf = (real, cur)
    if buf is not None:
        yield buf


def epoch_pass(mode, loader, state, step_fn, evaluator, key, summarizer=None,
               epoch=0, mesh=None, log_every=20, profiler_cfg=None,
               fused_step=None, artiboost_loader=None, mixed_step=None):
    """One epoch. When ``fused_step`` is given (TRAIN with online synthesis),
    iterate (real, synth_idx) parts and render+train in one device program;
    when ``mixed_step`` is ALSO given, pipeline instead: render each step's
    synth half one step ahead (PIPELINE_SYNTH); otherwise iterate
    fully-formed batches."""
    evaluator.reset_all()
    t0 = time.time()
    n_batches = 0
    use_fused = (fused_step is not None and mode == TrainMode.TRAIN
                 and artiboost_loader is not None
                 and artiboost_loader.use_synth
                 and artiboost_loader.generated is not None)
    use_pipelined = use_fused and mixed_step is not None
    # On a HOST-CPU multi-device mesh (virtual-device tests), unbounded
    # async dispatch deadlocks: each in-flight multi-device program parks
    # its per-device executions at a collective rendezvous, and the
    # host's small thread pool can strand program N's participants behind
    # program N+1's. Real TPU slices have per-device hardware queues and
    # need no such bound — keep full async pipelining there.
    cpu_mesh_sync = (mesh is not None and jax.default_backend() == "cpu"
                     and mesh.devices.size > 1)
    if use_pipelined:
        key, k_pipe = jax.random.split(key)
        iterable = _pipelined_parts(
            artiboost_loader.iter_parts(),
            artiboost_loader._synth_batch_jit,
            artiboost_loader.generated, k_pipe)
    elif use_fused:
        iterable = artiboost_loader.iter_parts()
    else:
        iterable = loader
    # overlap host batch assembly (decode + native warp + collate) with
    # the device step — the DataLoader-worker role (prefetch.py)
    iterable = prefetch(iterable, depth=2)
    bar = etqdm(iterable, total=len(loader) if hasattr(loader, "__len__") else None,
                desc=f"{mode.name} {epoch}")
    for bidx, item in enumerate(bar):
        key, sub = jax.random.split(key)
        if profiler_cfg and epoch == 0 and bidx == 1:  # skip compile step
            profiling.start_trace(profiler_cfg[0])
        with profiling.step_trace(mode.name.lower(), int(state.step)):
            if use_pipelined:
                real_batch, synth = item
                if synth is not None:
                    real_batch = {} if real_batch is None else \
                        _ensure_synth_ids(_to_device_batch(real_batch))
                    if real_batch and mesh is not None:
                        # commit the host half to the mesh's data axis
                        # (required for multi-process; a no-op cost
                        # single-process — the jit would do the same put)
                        real_batch = shard_batch(real_batch, mesh)
                    state, preds, losses, batch = mixed_step(
                        state, real_batch, synth, sub)
                else:  # synth exhausted/shutdown: plain real step
                    batch = _ensure_synth_ids(_to_device_batch(real_batch))
                    if mesh is not None:
                        batch = shard_batch(batch, mesh)
                    state, preds, losses = step_fn(state, batch, sub)
            elif use_fused:
                real_batch, sidx = item
                if sidx is not None:
                    real_batch = {} if real_batch is None else \
                        _ensure_synth_ids(_to_device_batch(real_batch))
                    state, preds, losses, batch = fused_step(
                        state, real_batch, artiboost_loader.generated, sidx, sub)
                else:  # synth exhausted/shutdown: plain real step
                    batch = _ensure_synth_ids(_to_device_batch(real_batch))
                    if mesh is not None:
                        batch = shard_batch(batch, mesh)
                    state, preds, losses = step_fn(state, batch, sub)
            else:
                batch = _ensure_synth_ids(_to_device_batch(item))
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                if mode == TrainMode.TRAIN:
                    state, preds, losses = step_fn(state, batch, sub)
                else:
                    preds, losses = step_fn(state, batch, sub)
        if profiler_cfg and epoch == 0 and bidx == profiler_cfg[1]:
            profiling.stop_trace()
        evaluator.feed_all(preds, batch, losses)
        if cpu_mesh_sync:
            jax.block_until_ready(losses["final_loss"])
        n_batches += 1
        if bidx % log_every == 0:
            bar.set_postfix_str(str(evaluator))
        if summarizer is not None and mode == TrainMode.TRAIN and bidx % log_every == 0:
            summarizer.summarize_losses(
                {k: v for k, v in losses.items() if v is not None},
                int(state.step), prefix="train")
    dt = time.time() - t0
    logger.info(f"{mode.name} epoch {epoch}: {n_batches} batches in {dt:.1f}s "
                f"({n_batches / max(dt, 1e-6):.2f} it/s) | {evaluator}")
    return state, key


class _NullRecorder:
    """Non-zero ranks in a multi-process run: every process executes the
    same SPMD program, but only process 0 owns the experiment directory,
    checkpoints, and TB events (the standard multi-host convention)."""
    dump_path = None

    def record_arch(self, *a, **k):
        pass

    def record_evaluator(self, *a, **k):
        pass

    def record_checkpoints(self, *a, **k):
        pass

    def resume_checkpoints(self, *a, **k):
        raise RuntimeError("--resume on a non-zero rank: restore happens on "
                           "process 0 and broadcasts through put_global")

    def resume_artiboost_state(self, *a, **k):
        return None


class _NullSummarizer:
    def summarize_losses(self, *a, **k):
        pass

    def summarize_evaluator(self, *a, **k):
        pass

    def close(self):
        pass


def main_worker(arg, cfg, extra):
    if jax.process_index() == 0:
        recorder = Recorder(arg.exp_id, cfg, resume_path=arg.resume,
                            allow_dirty=getattr(arg, "allow_dirty", False))
        summarizer = Summarizer(recorder.dump_path)
    else:
        recorder, summarizer = _NullRecorder(), _NullSummarizer()
    rng = jax.random.PRNGKey(int(cfg.get("TRAIN", {}).get("MANUAL_SEED", 1)))

    mesh = get_mesh(n_data=arg.n_devices)
    logger.info(f"mesh: {mesh.shape} over {len(jax.devices())} devices")

    data_preset = cfg["DATA_PRESET"]
    batch_size = int(cfg["TRAIN"]["BATCH_SIZE"])
    n_epochs = int(cfg["TRAIN"]["EPOCH"])

    # ---- datasets ----
    train_data = None
    if "DATASET" in cfg and "TRAIN" in cfg["DATASET"]:
        try:
            train_data = build_from_cfg(cfg["DATASET"]["TRAIN"], DATASET,
                                        {"DATA_PRESET": data_preset})
        except FileNotFoundError as e:
            logger.warning(f"train dataset unavailable ({e}); synth-only training")
    test_data = None
    if "DATASET" in cfg and "TEST" in cfg["DATASET"]:
        try:
            test_data = build_from_cfg(cfg["DATASET"]["TEST"], DATASET,
                                       {"DATA_PRESET": data_preset})
        except FileNotFoundError as e:
            logger.warning(f"test dataset unavailable ({e}); skipping test passes")

    # ---- model / criterion / evaluators ----
    arch = build_arch(cfg["ARCH"], data_preset)
    recorder.record_arch(arch)
    criterion = build_criterion(cfg)
    manager_cfg = dict(cfg.get("MANAGER", {}))
    manager_cfg.setdefault("DATA_PRESET", data_preset)
    # val-sweep gates live under TRAIN in the released configs (parity:
    # reference train_artiboost.py:166-167 injects them the same way)
    if "EVAL_FREQ" in cfg["TRAIN"]:
        manager_cfg.setdefault("VAL_FREQ", cfg["TRAIN"]["EVAL_FREQ"])
    if "VAL_START_EPOCH" in cfg["TRAIN"]:
        manager_cfg.setdefault("VAL_START_EPOCH", cfg["TRAIN"]["VAL_START_EPOCH"])
    ccv_shape_defaults = {}
    evaluator = build_evaluator(cfg.get("EVALUATOR", []), data_preset,
                                **ccv_shape_defaults)
    test_evaluator = build_evaluator(
        [m for m in cfg.get("EVALUATOR", [])
         if not m["TYPE"].startswith("ValMetric")], data_preset)

    # ---- artiboost loader ----
    artiboost_loader = ArtiBoostLoader(
        real_dataset=train_data, cfg=manager_cfg, batch_size=batch_size,
        n_epochs=n_epochs, seed=int(cfg["TRAIN"].get("MANUAL_SEED", 1)),
        mesh=mesh)

    # ---- optimizer / state ----
    optimizer, sched = build_optimizer(cfg["TRAIN"])
    artiboost_loader.prepare()
    if jax.process_count() > 1 and artiboost_loader.generated is not None:
        # multi-process: arch.init runs ops eagerly, which is illegal on
        # global (non-fully-addressable) arrays — render one synth batch
        # for its SCHEMA and init from host zeros of the same structure
        # (a synth batch carries the full annotation key set)
        sidx = artiboost_loader._sample_synth_idx(
            np.arange(max(batch_size, 1)), 0, batch_size)
        synth = artiboost_loader._synth_batch_jit(
            jax.random.PRNGKey(0), artiboost_loader.generated, sidx)
        init_batch = _ensure_synth_ids(jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, x.dtype), synth))
    else:
        init_batch = _ensure_synth_ids(_to_device_batch(next(iter(artiboost_loader))))
    rng, init_key = jax.random.split(rng)
    state = create_train_state(arch, optimizer, init_batch, init_key, mesh=mesh)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(state.params))
    logger.info(f"arch has {n_params / 1e6:.1f}M params")

    # pretrained init (ImageNet backbone and/or full released checkpoint,
    # reference loads these inside the model constructors); a resume
    # below overrides, matching the reference's ordering
    from artiboost_tpu.utils.pretrained import load_arch_pretrained
    state, _ = load_arch_pretrained(state, cfg["ARCH"])

    epoch_start = 0
    if arg.resume:
        state, epoch_start, restored_rng = recorder.resume_checkpoints(state)
        if restored_rng is not None:
            rng = restored_rng
        ab_state = recorder.resume_artiboost_state()
        if ab_state is not None:
            artiboost_loader.load_state_dict(ab_state)
        logger.info(f"resumed from epoch {epoch_start}")

    train_step = make_train_step(arch, criterion, optimizer, mesh)
    fused_step = make_fused_train_step(arch, criterion, optimizer,
                                       artiboost_loader.synth_batch_fn, mesh)
    # PIPELINE_SYNTH (default on): double-buffer the synth render one step
    # ahead of fwd/bwd instead of fusing it into the train program
    # (VERDICT r4 item 1; A/B in docs/PERF.md round 5)
    mixed_step = None
    if bool(cfg["TRAIN"].get("PIPELINE_SYNTH", True)):
        mixed_step = make_mixed_train_step(arch, criterion, optimizer, mesh)
    eval_step = make_eval_step(arch, criterion, mesh)

    # ---- epochs ----
    if getattr(arg, "evaluate", False):
        if test_data is None:
            raise RuntimeError("--evaluate requires a TEST dataset")
        test_loader = _host_loader(test_data, batch_size)
        _, rng = epoch_pass(TrainMode.TEST, test_loader, state, eval_step,
                            test_evaluator, rng, None, epoch_start, mesh)
        recorder.record_evaluator(test_evaluator, epoch_start, "test")
        summarizer.close()
        return state

    profile_dir = getattr(arg, "profile_dir", None)
    profiler_cfg = (profile_dir, getattr(arg, "profile_steps", 20)) if profile_dir else None
    for epoch in range(epoch_start, n_epochs):
        with profiling.trace("artiboost/prepare"):
            artiboost_loader.prepare()
        state, rng = epoch_pass(TrainMode.TRAIN, artiboost_loader, state,
                                train_step, evaluator, rng,
                                summarizer, epoch, mesh,
                                profiler_cfg=profiler_cfg,
                                fused_step=fused_step,
                                artiboost_loader=artiboost_loader,
                                mixed_step=mixed_step)
        profiling.stop_trace()  # no-op unless a short epoch left it running
        summarizer.summarize_evaluator(evaluator, epoch, "train")
        recorder.record_evaluator(evaluator, epoch, "train")
        if artiboost_loader.should_val(epoch):
            # dedicated val sweep: uniform triplet draw w/o replacement,
            # rendered + evaluated fresh, feeds mining instead of the
            # (weight-biased) training-epoch measurements
            with profiling.trace("artiboost/prepare_val"):
                artiboost_loader.prepare_val()
            val_loader = _WithLen(artiboost_loader.iter_val(),
                                  artiboost_loader.len_val())
            _, rng = epoch_pass(TrainMode.VAL, val_loader, state, eval_step,
                                evaluator, rng, None, epoch, mesh)
            summarizer.summarize_evaluator(evaluator, epoch, "val")
            recorder.record_evaluator(evaluator, epoch, "val")
        artiboost_loader.step_eval(epoch, evaluator)
        recorder.record_checkpoints(state, epoch,
                                    artiboost_state=artiboost_loader.state_dict(),
                                    rng_key=rng, snapshot=arg.snapshot)

        if test_data is not None and arg.test_freq > 0 and \
                (epoch + 1) % arg.test_freq == 0:
            test_loader = _host_loader(test_data, batch_size)
            _, rng = epoch_pass(TrainMode.TEST, test_loader, state, eval_step,
                                test_evaluator, rng, None, epoch, mesh)
            summarizer.summarize_evaluator(test_evaluator, epoch, "test")
            recorder.record_evaluator(test_evaluator, epoch, "test")

    artiboost_loader.synth_shutdown()
    summarizer.close()
    logger.info("training complete")
    return state


class _WithLen:
    """Wrap a generator with a known length (for epoch_pass progress)."""

    def __init__(self, it, n):
        self._it, self._n = it, n

    def __iter__(self):
        return iter(self._it)

    def __len__(self):
        return self._n


def _host_loader(dataset, batch_size, shuffle=False):
    """Full-coverage eval loader: the tail batch is repeat-padded and
    masked with SAMPLE_VALID instead of dropped (metrics honor it)."""
    from artiboost_tpu.datasets.hodata import padded_host_loader

    yield from padded_host_loader(dataset, batch_size, shuffle=shuffle)


def main():
    arg, cfg, custom = parse_args()
    extra = parse_extra_args(custom)
    if getattr(arg, "multihost", False):
        from artiboost_tpu.parallel import init_distributed

        init_distributed(arg.coordinator, arg.num_processes, arg.process_id)
        logger.info(f"multihost: process {jax.process_index()}/"
                    f"{jax.process_count()}, "
                    f"{len(jax.devices())} global devices")
    logger.info(f"==> start training {arg.exp_id}")
    main_worker(arg, cfg, extra)


if __name__ == "__main__":
    main()
