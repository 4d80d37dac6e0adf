"""Train state + pjit-compiled train/eval steps.

Replaces the reference's torch loop (``train/train_artiboost.py:46-105``
epoch_pass: forward -> criterion -> backward -> clip -> adam step) with
a single donated jitted step sharded over the mesh ``data`` axis; the
optimizer/scheduler factories mirror ``anakin/utils/netutils.py:26,44``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def build_scheduler(cfg: Dict, base_lr: float) -> optax.Schedule:
    """StepLR / warmup-cosine / warmup-linear (netutils.py:44 parity)."""
    kind = cfg.get("SCHEDULER", "step").lower()
    if kind in ("step", "steplr"):
        step_size = int(cfg.get("LR_DECAY_STEP", 100))
        gamma = float(cfg.get("LR_DECAY_GAMMA", 1.0))
        steps_per_epoch = int(cfg.get("STEPS_PER_EPOCH", 1))
        return lambda step: base_lr * gamma ** (step // (step_size * steps_per_epoch))
    if kind == "cosine":
        total = int(cfg.get("TOTAL_STEPS", 10000))
        warm = int(cfg.get("WARMUP_STEPS", 0))
        return optax.warmup_cosine_decay_schedule(0.0, base_lr, warm, total)
    if kind == "linear":
        total = int(cfg.get("TOTAL_STEPS", 10000))
        warm = int(cfg.get("WARMUP_STEPS", 0))
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warm),
             optax.linear_schedule(base_lr, 0.0, total - warm)], [warm])
    raise ValueError(f"unknown scheduler {kind}")


def _decay_mask(params) -> Any:
    """Weight-decay mask: True everywhere except frozen buffers.

    ManoAdaptor's ``regressor`` is a fixed joint-regression matrix the
    reference stores with requires_grad=False (``anakin/models/mano.py:
    13-41``); its forward stop_gradients it so adam never moves it, but
    adamw's decoupled decay would still erode it — mask it out (ADVICE
    r4). The leaf name "regressor" is unique to ManoAdaptor in this
    codebase (tests/test_models.py asserts that stays true)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not any(
            getattr(k, "key", None) == "regressor" for k in path),
        params)


def build_optimizer(cfg: Dict) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """adam / sgd with grad clipping (netutils.py:26 parity; the reference
    clips by value GRAD_CLIP through torch.nn.utils.clip_grad_norm_ — we
    use global-norm clipping with the same threshold)."""
    base_lr = float(cfg.get("LR", 1e-4))
    sched = build_scheduler(cfg, base_lr)
    opt_name = cfg.get("OPTIMIZER", "adam").lower()
    wd = float(cfg.get("WEIGHT_DECAY", 0.0))
    if opt_name == "adam":
        core = (optax.adamw(sched, weight_decay=wd, mask=_decay_mask)
                if wd else optax.adam(sched))
    elif opt_name == "sgd":
        core = optax.sgd(sched, momentum=float(cfg.get("MOMENTUM", 0.9)))
    else:
        raise ValueError(f"unknown optimizer {opt_name}")
    chain = []
    clip = float(cfg.get("GRAD_CLIP", 0.0))
    if clip:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(core)
    return optax.chain(*chain), sched


def create_train_state(arch, optimizer: optax.GradientTransformation,
                       sample_batch: Dict, key: jax.Array,
                       mesh: Optional[Mesh] = None) -> TrainState:
    variables = arch.init(key, sample_batch, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )
    if mesh is not None and jax.process_count() > 1:
        # multi-process: the first global jit call requires state already
        # committed to the GLOBAL replicated sharding (every process init
        # is identical — same seed, same arch)
        from artiboost_tpu.parallel.mesh import put_global, replicated_sharding

        repl = replicated_sharding(mesh)
        state = jax.tree_util.tree_map(lambda x: put_global(x, repl), state)
    return state


def make_train_step(
    arch,
    criterion,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """-> step(state, batch, key) -> (state, preds, losses).

    When a mesh is given, the returned function is jitted with batch
    sharded over ``data`` and state replicated — XLA inserts the psum
    gradient reduction over ICI.
    """

    def step(state: TrainState, batch: Dict, key: jax.Array):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = arch.apply(variables, batch, train=True,
                             mutable=["batch_stats"] if state.batch_stats else [])
            preds, mutated = out if isinstance(out, tuple) else (out, {})
            total, losses = criterion.compute_losses(preds, batch, key)
            return total, (preds, losses, mutated.get("batch_stats", state.batch_stats))

        (_, (preds, losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, preds, losses

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, data, repl),
        donate_argnums=(0,),
    )


def make_fused_train_step(
    arch,
    criterion,
    optimizer: optax.GradientTransformation,
    synth_fn: Callable,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """-> step(state, real_batch, gen, sidx, key) -> (state, preds, losses, batch).

    One device program per training step: renders the synthetic half-batch
    (``synth_fn(key, gen, sidx)``), concatenates it with the real half
    along batch, and runs fwd/bwd/adam — XLA overlaps the rasterizer's VPU
    work with the CNN's MXU work, and the per-step host round-trip for the
    separate synth dispatch disappears (SURVEY §7.8: synth batches flow
    straight into the train step).
    """

    def assemble(real_batch: Optional[Dict], gen, sidx, key) -> Dict:
        synth = synth_fn(key, gen, sidx)
        if not real_batch:
            return synth
        # masked key-UNION (runs at trace time): a side missing a key is
        # zero-filled + per-sample-masked so every configured loss sees
        # every mixed batch, matching the reference where MixedDataset
        # always carries full annotations (criterion.py:57-67)
        from artiboost_tpu.utils.batching import union_concat

        return union_concat([real_batch, synth],
                            "make_fused_train_step.assemble")

    def step(state: TrainState, real_batch: Optional[Dict], gen, sidx,
             key: jax.Array):
        k_synth, k_loss = jax.random.split(key)
        batch = assemble(real_batch, gen, sidx, k_synth)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = arch.apply(variables, batch, train=True,
                             mutable=["batch_stats"] if state.batch_stats else [])
            preds, mutated = out if isinstance(out, tuple) else (out, {})
            total, losses = criterion.compute_losses(preds, batch, k_loss)
            return total, (preds, losses, mutated.get("batch_stats", state.batch_stats))

        (_, (preds, losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, preds, losses, batch

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, repl, data, repl),
        out_shardings=(repl, data, repl, data),
        donate_argnums=(0,),
    )


def make_mixed_train_step(
    arch,
    criterion,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """-> step(state, real_batch, synth_batch, key) -> (state, preds, losses, batch).

    The double-buffered half of the pipelined fused path (VERDICT r4 item
    1): the synth half-batch arrives PRE-RENDERED (dispatched one step
    ahead by the epoch driver through the loader's ``synth_batch_fn``
    jit), so the render of step N+1 sits in the device queue behind step
    N's fwd/bwd instead of serializing in front of it inside one program.
    This is the TPU-native shape of the reference's render-farm overlap
    (``anakin/artiboost/render_infra.py:14-59``: render workers produce
    images while the training GPU consumes the previous ones). Measured
    A/B vs the single-program fused step: script/probe_pipeline.py +
    docs/PERF.md round 5.
    """

    def step(state: TrainState, real_batch: Optional[Dict],
             synth_batch: Optional[Dict], key: jax.Array):
        if real_batch and synth_batch:
            from artiboost_tpu.utils.batching import union_concat

            batch = union_concat([real_batch, synth_batch],
                                 "make_mixed_train_step")
        else:
            batch = synth_batch or real_batch

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = arch.apply(variables, batch, train=True,
                             mutable=["batch_stats"] if state.batch_stats else [])
            preds, mutated = out if isinstance(out, tuple) else (out, {})
            total, losses = criterion.compute_losses(preds, batch, key)
            return total, (preds, losses, mutated.get("batch_stats", state.batch_stats))

        (_, (preds, losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, preds, losses, batch

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 2))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, data, data, repl),
        out_shardings=(repl, data, repl, data),
        donate_argnums=(0, 2),
    )


def make_eval_step(arch, criterion=None, mesh: Optional[Mesh] = None) -> Callable:
    """-> eval_step(state, batch, key) -> (preds, losses)."""

    def step(state: TrainState, batch: Dict, key: jax.Array):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        preds = arch.apply(variables, batch, train=False)
        losses = {}
        if criterion is not None:
            _, losses = criterion.compute_losses(preds, batch, key)
        return preds, losses

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data, repl),
                   out_shardings=(data, repl))
