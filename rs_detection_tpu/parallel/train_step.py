"""Data-parallel training over a device mesh (pjit/NamedSharding).

Replaces the reference's Jittor-MPI data parallelism (SURVEY §2.7:
``mpirun -np 8``, implicit gradient all-reduce inside optimizer.step,
rank-0 logging) with the TPU-native equivalent: a 1-D ``data`` mesh,
batch sharded over it, parameters/optimizer state replicated, and XLA
inserting the gradient psum automatically from the sharding constraints
— collectives ride ICI, no NCCL/MPI analogue needed.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any      # all non-param variable collections
    opt_state: Any
    # per-step exponential moving average of params (YOLO-style; the
    # reference's ModelEMA — networks/yolo.py). None when disabled.
    ema_params: Any = None


def create_mesh(n_devices: Optional[int] = None,
                axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shardings(mesh: Mesh, axis_name: str = "data"):
    """(replicated, batch-sharded) NamedShardings for the mesh."""
    replicated = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(axis_name))
    return replicated, batch


def create_train_state(model, variables, tx,
                       ema: bool = False) -> TrainState:
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=extra,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params)
        if ema else None,
    )


def make_train_step(model, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    axis_name: str = "data",
                    donate: bool = True,
                    ema_decay: Optional[float] = None,
                    ema_ramp: float = 2000.0) -> Callable:
    """Build the jitted DP train step.

    The returned ``train_step(state, images, targets, rng) ->
    (state, metrics)`` computes the mean loss over the global batch;
    with a mesh, inputs are sharded over ``axis_name`` and XLA derives
    the gradient all-reduce. With ``ema_decay`` set (and
    ``state.ema_params`` initialized), a per-step EMA of the params is
    maintained inside the same jitted program with the reference
    YOLO's warmup-ramped decay ``d = decay * (1 - exp(-step/ramp))``.
    """

    def step_fn(state: TrainState, images, targets, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params, **state.batch_stats}
            mutable = list(state.batch_stats.keys())
            out = model.apply(
                variables, images, targets, method=model.loss,
                rngs={"sampler": rng},
                mutable=mutable if mutable else [])
            losses, mutated = out if isinstance(out, tuple) else (out, {})
            new_extra = {**state.batch_stats, **dict(mutated)}
            total = sum(v for k, v in losses.items() if "loss" in k)
            return total, (losses, new_extra)

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            d = ema_decay * (1.0 - jnp.exp(
                -(state.step.astype(jnp.float32) + 1.0) / ema_ramp))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema_params, new_params)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt,
                               ema_params=new_ema)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    replicated, batch = shardings(mesh, axis_name)
    # sharding pytree prefixes: state/rng replicated, batch-leading
    # arrays (images + every target leaf) sharded over the data axis
    return jax.jit(
        step_fn,
        in_shardings=(replicated, batch, batch, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Optional[Mesh] = None,
                   axis_name: str = "data",
                   use_shard_map: bool = True) -> Callable:
    """Jitted inference step: (variables, images, targets) -> dense
    detections dict.

    With a mesh, the default is ``shard_map`` (each device runs the
    whole predict graph on its batch shard): unlike jit-GSPMD this
    composes with the Pallas RoIAlign kernel, which has no SPMD
    partitioning rule and would otherwise be replicated across chips.
    ``use_shard_map=False`` keeps the GSPMD path (XLA-op graphs only).
    """

    def eval_fn(variables, images, targets):
        return model.apply(variables, images, targets,
                           method=model.predict)

    if mesh is None:
        return jax.jit(eval_fn)
    replicated, batch = shardings(mesh, axis_name)
    if not use_shard_map:
        return jax.jit(eval_fn, in_shardings=(replicated, batch, batch),
                       out_shardings=batch)

    from jax.experimental.shard_map import shard_map

    # shard_map specs are per-leaf and fixed at trace time; targets may
    # carry non-batched leaves (scalars, per-run metadata) that must be
    # replicated rather than split. Build the specs lazily from the
    # actual targets structure and cache per (treedef, batched-mask).
    cache: dict = {}

    def call(variables, images, targets):
        bs = images.shape[0]
        leaves, treedef = jax.tree_util.tree_flatten(targets)
        batched = tuple(
            getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == bs
            for leaf in leaves)
        key = (treedef, batched)
        if key not in cache:
            t_specs = jax.tree_util.tree_unflatten(
                treedef, [P(axis_name) if b else P() for b in batched])
            t_shard = jax.tree_util.tree_unflatten(
                treedef, [batch if b else replicated for b in batched])
            mapped = shard_map(
                eval_fn, mesh=mesh,
                in_specs=(P(), P(axis_name), t_specs),
                out_specs=P(axis_name), check_rep=False)
            cache[key] = jax.jit(
                mapped, in_shardings=(replicated, batch, t_shard),
                out_shardings=batch)
        return cache[key](variables, images, targets)

    return call
