"""SPMD data-parallel training step.

Replaces the reference's two training paths — ``nn.DataParallel``
(train.py:173) and DDP+NCCL (distributed_train.py:201-369) — with ONE
jitted step over a device mesh:

  * the batch is sharded along the mesh ``data`` axis; parameters and
    optimizer state are replicated;
  * gradient all-reduce is implicit: XLA inserts the psum over ICI when
    the mean loss contracts the sharded batch dim (no DDP wrapper, no
    process groups, no barriers);
  * BatchNorm statistics are computed over the *global* logical batch
    inside jit — SyncBatchNorm semantics by construction (MODEL.SYNC_BN,
    ref models/build.py:69-70, is the natural default on TPU);
  * metric reduction (the reference's all_reduce of the confusion matrix,
    metrics.py:64-70) is just part of the same compiled program.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.loss import cross_entropy_loss
from ..models.metrics import confusion_matrix_update

Array = jnp.ndarray


class TrainState(struct.PyTreeNode):
    """Functional training state (params + BN stats + optimizer + rng)."""

    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, model, variables, tx, rng):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=rng,
            tx=tx,
            apply_fn=model.apply,
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_train_step(
    num_classes: int,
    ignore_index: int = 255,
    max_grad_norm: float = 0.0,
    freeze_bn_stats: bool = False,
    remat: bool = False,
    accum_steps: int = 1,
    augment: Optional[Callable] = None,
) -> Callable[[TrainState, Dict[str, Array]], Tuple[TrainState, Dict[str, Array]]]:
    """Build the fused train step (fwd + loss + bwd + update + metrics).

    The returned function is pure; jit it with sharded-batch in_shardings
    (see :func:`jit_train_step`) to get data parallelism.
    ``freeze_bn_stats`` keeps BatchNorm running statistics fixed — the
    eval-mode half of the reference's freeze_bn (ref core/nn/freezer.py:100-106).
    ``remat`` rematerializes the forward under the backward pass
    (jax.checkpoint): trades FLOPs for activation memory so large batches /
    resolutions fit HBM.
    ``accum_steps`` > 1 splits the batch into that many micro-batches,
    accumulates gradients over a lax.scan, and applies ONE optimizer
    update with the averaged gradient — emulating a batch that does not
    fit HBM (no reference equivalent; it trains what fits a 2080 Ti).
    The gradient equals the full-batch gradient exactly for BN-free
    models; with BatchNorm, batch statistics are micro-batch-local and
    running stats thread sequentially through the micro-batches (the
    same semantics as running the micro-batches as separate steps).
    ``TRAIN.BATCH_SIZE`` must be divisible by ``accum_steps``.
    ``augment``, when given, maps ``(rng, batch) -> batch`` INSIDE the
    step (see train/augment.py): the host then feeds raw uint8 batches
    and the random scale/crop/flip/normalize chain runs on-device.
    """

    def train_step(state: TrainState, batch: Dict[str, Array]):
        if augment is not None:
            rng, dropout_rng, aug_rng = jax.random.split(state.rng, 3)
            batch = augment(aug_rng, batch)
        else:
            rng, dropout_rng = jax.random.split(state.rng)

        def forward(params, stats, image, drng):
            return state.apply_fn(
                {"params": params, "batch_stats": stats},
                image,
                train=True,
                upsample_pred=True,
                mutable=["batch_stats"],
                rngs={"dropout": drng},
            )

        if remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params, stats, mb, drng):
            logits, mutated = forward(params, stats, mb["image"], drng)
            loss = cross_entropy_loss(logits, mb["label"], ignore_index=ignore_index)
            return loss, (logits, mutated["batch_stats"])

        if accum_steps == 1:
            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, dropout_rng)
            confusion = confusion_matrix_update(logits, batch["label"], num_classes)
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(
                    (accum_steps, x.shape[0] // accum_steps) + x.shape[1:]
                ),
                batch,
            )

            def body(carry, xs):
                stats, grad_sum, loss_sum, conf_sum = carry
                mb, idx = xs
                drng = jax.random.fold_in(dropout_rng, idx)
                (mloss, (logits, mstats)), mgrads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, stats, mb, drng)
                carry = (
                    mstats,
                    jax.tree.map(jnp.add, grad_sum, mgrads),
                    loss_sum + mloss,
                    conf_sum
                    + confusion_matrix_update(logits, mb["label"], num_classes),
                )
                return carry, None

            init = (
                state.batch_stats,
                jax.tree.map(jnp.zeros_like, state.params),
                jnp.zeros((), jnp.float32),
                jnp.zeros((num_classes, num_classes), jnp.float32),
            )
            (new_stats, grad_sum, loss_sum, confusion), _ = jax.lax.scan(
                body, init, (micro, jnp.arange(accum_steps))
            )
            grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
            loss = loss_sum / accum_steps

        if max_grad_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)

        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=state.batch_stats if freeze_bn_stats else new_stats,
            opt_state=opt_state,
            rng=rng,
        )
        metrics = {"loss": loss, "confusion": confusion}
        return new_state, metrics

    return train_step


def make_multi_train_step(
    num_classes: int,
    steps: int,
    ignore_index: int = 255,
    max_grad_norm: float = 0.0,
    freeze_bn_stats: bool = False,
    remat: bool = False,
    accum_steps: int = 1,
    augment: Optional[Callable] = None,
):
    """``steps`` train steps fused into ONE device dispatch via lax.scan.

    Dispatch overhead is per call and scales with the size of the argument
    tree (~hundreds of param/optimizer arrays); on the dev tunnel a single
    DeepLab step costs ~11 s of round-trip against ~51 ms of compute.
    Scanning K steps per dispatch amortizes that K-fold (measured 215x
    here) and also helps on directly-attached hardware.

    The input batch dict must carry a leading ``steps`` axis
    (e.g. image (K, B, H, W, 3)); each scan iteration consumes one slice,
    exactly equivalent to K sequential :func:`make_train_step` calls.
    Returns (state, {"loss": (K,), "confusion": (K, C, C)}).  The
    confusion stack is deliberately NOT summed in-jit: each per-step
    matrix is exact in float32 (counts <= B*H*W < 2^24), but a K-step sum
    of a dominant class can exceed the 2^24 exact-integer range — fold the
    stack into the host-side float64 accumulator instead.
    """
    step = make_train_step(
        num_classes,
        ignore_index=ignore_index,
        max_grad_norm=max_grad_norm,
        freeze_bn_stats=freeze_bn_stats,
        remat=remat,
        accum_steps=accum_steps,
        augment=augment,
    )

    def multi_step(state: TrainState, batches: Dict[str, Array]):
        def body(s, b):
            s, m = step(s, b)
            return s, m

        state, ms = jax.lax.scan(body, state, batches)
        return state, ms

    return multi_step


def jit_multi_train_step(multi_step: Callable, mesh: Mesh, axis: str = "data"):
    """jit with shardings: per-step batches split on ``axis`` (dim 1)."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(None, axis))
    return jax.jit(
        multi_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
    )


def make_per_device_bn_train_step(
    num_classes: int,
    mesh: Mesh,
    axis: str = "data",
    ignore_index: int = 255,
    max_grad_norm: float = 0.0,
    steps: int = 1,
    augment: Optional[Callable] = None,
):
    """Data-parallel train step with PER-DEVICE BatchNorm statistics.

    The reference's default (MODEL.SYNC_BN=False, ref models/build.py:69-70)
    normalizes each DDP replica with its local batch statistics.  Under
    plain jit-SPMD, BN sees the global batch (sync semantics), so this
    variant runs the forward/backward inside ``shard_map``: every device
    normalizes with its own shard's statistics, gradients/loss/metrics are
    psum'd exactly like DDP's all-reduce, and the stored running stats are
    the cross-device mean (deterministic, vs DDP's save-rank-0).

    Already jitted + sharded; call as ``step(state, sharded_batch)``.
    ``steps > 1`` scans that many steps per dispatch (see
    :func:`make_multi_train_step`); the batch dict then carries a leading
    ``steps`` axis and the returned loss is (steps,).
    """
    from jax import shard_map

    def _shard_body(state: TrainState, batch: Dict[str, Array]):
        if augment is not None:
            rng, base_dropout, aug_base = jax.random.split(state.rng, 3)
            # distinct augmentations per device shard, like DDP workers
            batch = augment(
                jax.random.fold_in(aug_base, jax.lax.axis_index(axis)), batch
            )
        else:
            rng, base_dropout = jax.random.split(state.rng)
        # distinct dropout mask per device, like independent DDP workers
        dropout_rng = jax.random.fold_in(base_dropout, jax.lax.axis_index(axis))

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                upsample_pred=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            local = cross_entropy_loss(logits, batch["label"], ignore_index=ignore_index)
            # pmean INSIDE the differentiated function: its transpose makes
            # the gradients the exact cross-replica mean regardless of
            # shard_map's implicit-psum semantics for replicated inputs
            # (jax >= 0.8 auto-psums cotangents of unvarying inputs, so a
            # manual pmean-after-grad would double-count by axis_size)
            loss = jax.lax.pmean(local, axis)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, local_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # DDP equivalences: metric sum, running-stat mean
        confusion = jax.lax.psum(
            confusion_matrix_update(logits, batch["label"], num_classes), axis
        )
        new_stats = jax.lax.pmean(local_stats, axis)

        if max_grad_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)

        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            rng=rng,
        )
        return new_state, {"loss": loss, "confusion": confusion}

    if steps > 1:

        def _multi_body(state: TrainState, batches: Dict[str, Array]):
            def body(s, b):
                s, m = _shard_body(s, b)
                return s, m

            state, ms = jax.lax.scan(body, state, batches)
            # per-step (K, C, C) confusion stack: summed on host in float64
            # (a K-step f32 sum can exceed the 2^24 exact-count range)
            return state, ms

        body_fn, batch_spec = _multi_body, P(None, axis)
    else:
        body_fn, batch_spec = _shard_body, P(axis)

    sharded = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded)


def make_eval_step(num_classes: int, ignore_index: int = 255):
    """Validation step: forward + loss + confusion matrix, no updates."""

    def eval_step(state: TrainState, batch: Dict[str, Array]):
        logits = state.apply_fn(
            state.variables, batch["image"], train=False, upsample_pred=True
        )
        loss = cross_entropy_loss(logits, batch["label"], ignore_index=ignore_index)
        return {
            "loss": loss,
            "confusion": confusion_matrix_update(logits, batch["label"], num_classes),
        }

    return eval_step


def jit_train_step(train_step: Callable, mesh: Mesh, axis: str = "data"):
    """jit with data-parallel shardings: batch split on ``axis``, state replicated."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))
    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
    )


def jit_spatial_train_step(
    train_step: Callable,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    spatial_axis: str = "spatial",
    steps_axis: bool = False,
):
    """jit a train step with image ROWS sharded over ``mesh[spatial_axis]``.

    Spatial (sequence-parallel analogue) training: the batch's H dimension
    is banded over the mesh in addition to (optionally) the batch dim over
    ``data_axis``.  GSPMD inserts the conv halo exchanges in BOTH the
    forward and the backward (transposed convs halo the cotangents), the
    BN batch statistics and the loss/metric contractions become partial
    sums + an ICI psum, and parameters/optimizer state stay replicated —
    so the step is numerically the single-device step up to float
    reassociation of the reductions (pinned in tests/test_spatial_train.py).

    Why: activation memory for DeepLab at train time scales with B*H*W
    while the parameter tree is ~50 MB — sharding H divides the activation
    footprint by the axis size, unlocking crop sizes / batch shapes a
    single chip's HBM cannot hold (the training-side counterpart of
    parallel/spatial_infer.py; no reference equivalent — DDP only
    replicates, ref distributed_train.py:201-369).

    Args:
        data_axis: mesh axis for the batch dim, or None for a pure-spatial
            mesh.
        steps_axis: the batch dict carries a leading K (steps-per-dispatch)
            axis, as in :func:`make_multi_train_step`; K stays unsharded.

    Works with the SyncBN/jit step only (global-batch BN statistics); the
    per-device-BN shard_map path has no spatial variant by design.

    .. warning:: every intermediate feature map must keep >= 1 row per
        spatial shard: image H must be >= backbone output_stride x
        axis size.  Below that, XLA GSPMD's backward for strided convs
        silently computes WRONG kernel gradients (measured: stride-2 3x3
        SAME conv, 8 rows over 8 devices -> forward exact, kernel grad
        38% wrong; at >= 1 row/shard everything is exact to ~1e-6 rel —
        see ROUND_NOTES.md "Spatial-sharded training").  The Trainer
        enforces this; direct callers must check it themselves.
    """
    replicated = NamedSharding(mesh, P())
    spec = (P(None, data_axis, spatial_axis) if steps_axis
            else P(data_axis, spatial_axis))
    batch_sharded = NamedSharding(mesh, spec)
    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
    )


def jit_spatial_eval_step(
    eval_step: Callable,
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    spatial_axis: str = "spatial",
):
    """Eval-step twin of :func:`jit_spatial_train_step`."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(data_axis, spatial_axis))
    return jax.jit(
        eval_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=replicated,
    )


def jit_eval_step(eval_step: Callable, mesh: Mesh, axis: str = "data"):
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))
    return jax.jit(
        eval_step,
        in_shardings=(replicated, batch_sharded),
        out_shardings=replicated,
    )
