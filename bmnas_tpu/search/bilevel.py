"""Bilevel (weights / architecture) training steps, jitted.

Rebuild of the reference training machinery:
  * weight step: train-phase per-batch Adam update with per-batch cosine LR
    (train_searchable/mmimdb.py:96-101, scheduler update :97-99);
  * arch step: first-order DARTS — a full forward/backward on a dev batch,
    Adam over arch params only, network-weight grads discarded
    (darts/architect.py:21-29);
  * the reference's exact BN-mode matrix: BN runs in TRAIN mode on both train
    and dev batches during search (train_searchable/mmimdb.py:50-56), and the
    dev metric forward happens *after* the arch update, updating BN stats a
    second time.

TPU-first notes:
  * each step is a single jitted function with donated state;
  * all shapes are static: the last (partial) batch of an epoch is padded to
    the full batch size and carries a ``mask`` row-validity vector — losses
    and metric counts are mask-weighted so the numbers match the reference's
    dynamic-batch semantics exactly;
  * metrics AND the running loss are accumulated on device (counts dicts);
    nothing crosses to the host per batch;
  * the scalar LR (host-computed, see search/scheduler.py) enters as a
    dynamic scalar argument so LR changes never retrigger compilation;
  * optimizers are optax chains matching torch.optim.Adam semantics (L2
    weight decay added to the gradient before the moment updates).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

Batch = Dict[str, jnp.ndarray]


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    arch: Any                      # arch-param pytree (None for found nets)
    opt_w: Any
    opt_arch: Any
    rng: jax.Array
    step: jnp.ndarray              # int32 scalar


def torch_adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam *direction* (unit LR) with torch-style L2-into-grad decay.

    The caller applies ``params -= eta * direction`` so a host-computed
    per-batch eta needs no optimizer-state surgery.
    """
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    return optax.chain(*txs)


def make_weight_optimizer(param_labels: Any, weight_decay: float
                          ) -> optax.GradientTransformation:
    """Adam over 'train'-labelled params; 'frozen' params get zero updates.

    Mirrors the reference's search-phase optimizer covering only
    ``central_params()`` — backbones excluded (mmimdb_darts_searchable.py:120-126).
    """
    return optax.multi_transform(
        {"train": torch_adam(weight_decay=weight_decay),
         "frozen": optax.set_to_zero()},
        param_labels,
    )


def make_arch_optimizer(lr: float, weight_decay: float
                        ) -> optax.GradientTransformation:
    """Adam(lr, betas=(0.5, 0.999), wd) over arch params
    (mmimdb_darts_searchable.py:32-33)."""
    return optax.chain(
        torch_adam(b1=0.5, b2=0.999, weight_decay=weight_decay),
        optax.scale(-lr),
    )


# Criteria ------------------------------------------------------------------
# Signature: (logits, labels, mask) -> scalar. ``mask`` is a (B,) row-validity
# vector; with a full mask these equal the torch criteria exactly.

def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    """torch BCEWithLogitsLoss (mean over all elements of the valid rows)."""
    per_row = optax.sigmoid_binary_cross_entropy(logits, labels).mean(axis=-1)
    return (per_row * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """torch CrossEntropyLoss with integer labels (masked mean)."""
    per_row = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return (per_row * mask).sum() / jnp.maximum(mask.sum(), 1.0)


@dataclasses.dataclass(frozen=True)
class StepFunctions:
    """Jitted step functions for one task model.

    weight_step(state, batch, eta) -> (state', counts)
    arch_step(state, batch)        -> (state', counts)   [search dev phase]
    arch_step_unrolled(state, dev_batch, train_batch, eta)
                                   -> (state', counts)   [--unrolled]
    eval_step(state, batch)        -> counts             [model.eval()]

    ``counts`` always contains 'loss_sum' (sum of per-sample losses) and
    'valid' (number of real rows) in addition to the task metric counts.
    """
    weight_step: Callable
    arch_step: Optional[Callable]
    eval_step: Callable
    arch_step_unrolled: Optional[Callable] = None
    # chunked variants (--steps_per_dispatch): one device dispatch runs k
    # sequential steps via lax.scan over batches stacked on a leading axis.
    # Semantically identical to k single-step calls (same carried state and
    # PRNG stream); exists to amortize host->device dispatch latency, which
    # dominates wall-clock when the per-step compute is small (batch 8
    # MM-IMDB ~2 ms/step vs ~100 ms dispatch RTT through a TPU relay).
    weight_step_many: Optional[Callable] = None
    arch_step_many: Optional[Callable] = None
    eval_step_many: Optional[Callable] = None


def build_step_functions(
    apply_fn: Callable,
    criterion: Callable,
    counts_fn: Callable,
    w_tx: optax.GradientTransformation,
    arch_tx: Optional[optax.GradientTransformation],
    donate: bool = True,
    frozen_prefixes: Tuple[str, ...] = (),
) -> StepFunctions:
    """Construct the three step functions.

    ``apply_fn(variables, batch, arch, train, rngs, mutable)`` must return
    ``logits`` (and the mutated variables dict when ``mutable`` is non-empty).
    ``counts_fn(logits, labels, mask)`` produces the on-device metric counts.

    ``frozen_prefixes``: top-level param subtrees the weight optimizer
    freezes (same names passed to ``make_param_labels``). When given, weight
    steps differentiate ONLY the trainable subtrees — the frozen backbones
    are closed over as constants, so XLA never builds their backward pass and
    never keeps their forward activations alive for it. Numerically identical
    to differentiating everything and masking the update (the frozen grads
    were discarded by ``set_to_zero``) — equivalence-tested in
    tests/test_bilevel.py::TestFrozenPartition — and it removes the backbone
    backward FLOPs plus the backward's activation-memory term of a
    search-phase step. (Not sufficient, on its own, to co-locate batch-96
    NTU search with the 8.4 GB dev-split HBM cache on a 16 GB chip: the
    backbone *forward* transients still peak too high — measured
    RESOURCE_EXHAUSTED with and without remat. Use --device_cache_budget_gb
    to keep oversized splits streaming.)

    For the unrolled (second-order) arch step the partition is also a
    semantic refinement: the virtual SGD step now moves only the params the
    real weight optimizer trains, where the full-gradient version moved the
    frozen backbones too — a trajectory real training can never take.
    """

    def _mask(batch):
        if "mask" in batch:
            return batch["mask"]
        return jnp.ones((batch["label"].shape[0],), jnp.float32)

    def _with_loss(counts, loss, mask):
        counts = dict(counts)
        counts["loss_sum"] = loss * mask.sum()
        counts["valid"] = mask.sum()
        return counts

    def _forward_train(params, batch_stats, arch, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = apply_fn(
            variables, batch, arch, True, {"dropout": rng}, ["batch_stats"]
        )
        return logits, mutated["batch_stats"]

    def _split_frozen(params):
        trainable = {k: v for k, v in params.items()
                     if k not in frozen_prefixes}
        frozen = {k: v for k, v in params.items() if k in frozen_prefixes}
        return trainable, frozen

    def weight_step(state: TrainState, batch: Batch, eta: jnp.ndarray):
        rng, step_rng = jax.random.split(state.rng)
        mask = _mask(batch)
        trainable, frozen = _split_frozen(state.params)

        def loss_fn(train_params):
            logits, new_bs = _forward_train(
                {**train_params, **frozen}, state.batch_stats, state.arch,
                batch, step_rng
            )
            return criterion(logits, batch["label"], mask), (logits, new_bs)

        (loss, (logits, new_bs)), g_train = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        # zeros for frozen subtrees keep the optimizer's full pytree
        # structure; their set_to_zero branch ignores them, so XLA removes
        # the zero arrays entirely
        grads = {**g_train,
                 **jax.tree_util.tree_map(jnp.zeros_like, frozen)}
        updates, new_opt_w = w_tx.update(grads, state.opt_w, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - eta * u, state.params, updates
        )
        counts = _with_loss(counts_fn(logits, batch["label"], mask), loss, mask)
        new_state = state.replace(
            params=new_params, batch_stats=new_bs, opt_w=new_opt_w,
            rng=rng, step=state.step + 1,
        )
        return new_state, counts

    def arch_step(state: TrainState, batch: Batch):
        """Search dev-phase batch: arch update then metric forward.

        Both forwards run in train mode (BN stats update twice), matching
        architect.step + the subsequent no-grad forward in the reference dev
        loop (train_searchable/mmimdb.py:77-105).
        """
        rng, k1, k2 = jax.random.split(state.rng, 3)
        mask = _mask(batch)

        def arch_loss(arch):
            logits, new_bs = _forward_train(
                state.params, state.batch_stats, arch, batch, k1
            )
            return criterion(logits, batch["label"], mask), new_bs

        (_, bs_after_arch), arch_grads = jax.value_and_grad(
            arch_loss, has_aux=True
        )(state.arch)
        arch_updates, new_opt_arch = arch_tx.update(
            arch_grads, state.opt_arch, state.arch
        )
        new_arch = optax.apply_updates(state.arch, arch_updates)

        # Metric forward with the UPDATED arch and BN stats (second BN update).
        logits, new_bs = _forward_train(
            state.params, bs_after_arch, new_arch, batch, k2
        )
        loss = criterion(logits, batch["label"], mask)
        counts = _with_loss(counts_fn(logits, batch["label"], mask), loss, mask)
        new_state = state.replace(
            arch=new_arch, opt_arch=new_opt_arch, batch_stats=new_bs, rng=rng,
        )
        return new_state, counts

    def arch_step_unrolled(state: TrainState, dev_batch: Batch,
                           train_batch: Batch, eta: jnp.ndarray):
        """Second-order DARTS arch update (the reference's vestigial
        ``--unrolled`` flag, main_darts_found_ntu.py:48; its only
        implementation lives in dead code, darts/train_search.py:151, as the
        original finite-difference approximation).

        Here the unrolled objective is differentiated EXACTLY: the virtual
        SGD step  w' = w - eta * grad_w L_train(w, alpha)  is inside the
        traced arch-loss, so jax.grad delivers the full second-order term
        (XLA composes the Hessian-vector product; no epsilon finite
        differences). The virtual step is plain SGD at the current network
        LR, per the DARTS paper's formulation.
        """
        rng, k0, k1, k2 = jax.random.split(state.rng, 4)
        dev_mask = _mask(dev_batch)
        train_mask = _mask(train_batch)
        trainable, frozen = _split_frozen(state.params)

        def arch_loss(arch):
            # virtual step moves ONLY the params the real weight optimizer
            # trains — frozen backbones get zero updates in real steps, so
            # the unrolled objective holds them fixed too (and their
            # backward/Hessian-vector product is never built)
            def train_loss(train_params):
                logits, _ = _forward_train(
                    {**train_params, **frozen}, state.batch_stats, arch,
                    train_batch, k0)
                return criterion(logits, train_batch["label"], train_mask)

            g_w = jax.grad(train_loss)(trainable)
            w_virtual = jax.tree_util.tree_map(
                lambda w, g: w - eta * g, trainable, g_w)
            logits, new_bs = _forward_train(
                {**w_virtual, **frozen}, state.batch_stats, arch,
                dev_batch, k1)
            return criterion(logits, dev_batch["label"], dev_mask), new_bs

        (_, bs_after_arch), arch_grads = jax.value_and_grad(
            arch_loss, has_aux=True)(state.arch)
        arch_updates, new_opt_arch = arch_tx.update(
            arch_grads, state.opt_arch, state.arch)
        new_arch = optax.apply_updates(state.arch, arch_updates)

        # Metric forward with the UPDATED arch (same dev-phase semantics as
        # the first-order step: real weights, second BN update).
        logits, new_bs = _forward_train(
            state.params, bs_after_arch, new_arch, dev_batch, k2)
        loss = criterion(logits, dev_batch["label"], dev_mask)
        counts = _with_loss(counts_fn(logits, dev_batch["label"], dev_mask),
                            loss, dev_mask)
        new_state = state.replace(
            arch=new_arch, opt_arch=new_opt_arch, batch_stats=new_bs, rng=rng,
        )
        return new_state, counts

    def eval_step(state: TrainState, batch: Batch):
        """model.eval(): running BN stats, no dropout, no updates."""
        mask = _mask(batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = apply_fn(variables, batch, state.arch, False, None, [])
        loss = criterion(logits, batch["label"], mask)
        return _with_loss(counts_fn(logits, batch["label"], mask), loss, mask)

    def weight_step_many(state: TrainState, batches: Batch,
                         etas: jnp.ndarray):
        """k weight steps in ONE dispatch. ``batches``: leading [k] axis on
        every field; ``etas``: (k,) per-batch LRs from the host scheduler."""
        def body(s, xs):
            b, eta = xs
            return weight_step(s, b, eta)

        state, counts = jax.lax.scan(body, state, (batches, etas))
        return state, jax.tree_util.tree_map(lambda x: x.sum(0), counts)

    def arch_step_many(state: TrainState, batches: Batch):
        def body(s, b):
            return arch_step(s, b)

        state, counts = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(lambda x: x.sum(0), counts)

    def eval_step_many(state: TrainState, batches: Batch):
        def body(carry, b):
            return carry, eval_step(state, b)

        _, counts = jax.lax.scan(body, 0, batches)
        return jax.tree_util.tree_map(lambda x: x.sum(0), counts)

    dn = (0,) if donate else ()
    return StepFunctions(
        weight_step=jax.jit(weight_step, donate_argnums=dn),
        arch_step=jax.jit(arch_step, donate_argnums=dn) if arch_tx is not None else None,
        eval_step=jax.jit(eval_step),
        arch_step_unrolled=(jax.jit(arch_step_unrolled, donate_argnums=dn)
                            if arch_tx is not None else None),
        weight_step_many=jax.jit(weight_step_many, donate_argnums=dn),
        arch_step_many=(jax.jit(arch_step_many, donate_argnums=dn)
                        if arch_tx is not None else None),
        eval_step_many=jax.jit(eval_step_many),
    )


def make_param_labels(params: Any, frozen_prefixes: Tuple[str, ...]) -> Any:
    """Label each top-level params subtree 'frozen' or 'train'.

    Backbone freezing contract: reference central_params() excludes backbone
    modules from the weight optimizer (mmimdb_darts_searchable.py:120-126,
    ntu_darts_searchable.py — same pattern).
    """
    return {
        k: jax.tree_util.tree_map(lambda _: "frozen", v)
        if k in frozen_prefixes
        else jax.tree_util.tree_map(lambda _: "train", v)
        for k, v in params.items()
    }


# ---------------------------------------------------------------------------
# Device-resident dataset stepping (--device_data_cache).
#
# For corpora that fit in HBM (MM-IMDB train split = 3.8 GB of bf16 images +
# text/labels), streaming batches host->device every epoch is pure waste —
# and catastrophic over a low-bandwidth link (the dev relay moves ~20 MB/s;
# 7.6 GB/epoch of images made the full search H2D-bound at ~6.8 min/epoch).
# Instead the whole split is uploaded ONCE and every step gathers its batch
# on device from tiny host-sent index arrays. Padded index rows are -1: the
# gather clips them to row 0 and the mask both zeroes the batch content and
# the loss/metric contribution, which reproduces the zero-padded-final-batch
# semantics of the streaming loader bit for bit.
# ---------------------------------------------------------------------------

def _gather_batch(cache: Batch, idx: jnp.ndarray) -> Batch:
    mask = (idx >= 0).astype(jnp.float32)
    safe = jnp.maximum(idx, 0)
    batch = {}
    for k, v in cache.items():
        rows = jnp.take(v, safe, axis=0)
        m = mask.reshape((-1,) + (1,) * (rows.ndim - 1)).astype(rows.dtype)
        batch[k] = rows * m
    batch["mask"] = mask
    return batch


def build_gather_step_functions(fns: StepFunctions,
                                batch_sharding=None) -> StepFunctions:
    """Wrap scanned step variants to source batches from a device cache.

    Returned functions' signatures:
      weight_step_many(state, cache, idxs (k,B) int32, etas (k,))
      arch_step_many(state, cache, idxs)
      eval_step_many(state, cache, idxs)
    ``cache`` is a non-donated device pytree with a leading sample axis.

    ``batch_sharding``: under --parallel the cache lives row-sharded over the
    1-D data mesh (``NamedSharding(mesh, P('data'))``). The global-index gather
    then crosses shards; GSPMD lowers it to shard-local masked gathers + an
    ICI all-reduce, and this constraint pins the gathered batch back to
    batch-sharded layout so the model step runs data-parallel (without it,
    propagation would replicate the batch and serialize the compute).
    """
    import jax as _jax

    weight_inner = fns.weight_step
    arch_inner = fns.arch_step
    eval_inner = fns.eval_step

    def _take(cache, idx):
        batch = _gather_batch(cache, idx)
        if batch_sharding is not None:
            batch = _jax.tree_util.tree_map(
                lambda x: _jax.lax.with_sharding_constraint(x, batch_sharding),
                batch)
        return batch

    def weight_step_many(state, cache, idxs, etas):
        def body(s, xs):
            idx, eta = xs
            return weight_inner(s, _take(cache, idx), eta)

        state, counts = _jax.lax.scan(body, state, (idxs, etas))
        return state, _jax.tree_util.tree_map(lambda x: x.sum(0), counts)

    def arch_step_many(state, cache, idxs):
        def body(s, idx):
            return arch_inner(s, _take(cache, idx))

        state, counts = _jax.lax.scan(body, state, idxs)
        return state, _jax.tree_util.tree_map(lambda x: x.sum(0), counts)

    def eval_step_many(state, cache, idxs):
        def body(carry, idx):
            return carry, eval_inner(state, _take(cache, idx))

        _, counts = _jax.lax.scan(body, 0, idxs)
        return _jax.tree_util.tree_map(lambda x: x.sum(0), counts)

    return StepFunctions(
        weight_step=fns.weight_step,
        arch_step=fns.arch_step,
        eval_step=fns.eval_step,
        arch_step_unrolled=fns.arch_step_unrolled,
        weight_step_many=jax.jit(weight_step_many, donate_argnums=(0,)),
        arch_step_many=(jax.jit(arch_step_many, donate_argnums=(0,))
                        if arch_inner is not None else None),
        eval_step_many=jax.jit(eval_step_many),
    )


# ---------------------------------------------------------------------------
# Device-resident FRAME POOL stepping (--device_data_cache, augmented train
# splits whose video transform is pure frame selection — NTU).
#
# The deterministic splits above cache final (B, F, H, W, C) clips. The NTU
# *train* split re-randomizes its temporal crop every epoch, but that crop
# only SELECTS frames (data/ntu.aug_crop_select): so the decoded frames live
# in HBM once — (N, F_pool, H, W, C), row-sharded over the data mesh under
# --parallel — and each step ships only (B,) sample indices, (B, F_out)
# frame indices and the small skeleton/label host fields. The device gathers
# pool[sample_idx][frame_idx] and normalizes as usual (uint8 pools keep the
# 4x-compressed pixels resident). Replaces the 4.5 GB/epoch uint8 video
# stream of a full-scale NTU search (main_darts_searchable_ntu.py:38-59)
# with ~220 MB/epoch of skeletons+indices.
# ---------------------------------------------------------------------------

def _gather_pool_batch(pool: jnp.ndarray, host: Batch, image_key: str) -> Batch:
    sidx = host["sample_idx"]
    fidx = host["frame_idx"]
    mask = (sidx >= 0).astype(jnp.float32)
    rows = jnp.take(pool, jnp.maximum(sidx, 0), axis=0)   # (B, F_pool, ...)
    ext = fidx.reshape(fidx.shape + (1,) * (rows.ndim - 2))
    frames = jnp.take_along_axis(rows, ext, axis=1)       # (B, F_out, ...)
    m = mask.reshape((-1,) + (1,) * (frames.ndim - 1)).astype(frames.dtype)
    batch = {k: v for k, v in host.items()
             if k not in ("sample_idx", "frame_idx")}
    batch[image_key] = frames * m
    return batch


def build_pool_step_functions(fns: StepFunctions, image_key: str = "image",
                              batch_sharding=None) -> StepFunctions:
    """Wrap the weight/eval steps to source pixels from a device frame pool.

    Returned signatures (``host`` batches carry skeleton/label/mask plus
    sample_idx (B,) and frame_idx (B, F_out) int32; padded rows sample_idx=-1):
      weight_step(state, pool, host, eta)
      weight_step_many(state, pool, hosts (k-stacked), etas (k,))
      eval_step(state, pool, host) / eval_step_many(state, pool, hosts)

    ``batch_sharding`` pins the gathered batch back to the data mesh under
    --parallel (same contract as build_gather_step_functions)."""
    weight_inner = fns.weight_step
    eval_inner = fns.eval_step

    def _take(pool, host):
        batch = _gather_pool_batch(pool, host, image_key)
        if batch_sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding),
                batch)
        return batch

    def weight_step(state, pool, host, eta):
        return weight_inner(state, _take(pool, host), eta)

    def weight_step_many(state, pool, hosts, etas):
        def body(s, xs):
            h, eta = xs
            return weight_inner(s, _take(pool, h), eta)

        state, counts = jax.lax.scan(body, state, (hosts, etas))
        return state, jax.tree_util.tree_map(lambda x: x.sum(0), counts)

    def eval_step(state, pool, host):
        return eval_inner(state, _take(pool, host))

    def eval_step_many(state, pool, hosts):
        def body(carry, h):
            return carry, eval_inner(state, _take(pool, h))

        _, counts = jax.lax.scan(body, 0, hosts)
        return jax.tree_util.tree_map(lambda x: x.sum(0), counts)

    return StepFunctions(
        weight_step=jax.jit(weight_step, donate_argnums=(0,)),
        arch_step=None,
        eval_step=jax.jit(eval_step),
        weight_step_many=jax.jit(weight_step_many, donate_argnums=(0,)),
        arch_step_many=None,
        eval_step_many=jax.jit(eval_step_many),
    )
