"""End-to-end train/eval drivers for classification and part segmentation.

Capability parity with the reference mains (main_cls_dgcnn.py,
main_cls_pointnet.py, main_partseg_dgcnn.py, main_partseg_pointnet.py):
same recipes, same checkpoint/resume/best semantics, same two-file logging
contract, same metrics — plus first-class KD (teacher preload + logit
distillation), which the reference's logs use but its shipped code lacks
(SURVEY.md §2.10).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from svnet_tpu import config, models, ops
from svnet_tpu.data import ModelNet40, ScanObjectNNCls, ShapeNetPart, Loader
from svnet_tpu.train import (
    cal_loss,
    cal_pointnet_loss,
    make_optimizer,
    accuracy,
    balanced_accuracy,
    shape_iou,
)
from svnet_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from svnet_tpu.train.logs import configure_logging
from svnet_tpu.train.steps import (
    TrainState, make_train_step, make_eval_step, make_recal_step,
)


def param_count_m(params) -> float:
    return sum(x.size for x in jax.tree.leaves(params)) / 1e6


def _weighted_loss(losses, counts) -> float:
    """Count-weighted mean of per-step device loss scalars, fetched in ONE
    device round trip (a float() per step costs a full dispatch-fetch sync
    — ≈26 ms each through the axon tunnel — and defeats async dispatch)."""
    w = jnp.asarray(counts, jnp.float32)
    return float(jnp.stack([jnp.asarray(l, jnp.float32) for l in losses]) @ w
                 / jnp.sum(w))


def _pick_loss(model_name: str):
    """T-Net models return (logits, trans_feat) and use the regularized loss
    (ref main_cls_pointnet.py:97-103)."""
    if model_name in ("original", "bipointnet"):
        return cal_pointnet_loss
    return cal_loss


def _build_cls_model(args, num_classes: int):
    kw = dict(num_classes=num_classes, k=args.k)
    if args.model == "svnet":
        kw["binary"] = args.binary
        if args.backbone == "dgcnn":
            kw["dropout"] = args.dropout
    if args.model == "vn":
        kw["pooling"] = args.pooling
    return models.get_model("cls", args.backbone, args.model, **kw)


def _build_pseg_model(args, num_part: int):
    kw = dict(num_part=num_part, k=args.k)
    if args.model == "svnet":
        kw["binary"] = args.binary
        if args.backbone == "dgcnn":
            kw["dropout"] = args.dropout
    if args.model == "vn":
        kw["pooling"] = args.pooling
    return models.get_model("partseg", args.backbone, args.model, **kw)


def _recipe(args) -> str:
    if args.backbone == "pointnet":
        return "pointnet_cls" if args.task == "cls" else "pointnet_partseg"
    return "dgcnn"


class _Distiller:
    """Optional knowledge distillation: a frozen FP teacher's logits guide
    the student via a KL term (T=4), the standard Hinton recipe. Enabled by
    --distill with --preload TEACHER_CKPT."""

    def __init__(self, model, variables, with_label: bool, temperature: float = 4.0):
        self.model = model
        self.variables = variables
        self.with_label = with_label
        self.T = temperature

    def loss(self, student_logits, points, label=None):
        args = (points, label) if self.with_label else (points,)
        t_out = self.model.apply(self.variables, *args, False)
        t_logits = t_out[0] if isinstance(t_out, tuple) else t_out
        t_logits = jax.lax.stop_gradient(t_logits)
        T = self.T
        p_t = jax.nn.softmax(t_logits / T, axis=-1)
        log_p_s = jax.nn.log_softmax(student_logits / T, axis=-1)
        return -(p_t * log_p_s).sum(axis=-1).mean() * (T * T)


def _merge_overlap(student, teacher):
    """Copy teacher leaves into the student tree where path+shape match.

    The binary student's tree is the FP teacher's plus binarization extras
    (beta / scale leaves) — those keep their fresh init. Used to start the
    KD student at the teacher (the BiPointNet-style recipe the reference's
    `*_kd_*` checkpoints imply; its training code is not shipped —
    /root/reference/scripts.sh:54-55 evals them only)."""
    from flax import traverse_util

    s = traverse_util.flatten_dict(student)
    t = traverse_util.flatten_dict(teacher)
    hits = 0
    for key, val in s.items():
        t_val = t.get(key)
        if t_val is not None and t_val.shape == val.shape:
            s[key] = t_val.astype(val.dtype)
            hits += 1
    return traverse_util.unflatten_dict(s), hits, len(s)


def _preload_weights(state, args, t_template, log_string):
    """Plain (non-distill) --preload: finetune initialization.

    Restores through a template shaped like the STUDENT state, so same-
    config preloads (binary -> binary knob-finetuning, FP -> FP) carry
    every leaf including the binarization extras; when the checkpoint's
    tree differs (an FP teacher preloaded into a binary student) it falls
    back to the FP-shaped ``t_template`` and merges the overlapping
    leaves, like --distill's kd-init does."""
    s_template = {
        "epoch": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "best_metric": 0.0,
    }
    try:
        ckpt = load_checkpoint(s_template, args.save_dir, test=args.preload)
        if ckpt is None:
            raise FileNotFoundError(f"--preload {args.preload} not found")
        state = state.replace(
            params=ckpt["params"], batch_stats=ckpt["batch_stats"]
        )
        log_string(f"preloaded weights from {args.preload}")
        return state
    except (ValueError, KeyError, TypeError):
        pass  # tree mismatch: fall back to the FP-shaped template
    ckpt = load_checkpoint(t_template, args.save_dir, test=args.preload)
    if ckpt is None:
        raise FileNotFoundError(f"--preload {args.preload} not found")
    new_p, hp, tp_n = _merge_overlap(state.params, ckpt["params"])
    new_b, hb, tb = _merge_overlap(state.batch_stats, ckpt["batch_stats"])
    state = state.replace(params=new_p, batch_stats=new_b)
    log_string(
        f"preloaded weights from {args.preload} "
        f"(overlap merge: {hp}/{tp_n} params, {hb}/{tb} batch_stats leaves)"
    )
    return state


def _setup_mesh(args, state):
    """Parallelism mesh (--dp x --tp): shard the state, return a batch
    sharding function. --dp is the TPU-native upgrade of the reference's
    nn.DataParallel (SURVEY.md §2.8/§5.8): XLA inserts psum for grads and
    global BN statistics over ICI. --tp (r4) column-shards the wide
    kernels (and their param-shaped optimizer moments) on the 'model'
    axis — Megatron-style tensor parallelism for the conv5/head linears,
    reachable from every driver."""
    dp = getattr(args, "dp", 1)
    tp = getattr(args, "tp", 1)
    if dp <= 1 and tp <= 1:
        return state, lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec as P

    from svnet_tpu import parallel

    assert args.batch_size % dp == 0, (args.batch_size, dp)
    mesh = parallel.make_mesh(dp * tp, data=dp, model=tp)
    rep = parallel.replicated(mesh)

    def rule(leaf):
        # same wide-kernel condition as parallel.shard_params_tp, applied
        # shape-wise so Adam/SGD moments shard consistently with params
        if (
            tp > 1
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[-1] >= 256
            and leaf.shape[-1] % tp == 0
        ):
            return NamedSharding(mesh, P(None, "model"))
        return rep

    state = jax.tree.map(lambda x: jax.device_put(x, rule(x)), state)

    def shard_batch(jb):
        return {
            key: jax.device_put(
                val, parallel.batch_sharding(mesh, jnp.ndim(val))
            )
            for key, val in jb.items()
        }

    return state, shard_batch


def _make_state(args, model, init_batch, steps_per_epoch, with_label=False):
    rng = jax.random.PRNGKey(args.seed)
    if with_label:
        variables = model.init(rng, init_batch["points"], init_batch["label"])
    else:
        variables = model.init(rng, init_batch["points"])
    tx = make_optimizer(
        binary=args.binary,
        lr=args.lr,
        epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
        momentum=args.momentum,
        weight_decay=args.wd,
        recipe=_recipe(args),
        opt=getattr(args, "opt", "auto"),
    )
    return TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )


def _apply_approx_knobs(args) -> None:
    """CLI -> config: approx-mode serving knobs (trace-time; the setters
    clear the jit cache)."""
    if getattr(args, "approx_fold", 0):
        config.set_approx_fold(args.approx_fold)
    if getattr(args, "approx_gather_bits", 0):
        config.set_approx_gather_bits(args.approx_gather_bits)
    if getattr(args, "fast_gather_bits", 0):
        config.set_fast_gather_bits(args.fast_gather_bits)
    if getattr(args, "graph_reuse", "none") != "none":
        config.set_graph_reuse(args.graph_reuse)
    if getattr(args, "reuse_k", 0):
        config.set_reuse_k(args.reuse_k)
    if getattr(args, "morton_entry", False):
        config.set_morton_entry(True)
    if getattr(args, "train_knobs", False):
        config.set_train_knobs(True)


def run_cls(args) -> Optional[float]:
    """Classification driver (ModelNet40 / ScanObjectNN)."""
    args.task = "cls"
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    _apply_approx_knobs(args)
    log_string = configure_logging(args.save_dir, "cls")
    epoch_string = configure_logging(args.save_dir, "cls", "log")
    epoch_string(str(vars(args)))

    if args.dataset == "modelnet40":
        ds_cls, num_classes = ModelNet40, 40
    elif args.dataset == "scanobjectnn":
        ds_cls, num_classes = ScanObjectNNCls, 15
    else:
        raise ValueError(f"unknown dataset {args.dataset!r}")

    model = _build_cls_model(args, num_classes)
    loss_fn = _pick_loss(args.model)

    if args.checkinfo:
        pts = jnp.zeros((2, args.num_points, 3))
        variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), pts))
        n = sum(np.prod(s.shape) for s in jax.tree.leaves(variables["params"]))
        print(f"Number of Parameters: {n / 1e6:.6f}M")
        return None

    train_set = ds_cls(
        num_points=args.num_points, data_dir=args.data_dir,
        partition="train", subset=args.subset, seed=args.seed,
    )
    test_set = ds_cls(
        num_points=args.num_points, data_dir=args.data_dir,
        partition="test", subset=args.subset, seed=args.seed + 1,
    )
    train_loader = Loader(
        train_set, args.batch_size, shuffle=True, drop_last=True,
        seed=args.seed, num_workers=getattr(args, "num_workers", 0),
    )
    test_loader = Loader(
        test_set, args.batch_size, shuffle=False, pad_last=True
    )
    log_string(
        f"trainloader: {len(train_set)}, test_loader: {len(test_set)}"
    )

    init_batch = next(iter(test_loader))
    state = _make_state(args, model, init_batch, len(train_loader))

    # KD: teacher preload / distillation
    distiller = None
    if getattr(args, "preload", None):
        teacher_model = _build_cls_model(_fp_copy(args), num_classes)
        # the restore template must be TEACHER-shaped: a binary student's
        # tree has extra leaves (beta/scale) the FP teacher checkpoint
        # lacks (found when distilling FP -> binary, round 2)
        t_shapes = jax.eval_shape(
            lambda: teacher_model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, args.num_points, 3), jnp.float32),
            )
        )
        t_zeros = jax.tree.map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype), t_shapes
        )
        t_template = {
            "epoch": 0,
            "params": t_zeros["params"],
            "batch_stats": t_zeros["batch_stats"],
            "best_metric": 0.0,
        }
        if getattr(args, "distill", False):
            t_ckpt = load_checkpoint(
                t_template, args.save_dir, test=args.preload
            )
            if t_ckpt is None:
                raise FileNotFoundError(f"--preload {args.preload} not found")
            distiller = _Distiller(
                teacher_model,
                {"params": t_ckpt["params"], "batch_stats": t_ckpt["batch_stats"]},
                with_label=False,
                temperature=getattr(args, "kd_t", 4.0),
            )
            log_string(
                f"KD teacher loaded from {args.preload} "
                f"(T={distiller.T}, alpha={getattr(args, 'kd_alpha', 0.5)})"
            )
            if getattr(args, "kd_init", True):
                new_p, hp, tp = _merge_overlap(state.params, t_ckpt["params"])
                new_b, hb, tb = _merge_overlap(
                    state.batch_stats, t_ckpt["batch_stats"]
                )
                state = state.replace(params=new_p, batch_stats=new_b)
                log_string(
                    f"KD student initialized from teacher "
                    f"({hp}/{tp} params, {hb}/{tb} batch_stats leaves)"
                )
        else:
            state = _preload_weights(state, args, t_template, log_string)

    # build steps (KD wraps the base step to add the teacher term).
    # The fused Pallas train forward (train/fused.py) replaces model.apply
    # for the binary SV-DGCNN flagship (config.fused_train).
    fused_apply = None
    if (
        config.fused_train != "off"
        and args.model == "svnet"
        and args.backbone == "dgcnn"
        and (config.fused_train == "on" or jax.default_backend() == "tpu")
    ):
        from svnet_tpu.train.fused import make_fused_train_apply

        fused_apply = make_fused_train_apply(
            num_classes, args.k, binary=args.binary,
            interpret=jax.default_backend() != "tpu",
            dropout=args.dropout,
        )
        log_string("fused Pallas train forward enabled")
    if distiller is None:
        train_step = jax.jit(
            make_train_step(model, loss_fn, rot=args.rot,
                            fused_apply=fused_apply)
        )
    else:
        train_step = jax.jit(
            _make_kd_train_step(model, loss_fn, distiller, rot=args.rot,
                                alpha=getattr(args, "kd_alpha", 0.5),
                                fused_apply=fused_apply)
        )
    eval_step = jax.jit(make_eval_step(model, loss_fn, rot_test=args.rot_test))
    recal_n = _resolve_recal_n(args)
    recal_step = None
    if recal_n:
        recal_step = jax.jit(
            make_recal_step(model, rot=args.rot, fused_apply=fused_apply)
        )
        log_string(f"BN re-estimation before eval: {recal_n} train batches")

    # resume / test
    template = {
        "epoch": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "best_metric": 0.0,
    }
    start_epoch, best_acc = 0, 0.0
    ckpt = load_checkpoint(
        template, args.save_dir, test=args.test,
        resume_from=args.resume_from, resume=args.resume,
    )
    if ckpt is not None:
        state = state.replace(params=ckpt["params"], batch_stats=ckpt["batch_stats"])
        if args.test is None:
            state = state.replace(opt_state=ckpt["opt_state"])
            start_epoch = ckpt["epoch"] + 1
            best_acc = ckpt["best_metric"]
        log_string("checkpoint loaded successfully")
    else:
        log_string("no checkpoint loaded")

    state, shard_batch = _setup_mesh(args, state)
    rng = jax.random.PRNGKey(args.seed + 123)

    if args.test is not None:
        if getattr(args, "fused", False) and args.model == "svnet":
            eval_step = _fused_cls_eval_step(args, state)
            log_string("evaluating with the fused Pallas engine")
        acc, avg_acc, loss = _eval_cls(
            eval_step, state, test_loader, rng, log_string, shard_batch
        )
        return acc

    save_id = None
    profiled = False
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        train_true, train_pred, losses, counts = [], [], [], []
        print_freq = max(len(train_loader) // 10, 1)
        for i, batch in enumerate(train_loader):
            rng, step_rng = jax.random.split(rng)
            jb = shard_batch({
                "points": jnp.asarray(batch["points"]),
                "target": jnp.asarray(batch["target"]),
            })
            if getattr(args, "profile_dir", None) and not profiled and i == 2:
                # trace a few warmed steps (post-compile) for jax.profiler
                with jax.profiler.trace(args.profile_dir):
                    state, loss, preds = train_step(state, jb, step_rng)
                    jax.block_until_ready(loss)
                profiled = True
                log_string(f"profiler trace written to {args.profile_dir}")
                continue
            state, loss, preds = train_step(state, jb, step_rng)
            # keep loss/preds on device: a float()/np.asarray() here costs a
            # full dispatch-fetch sync per step (≈26 ms through the axon
            # tunnel) and serializes JAX's async dispatch; fetch lazily at
            # print points and convert once per epoch.
            losses.append(loss)
            counts.append(batch["size"])
            train_true.append(batch["target"])
            train_pred.append(preds)
            if (i + 1) % print_freq == 0:
                run_loss = _weighted_loss(losses, counts)
                log_string(
                    f"EPOCH {epoch:03d}/{args.epochs:03d} Batch {i:05d}/"
                    f"{len(train_loader):05d}: Loss {run_loss:.8f}"
                )
        train_true = np.concatenate(train_true)
        train_pred = np.concatenate(jax.device_get(train_pred))
        train_loss = _weighted_loss(losses, counts)
        train_acc = accuracy(train_true, train_pred)
        train_avg = balanced_accuracy(train_true, train_pred)
        log_string(
            f"TRAIN: loss {train_loss:.6f}, acc {train_acc:.6f}, "
            f"avg acc {train_avg:.6f} ({time.time()-t0:.1f}s)"
        )

        rng, eval_rng = jax.random.split(rng)
        if recal_step is not None:
            rng, recal_rng = jax.random.split(rng)
            # re-estimated stats are adopted into the state: they are a
            # strictly fresher estimate of the current activation
            # distributions, and the saved checkpoint must carry stats
            # that match its eval metric
            state = _bn_reestimate(
                recal_step, state, train_loader, recal_rng, recal_n,
                shard_batch,
            )
        test_acc, test_avg, test_loss = _eval_cls(
            eval_step, state, test_loader, eval_rng, log_string, shard_batch
        )
        is_best = test_acc >= best_acc
        best_acc = max(best_acc, test_acc)
        save_id = save_checkpoint(
            {
                "epoch": epoch,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "best_metric": best_acc,
            },
            epoch,
            args.save_dir,
            is_best,
            save_id,
        )
        epoch_string(
            f"EPOCH {epoch:03d}/{args.epochs:03d} | Test: loss {test_loss:.6f}, "
            f"acc {test_acc:.6f}, avg acc {test_avg:.6f} | Train: loss "
            f"{train_loss:.6f}, acc {train_acc:.6f}, avg acc {train_avg:.6f} | "
            f"{time.strftime('%Y-%m-%d-%H-%M-%S')}"
        )
    return best_acc


def _resolve_recal_n(args) -> int:
    n = getattr(args, "bn_reestimate", -1)
    if n < 0:
        n = 60 if getattr(args, "binary", False) else 0
    return n


def _bn_reestimate(recal_step, state, train_loader, rng, n, shard_batch,
                   with_label=False):
    """Replace BN running stats with the arithmetic mean of per-batch
    statistics over n train batches at FIXED weights.

    Binary nets' activation distributions move with every weight-sign flip,
    so the EMA lags catastrophically mid-training (measured: an epoch-59
    binary checkpoint evals at 0.05 with its stored running stats and 0.77
    with re-estimated ones). Standard BNN practice; the reference never
    evals mid-training off running stats at high LR so never hits this.

    Each batch's statistics are recovered algebraically from one EMA step
    off the same base (new = m·old + (1−m)·batch with m = 0.9, the
    torch-parity momentum everywhere in this repo), then averaged — an
    unbiased estimator whose noise shrinks as 1/sqrt(n), unlike chaining
    the EMA (effective window ~10 batches regardless of n)."""
    bs0 = state.batch_stats
    acc = None
    done = 0
    while done < n:
        for batch in train_loader:
            if done >= n:
                break
            rng, r = jax.random.split(rng)
            jb = {"points": jnp.asarray(batch["points"])}
            if with_label:
                jb["label"] = jnp.asarray(batch["label"])
            new = recal_step(state.params, bs0, shard_batch(jb), r)
            batch_bs = jax.tree.map(
                lambda nw, od: 10.0 * nw - 9.0 * od, new, bs0
            )
            acc = (
                batch_bs if acc is None
                else jax.tree.map(jnp.add, acc, batch_bs)
            )
            done += 1
    mean = jax.tree.map(lambda a: a / done, acc)
    return state.replace(batch_stats=mean)


def _eval_cls(eval_step, state, test_loader, rng, log_string, shard_batch=lambda x: x):
    test_true, test_pred, losses, counts = [], [], [], []
    for batch in test_loader:
        rng, step_rng = jax.random.split(rng)
        jb = shard_batch({
            "points": jnp.asarray(batch["points"]),
            "target": jnp.asarray(batch["target"]),
        })
        loss, preds = eval_step(state.params, state.batch_stats, jb, step_rng)
        size = batch["size"]
        losses.append(loss)
        counts.append(size)
        test_true.append(batch["target"][:size])
        test_pred.append((preds, size))
    test_true = np.concatenate(test_true)
    test_pred = np.concatenate(
        [np.asarray(p)[:s] for p, s in jax.device_get(test_pred)]
    )
    test_loss = _weighted_loss(losses, counts)
    acc = accuracy(test_true, test_pred)
    avg = balanced_accuracy(test_true, test_pred)
    log_string(f"TEST: loss {test_loss:.6f}, acc {acc:.6f}, avg acc {avg:.6f}")
    return acc, avg, test_loss


def _make_kd_train_step(model, base_loss, distiller, rot, with_label=False,
                        alpha: float = 0.5, fused_apply=None):
    """Train step with KD: loss = (1-a)·CE + a·KL(teacher || student)."""

    def step(state, batch, rng):
        rot_rng, drop_rng = jax.random.split(rng)
        points = ops.apply_rotation_aug(rot_rng, batch["points"], rot)

        def loss_wrapped(params):
            if fused_apply is not None:
                f_args = (
                    (points, batch["label"]) if with_label else (points,)
                )
                outputs, new_stats = fused_apply(
                    params, state.batch_stats, *f_args, drop_rng
                )
            else:
                args_ = (points, batch["label"]) if with_label else (points,)
                outputs, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    *args_,
                    True,
                    mutable=["batch_stats"],
                    rngs={"dropout": drop_rng},
                )
                new_stats = updates["batch_stats"]
            logits = outputs[0] if isinstance(outputs, tuple) else outputs
            ce = base_loss(outputs, batch["target"])
            kd = distiller.loss(
                logits, points, batch.get("label") if with_label else None
            )
            return (1 - alpha) * ce + alpha * kd, (outputs, new_stats)

        (loss, (outputs, new_stats)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        logits = outputs[0] if isinstance(outputs, tuple) else outputs
        return new_state, loss, jnp.argmax(logits, axis=-1)

    return step


def _fused_cls_eval_step(args, state):
    """--test evaluation through the fused Pallas engine (--fused)."""
    from svnet_tpu.infer import SVDGCNNClsEngine, SVPointNetClsEngine

    engine_cls = (
        SVDGCNNClsEngine if args.backbone == "dgcnn" else SVPointNetClsEngine
    )
    eng = engine_cls(
        {"params": state.params, "batch_stats": state.batch_stats},
        k=args.k, binary=args.binary,
        mode=getattr(args, "engine_mode", "exact"),
    )

    @jax.jit
    def step(params, batch_stats, batch, rng):
        pts = ops.apply_rotation_aug(rng, batch["points"], args.rot_test)
        logits = eng._forward(pts)
        loss = cal_loss(logits, batch["target"])
        return loss, jnp.argmax(logits, axis=-1)

    return step


def _fused_pseg_eval_step(args, state):
    from svnet_tpu.infer import SVDGCNNPsegEngine

    eng = SVDGCNNPsegEngine(
        {"params": state.params, "batch_stats": state.batch_stats},
        k=args.k, binary=args.binary,
        mode=getattr(args, "engine_mode", "exact"),
    )

    @jax.jit
    def step(params, batch_stats, batch, rng):
        pts = ops.apply_rotation_aug(rng, batch["points"], args.rot_test)
        logits = eng._forward(pts, batch["label"])
        loss = cal_loss(logits, batch["target"], smoothing=args.smoothing)
        return loss, jnp.argmax(logits, axis=-1)

    return step


def _fp_copy(args):
    import copy

    fp = copy.copy(args)
    fp.binary = False
    return fp


def run_partseg(args) -> Optional[float]:
    """Part segmentation driver (ShapeNetPart)."""
    args.task = "partseg"
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    _apply_approx_knobs(args)
    log_string = configure_logging(args.save_dir, "partseg")
    epoch_string = configure_logging(args.save_dir, "partseg", "log")
    epoch_string(str(vars(args)))

    model = _build_pseg_model(args, num_part=50)

    def seg_loss(outputs, target):
        logits = outputs[0] if isinstance(outputs, tuple) else outputs
        base = cal_loss(logits, target, smoothing=args.smoothing)
        if isinstance(outputs, tuple):
            from svnet_tpu.train.losses import feature_transform_regularizer

            base = base + 0.001 * feature_transform_regularizer(outputs[1])
        return base

    if args.checkinfo:
        pts = jnp.zeros((2, args.num_points, 3))
        lab = jnp.zeros((2, 16))
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), pts, lab)
        )
        n = sum(np.prod(s.shape) for s in jax.tree.leaves(variables["params"]))
        print(f"Number of Parameters: {n / 1e6:.6f}M")
        return None

    train_set = ShapeNetPart(
        num_points=args.num_points, data_dir=args.data_dir,
        partition="trainval", class_choice=args.class_choice, seed=args.seed,
    )
    test_set = ShapeNetPart(
        num_points=args.num_points, data_dir=args.data_dir,
        partition="test", class_choice=args.class_choice, seed=args.seed + 1,
    )
    train_loader = Loader(
        train_set, args.batch_size, shuffle=True, drop_last=True,
        seed=args.seed, num_workers=getattr(args, "num_workers", 0),
    )
    test_loader = Loader(test_set, args.batch_size, shuffle=False, pad_last=True)
    log_string(f"trainloader: {len(train_set)}, test_loader: {len(test_set)}")

    init_batch = next(iter(test_loader))
    state = _make_state(args, model, init_batch, len(train_loader), with_label=True)

    # KD: teacher preload / distillation (mirrors the cls driver)
    distiller = None
    if getattr(args, "preload", None):
        teacher_model = _build_pseg_model(_fp_copy(args), num_part=50)
        # teacher-shaped restore template (same fix as the cls driver: a
        # binary student's tree has extra beta/scale leaves the FP teacher
        # checkpoint lacks)
        t_shapes = jax.eval_shape(
            lambda: teacher_model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, args.num_points, 3), jnp.float32),
                jnp.zeros((1, 16), jnp.float32),
            )
        )
        t_zeros = jax.tree.map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype), t_shapes
        )
        t_template = {
            "epoch": 0,
            "params": t_zeros["params"],
            "batch_stats": t_zeros["batch_stats"],
            "best_metric": 0.0,
        }
        if getattr(args, "distill", False):
            t_ckpt = load_checkpoint(
                t_template, args.save_dir, test=args.preload
            )
            if t_ckpt is None:
                raise FileNotFoundError(f"--preload {args.preload} not found")
            distiller = _Distiller(
                teacher_model,
                {"params": t_ckpt["params"], "batch_stats": t_ckpt["batch_stats"]},
                with_label=True,
                temperature=getattr(args, "kd_t", 4.0),
            )
            log_string(
                f"KD teacher loaded from {args.preload} "
                f"(T={distiller.T}, alpha={getattr(args, 'kd_alpha', 0.5)})"
            )
            if getattr(args, "kd_init", True):
                new_p, hp, tp = _merge_overlap(state.params, t_ckpt["params"])
                new_b, hb, tb = _merge_overlap(
                    state.batch_stats, t_ckpt["batch_stats"]
                )
                state = state.replace(params=new_p, batch_stats=new_b)
                log_string(
                    f"KD student initialized from teacher "
                    f"({hp}/{tp} params, {hb}/{tb} batch_stats leaves)"
                )
        else:
            state = _preload_weights(state, args, t_template, log_string)

    # The fused Pallas train forward (train/fused.py) replaces model.apply
    # for the binary SV-DGCNN partseg flagship (config.fused_train) — same
    # gating as the cls driver.
    fused_apply = None
    if (
        config.fused_train != "off"
        and args.model == "svnet"
        and args.backbone == "dgcnn"
        and (config.fused_train == "on" or jax.default_backend() == "tpu")
    ):
        from svnet_tpu.train.fused import make_fused_train_apply_pseg

        fused_apply = make_fused_train_apply_pseg(
            50, args.k, binary=args.binary,
            interpret=jax.default_backend() != "tpu",
            dropout=args.dropout,
        )
        log_string("fused Pallas train forward enabled")
    if distiller is None:
        train_step = jax.jit(
            make_train_step(model, seg_loss, rot=args.rot, with_label=True,
                            fused_apply=fused_apply)
        )
    else:
        train_step = jax.jit(
            _make_kd_train_step(
                model, seg_loss, distiller, rot=args.rot, with_label=True,
                alpha=getattr(args, "kd_alpha", 0.5),
                fused_apply=fused_apply,
            )
        )
    eval_step = jax.jit(
        make_eval_step(model, seg_loss, rot_test=args.rot_test, with_label=True)
    )
    recal_n = _resolve_recal_n(args)
    recal_step = None
    if recal_n:
        recal_step = jax.jit(
            make_recal_step(model, rot=args.rot, with_label=True,
                            fused_apply=fused_apply)
        )
        log_string(f"BN re-estimation before eval: {recal_n} train batches")

    template = {
        "epoch": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "best_metric": 0.0,
    }
    start_epoch, best_iou = 0, 0.0
    ckpt = load_checkpoint(
        template, args.save_dir, test=args.test,
        resume_from=args.resume_from, resume=args.resume,
    )
    if ckpt is not None:
        state = state.replace(params=ckpt["params"], batch_stats=ckpt["batch_stats"])
        if args.test is None:
            state = state.replace(opt_state=ckpt["opt_state"])
            start_epoch = ckpt["epoch"] + 1
            best_iou = ckpt["best_metric"]
        log_string("checkpoint loaded successfully")
    else:
        log_string("no checkpoint loaded")

    state, shard_batch = _setup_mesh(args, state)
    rng = jax.random.PRNGKey(args.seed + 123)

    if args.test is not None:
        if (
            getattr(args, "fused", False)
            and args.model == "svnet"
            and args.backbone == "dgcnn"
        ):
            eval_step = _fused_pseg_eval_step(args, state)
            log_string("evaluating with the fused Pallas engine")
        iou, acc, loss = _eval_pseg(
            eval_step, state, test_loader, rng, log_string, shard_batch
        )
        return iou

    save_id = None
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses, counts = [], []
        accs = []
        print_freq = max(len(train_loader) // 10, 1)
        for i, batch in enumerate(train_loader):
            rng, step_rng = jax.random.split(rng)
            jb = shard_batch({
                "points": jnp.asarray(batch["points"]),
                "target": jnp.asarray(batch["seg"]),
                "label": jnp.asarray(batch["label"]),
            })
            state, loss, preds = train_step(state, jb, step_rng)
            # device-resident accumulation: see the cls loop / _weighted_loss
            losses.append(loss)
            counts.append(batch["size"])
            accs.append(jnp.mean(preds == jb["target"]))
            if (i + 1) % print_freq == 0:
                run_loss = _weighted_loss(losses, counts)
                log_string(
                    f"EPOCH {epoch:03d}/{args.epochs:03d} Batch {i:05d}/"
                    f"{len(train_loader):05d}: Loss {run_loss:.8f}"
                )
        train_loss = _weighted_loss(losses, counts)
        train_pacc = float(jnp.mean(jnp.stack(accs)))
        log_string(
            f"TRAIN: loss {train_loss:.6f}, point acc {train_pacc:.6f} "
            f"({time.time()-t0:.1f}s)"
        )

        rng, eval_rng = jax.random.split(rng)
        if recal_step is not None:
            rng, recal_rng = jax.random.split(rng)
            state = _bn_reestimate(
                recal_step, state, train_loader, recal_rng, recal_n,
                shard_batch, with_label=True,
            )
        test_iou, test_acc, test_loss = _eval_pseg(
            eval_step, state, test_loader, eval_rng, log_string, shard_batch
        )
        is_best = test_iou >= best_iou
        best_iou = max(best_iou, test_iou)
        save_id = save_checkpoint(
            {
                "epoch": epoch,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "best_metric": best_iou,
            },
            epoch,
            args.save_dir,
            is_best,
            save_id,
        )
        epoch_string(
            f"EPOCH {epoch:03d}/{args.epochs:03d} | Test: loss {test_loss:.6f}, "
            f"iou {test_iou:.6f}, acc {test_acc:.6f} | Train: loss "
            f"{train_loss:.6f} | {time.strftime('%Y-%m-%d-%H-%M-%S')}"
        )
    return best_iou


def _eval_pseg(eval_step, state, test_loader, rng, log_string, shard_batch=lambda x: x):
    all_pred, all_seg, all_cat = [], [], []
    losses, counts = [], []
    for batch in test_loader:
        rng, step_rng = jax.random.split(rng)
        jb = shard_batch({
            "points": jnp.asarray(batch["points"]),
            "target": jnp.asarray(batch["seg"]),
            "label": jnp.asarray(batch["label"]),
        })
        loss, preds = eval_step(state.params, state.batch_stats, jb, step_rng)
        size = batch["size"]
        losses.append(loss)
        counts.append(size)
        all_pred.append((preds, size))
        all_seg.append(batch["seg"][:size])
        all_cat.append(batch["category"][:size])
    pred = np.concatenate(
        [np.asarray(p)[:s] for p, s in jax.device_get(all_pred)]
    )
    seg = np.concatenate(all_seg)
    cat = np.concatenate(all_cat)
    ious = shape_iou(pred, seg, cat)
    iou = float(np.mean(ious))
    acc = float((pred == seg).mean())
    loss = _weighted_loss(losses, counts)
    log_string(f"TEST: loss {loss:.6f}, iou {iou:.6f}, point acc {acc:.6f}")
    return iou, acc, loss


def run_semseg(args) -> Optional[float]:
    """Semantic segmentation driver (S3DIS, 13 classes).

    The reference ships the S3DIS dataset (data.py:342-360) and a semseg
    model (BasicBiPointNetSemSeg) but no driver — this completes that
    dangling capability with the same loop/checkpoint/logging contracts.
    """
    from svnet_tpu.data import S3DIS

    args.task = "semseg"
    log_string = configure_logging(args.save_dir, "semseg")
    epoch_string = configure_logging(args.save_dir, "semseg", "log")
    epoch_string(str(vars(args)))

    model = models.BiPointNet_SEMSEG(num_classes=13)
    if args.rot != "aligned" or args.rot_test != "aligned":
        # S3DIS rooms carry 9 features (xyz + rgb + normalized coords);
        # whole-room rotation augmentation is not meaningful there
        raise ValueError("semseg supports --rot/--rot-test aligned only")

    def seg_loss(outputs, target):
        logits, trans_feat = outputs
        from svnet_tpu.train.losses import feature_transform_regularizer

        return cal_loss(logits, target, smoothing=args.smoothing) + (
            0.001 * feature_transform_regularizer(trans_feat)
        )

    train_set = S3DIS(
        num_points=args.num_points, data_dir=args.data_dir,
        partition="train", test_area=args.test_area, seed=args.seed,
    )
    test_set = S3DIS(
        num_points=args.num_points, data_dir=args.data_dir,
        partition="test", test_area=args.test_area, seed=args.seed + 1,
    )
    train_loader = Loader(
        train_set, args.batch_size, shuffle=True, drop_last=True,
        seed=args.seed, num_workers=getattr(args, "num_workers", 0),
    )
    test_loader = Loader(test_set, args.batch_size, shuffle=False, pad_last=True)
    log_string(f"train rooms: {len(train_set)}, test rooms: {len(test_set)}")

    init_batch = next(iter(test_loader))
    rng0 = jax.random.PRNGKey(args.seed)
    variables = model.init(rng0, jnp.asarray(init_batch["points"]))
    tx = make_optimizer(
        binary=True, lr=args.lr, epochs=args.epochs,
        steps_per_epoch=max(len(train_loader), 1),
        momentum=args.momentum, weight_decay=args.wd, recipe="dgcnn",
    )
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )

    train_step = jax.jit(make_train_step(model, seg_loss, rot=args.rot))
    eval_step = jax.jit(make_eval_step(model, seg_loss, rot_test=args.rot_test))

    template = {
        "epoch": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "best_metric": 0.0,
    }
    start_epoch, best_acc = 0, 0.0
    ckpt = load_checkpoint(
        template, args.save_dir, test=args.test,
        resume_from=args.resume_from, resume=args.resume,
    )
    if ckpt is not None:
        state = state.replace(params=ckpt["params"], batch_stats=ckpt["batch_stats"])
        if args.test is None:
            state = state.replace(opt_state=ckpt["opt_state"])
            start_epoch = ckpt["epoch"] + 1
            best_acc = ckpt["best_metric"]
        log_string("checkpoint loaded successfully")

    state, shard_batch = _setup_mesh(args, state)
    rng = jax.random.PRNGKey(args.seed + 123)

    def evaluate(rng):
        preds, segs, losses, counts = [], [], [], []
        for batch in test_loader:
            rng, sk = jax.random.split(rng)
            jb = shard_batch({
                "points": jnp.asarray(batch["points"]),
                "target": jnp.asarray(batch["target"]),
            })
            loss, pr = eval_step(state.params, state.batch_stats, jb, sk)
            size = batch["size"]
            losses.append(loss)
            counts.append(size)
            preds.append((pr, size))
            segs.append(batch["target"][:size])
        pred = np.concatenate(
            [np.asarray(p)[:s] for p, s in jax.device_get(preds)]
        )
        seg = np.concatenate(segs)
        acc = float((pred == seg).mean())
        # mean IoU over the 13 classes present in the ground truth
        ious = []
        for c in np.unique(seg):
            inter = np.logical_and(pred == c, seg == c).sum()
            union = np.logical_or(pred == c, seg == c).sum()
            ious.append(inter / union if union else 1.0)
        miou = float(np.mean(ious))
        loss = _weighted_loss(losses, counts)
        log_string(f"TEST: loss {loss:.6f}, point acc {acc:.6f}, mIoU {miou:.6f}")
        return acc, miou, loss

    if args.test is not None:
        acc, miou, _ = evaluate(rng)
        return miou

    save_id = None
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses, counts = [], []
        for batch in train_loader:
            rng, sk = jax.random.split(rng)
            jb = shard_batch({
                "points": jnp.asarray(batch["points"]),
                "target": jnp.asarray(batch["target"]),
            })
            state, loss, _ = train_step(state, jb, sk)
            losses.append(loss)
            counts.append(batch["size"])
        train_loss = (
            _weighted_loss(losses, counts) if counts else 0.0
        )
        log_string(f"TRAIN: loss {train_loss:.6f} ({time.time()-t0:.1f}s)")
        rng, ek = jax.random.split(rng)
        acc, miou, test_loss = evaluate(ek)
        is_best = acc >= best_acc
        best_acc = max(best_acc, acc)
        save_id = save_checkpoint(
            {
                "epoch": epoch,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "best_metric": best_acc,
            },
            epoch, args.save_dir, is_best, save_id,
        )
        epoch_string(
            f"EPOCH {epoch:03d}/{args.epochs:03d} | Test: loss {test_loss:.6f}, "
            f"acc {acc:.6f}, miou {miou:.6f} | Train: loss {train_loss:.6f} | "
            f"{time.strftime('%Y-%m-%d-%H-%M-%S')}"
        )
    return best_acc
