"""The training stack actually learns: SV-PointNet separates synthetic
geometric shape classes (sphere / cube-surface / thin disk) well above
chance in a few dozen steps, under rotation augmentation — exercising the
optimizer recipe, BN train mode, dropout rng, and the invariant architecture
end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnet_tpu import models
from svnet_tpu.train import cal_loss, make_optimizer
from svnet_tpu.train.steps import TrainState, make_eval_step, make_train_step

pytestmark = pytest.mark.slow  # interpret-mode/oracle test: minutes on 1 CPU

N = 64


def _clouds(rng, n_per_class):
    """Three rotation-invariant-distinguishable shapes."""
    clouds, labels = [], []
    for i in range(n_per_class):
        # sphere surface
        v = rng.standard_normal((N, 3))
        clouds.append(v / np.linalg.norm(v, axis=1, keepdims=True))
        labels.append(0)
        # cube surface
        u = rng.uniform(-1, 1, (N, 3))
        ax = rng.integers(0, 3, N)
        sgn = rng.choice([-1.0, 1.0], N)
        u[np.arange(N), ax] = sgn
        clouds.append(u)
        labels.append(1)
        # thin disk
        d = rng.standard_normal((N, 3)) * np.array([1.0, 1.0, 0.02])
        clouds.append(d)
        labels.append(2)
    return (
        np.stack(clouds).astype(np.float32),
        np.asarray(labels, dtype=np.int64),
    )


def test_svnet_pointnet_learns_shapes():
    rng = np.random.default_rng(0)
    x_train, y_train = _clouds(rng, 40)  # 120 clouds
    x_test, y_test = _clouds(rng, 10)  # 30 clouds

    model = models.SV_PointNet_CLS(num_classes=3, k=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_train[:2]))
    B = 24
    steps_per_epoch = len(x_train) // B
    tx = make_optimizer(
        binary=False, lr=1e-3, epochs=10,
        steps_per_epoch=steps_per_epoch, recipe="pointnet_cls",
    )
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    train_step = jax.jit(make_train_step(model, cal_loss, rot="so3"))
    eval_step = jax.jit(make_eval_step(model, cal_loss, rot_test="so3"))

    key = jax.random.PRNGKey(1)
    order = np.arange(len(x_train))
    losses = []
    for epoch in range(20):
        rng.shuffle(order)
        for s in range(steps_per_epoch):
            idx = order[s * B : (s + 1) * B]
            batch = {
                "points": jnp.asarray(x_train[idx]),
                "target": jnp.asarray(y_train[idx]),
            }
            key, sk = jax.random.split(key)
            state, loss, _ = train_step(state, batch, sk)
            losses.append(float(loss))

    # loss decreased materially
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.2, (
        losses[:5], losses[-5:],
    )

    # accuracy well above 1/3 chance, under random so3 test rotation
    _, preds = eval_step(
        state.params,
        state.batch_stats,
        {"points": jnp.asarray(x_test), "target": jnp.asarray(y_test)},
        jax.random.PRNGKey(2),
    )
    acc = float((np.asarray(preds) == y_test).mean())
    assert acc >= 0.8, acc
