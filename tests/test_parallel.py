"""Parallelism tests on the 8-device CPU mesh: local vs global
contrastive scope, gradient allreduce equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from locov_tpu.parallel import (get_mesh, make_train_step, shard_batch,
                                batch_sharded, replicated)


class ToyContrastive:
    """Minimal model with reference-style (outputs, losses) contract and
    a batch-coupled (contrastive-like) loss so local vs global scope
    give DIFFERENT losses but comparable grads."""

    def apply(self, params, batch, class_emb, rng, deterministic=True,
              method=None, rngs=None):
        x = batch["x"]  # [B, D]
        emb = x @ params["params"]["w"]  # [B, D]
        # BxB contrastive: logsoftmax over the batch
        sim = emb @ emb.T
        loss = -jnp.diagonal(jax.nn.log_softmax(sim, axis=1)).mean()
        return {"acc": (sim.argmax(1) == jnp.arange(x.shape[0])).mean()
                }, {"con_loss": loss}

    @property
    def losses(self):
        return "losses"


class _Opt:
    def init(self, params):
        return {}

    def update(self, grads, state, params):
        return jax.tree.map(lambda g: -0.1 * g, grads), state


def _setup():
    mesh = get_mesh()
    rng = np.random.RandomState(0)
    params = {"params": {"w": jnp.array(rng.randn(4, 4),
                                        jnp.float32)}}
    batch = {"x": jnp.array(rng.randn(8, 4), jnp.float32)}
    return mesh, params, batch


def test_local_vs_global_scope_semantics():
    mesh, params, batch = _setup()
    model, opt = ToyContrastive(), _Opt()
    key = jax.random.PRNGKey(0)
    ce = jnp.zeros((1,))

    step_local = make_train_step(model, opt, mesh,
                                 contrastive_scope="local")
    step_global = make_train_step(model, opt, mesh,
                                  contrastive_scope="global")
    sb = shard_batch(batch, mesh)
    # the train step donates params/opt_state: hand each call its own
    # copy (production code always rebinds params = step(params, ...))
    _, _, m_local = step_local(jax.tree.map(jnp.copy, params), {}, sb,
                               ce, key)
    _, _, m_global = step_global(jax.tree.map(jnp.copy, params), {}, sb,
                                 ce, key)
    # local: each device scores 1 candidate -> log_softmax of 1x1 = 0
    assert abs(float(m_local["con_loss"])) < 1e-6
    # global: 8x8 contrastive -> strictly positive loss
    assert float(m_global["con_loss"]) > 0.1


def test_local_grads_equal_single_device_mean():
    """pmean of per-shard grads == grads of mean-of-per-shard losses
    computed on one device."""
    mesh, params, batch = _setup()
    model, opt = ToyContrastive(), _Opt()
    key = jax.random.PRNGKey(0)
    ce = jnp.zeros((1,))
    step = make_train_step(model, opt, mesh, contrastive_scope="local")
    w_before = np.asarray(params["params"]["w"])  # step donates params
    new_params, _, metrics = step(params, {}, shard_batch(batch, mesh),
                                  ce, key)

    # reference computation: per-device (B=1) loss is 0 everywhere, so
    # grads must be 0 and params unchanged
    np.testing.assert_allclose(np.asarray(new_params["params"]["w"]),
                               w_before, atol=1e-6)


def test_global_step_updates_params():
    mesh, params, batch = _setup()
    model, opt = ToyContrastive(), _Opt()
    step = make_train_step(model, opt, mesh, contrastive_scope="global")
    w_before = np.asarray(params["params"]["w"])  # step donates params
    new_params, _, _ = step(params, {}, shard_batch(batch, mesh),
                            jnp.zeros((1,)), jax.random.PRNGKey(0))
    assert float(jnp.abs(new_params["params"]["w"]
                         - jnp.asarray(w_before)).sum()) > 1e-6


class _ToyL2:
    """Per-sample L2 loss: NONZERO per-device gradients even at local
    batch 1 (ToyContrastive's 1x1 contrastive loss is identically zero
    per shard on the 8-device mesh, so it can't drive this test)."""

    def apply(self, params, batch, class_emb, rng, deterministic=True,
              method=None, rngs=None):
        pred = batch["x"] @ params["params"]["w"]
        return {}, {"l2": (pred ** 2).mean()}

    @property
    def losses(self):
        return "losses"


def test_gradient_accumulation_inside_mesh_step():
    """optax.MultiSteps-wrapped optimizer under the shard_map train
    step: the first micro-step must leave params untouched, the second
    applies the inner update of the 2-micro-batch mean gradient."""
    import optax
    mesh, params, batch = _setup()
    model = _ToyL2()
    inner = _Opt()
    ms = optax.MultiSteps(
        optax.GradientTransformation(lambda p: inner.init(p),
                                     lambda g, s, p: inner.update(g, s, p)),
        every_k_schedule=2)
    opt = optax.GradientTransformation(ms.init, ms.update)
    step = make_train_step(model, opt, mesh, contrastive_scope="local")
    st = opt.init(params)
    b = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)
    w0 = np.asarray(params["params"]["w"])  # step() donates its inputs
    p1, st, _ = step(params, st, b, None, key)
    assert int(st.mini_step) == 1
    acc = np.asarray(st.acc_grads["params"]["w"])
    assert np.abs(acc).max() > 0  # pmean'd grads accumulated, nonzero
    np.testing.assert_array_equal(np.asarray(p1["params"]["w"]), w0)
    p2, st, _ = step(p1, st, b, None, key)
    assert int(st.mini_step) == 0 and int(st.gradient_step) == 1
    # same data both micro-steps -> applied update == -0.1 * acc_grad
    np.testing.assert_allclose(np.asarray(p2["params"]["w"]) - w0,
                               -0.1 * acc, rtol=1e-5, atol=1e-7)


def test_device_prefetcher_order_stop_and_errors():
    """DevicePrefetcher: preserves order, device-puts with the batch
    sharding, raises StopIteration at source end, and surfaces worker
    exceptions on the consumer side."""
    from locov_tpu.parallel import DevicePrefetcher

    mesh = get_mesh()
    batches = [{"x": np.full((8, 4), i, np.float32)} for i in range(5)]
    pf = DevicePrefetcher(iter(batches), mesh, depth=2)
    got = list(pf)
    assert len(got) == 5
    for i, b in enumerate(got):
        assert float(b["x"][0, 0]) == i  # order preserved
        # placed with the batch sharding over the mesh
        assert b["x"].sharding.mesh.shape == mesh.shape
    with pytest.raises(StopIteration):
        next(pf)

    def boom_source():
        yield {"x": np.zeros((8, 4), np.float32)}
        raise RuntimeError("decode failed")

    pf = DevicePrefetcher(boom_source(), mesh, depth=2)
    next(pf)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(pf)
    with pytest.raises(StopIteration):  # errored => exhausted, no hang
        next(pf)


def test_global_scope_equals_replicated_big_batch():
    """VERDICT r3 Next #6: the mesh-sharded global-scope step must give
    exactly the loss AND the parameter update of the same model run on
    the full (replicated) batch on one device — i.e. global scope
    really is the single-big-batch semantics, just sharded."""
    mesh, params, batch = _setup()
    model, opt = ToyContrastive(), _Opt()
    key = jax.random.PRNGKey(0)
    ce = jnp.zeros((1,))
    step = make_train_step(model, opt, mesh, contrastive_scope="global")
    new_params, _, m = step(jax.tree.map(jnp.copy, params), {},
                            shard_batch(batch, mesh), ce, key)

    # single-device reference on the SAME full batch
    def loss_fn(p):
        _, losses = model.apply(p, batch, ce, key)
        return losses["con_loss"]

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(m["con_loss"]), float(ref_loss),
                               rtol=1e-5)
    updates, _ = opt.update(ref_grads, {}, params)
    ref_params = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["w"]),
        np.asarray(ref_params["params"]["w"]), rtol=1e-5, atol=1e-6)
