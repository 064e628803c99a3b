"""Multi-chip tests on the virtual 8-device CPU mesh: data-parallel training
step, sharded tile-batch inference, and equality with the single-device
result (DP must be semantics-preserving)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nind_denoise_tpu.models.utnet import UtNet
from nind_denoise_tpu.parallel import mesh as pmesh
from nind_denoise_tpu.train import steps


@pytest.fixture(scope="module")
def tiny_setup():
    params = UtNet.init(jax.random.PRNGKey(0), funit=2)
    apply_fn = lambda p, x: UtNet.apply(p, x)
    rng = np.random.default_rng(0)
    clean = rng.random((8, 168, 168, 3)).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.05, clean.shape).astype(np.float32), 0, 1)
    return params, apply_fn, clean, noisy


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_dp_train_step_runs_and_reduces(tiny_setup):
    params, apply_fn, clean, noisy = tiny_setup
    mesh = pmesh.make_mesh(8)
    opt = steps.make_optimizer(1e-3, 0.5)
    state = steps.TrainState(params, opt.init(params))
    # donate=False: the module-scoped fixture params must survive this test
    step = steps.make_generator_train_step(apply_fn, opt,
                                           {"MSE": 1.0}, loss_cs=160,
                                           donate=False)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, pmesh.replicated(mesh))
        if hasattr(x, "shape") else x, state)
    c, n = pmesh.shard_batch(mesh, clean, noisy)
    losses = []
    for _ in range(3):
        state, metrics = step(state, c, n)
        losses.append(float(metrics["weighted"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow  # >20 s on the 1-core host
def test_dp_matches_single_device(tiny_setup):
    """One DP step over 8 shards == one step on the full batch, single device."""
    params, apply_fn, clean, noisy = tiny_setup
    opt = steps.make_optimizer(1e-3, 0.5)
    step = steps.make_generator_train_step(apply_fn, opt, {"MSE": 1.0},
                                           loss_cs=160, donate=False)

    s0 = steps.TrainState(params, opt.init(params))
    s_single, m_single = step(s0, jnp.asarray(clean), jnp.asarray(noisy))

    mesh = pmesh.make_mesh(8)
    s1 = steps.TrainState(params, opt.init(params))
    s1 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, pmesh.replicated(mesh))
        if hasattr(x, "shape") else x, s1)
    c, n = pmesh.shard_batch(mesh, clean, noisy)
    s_dp, m_dp = step(s1, c, n)

    np.testing.assert_allclose(float(m_dp["weighted"]), float(m_single["weighted"]),
                               rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(s_single.params)
    flat_b = jax.tree_util.tree_leaves(s_dp.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_tile_inference(tiny_setup):
    """Tile-batch DP inference: sharded forward == unsharded forward."""
    params, apply_fn, _, noisy = tiny_setup
    mesh = pmesh.make_mesh(8)
    fwd = jax.jit(apply_fn)
    ref = np.asarray(fwd(params, jnp.asarray(noisy)))
    p_rep = pmesh.replicate_tree(mesh, params)
    tiles_s = pmesh.shard_batch(mesh, noisy)
    got = np.asarray(fwd(p_rep, tiles_s))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_forward():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    params, tiles = args
    small = jnp.zeros((1, 104, 104, 3), jnp.float32)  # keep CPU test fast
    y = jax.jit(fn)(params, small)
    assert y.shape == (1, 104, 104, 3)


def test_tp_forward_matches_single_device():
    """Tensor parallelism: out-channel-sharded params (GSPMD collectives)
    must reproduce the single-device forward. funit=8 so every channel dim
    divides the 8-way model mesh (the final 1x1's cout=3 stays replicated)."""
    from nind_denoise_tpu.parallel import tensor_parallel as tp

    params = UtNet.init(jax.random.PRNGKey(1), funit=8)
    apply_fn = lambda p, x: UtNet.apply(p, x)
    x = jnp.asarray(np.random.default_rng(3).random((2, 104, 104, 3),
                                                    dtype=np.float32))
    ref = np.asarray(jax.jit(apply_fn)(params, x))

    mesh = tp.make_model_mesh(8)
    p_tp = tp.shard_params_tp(params, mesh)
    # the big decoder weights must actually be sharded, not replicated
    w = p_tp["tconvs1"]["c0"]["w"]
    assert not w.sharding.is_fully_replicated
    assert w.addressable_shards[0].data.shape[-1] == w.shape[-1] // 8
    got = np.asarray(tp.tp_forward(apply_fn, mesh)(p_tp, x))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_dp_gan_discriminator_step(tiny_setup):
    """cGAN discriminator step under the DP mesh: batch sharded over
    'data', params/BN replicated — GSPMD inserts the gradient all-reduce
    AND the BatchNorm batch-stat reductions. Finite losses, params move."""
    from nind_denoise_tpu.models.hul import Hul112Disc

    params, apply_fn, clean, noisy = tiny_setup
    mesh = pmesh.make_mesh(8)
    d_params, bn_state = Hul112Disc.init(jax.random.PRNGKey(1),
                                         input_channels=6, funit=4)
    opt = steps.make_optimizer(1e-4, 0.5, amsgrad=False)
    state = steps.TrainState(d_params, opt.init(d_params), bn_state)
    step = steps.make_discriminator_train_step(
        lambda p, s, x, train: Hul112Disc.apply(p, x, s, train=train),
        opt, conditional=True)

    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, pmesh.replicated(mesh))
        if hasattr(x, "shape") else x, state)
    cs = 112
    c, n = pmesh.shard_batch(mesh, clean[:, :cs, :cs], noisy[:, :cs, :cs])
    gen = jnp.clip(n + 0.01, 0, 1)  # stand-in generated batch, same sharding
    before = [np.asarray(x).copy()
              for x in jax.tree_util.tree_leaves(state.params)]
    state, (lr_, lf_, ranges) = step(state, jax.random.PRNGKey(2), c, gen, n,
                                     jnp.asarray(True))
    assert np.isfinite(float(lr_)) and np.isfinite(float(lf_))
    assert np.isfinite(np.asarray(ranges)).all()
    after = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    moved = max(np.abs(a - b).max() for a, b in zip(after, before))
    assert moved > 0, "no parameter moved in the DP discriminator step"


@pytest.mark.slow  # >20 s on the 1-core host
def test_dp_grad_accum_matches_single_device(tiny_setup):
    """--grad_accum composes with the DP mesh: one accumulated step over 8
    sharded devices == one plain step on the full batch, single device
    (GSPMD reshards the (N, mb) microbatch view; the averaged update is
    the same up to fp32 reassociation)."""
    params, apply_fn, clean, noisy = tiny_setup
    opt = steps.make_optimizer(1e-3, 0.5)
    plain = steps.make_generator_train_step(apply_fn, opt, {"MSE": 1.0},
                                            loss_cs=160, donate=False)
    accum = steps.make_generator_train_step(apply_fn, opt, {"MSE": 1.0},
                                            loss_cs=160, donate=False,
                                            grad_accum=2)

    s0 = steps.TrainState(params, opt.init(params))
    s_single, m_single = plain(s0, jnp.asarray(clean), jnp.asarray(noisy))

    mesh = pmesh.make_mesh(8)
    s1 = steps.TrainState(params, opt.init(params))
    s1 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, pmesh.replicated(mesh))
        if hasattr(x, "shape") else x, s1)
    c, n = pmesh.shard_batch(mesh, clean, noisy)
    s_dp, m_dp = accum(s1, c, n)

    np.testing.assert_allclose(float(m_dp["weighted"]),
                               float(m_single["weighted"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-7)
