"""Jitted training/eval steps: generator (+ optional cGAN discriminators).

Behavioral parity with the reference's Generator/Discriminator wrappers
(/root/reference/src/nind_denoise/nn_common.py:163-361):

* Generator: Adam with **amsgrad** (betas=(beta1, 0.999), nn_common.py:184),
  weighted loss over {SSIM, L1, MSE, MSSSIM, D1, D2} on ``loss_cs``
  center crops, forward clipped to [0, 1] (denoise_batch,
  nn_common.py:198-199), manual multiplicative LR decay
  (update_learning_rate, nn_common.py:252-255).
* Discriminator: Adam (no amsgrad), MSE against fuzzy targets
  (gen_target_probabilities, nn_common.py:403-420: real in [0.95, 1],
  fake in [0, 0.05] when noisy), loss = (sqrt(fake) + sqrt(real)) / 2
  (update_loss, nn_common.py:310-314), conditional 6-channel input.

TPU-first notes: steps are pure functions jitted once; the batch axis shards
over a ``('data',)`` mesh with replicated params — XLA emits the gradient
all-reduce. ``remat=True`` wraps the generator forward in jax.checkpoint to
trade FLOPs for HBM on large crops.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import losses as L

LOSS_NAMES = ("SSIM", "L1", "MSE", "MSSSIM", "D1", "D2")


def center_crop(batch_nhwc: jnp.ndarray, cs: int) -> jnp.ndarray:
    """pt_ops.pt_crop_batch equivalent (NHWC)."""
    y0 = (batch_nhwc.shape[1] - cs) // 2
    x0 = (batch_nhwc.shape[2] - cs) // 2
    return batch_nhwc[:, y0:y0 + cs, x0:x0 + cs, :]


def normalize_weights(weights: Dict[str, float]) -> Dict[str, float]:
    """get_weights semantics (nn_common.py:423-452): normalize to sum 1;
    all-zero -> MSSSIM=1 default."""
    w = {k: float(weights.get(k, 0.0)) for k in LOSS_NAMES}
    total = sum(w.values())
    if total == 0:
        w["MSSSIM"] = 1.0
    elif total != 1:
        w = {k: v / total for k, v in w.items()}
    return w


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    model_state: Any = None      # BN stats for UNet/discriminators; None else


def make_optimizer(lr: float, beta1: float, amsgrad: bool = True):
    """Adam with runtime-adjustable LR (inject_hyperparams) so the manual
    multiplicative decay of the reference maps onto optax."""
    opt = optax.amsgrad if amsgrad else optax.adam
    return optax.inject_hyperparams(opt)(learning_rate=lr, b1=beta1, b2=0.999)


def get_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    state.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state


def decay_lr(state: TrainState, factor: float) -> Tuple[TrainState, float]:
    """update_learning_rate parity: lr *= factor."""
    lr = get_lr(state) * factor
    return set_lr(state, lr), lr


def _quality_losses(gen_c, clean_c, weights, compute_ssim_anyway=False):
    metrics = {}
    total = 0.0
    if weights["SSIM"] > 0 or compute_ssim_anyway:
        metrics["SSIM"] = L.ssim_loss(gen_c, clean_c).mean()
        total += weights["SSIM"] * metrics["SSIM"]
    if weights["MSSSIM"] > 0:
        metrics["MSSSIM"] = L.ms_ssim_loss(gen_c, clean_c).mean()
        total += weights["MSSSIM"] * metrics["MSSSIM"]
    if weights["L1"] > 0:
        metrics["L1"] = L.l1_loss(gen_c, clean_c).mean()
        total += weights["L1"] * metrics["L1"]
    if weights["MSE"] > 0:
        metrics["MSE"] = L.mse_loss(gen_c, clean_c).mean()
        total += weights["MSE"] * metrics["MSE"]
    return total, metrics


def make_generator_train_step(apply_fn: Callable, optimizer, weights: Dict[str, float],
                              loss_cs: int, compute_ssim_anyway: bool = False,
                              remat: bool = False,
                              disc_apply_fns: Tuple[Optional[Callable], ...] = (None, None),
                              donate: bool = True, stateful: bool = False,
                              grad_accum: int = 1):
    """Returns jitted ``step(state, clean, noisy, disc_states) ->
    (state, metrics)``. ``disc_apply_fns[i](params_i, state_i, fake_nhwc)``
    returns discriminator predictions for the D1/D2 fooling terms.

    ``stateful=True`` expects ``apply_fn(params, x, model_state) ->
    (y, new_model_state)`` (UNet's BatchNorm threading); otherwise
    ``apply_fn(params, x) -> y``.

    ``grad_accum=N`` (N must divide the batch) runs the batch as N
    contiguous microbatches under a ``lax.scan`` — activations for only
    batch/N samples live at a time — and applies ONE optimizer update on
    the mean gradient. For STATELESS nets (UtNet and the rest of the zoo)
    this is the SAME update as the plain step: every per-batch loss above
    is a mean over equal-size microbatches, so the mean of microbatch
    gradients equals the full-batch gradient up to fp32 reassociation
    (pinned by tests/test_train.py). For stateful BatchNorm nets (UNet,
    ``stateful=True``) it is NOT bit-identical: each microbatch normalizes
    by its own batch/N statistics and the BN running state threads
    sequentially through the scan, so gradients and model_state differ
    from the full-batch step (the standard gradient-accumulation caveat —
    torch accumulation behaves the same way). This is how the reference's
    8-GB-GPU batch guidance (src/nind_denoise/README.md:123) scales past a
    chip's HBM — the reference itself has no equivalent.
    """
    weights = normalize_weights(weights)
    fwd = jax.checkpoint(apply_fn) if remat else apply_fn

    def loss_fn(params, model_state, clean, noisy, disc_params):
        if stateful:
            gen, new_ms = fwd(params, noisy, model_state)
        else:
            gen, new_ms = fwd(params, noisy), model_state
        gen = jnp.clip(gen, 0.0, 1.0)
        gen_c = center_crop(gen, loss_cs)
        clean_c = center_crop(clean, loss_cs)
        noisy_c = center_crop(noisy, loss_cs)
        total, metrics = _quality_losses(gen_c, clean_c, weights, compute_ssim_anyway)
        for i, dfn in enumerate(disc_apply_fns):
            wname = f"D{i+1}"
            if dfn is None or weights[wname] == 0:
                continue
            preds = dfn(disc_params[i], gen_c, noisy_c)
            # fool the discriminator: MSE against non-noisy "real" target = 1
            dloss = jnp.mean((preds - 1.0) ** 2)
            metrics[wname] = dloss
            total = total + weights[wname] * dloss
        metrics["weighted"] = total
        return total, (metrics, new_ms)

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: TrainState, clean, noisy, disc_params=(None, None)):
        (_, (metrics, new_ms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.model_state, clean,
                                   noisy, disc_params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, new_ms), metrics

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_accum(state: TrainState, clean, noisy, disc_params=(None, None)):
        b = clean.shape[0]
        if b % grad_accum:
            raise ValueError(f"grad_accum={grad_accum} must divide the "
                             f"batch size {b}")
        mb = b // grad_accum
        # (N, mb, H, W, C) contiguous microbatches; scan keeps ONE
        # microbatch's fwd+bwd activations live at a time
        clean_m = clean.reshape((grad_accum, mb) + clean.shape[1:])
        noisy_m = noisy.reshape((grad_accum, mb) + noisy.shape[1:])

        def micro(carry, xs):
            g_sum, m_sum, ms = carry
            c_i, n_i = xs
            (_, (metrics, new_ms)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, ms, c_i, n_i,
                                       disc_params)
            g_sum = jax.tree_util.tree_map(jnp.add, g_sum, grads)
            m_sum = {k: m_sum[k] + metrics[k] for k in m_sum}
            return (g_sum, m_sum, new_ms), None

        zeros_like_tree = lambda t: jax.tree_util.tree_map(
            jnp.zeros_like, t)
        # metric keys are static (weights/disc_apply_fns close over them):
        # probe with per-microbatch shapes via eval_shape to build the sums
        probe = jax.eval_shape(loss_fn, state.params, state.model_state,
                               clean_m[0], noisy_m[0], disc_params)[1][0]
        m0 = {k: jnp.zeros((), jnp.float32) for k in probe}
        (g_sum, m_sum, new_ms), _ = jax.lax.scan(
            micro, (zeros_like_tree(state.params), m0, state.model_state),
            (clean_m, noisy_m))
        inv = 1.0 / grad_accum
        grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
        metrics = {k: v * inv for k, v in m_sum.items()}
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, new_ms), metrics

    return step_accum if grad_accum > 1 else step


def make_generator_eval_step(apply_fn: Callable, weights: Dict[str, float],
                             loss_cs: int, compute_ssim_anyway: bool = False,
                             stateful: bool = False):
    """Jitted validation step -> weighted loss + components (validate_generator
    parity, nn_train.py:51-71)."""
    weights = normalize_weights(weights)

    @partial(jax.jit, static_argnames=())
    def step(params, clean, noisy, model_state=None):
        if stateful:
            gen, _ = apply_fn(params, noisy, model_state)
        else:
            gen = apply_fn(params, noisy)
        gen = jnp.clip(gen, 0.0, 1.0)
        gen_c = center_crop(gen, loss_cs)
        clean_c = center_crop(clean, loss_cs)
        total, metrics = _quality_losses(gen_c, clean_c, weights, compute_ssim_anyway)
        metrics["weighted"] = total
        return metrics

    return step


# -- discriminator ------------------------------------------------------------

def fuzzy_targets(key, shape, target_real: bool, noisy: bool = True):
    """gen_target_probabilities parity: real in [19/20, 1] (or exactly 1),
    fake in [0, 1/20] (or exactly 0)."""
    if target_real:
        return 19.0 / 20.0 + jax.random.uniform(key, shape) / 20.0 if noisy \
            else jnp.ones(shape)
    return jax.random.uniform(key, shape) / 20.0 if noisy else jnp.zeros(shape)


def make_discriminator_train_step(disc_apply: Callable, optimizer,
                                  conditional: bool = True):
    """disc_apply(params, bn_state, x_nhwc, train) -> (preds, new_bn_state).

    Jitted ``step(state, key, clean_c, generated_c, noisy_c, fake_is_noisy)``
    -> (state, aux) with aux = (loss_real, loss_fake, pred ranges).
    ``fake_is_noisy`` mirrors the reference's ``noisy=self.loss < 0.25``
    fuzziness switch (nn_common.py:349-353) as a traced bool.
    """

    def one_side(params, bn_state, key, batch, target_real, noisy_targets):
        preds, new_bn = disc_apply(params, bn_state, batch, True)
        tgt_noisy = fuzzy_targets(key, preds.shape, target_real, True)
        tgt_clean = fuzzy_targets(key, preds.shape, target_real, False)
        tgt = jnp.where(noisy_targets, tgt_noisy, tgt_clean)
        loss = jnp.mean((preds - tgt) ** 2)
        return loss, (new_bn, preds)

    @partial(jax.jit, static_argnames=())
    def step(state: TrainState, key, clean_c, generated_c, noisy_c, fake_is_noisy):
        kr, kf = jax.random.split(key)
        if conditional:
            real_b = jnp.concatenate([noisy_c, clean_c], axis=-1)
            fake_b = jnp.concatenate([noisy_c, generated_c], axis=-1)
        else:
            real_b, fake_b = clean_c, generated_c
        fake_b = jax.lax.stop_gradient(fake_b)

        (loss_real, (bn1, preds_r)), grads_r = jax.value_and_grad(
            one_side, has_aux=True)(state.params, state.model_state, kr,
                                    real_b, True, jnp.asarray(True))
        (loss_fake, (bn2, preds_f)), grads_f = jax.value_and_grad(
            one_side, has_aux=True)(state.params, bn1, kf,
                                    fake_b, False, fake_is_noisy)
        grads = jax.tree_util.tree_map(lambda a, b: a + b, grads_r, grads_f)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ranges = jnp.stack([preds_r.min(), preds_r.max(), preds_f.min(), preds_f.max()])
        return TrainState(params, opt_state, bn2), (loss_real, loss_fake, ranges)

    return step


def discriminator_scalar_loss(loss_fake: float, loss_real: float) -> float:
    """(sqrt(fake) + sqrt(real)) / 2 — update_loss parity."""
    import math

    return (math.sqrt(max(loss_fake, 0.0)) + math.sqrt(max(loss_real, 0.0))) / 2.0


# -- optimizer-state (de)serialization ----------------------------------------
# optax states are nested namedtuples which the plain .npz pytree IO cannot
# reconstruct; store the flattened leaves and re-hydrate into a freshly
# initialized state of identical structure. (The reference never checkpoints
# Adam state — resume restarts the optimizer, SURVEY.md §5.4 — this is a
# deliberate improvement.)

def opt_state_leaves(opt_state):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(opt_state)]


def restore_opt_state(optimizer, params, leaves):
    fresh = optimizer.init(params)
    treedef = jax.tree_util.tree_structure(fresh)
    fresh_leaves = jax.tree_util.tree_leaves(fresh)
    if len(fresh_leaves) != len(leaves):
        raise ValueError(
            f"optimizer state mismatch: {len(fresh_leaves)} leaves expected, "
            f"{len(leaves)} saved")
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(v) for v in leaves])
