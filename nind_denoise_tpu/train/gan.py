"""cGAN discriminator wrapper + plateau LR scheduler.

Parity with the reference Discriminator (nn_common.py:275-361): Hul112Disc
by default, conditional 6-channel input, Adam (no amsgrad), MSE against
fuzzy targets, scalar loss = (sqrt(fake)+sqrt(real))/2, ReduceLROnPlateau
(factor 0.75, threshold 1e-8).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..models import params_io
from ..utils import utilities


class ReduceLROnPlateau:
    """torch-equivalent plateau scheduler (mode=min)."""

    def __init__(self, lr: float, factor: float = 0.75, patience: int = 3,
                 threshold: float = 1e-8):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best - self.threshold:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr


class DiscriminatorWrapper:
    def __init__(self, args, network: str, funit: int, lr: Optional[float],
                 conditional: bool, seed: int, advantage: float = 0.0,
                 patience: int = 3, model_path: Optional[str] = None,
                 keyword: str = "discriminator"):
        import jax

        from ..models import get_network
        from . import steps

        self.net = get_network(network)
        self.keyword = keyword
        # the generator-loss weight this discriminator's fooling term feeds
        self.wname = "D2" if keyword == "discriminator2" else "D1"
        self.conditional = conditional
        self.advantage = advantage
        self.lr = lr if lr is not None else 1e-4
        in_ch = 6 if conditional else 3
        params, bn_state = self.net.init(jax.random.PRNGKey(seed),
                                         input_channels=in_ch, funit=funit)
        opt_leaves = sched = None
        if model_path:
            loaded = params_io.load_discriminator(
                model_path, network, args.models_dpath, keyword)
            params = loaded["params"]
            bn_state = loaded["state"] if loaded["state"] is not None else bn_state
            opt_leaves = loaded["opt"]
            sched = loaded["sched"]
        self.optimizer = steps.make_optimizer(self.lr, args.beta1, amsgrad=False)
        opt_state = (steps.restore_opt_state(self.optimizer, params, opt_leaves)
                     if opt_leaves is not None else self.optimizer.init(params))
        self.state = steps.TrainState(params, opt_state, bn_state)
        self._step = steps.make_discriminator_train_step(
            lambda p, s, x, train: self.net.apply(p, x, s, train=train),
            self.optimizer, conditional=conditional)
        self.scheduler = ReduceLROnPlateau(self.lr, factor=0.75,
                                           patience=patience)
        if sched is not None:  # exact plateau-scheduler resume
            self.scheduler.lr = self.lr = float(sched["lr"])
            self.scheduler.best = float(sched["best"])
            self.scheduler.num_bad = int(sched["num_bad"])
            self.state = steps.set_lr(self.state, self.lr)
        self.loss = 1.0
        self.predictions_range = None

    # prediction fn for the generator's fooling loss (discriminate_batch)
    def pred_fn(self, disc_params, generated_c, noisy_c):
        import jax
        import jax.numpy as jnp

        params, bn_state = disc_params
        if self.conditional:
            batch = jnp.concatenate([noisy_c, generated_c], axis=-1)
        else:
            batch = generated_c
        preds, _ = self.net.apply(params, batch, bn_state, train=True)
        return preds

    def learn(self, key, clean, noisy, gen, loss_cs: int) -> None:
        import jax
        import jax.numpy as jnp

        from . import steps

        clean_c = steps.center_crop(jnp.asarray(clean), loss_cs)
        noisy_c = steps.center_crop(jnp.asarray(noisy), loss_cs)
        # jitted: this runs EVERY discriminator step (an un-jitted full
        # generator forward op-by-op dominated cGAN batch wall time)
        fwd = gen.infer_jit if hasattr(gen, "infer_jit") else \
            (gen.infer if hasattr(gen, "infer") else gen.apply_fn)
        generated = jnp.clip(fwd(gen.state.params, jnp.asarray(noisy)), 0, 1)
        generated_c = steps.center_crop(generated, loss_cs)
        fake_is_noisy = jnp.asarray(self.loss < 0.25)  # nn_common.py:349-353
        self.state, (loss_real, loss_fake, ranges) = self._step(
            self.state, key, clean_c, generated_c, noisy_c, fake_is_noisy)
        lr_, lf_ = float(loss_real), float(loss_fake)
        self.loss = steps.discriminator_scalar_loss(lf_, lr_)
        r = np.asarray(ranges)
        self.predictions_range = ", ".join(f"{v:.2}" for v in r)

    def update_learning_rate(self, avg_loss: float) -> float:
        from . import steps

        new_lr = self.scheduler.step(avg_loss)
        if new_lr != steps.get_lr(self.state):
            self.state = steps.set_lr(self.state, new_lr)
        self.lr = new_lr
        return new_lr

    def save_model(self, model_dir: str, epoch: int, name: str) -> None:
        """Params + BN state + Adam leaves + plateau-scheduler state, so a
        cGAN resume is exact (the reference saved only the state_dict,
        nn_common.py:300-305 — its resumed discriminators restart Adam
        moments and the plateau window)."""
        from . import steps

        params_io.save({"params": self.state.params,
                        "state": self.state.model_state,
                        "opt": steps.opt_state_leaves(self.state.opt_state),
                        "sched": {"lr": self.scheduler.lr,
                                  "best": self.scheduler.best,
                                  "num_bad": self.scheduler.num_bad}},
                       os.path.join(model_dir, f"{name}_{epoch}.npz"))
