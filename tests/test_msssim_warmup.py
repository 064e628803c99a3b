"""--msssim_warmup_epochs: MSE warmup escapes the MS-SSIM dead zone.

Also regression-tests the dead zone itself: a fresh generator whose output
lands outside the valid cs range gets exactly zero MS-SSIM gradient (the
relu'd product kills it), which is why the flag exists.
"""

import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # torch-twin zoo parity: minutes on 1 core



@pytest.fixture(scope="module")
def cropped_ds_176(tmp_path_factory):
    import cv2
    from scipy.ndimage import gaussian_filter

    root = tmp_path_factory.mktemp("c176") / "SYN_176_168"
    rng = np.random.default_rng(1)
    for s in ("a", "b"):
        base = gaussian_filter(rng.random((176, 176, 3)).astype(np.float32),
                               (10, 10, 0))
        base = (base - base.min()) / (np.ptp(base) + 1e-6)
        for iso, sig in (("ISO200", 0.0), ("ISO3200", 0.08)):
            d = root / f"scene{s}" / iso
            d.mkdir(parents=True, exist_ok=True)
            img = np.clip(base + rng.normal(0, sig, base.shape), 0, 1)
            cv2.imwrite(str(d / f"SYN_scene{s}_{iso}_0_0_168.png"),
                        (img * 65535).astype(np.uint16))
    return str(root)


def test_msssim_dead_zone_exists():
    """One negative-cs scale -> zero gradient through the relu'd product."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from nind_denoise_tpu.ops import losses as L

    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((1, 168, 168, 3), np.float32))
    noisy = jnp.clip(target + rng.normal(0, 0.1, target.shape).astype(np.float32), 0, 1)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 3)).astype(np.float32))

    def fwd(w):
        dn = lax.conv_dimension_numbers(noisy.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(noisy, w, (1, 1), "SAME",
                                        dimension_numbers=dn)

    loss, grad = jax.value_and_grad(
        lambda w: L.ms_ssim_loss(fwd(w), target).mean())(w)
    assert float(loss) == 1.0
    assert float(optax.global_norm(grad)) == 0.0
    # MSE gradient flows from the identical starting point
    _, gmse = jax.value_and_grad(
        lambda w: L.mse_loss(fwd(w), target).mean())(w)
    assert float(optax.global_norm(gmse)) > 0


def test_warmup_flag_runs(cropped_ds_176, tmp_path):
    from nind_denoise_tpu.train import loop

    val = [[os.path.join(cropped_ds_176, "scenea", "ISO200",
                         "SYN_scenea_ISO200_0_0_168.png"),
            os.path.join(cropped_ds_176, "scenea", "ISO3200",
                         "SYN_scenea_ISO3200_0_0_168.png")]]
    vy = tmp_path / "val.yaml"
    vy.write_text(yaml.safe_dump(val))
    models_dir = str(tmp_path / "m")
    loop.main([
        "--train_data", cropped_ds_176,
        "--models_dpath", models_dir, "--test_reserve", "0",
        "--g_network", "UtNet", "--g_funit", "2",
        "--cs", "168", "--loss_cs", "168", "--weight_MSSSIM", "1",
        "--batch_size", "2", "--epochs", "3",
        "--msssim_warmup_epochs", "1",
        "--g_lr", "1e-3", "--beta1", "0.5", "--patience", "2",
        "--reduce_lr_factor", "0.95", "--min_lr", "1e-9",
        "--validation_set_yaml", str(vy), "--threads", "1",
        "--validation_interval", "0",
    ])
    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    assert any(f.startswith("generator_") for f in os.listdir(exp))
