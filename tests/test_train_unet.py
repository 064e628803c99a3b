"""UNet training path: BatchNorm state must thread through the jitted step."""

import os

import numpy as np
import pytest

from tests.test_train import cropped_ds_104, validation_yaml_104  # noqa: F401


@pytest.mark.slow  # >20 s on the 1-core host
def test_unet_train_short(cropped_ds_104, validation_yaml_104, tmp_path):  # noqa: F811
    from nind_denoise_tpu.train import loop

    models_dir = str(tmp_path / "models")
    loop.main([
        "--train_data", cropped_ds_104,
        "--models_dpath", models_dir,
        "--test_reserve", "0",
        "--g_network", "UNet",
        "--cs", "104", "--loss_cs", "96",
        "--weight_MSE", "1", "--weight_MSSSIM", "0",
        "--batch_size", "2", "--epochs", "2",
        "--g_lr", "1e-3", "--beta1", "0.5", "--patience", "2",
        "--reduce_lr_factor", "0.95", "--min_lr", "1e-9",
        "--validation_set_yaml", validation_yaml_104,
        "--threads", "1",
    ])
    exp = os.path.join(models_dir, os.listdir(models_dir)[0])
    ckpts = [f for f in os.listdir(exp) if f.startswith("generator_")]
    assert ckpts

    # BN running stats must have moved away from init (mean 0 / var 1)
    from nind_denoise_tpu.models import params_io

    tree = params_io.load(os.path.join(exp, ckpts[0]))
    bn_mean = tree["state"]["inc"]["bn0"]["mean"]
    assert np.abs(np.asarray(bn_mean)).max() > 1e-4
