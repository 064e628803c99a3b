"""Torchvision segmentation-head experiments (gated stubs).

Parity notes for /root/reference/src/nind_denoise/networks/ThirdPartyNets.py
:171-187: the reference's ``MobileNetV3`` and ``deeplabv3_resnet101`` are
~10-line wrappers that download torchvision *pretrained* segmentation models
(``lraspp_mobilenet_v3_large`` / ``deeplabv3_resnet101``) and swap their
classifier heads for 3-channel 1x1 convs. Upstream support level:

* ``MobileNetV3.forward`` works only with torchvision installed and network
  access to fetch the pretrained weights;
* ``deeplabv3_resnet101.forward`` literally ``raise NotImplementedError``
  (ThirdPartyNets.py:186-187).

Neither is reachable from any config, CLI, or factory in the maintained
reference paths; they exist as experiment scaffolding. This module mirrors
that support level honestly: the classes are registered, construct a clear
description of the head surgery they would perform, and raise an
informative error explaining the torchvision + pretrained-weights
dependency (this deployment has no torchvision and no egress). The other
ThirdPartyNets members that ARE functional (PatchGAN, UNet duplicate) are
ported for real in models/p2p.py and models/unet.py.
"""

from __future__ import annotations


class _TorchvisionExperiment:
    """Base for the torchvision-pretrained experiment wrappers."""

    name = "TorchvisionExperiment"
    kind = "generator"
    #: (torchvision factory, head-surgery description)
    factory = ""
    surgery = ""

    @classmethod
    def init(cls, key, **_ignored):
        try:
            import torchvision  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                f"{cls.name} wraps the pretrained torchvision model "
                f"{cls.factory!r} with head surgery ({cls.surgery}); it "
                "requires torchvision plus network access to download the "
                "pretrained weights, neither of which this deployment has. "
                "Upstream status is equivalent: see ThirdPartyNets.py:171-187 "
                "(deeplab's forward raises NotImplementedError there)."
            ) from exc
        raise NotImplementedError(
            f"{cls.name}: torchvision is present but pretrained-weight "
            "download is unavailable here; wire a local weights path and "
            "convert via models/torch_import.py if this experiment is "
            "actually needed.")

    @classmethod
    def apply(cls, params, x, *a, **k):
        raise NotImplementedError(cls.name)


class MobileNetV3(_TorchvisionExperiment):
    """ThirdPartyNets.py:171-179 — LR-ASPP MobileNetV3-Large with both
    classifiers replaced by 3-channel 1x1 convs (low: 40->3, high: 128->3)."""

    name = "MobileNetV3"
    factory = "torchvision.models.segmentation.lraspp_mobilenet_v3_large"
    surgery = "low_classifier Conv2d(40,3,1), high_classifier Conv2d(128,3,1)"


class deeplabv3_resnet101(_TorchvisionExperiment):
    """ThirdPartyNets.py:181-187 — DeepLabV3-ResNet101 with
    aux_classifier[4] replaced by Conv2d(256,3,1); upstream forward raises
    NotImplementedError."""

    name = "deeplabv3_resnet101"
    factory = "torchvision.models.segmentation.deeplabv3_resnet101"
    surgery = "aux_classifier[4] Conv2d(256,3,1)"
