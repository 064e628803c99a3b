"""Model zoo registry.

Equivalent role to the reference's ``globals()[network]`` arch resolution
(/root/reference/src/nind_denoise/nn_common.py:131,137), done explicitly.
"""

from . import utnet, unet, hul, hul_gen, legacy, p2p, relics, third_party


def get_network(name: str):
    """Resolve an architecture name to its (init, apply) module."""
    registry = {
        "UtNet": utnet.UtNet,
        "UNet": unet.UNet,
        "Hul112Disc": hul.Hul112Disc,
        "Hulb112Disc": hul.Hulb112Disc,
        "Hull112Disc": hul.Hull112Disc,
        "Hulf112Disc": hul.Hulf112Disc,
        "Hulb128Net": hul_gen.Hulb128Net,
        "Hulbs128Net": hul_gen.Hulbs128Net,
        "DnCNN": legacy.DnCNN,
        "RedCNN": legacy.RedCNN,
        "ResnetGenerator": p2p.ResnetGenerator,
        "NLayerDiscriminator": p2p.NLayerDiscriminator,
        "PatchGAN": p2p.NLayerDiscriminator,
        "PixelDiscriminator": p2p.PixelDiscriminator,
        "MultiscaleDiscriminator": p2p.MultiscaleDiscriminator,
        # historical relic zoo (reference networks/relics.py)
        "RedishCNN": relics.RedishCNN,
        "HunkyDisc": relics.HunkyDisc,
        "HunkyNet": relics.HunkyNet,
        "HunNet": relics.HunNet,
        "HuNet": relics.HuNet,
        "HuDisc": relics.HuDisc,
        "Hul144Disc": relics.Hul144Disc,
        "Hul128Net": relics.Hul128Net,
        "Hul160Net": relics.Hul160Net,
        "HulNet": relics.Hul160Net,
        # torchvision segmentation experiments (gated stubs, see module doc)
        "MobileNetV3": third_party.MobileNetV3,
        "deeplabv3_resnet101": third_party.deeplabv3_resnet101,
    }
    if name not in registry:
        raise KeyError(f"unknown network {name!r}; available: {sorted(registry)}")
    return registry[name]
