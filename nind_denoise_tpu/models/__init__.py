"""Model zoo registry.

Equivalent role to the reference's ``globals()[network]`` arch resolution
(/root/reference/src/nind_denoise/nn_common.py:131,137), done explicitly.
"""

from . import utnet, unet, hul


def get_network(name: str):
    """Resolve an architecture name to its (init, apply) module."""
    registry = {
        "UtNet": utnet.UtNet,
        "UNet": unet.UNet,
        "Hul112Disc": hul.Hul112Disc,
        "Hulb112Disc": hul.Hulb112Disc,
        "Hull112Disc": hul.Hull112Disc,
        "Hulf112Disc": hul.Hulf112Disc,
    }
    if name not in registry:
        raise KeyError(f"unknown network {name!r}; available: {sorted(registry)}")
    return registry[name]
