"""Property-based precedence invariants for the layered config parser.

utils/conf.LayeredArgumentParser reimplements configargparse's layering
(reference: nn_train.py:121-125 — CLI > --config2 > --config > default
files). Hypothesis assigns every option a random value at each layer (or
leaves it out) and asserts the winner is always the highest-precedence
layer that defined it — for str/int/float typed options, including
type coercion of YAML scalars.
"""

import yaml
from hypothesis import given, settings
from hypothesis import strategies as st

from nind_denoise_tpu.utils.conf import LayeredArgumentParser

OPTS = (("alpha", str), ("beta", int), ("gamma", float))
LAYERS = ("defaults", "config", "config2", "cli")  # ascending precedence


@st.composite
def assignments(draw):
    """For each option: which layers define it, and the value per layer."""
    plan = {}
    for name, typ in OPTS:
        per_layer = {}
        for layer in LAYERS:
            if draw(st.booleans()):
                if typ is str:
                    per_layer[layer] = draw(st.text(
                        alphabet="abcxyz", min_size=1, max_size=6))
                elif typ is int:
                    per_layer[layer] = draw(st.integers(-99, 99))
                else:
                    per_layer[layer] = float(draw(st.integers(-99, 99)))
        plan[name] = per_layer
    return plan


@settings(max_examples=50, deadline=None)
@given(assignments())
def test_layer_precedence(tmp_path_factory, plan):
    tmp_path = tmp_path_factory.mktemp("conf")

    def dump(layer):
        vals = {n: per[layer] for n, per in plan.items() if layer in per}
        p = tmp_path / f"{layer}.yaml"
        p.write_text(yaml.safe_dump(vals))
        return str(p)

    parser = LayeredArgumentParser(
        default_config_files=[dump("defaults")])
    for name, typ in OPTS:
        parser.add_argument(f"--{name}", type=typ, default=None)

    argv = ["--config", dump("config"), "--config2", dump("config2")]
    for name, per in plan.items():
        if "cli" in per:
            argv += [f"--{name}", str(per["cli"])]

    ns = parser.parse_args(argv)
    for name, typ in OPTS:
        per = plan[name]
        expect = None
        for layer in LAYERS:  # last (highest-precedence) defined layer wins
            if layer in per:
                expect = per[layer]
        got = getattr(ns, name)
        if expect is None:
            assert got is None, (name, got)
        else:
            assert got == typ(expect) and isinstance(got, typ), \
                (name, got, expect)
