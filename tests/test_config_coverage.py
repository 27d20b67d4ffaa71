"""Config coverage: every leaf field of ComoConfig must be READ by
product code during an end-to-end run — a field nobody reads is a dead
knob that silently does nothing (the round-1 failure mode this guards
against).  A recording proxy wraps the config tree; a tiny sequential
run plus the one-time validate() pass must touch every leaf."""

import dataclasses

import numpy as np
import pytest

from como_tpu.config import ComoConfig


class _Rec:
    """Attribute-read recorder around a (nested) dataclass."""

    def __init__(self, obj, prefix, seen):
        object.__setattr__(self, "_obj", obj)
        object.__setattr__(self, "_prefix", prefix)
        object.__setattr__(self, "_seen", seen)

    def __getattr__(self, name):
        val = getattr(object.__getattribute__(self, "_obj"), name)
        prefix = object.__getattribute__(self, "_prefix")
        seen = object.__getattribute__(self, "_seen")
        if dataclasses.is_dataclass(val):
            return _Rec(val, f"{prefix}{name}.", seen)
        if not name.startswith("_") and not callable(val):
            seen.add(prefix + name)
        return val

    def __setattr__(self, name, val):
        setattr(object.__getattribute__(self, "_obj"), name, val)


def _leaf_paths(obj, prefix=""):
    out = []
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            out += _leaf_paths(v, f"{prefix}{f.name}.")
        else:
            out.append(prefix + f.name)
    return out


@pytest.mark.slow
def test_every_config_field_is_read():
    from como_tpu.data.synthetic import SyntheticDataset
    from como_tpu.runtime.seq import ComoSeq

    IMG = (48, 64)
    cfg = ComoConfig()
    cfg.img_size = list(IMG)
    cfg.mapping.graph.num_keyframes = 4
    cfg.mapping.graph.num_one_way_frames = 4
    cfg.mapping.sampling.max_num_coords = 16
    cfg.mapping.sampling.border = 2
    cfg.validate()

    seen: set = set()
    wrapped = _Rec(cfg, "", seen)

    # the product read path: engine construction + setup + a short run
    # (the same calls como_tpu/cli.py makes; cli reads img_size itself)
    ds = SyntheticDataset(n_frames=20, img_size=IMG, seed=0, step=0.012)
    eng = ComoSeq(wrapped, ds.intrinsics, wrapped.img_size)
    eng.setup()
    eng.run(ds)
    assert eng.mapping.is_init  # the run must actually exercise the system

    expected = set(_leaf_paths(cfg))
    unread = expected - seen
    assert not unread, (
        f"dead config knobs (defined but never read by product code): "
        f"{sorted(unread)}")
