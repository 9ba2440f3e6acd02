"""The shipped configs/*.yaml files build the same model configs as the
code-side factories (parity with the reference configs/ directory:
ladcast_375M.yaml, ladcast_1.6B.yaml, DC_AE_84_pretrain.yaml,
DC_AE_ray_1024.yaml)."""

import os

import pytest

from ladcast_tpu.config import (
    DCAEConfig,
    LaDCastDiTConfig,
    config_from_dict,
    dcae_ray_1024_config,
    ladcast_1p6b_config,
    ladcast_375m_config,
)
from ladcast_tpu.utils.registry import load_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _norm(v):
    """Sequences in YAML parse as lists; dataclass factories use tuples."""
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _assert_config_equal(a, b):
    import dataclasses
    assert type(a) is type(b)
    for f in dataclasses.fields(a):
        va, vb = _norm(getattr(a, f.name)), _norm(getattr(b, f.name))
        assert va == vb, f"{f.name}: yaml={va!r} factory={vb!r}"


@pytest.mark.parametrize("yaml_name,section,cls,factory", [
    ("ladcast_375m.yaml", "ar_model", LaDCastDiTConfig, ladcast_375m_config),
    ("ladcast_1p6b.yaml", "ar_model", LaDCastDiTConfig, ladcast_1p6b_config),
    ("dcae_84.yaml", "encdec", DCAEConfig, DCAEConfig),  # defaults ARE the 84 config
    ("dcae_ray_1024.yaml", "encdec", DCAEConfig, dcae_ray_1024_config),
])
def test_yaml_matches_factory(yaml_name, section, cls, factory):
    cfg = load_yaml(os.path.join(REPO, "configs", yaml_name))
    built = config_from_dict(cls, cfg[section])
    _assert_config_equal(built, factory())


@pytest.mark.parametrize("yaml_name,section,cls", [
    ("ladcast_375m.yaml", "ar_model", LaDCastDiTConfig),
    ("ladcast_1p6b.yaml", "ar_model", LaDCastDiTConfig),
    ("dcae_84.yaml", "encdec", DCAEConfig),
    ("dcae_ray_1024.yaml", "encdec", DCAEConfig),
    ("dcae_84_ft_decoder.yaml", "encdec", DCAEConfig),
])
def test_yaml_keys_are_known_fields(yaml_name, section, cls):
    """config_from_dict silently drops unknown keys -- catch YAML typos."""
    import dataclasses
    cfg = load_yaml(os.path.join(REPO, "configs", yaml_name))
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(cfg[section]) - names
    assert not unknown, f"unknown {section} keys in {yaml_name}: {unknown}"
