"""Preset registry parity with the reference CONFIGS dict."""
import sys

import pytest

from wire_tpu.train.presets import ENTRIES, get_config, list_configs


def test_all_reference_configs_present_and_exact():
    sys.path.insert(0, "/root/reference")
    try:
        from configs import CONFIGS
    except ImportError:
        pytest.skip("reference not available")
    assert set(ENTRIES) == set(CONFIGS)
    for k, ref in CONFIGS.items():
        mine = get_config(k)
        for key, val in ref.items():
            if isinstance(val, list):
                val = tuple(val)
            assert getattr(mine, key) == val, (k, key)


def test_get_config_defaults():
    c = get_config(list_configs()[0])
    assert c.maxpoints == 256 * 256
    assert isinstance(c.scale_tensor, tuple)


def test_unknown_config_raises():
    with pytest.raises(KeyError):
        get_config("not_a_config")
