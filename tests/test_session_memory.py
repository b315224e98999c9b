"""Driver-heap default sizing (r17 verdict ask #7): 24g is the
measured local[32] sweet spot on the 128 GB bench host, but a flat 24g
would fail to launch (or swap) a 16-32 GB machine — the default must
derive from MemTotal, capped at half the host, with the env override
untouched."""

from amazon_s3_find_and_forget_spark.session import _default_driver_memory

GiB = 1 << 30


def test_big_host_keeps_measured_24g():
    assert _default_driver_memory(128 * GiB) == "24g"
    assert _default_driver_memory(48 * GiB) == "24g"


def test_small_host_caps_at_half_memtotal():
    assert _default_driver_memory(32 * GiB) == "16g"
    assert _default_driver_memory(16 * GiB) == "8g"
    assert _default_driver_memory(8 * GiB) == "4g"


def test_tiny_host_floors_at_2g():
    assert _default_driver_memory(2 * GiB) == "2g"
    assert _default_driver_memory(1 * GiB) == "2g"


def test_live_default_parses_and_is_bounded():
    """On the running host the derived default is a whole-GiB string
    in [2g, 24g]."""
    val = _default_driver_memory()
    assert val.endswith("g")
    assert 2 <= int(val[:-1]) <= 24
