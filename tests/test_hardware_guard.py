"""The measured-policy hardware guard (utils/hardware.py): v5e-swept
constants must warn once on a foreign TPU generation and stay silent on
CPU/v5e."""

import warnings

from gs2d_tpu.utils import hardware


def _run(kind):
    hardware.warn_if_untuned.cache_clear()
    orig = hardware._device_kind
    hardware._device_kind = lambda: kind
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ok = hardware.warn_if_untuned.__wrapped__()
        return ok, [str(x.message) for x in w]
    finally:
        hardware._device_kind = orig


def test_cpu_silent():
    ok, msgs = _run("cpu")
    assert ok and not msgs


def test_v5e_silent():
    for kind in ("tpu v5 lite", "tpu v5e"):
        ok, msgs = _run(kind)
        assert ok and not msgs, kind


def test_foreign_tpu_warns():
    ok, msgs = _run("tpu v6e")
    assert not ok
    assert len(msgs) == 1
    assert "re-sweep" in msgs[0] and "v5e" in msgs[0]


def test_real_backend_does_not_warn_on_cpu():
    # The suite runs on the forced-CPU backend; the real path must be
    # silent there (policies are shape-only off-TPU).
    hardware._device_kind.cache_clear()
    hardware.warn_if_untuned.cache_clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert hardware.warn_if_untuned()
    assert not w
