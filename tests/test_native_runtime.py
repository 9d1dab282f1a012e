"""Native runtime library: ring buffer semantics, pacer accounting, and the
pure-Python fallback paths."""

import time

import numpy as np
import pytest

from ironcub_mpc_tpu.runtime import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        try:
            native.build()
        except Exception:
            pytest.skip("cmake build unavailable")
        # reload bindings
        native._LIB = native._load()
    assert native.available()


def test_ring_fifo_and_drop_accounting():
    ring = native.TelemetryRing(capacity=64, record_len=4)
    for i in range(100):
        ring.push(np.full(4, i, np.float32))
    assert ring.size == 64
    assert ring.dropped == 36  # overflow dropped, not overwritten
    out = ring.pop(100)
    assert out.shape == (64, 4)
    np.testing.assert_allclose(out[:, 0], np.arange(64))  # FIFO order
    assert ring.size == 0


def test_ring_drain_to_file(tmp_path):
    ring = native.TelemetryRing(capacity=32, record_len=3)
    for i in range(10):
        ring.push(np.array([i, 2 * i, 3 * i], np.float32))
    path = tmp_path / "tel.bin"
    n = ring.drain_to_file(str(path))
    assert n == 10
    back = np.fromfile(path, np.float32).reshape(-1, 3)
    np.testing.assert_allclose(back[:, 1], 2 * np.arange(10))


def test_pacer_keeps_schedule():
    p = native.RealtimePacer(0.002)
    t0 = time.monotonic()
    for _ in range(25):
        p.wait()
    wall = time.monotonic() - t0
    # absolute deadlines: the pacer never runs ahead of the schedule, and on a
    # loaded CI box it may lag; allow generous forward slack but no early wake.
    assert 0.045 < wall < 0.12, wall
    assert p.ticks == 25


def test_pacer_overrun_accounting():
    p = native.RealtimePacer(0.001)
    time.sleep(0.02)  # blow through ~20 deadlines
    late = p.wait()
    assert late > 0.01
    assert p.overruns >= 1
    assert p.worst_lateness > 0.01


def test_python_fallback_ring():
    """Fallback implementation must expose the same semantics."""
    saved = native._LIB
    try:
        native._LIB = None
        ring = native.TelemetryRing(capacity=8, record_len=2)
        for i in range(12):
            ring.push(np.array([i, i], np.float32))
        assert ring.size == 8 and ring.dropped == 4
        out = ring.pop(20)
        np.testing.assert_allclose(out[:, 0], np.arange(8))
    finally:
        native._LIB = saved
