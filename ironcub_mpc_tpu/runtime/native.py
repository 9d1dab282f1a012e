"""ctypes bindings to the native runtime library (native/ironcub_rt.cc).

Provides the host-side real-time pieces as first-class native code — the
role C++ plays in the reference's runtime — with graceful pure-Python
fallbacks when the shared library hasn't been built:

- :class:`TelemetryRing`: lock-free SPSC ring of float records, drained to
  disk off the control thread;
- :class:`RealtimePacer`: absolute-deadline loop pacing with overrun
  accounting (clock_nanosleep under the hood).

Build once with ``python -m ironcub_mpc_tpu.runtime.native --build`` (cmake +
default generator) or ``bash native/build.sh``.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[2]
_LIB_PATHS = [
    ROOT / "native" / "build" / "libironcub_rt.so",
    ROOT / "native" / "libironcub_rt.so",
]


def build(verbose: bool = False) -> Path:
    """Compile the native library with CMake."""
    build_dir = ROOT / "native" / "build"
    build_dir.mkdir(exist_ok=True)
    kw = {} if verbose else {"capture_output": True}
    subprocess.run(["cmake", "-S", str(ROOT / "native"), "-B", str(build_dir)],
                   check=True, **kw)
    subprocess.run(["cmake", "--build", str(build_dir), "-j"], check=True, **kw)
    return build_dir / "libironcub_rt.so"


def _load():
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.ring_create.restype = ctypes.c_void_p
            lib.ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
            lib.ring_destroy.argtypes = [ctypes.c_void_p]
            lib.ring_push.restype = ctypes.c_int
            lib.ring_push.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float)]
            lib.ring_pop.restype = ctypes.c_size_t
            lib.ring_pop.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_size_t]
            lib.ring_dropped.restype = ctypes.c_uint64
            lib.ring_dropped.argtypes = [ctypes.c_void_p]
            lib.ring_size.restype = ctypes.c_size_t
            lib.ring_size.argtypes = [ctypes.c_void_p]
            lib.ring_drain_to_file.restype = ctypes.c_size_t
            lib.ring_drain_to_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.pacer_create.restype = ctypes.c_void_p
            lib.pacer_create.argtypes = [ctypes.c_double]
            lib.pacer_destroy.argtypes = [ctypes.c_void_p]
            lib.pacer_wait.restype = ctypes.c_int64
            lib.pacer_wait.argtypes = [ctypes.c_void_p]
            lib.pacer_overruns.restype = ctypes.c_uint64
            lib.pacer_overruns.argtypes = [ctypes.c_void_p]
            lib.pacer_worst_late_ns.restype = ctypes.c_int64
            lib.pacer_worst_late_ns.argtypes = [ctypes.c_void_p]
            lib.pacer_ticks.restype = ctypes.c_uint64
            lib.pacer_ticks.argtypes = [ctypes.c_void_p]
            lib.monotonic_ns.restype = ctypes.c_int64
            if hasattr(lib, "ring_stress"):
                lib.ring_stress.restype = ctypes.c_int
                lib.ring_stress.argtypes = [ctypes.c_size_t, ctypes.c_size_t,
                                            ctypes.c_uint64]
            return lib
    return None


def ring_stress(capacity: int, record_len: int, n_records: int) -> int:
    """Run the native concurrent SPSC stress (real producer vs consumer
    thread; ctypes releases the GIL for the call's duration). Returns 0 on
    success — see ironcub_rt.cc ring_stress for the error codes. Requires a
    library built from sources that include it."""
    if _LIB is None or not hasattr(_LIB, "ring_stress"):
        raise RuntimeError("native ring_stress unavailable (rebuild needed)")
    return int(_LIB.ring_stress(capacity, record_len, n_records))


_LIB = _load()


def available() -> bool:
    return _LIB is not None


class TelemetryRing:
    """SPSC float-record ring; native when built, deque fallback otherwise."""

    def __init__(self, capacity: int, record_len: int):
        self.record_len = record_len
        if _LIB is not None:
            self._h = _LIB.ring_create(capacity, record_len)
            self._native = True
        else:
            from collections import deque

            self._q = deque(maxlen=capacity)
            self._dropped = 0
            self._capacity = capacity
            self._native = False

    def push(self, record) -> bool:
        rec = np.ascontiguousarray(record, np.float32)
        assert rec.size == self.record_len
        if self._native:
            ptr = rec.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            return bool(_LIB.ring_push(self._h, ptr))
        if len(self._q) >= self._capacity:
            self._dropped += 1
            return False
        self._q.append(rec.copy())
        return True

    def pop(self, max_records: int) -> np.ndarray:
        if self._native:
            out = np.empty((max_records, self.record_len), np.float32)
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            n = _LIB.ring_pop(self._h, ptr, max_records)
            return out[:n]
        out = []
        while self._q and len(out) < max_records:
            out.append(self._q.popleft())
        return (np.stack(out) if out
                else np.empty((0, self.record_len), np.float32))

    @property
    def size(self) -> int:
        return _LIB.ring_size(self._h) if self._native else len(self._q)

    @property
    def dropped(self) -> int:
        return _LIB.ring_dropped(self._h) if self._native else self._dropped

    def drain_to_file(self, path: str) -> int:
        if self._native:
            return _LIB.ring_drain_to_file(self._h, str(path).encode())
        recs = self.pop(1 << 30)
        with open(path, "ab") as f:
            recs.tofile(f)
        return len(recs)

    def __del__(self):
        if getattr(self, "_native", False) and _LIB is not None:
            _LIB.ring_destroy(self._h)


class RealtimePacer:
    """Absolute-deadline period pacing with overrun accounting."""

    def __init__(self, period_s: float):
        self.period = period_s
        if _LIB is not None:
            self._h = _LIB.pacer_create(period_s)
            self._native = True
        else:
            self._native = False
            self._next = time.monotonic() + period_s
            self._overruns = 0
            self._worst = 0.0
            self._ticks = 0

    def wait(self) -> float:
        """Block until the next deadline; returns lateness in seconds
        (negative = slack)."""
        if self._native:
            return _LIB.pacer_wait(self._h) * 1e-9
        late = time.monotonic() - self._next
        if late < 0:
            time.sleep(-late)
        else:
            self._overruns += 1
            self._worst = max(self._worst, late)
        self._ticks += 1
        self._next += self.period
        return late

    @property
    def overruns(self) -> int:
        return _LIB.pacer_overruns(self._h) if self._native else self._overruns

    @property
    def worst_lateness(self) -> float:
        return (_LIB.pacer_worst_late_ns(self._h) * 1e-9 if self._native
                else self._worst)

    @property
    def ticks(self) -> int:
        return _LIB.pacer_ticks(self._h) if self._native else self._ticks

    def __del__(self):
        if getattr(self, "_native", False) and _LIB is not None:
            _LIB.pacer_destroy(self._h)


if __name__ == "__main__":
    if "--build" in sys.argv:
        path = build(verbose=True)
        print("built:", path)
    else:
        print("native runtime available:", available())
