"""Profiling & tracing: device traces, named spans, per-stage timers.

The reference's observability is ad-hoc wall-clock timers
(reference FaceBoxes/utils/timer.py:13-43, benchmark.py:122-135,
main_train.py:107-153). Here profiling is a first-class module:

- :func:`trace` / :class:`annotate` wrap ``jax.profiler`` so any region of
  the pipeline can emit an XLA device trace viewable in TensorBoard/XProf
  (set a directory, run, open the trace).
- :class:`StageTimer` measures named stages with host wall clock and
  correct device synchronization (``block_until_ready`` on exit), the
  accurate version of the reference's ``Timer``.
- :func:`measure` benchmarks a compiled callable (compile excluded).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in device traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating per-stage wall timer with device sync.

    >>> t = StageTimer()
    >>> with t.stage("decode"):
    ...     out = decode(...)          # device work
    >>> t.report()
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._last_result: Any = None

    @contextlib.contextmanager
    def stage(self, name: str, result: Any = None):
        start = time.perf_counter()
        try:
            yield self
        finally:
            if self.sync and self._last_result is not None:
                jax.block_until_ready(self._last_result)
                self._last_result = None
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def observe(self, result: Any) -> Any:
        """Register device output so the enclosing stage syncs on it."""
        self._last_result = result
        return result

    def averages(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self) -> str:
        lines = [f"{k}: total {self.totals[k] * 1e3:.2f} ms over "
                 f"{self.counts[k]} call(s), avg {v * 1e3:.3f} ms"
                 for k, v in self.averages().items()]
        return "\n".join(lines)


def measure(fn: Callable, *args, iters: int = 20, warmup: int = 2,
            **kwargs) -> Dict[str, float]:
    """Benchmark a jitted callable: seconds/call and calls/sec, compile
    excluded (warmup runs first)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_call": dt, "calls_per_sec": 1.0 / dt}


def device_memory_stats(device: Optional[jax.Device] = None
                        ) -> Dict[str, int]:
    """Live/peak HBM usage where the backend reports it."""
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def cache_fingerprint(xla_flags: str = None) -> str:
    """Short hash of everything that silently invalidates persistent-cache
    entries without changing their cache key: the XLA flags the process runs
    under, the platform selection, the host CPU's feature flags, the VM
    boot id, and the jax version.

    XLA:CPU AOT executables embed target-machine features chosen at compile
    time (including plugin-injected pseudo-features like
    ``+prefer-no-scatter``); loading an entry written under different flags
    or on a different host logs ``cpu_aot_loader`` feature-mismatch errors
    and can SIGILL or change reduction codegen (observed: a TPU-tunnel
    process's host-side entries poisoning the CPU test suite's cache).
    Suffixing every cache dir with this fingerprint keeps incompatible
    writers in separate directories.

    The hash covers the CPU *model* lines, not just the ISA flag list:
    LLVM derives tuning pseudo-features (``+prefer-no-gather`` /
    ``+prefer-no-scatter``, the Intel GDS-mitigation avoidance) from the
    detected CPU model, so two hosts with identical /proc/cpuinfo flags
    but different models still produce mutually mismatched AOT entries
    (observed round 4: a VM reboot onto a different model silently shared
    the dir and every load logged feature mismatches).
    """
    import hashlib
    import platform as _platform

    flags = (os.environ.get("XLA_FLAGS", "") if xla_flags is None
             else xla_flags)
    cpu_parts = [_platform.machine()]
    # LLVM detects the CPU via cpuid, not /proc/cpuinfo, so two VMs with
    # byte-identical cpuinfo model/flags lines can still disagree on the
    # derived tuning pseudo-features (observed round 5: a dryrun on a new
    # host VM loaded the old VM's AOT entries under the same fingerprint
    # and logged +prefer-no-scatter mismatches). The boot id pins entries
    # to one boot of one VM — the only scope where cpuid is constant.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            cpu_parts.append(f.read().strip())
    except OSError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                k = line.split(":", 1)[0].strip()
                if k in ("vendor_id", "cpu family", "model", "model name",
                         "stepping"):
                    cpu_parts.append(line.strip())
                elif k == "flags":
                    cpu_parts.append(
                        " ".join(sorted(line.split(":", 1)[1].split())))
                    break       # one logical-CPU block is enough
    except OSError:
        pass
    key = "|".join([jax.__version__, os.environ.get("JAX_PLATFORMS", ""),
                    flags, *cpu_parts])
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def enable_compile_cache(path: str = "/tmp/synergy_jax_cache",
                         min_compile_secs: float = 2.0) -> None:
    """Enable JAX's persistent compilation cache (first compiles of the big
    jitted programs take minutes on some backends; cached reloads are
    seconds). Call early, before the first jit dispatch.

    ``path`` is suffixed with :func:`cache_fingerprint` so processes running
    under different XLA flags / platforms / hosts never share entries."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          f"{path}-{cache_fingerprint()}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
