"""Persistent XLA compilation cache.

First compiles through this image's remote-compile tunnel take minutes for a
ViT-B program; the on-disk cache makes every later process reuse them.

The cache directory is namespaced by a host fingerprint: XLA:CPU AOT
executables are machine-code specialized to the compiling host's LLVM
target features, and loading them on a different host logs
"could lead to execution errors such as SIGILL" and can genuinely crash.
/proc/cpuinfo flags are NOT a sufficient identity — virtualized hosts
present identical generic cpuinfo while LLVM's CPUID-derived feature set
(e.g. the model-keyed ``+prefer-no-gather`` tuning) differs. So the tag is
built from the CPUID leaves LLVM actually reads (executed directly via a
ctypes code page), falling back to the fullest cpuinfo identity available,
and always includes the jaxlib version (serialization format).

Known cosmetic residue (measured, round 4): the cpu_aot_loader warning
also fires for blobs compiled BY THIS SAME MACHINE — XLA's compiler
records tuning flags (``+prefer-no-scatter/+prefer-no-gather``) in the
target feature string, while the loader re-derives host features without
them and flags the "unsupported" difference. Same-host loads are safe
(identical machine code); the namespace exists to stop the genuinely
dangerous cross-host loads, which it now does.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpuid_probe() -> str:
    """Raw CPUID leaves as a string, or '' on any failure.

    Covers the leaves LLVM's getHostCPUName/getHostCPUFeatures read:
    family/model/stepping (leaf 1), feature bits (1, 7.0, 7.1, 0xD.1,
    extended 0x80000001), executed with the real CPUID instruction so VM
    CPUID filtering is captured exactly as the compiler sees it.
    """
    try:
        import ctypes
        import mmap

        # mov r9, rdx (save: rdx holds arg3 ptr in SysV); mov eax, edi;
        # mov ecx, esi; cpuid; store eax/ebx/ecx/edx to [r9]; ret
        code = bytes.fromhex(
            "4989d1"          # mov r9, rdx
            "89f8"            # mov eax, edi
            "89f1"            # mov ecx, esi
            "0fa2"            # cpuid
            "418901"          # mov [r9], eax
            "41895904"        # mov [r9+4], ebx
            "41894908"        # mov [r9+8], ecx
            "4189510c"        # mov [r9+12], edx
            "c3"              # ret
        )
        buf = mmap.mmap(-1, len(code), prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC)
        buf.write(code)
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        fn = ctypes.CFUNCTYPE(
            None, ctypes.c_uint32, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32 * 4)
        )(addr)
        out = []
        for leaf, subleaf in [
            (0, 0), (1, 0), (7, 0), (7, 1), (0xD, 1),
            (0x80000000, 0), (0x80000001, 0), (0x80000008, 0),
        ]:
            regs = (ctypes.c_uint32 * 4)()
            fn(leaf, subleaf, ctypes.byref(regs))
            out.append(f"{leaf:x}.{subleaf:x}:" + ",".join(f"{r:08x}" for r in regs))
        del fn  # keep buf alive past the last call, then release
        buf.close()
        return ";".join(out)
    except Exception:
        return ""


def _cpuinfo_identity() -> str:
    """Fallback: the fullest identity /proc/cpuinfo offers (flags alone
    collide across virtual hosts; model/stepping/bugs narrow it)."""
    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "microcode", "flags", "bugs")
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # first processor block only
                if line.split(":")[0].strip() in keys:
                    lines.append(line.strip())
    except OSError:
        pass
    return "|".join(lines)


def _host_tag() -> str:
    ident = _cpuid_probe() or _cpuinfo_identity()
    try:
        import jaxlib

        jl = jaxlib.__version__
    except Exception:
        jl = ""
    h = hashlib.sha256(
        (platform.machine() + ident + jl).encode()
    ).hexdigest()[:10]
    return f"host-{h}"


def enable(path: str = "/root/.jax_cache") -> None:
    try:
        import jax

        path = os.path.join(path, _host_tag())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


# ---------------------------------------------------------------- counters
#
# Compile/hit accounting for the whole-run retrace audit (bench.py
# --end-to-end): a per-task retrace regression would otherwise ship
# invisibly — steady-state step benchmarks never see compile time.

_counters = {"events": {}, "durations": {}}
_installed = False


def install_counters() -> None:
    """Start counting jax.monitoring events: backend compiles (count +
    seconds), persistent-cache hits/misses, trace time. Idempotent."""
    global _installed
    if _installed:
        return
    try:
        from jax import monitoring

        def _on_event(name, **kw):
            _counters["events"][name] = _counters["events"].get(name, 0) + 1

        def _on_duration(name, secs, **kw):
            cnt, tot = _counters["durations"].get(name, (0, 0.0))
            _counters["durations"][name] = (cnt + 1, tot + float(secs))

        monitoring.register_event_listener(_on_event)
        monitoring.register_event_duration_secs_listener(_on_duration)
        _installed = True
    except Exception:
        pass


def counters_snapshot() -> dict:
    """{"compiles": n, "compile_secs": s, "cache_hits": n, "traces": n}
    plus the raw event tables (cumulative since install_counters)."""
    ev, du = _counters["events"], _counters["durations"]

    def _sum(table, needle, idx=None):
        if idx is None:
            return sum(v for k, v in table.items() if needle in k)
        return sum(v[idx] for k, v in table.items() if needle in k)

    return {
        "compiles": _sum(du, "backend_compile", 0),
        "compile_secs": round(_sum(du, "backend_compile", 1), 2),
        "cache_hits": _sum(ev, "cache_hit") + _sum(du, "cache_hit", 0),
        "traces": _sum(du, "trace", 0),
        "trace_secs": round(_sum(du, "trace", 1), 2),
        "raw_events": dict(ev),
        "raw_durations": {k: (v[0], round(v[1], 2)) for k, v in du.items()},
    }
