#!/usr/bin/env python
"""Environment doctor: one PASS/FAIL line per runtime dependency.

Every jax check runs in a SUBPROCESS with a timeout, because the axon TPU
tunnel can wedge so hard that even ``jax.devices()`` never returns (seen
2026-08-18; killing a client mid-compile is the suspected trigger) — a
wedged tunnel must produce a FAIL line here, not hang the doctor.

Usage: python tools/check_env.py        # exit 0 iff everything required passes
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FAILED = []


def report(name: str, ok: bool, detail: str = "", required: bool = True):
    tag = "PASS" if ok else ("FAIL" if required else "warn")
    print(f"[{tag}] {name}{': ' + detail if detail else ''}", flush=True)
    if required and not ok:
        FAILED.append(name)


def run_py(code: str, timeout: float, env_extra=None):
    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout, env=env, cwd=REPO,
        )
        return out.returncode == 0, (out.stdout + out.stderr).strip()
    except subprocess.TimeoutExpired:
        return False, f"timed out after {timeout:.0f}s"


def main():
    cores = os.cpu_count() or 1
    report("cpu cores", True, f"{cores}"
           + (" — serialize heavy runs, see verify skill" if cores == 1
              else ""))

    ok, msg = run_py(
        "import jax; d = jax.devices(); print(d[0].platform, len(d))",
        timeout=90.0,
    )
    report("TPU tunnel (axon)", ok,
           msg.splitlines()[-1] if msg else "",
           required=False)  # chip outages are environmental, not our bug
    if not ok:
        print("       -> tunnel wedged or absent; pin work to the CPU mesh:")
        print("          PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8")

    ok, msg = run_py(
        "import jax; print(len(jax.devices()))",
        timeout=60.0,
        env_extra={
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
    )
    report("virtual 8-device CPU mesh", ok and msg.endswith("8"), msg)

    ok, msg = run_py(
        "from sam_textvqa_tpu.ops import batcher; "
        "print('native' if batcher._try_build_native() else 'python')",
        timeout=120.0,
    )
    report("csrc native batcher (.so)", ok and msg.endswith("native"), msg)

    ok, msg = run_py(
        "from sam_textvqa_tpu.ops.phoc import _native_lib; "
        "print('native' if _native_lib() is not None else 'python')",
        timeout=120.0,
    )
    report("csrc native PHOC (.so)", ok and msg.endswith("native"), msg,
           required=False)

    report("reference mount", os.path.isdir("/root/reference/sam"),
           "/root/reference", required=False)

    for mod in ("lmdb", "fasttext", "editdistance", "easydict"):
        try:
            __import__(mod)
            present = True
        except ImportError:
            present = False
        report(f"optional dep {mod}", True,
               "present" if present else "absent (gated fallback active)",
               required=False)

    print(json.dumps({"failed": FAILED}))
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
