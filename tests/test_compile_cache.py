"""Persistent compilation cache (utils/compile_cache.py): executables
compiled by one process must be picked up from disk by the next —
cold-start elimination for serving warmup and the train step's first jit.

Proof shape: two fresh subprocesses jit the same function against the same
cache dir. The first populates it (entry files appear); the second produces
ZERO new entries (pure hits — jax only writes on a miss) and the same
numerics.
"""

import os
import subprocess
import sys

SCRIPT = r"""
import sys
from sam_textvqa_tpu.utils.compile_cache import enable_compile_cache

assert enable_compile_cache(sys.argv[1]) is not None

import jax
import jax.numpy as jnp


@jax.jit
def f(x, y):
    z = jnp.dot(x, y)
    return jnp.tanh(z).sum()


x = jnp.arange(64.0 * 32).reshape(64, 32) / 1000.0
y = jnp.arange(32.0 * 16).reshape(32, 16) / 1000.0
print("RESULT", float(f(x, y)))
"""


def _run(cache_dir, tmp_path):
    script = tmp_path / "cache_probe.py"
    script.write_text(SCRIPT)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # pin the CHILD to CPU for real: JAX_PLATFORMS=cpu alone is overridden
    # by the axon sitecustomize (jax.config.update at interpreter start);
    # clearing PALLAS_AXON_POOL_IPS disables that registration, otherwise
    # this hermetic cache test silently compiles over the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, str(script), str(cache_dir)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][0]
    return float(line.split()[1])


def _entries(cache_dir):
    return sorted(
        os.path.join(r, f)
        for r, _, files in os.walk(cache_dir)
        for f in files
    )


def test_second_process_hits_cache(tmp_path):
    cache = tmp_path / "xla_cache"
    r1 = _run(cache, tmp_path)
    after_first = _entries(cache)
    assert after_first, "first run wrote no cache entries"
    mtimes = {p: os.path.getmtime(p) for p in after_first}

    r2 = _run(cache, tmp_path)
    after_second = _entries(cache)
    assert after_second == after_first, (
        "second run compiled something new (cache miss)"
    )
    assert all(os.path.getmtime(p) == mtimes[p] for p in after_first)
    assert r1 == r2


def test_enable_compile_cache_env_and_disabled(tmp_path, monkeypatch):
    from sam_textvqa_tpu.utils.compile_cache import enable_compile_cache

    monkeypatch.delenv("SAM_COMPILE_CACHE", raising=False)
    assert enable_compile_cache(None) is None  # nothing configured: no-op
    monkeypatch.setenv("SAM_COMPILE_CACHE", str(tmp_path / "envcache"))
    got = enable_compile_cache(None)
    assert got == str(tmp_path / "envcache") and os.path.isdir(got)
    # explicit flag wins over the env var
    got = enable_compile_cache(str(tmp_path / "flagcache"))
    assert got == str(tmp_path / "flagcache")
