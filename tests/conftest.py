"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths compile and execute without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's axon sitecustomize pins jax_platforms to "axon,cpu" at
# interpreter start (routing every op to the remote TPU tunnel — painfully
# slow for eager test code). Re-pin to CPU before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def install_reference_shims():
    """Make reference modules importable as parity oracles: provide a minimal
    ``easydict`` (attribute-access dict) since the pip package is absent."""
    import types

    if "easydict" not in sys.modules:
        class EasyDict(dict):
            def __init__(self, d=None, **kwargs):
                super().__init__()
                d = dict(d or {}, **kwargs)
                for k, v in d.items():
                    self[k] = v

            def __setitem__(self, k, v):
                if isinstance(v, dict) and not isinstance(v, EasyDict):
                    v = EasyDict(v)
                super().__setitem__(k, v)
                super().__setattr__(k, v)

            __setattr__ = __setitem__

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

        mod = types.ModuleType("easydict")
        mod.EasyDict = EasyDict
        sys.modules["easydict"] = mod
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def load_reference_processors():
    """Load reference sam/datasets/processors.py with stub parent packages
    (its package __init__ chain needs lmdb + a py3.6 cphoc.so; we substitute
    our bit-parity PHOC and skip the dataset imports)."""
    import types

    install_reference_shims()
    if "sam.datasets.processors" in sys.modules:
        return sys.modules["sam.datasets.processors"]

    # parent package stubs
    sam_pkg = types.ModuleType("sam")
    sam_pkg.__path__ = [os.path.join(REFERENCE_ROOT, "sam")]
    sys.modules.setdefault("sam", sam_pkg)
    ds_pkg = types.ModuleType("sam.datasets")
    ds_pkg.__path__ = [os.path.join(REFERENCE_ROOT, "sam", "datasets")]
    sys.modules["sam.datasets"] = ds_pkg
    phoc_pkg = types.ModuleType("sam.phoc")
    from sam_textvqa_tpu.ops.phoc import build_phoc as _our_phoc

    phoc_pkg.build_phoc = _our_phoc  # bit-parity verified in test_phoc.py
    sys.modules["sam.phoc"] = phoc_pkg

    import importlib.util

    for name, rel in [
        ("sam.spatial_utils", "sam/spatial_utils.py"),
        ("sam.datasets.textvqa_vocab", "sam/datasets/textvqa_vocab.py"),
        ("sam.datasets.processors", "sam/datasets/processors.py"),
    ]:
        path = os.path.join(REFERENCE_ROOT, rel)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["sam.datasets.processors"]


def load_reference_module(relpath: str, name: str):
    """Load a single reference module by file path, bypassing package
    ``__init__`` chains that require unavailable native deps (lmdb, cphoc)."""
    import importlib.util

    install_reference_shims()
    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
