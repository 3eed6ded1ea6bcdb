"""Test configuration: force CPU backend with 8 virtual devices so
sharding logic is exercised without TPU hardware, and expose loaders for
the reference PyTorch code as *parity oracles* (imported read-only from
/root/reference, never copied)."""

import importlib.util
import os
import sys
import types

# Force CPU with 8 virtual devices. NOTE: the env var alone is NOT enough
# here — the ambient axon sitecustomize merges JAX_PLATFORMS into
# "axon,cpu", so only the explicit config update actually switches
# platforms (otherwise every test compiles through the TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: CPU XLA compiles dominate test time.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-test-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REF_ROOT = "/root/reference/hpe"
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)


def load_ref_module(dotted_name: str):
    """Import a module from the reference tree, stubbing out package
    ``__init__``s that require unavailable deps (timm/mup).

    e.g. ``load_ref_module("mh_so3_hpe.architectures.utils.forward_kinematics")``
    """
    parts = dotted_name.split(".")
    # Ensure parent packages exist as (possibly stub) namespace packages.
    for i in range(1, len(parts)):
        pkg_name = ".".join(parts[:i])
        if pkg_name in sys.modules:
            continue
        pkg_path = os.path.join(REF_ROOT, *parts[:i])
        init_py = os.path.join(pkg_path, "__init__.py")
        needs_stub = pkg_name.endswith("architectures")
        if os.path.exists(init_py) and not needs_stub:
            importlib.import_module(pkg_name)
        else:
            stub = types.ModuleType(pkg_name)
            stub.__path__ = [pkg_path]
            sys.modules[pkg_name] = stub
    if dotted_name in sys.modules:
        return sys.modules[dotted_name]
    file_path = os.path.join(REF_ROOT, *parts) + ".py"
    spec = importlib.util.spec_from_file_location(dotted_name, file_path)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = ".".join(parts[:-1])
    sys.modules[dotted_name] = mod
    spec.loader.exec_module(mod)
    return mod
