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

# 8 virtual devices timeshare this host's core(s): under background load
# a collective participant can miss XLA:CPU's 40 s rendezvous abort
from manipose_tpu.utils.platform import relax_cpu_collective_timeouts  # noqa: E402

relax_cpu_collective_timeouts()

# Persistent compilation cache: CPU XLA compiles dominate test time.
# Per-host fingerprinted dir — a foreign XLA:CPU AOT entry surviving a
# host migration in a shared cache dir can SIGILL or wedge a collective
# rendezvous (VERDICT r3 #1; utils.platform.cpu_cache_dir).
from manipose_tpu.utils.platform import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REF_ROOT = "/root/reference/hpe"
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)


def install_reference_stubs():
    """Make the reference *architectures* importable on CPU: stub timm
    (DropPath) and mup (MuReadout=Linear), and patch the hardcoded-CUDA
    ``normalize_vector`` (``rotation_tools.py:6-17``) with the same math
    device-neutrally. Returns the patched rotation-matrix fn."""
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        ml = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            def __init__(self, p):
                super().__init__()
                self.p = p

            def forward(self, x):
                if not self.training or self.p == 0.0:
                    return x
                keep = 1 - self.p
                mask = torch.rand(x.shape[0], *([1] * (x.dim() - 1))) < keep
                return x * mask / keep

        layers.DropPath = DropPath
        ml.layers = layers
        timm.models = ml
        sys.modules.update(
            {"timm": timm, "timm.models": ml, "timm.models.layers": layers}
        )
    if "mup" not in sys.modules:
        mup = types.ModuleType("mup")
        mup.MuReadout = nn.Linear
        sys.modules["mup"] = mup

    rt = load_ref_module("mh_so3_hpe.architectures.utils.rotation_tools")

    def normalize_vector(v):
        mag = torch.sqrt(v.pow(2).sum(1))
        mag = torch.max(mag, torch.tensor([1e-8]))
        return v / mag.view(-1, 1)

    def rot6d(poses):
        x = normalize_vector(poses[:, 0:3])
        z = normalize_vector(torch.cross(x, poses[:, 3:6], dim=1))
        y = torch.cross(z, x, dim=1)
        return torch.stack([x, y, z], dim=2)

    rt.normalize_vector = normalize_vector
    pd = load_ref_module("mh_so3_hpe.architectures.pose_decoder")
    pd.compute_rotation_matrix_from_ortho6d = rot6d
    return rot6d


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


def install_driver_stubs():
    """Make the reference DRIVER modules importable (main_h36m_lifting,
    eval_utils): stub omegaconf/hydra/mup-optim/mlflow, and publish the
    architectures into the stubbed ``mh_so3_hpe.architectures`` package.
    Returns the loaded reference rmcl module. Idempotent — the single
    source of truth for the driver-level stub scaffolding (tests AND
    tools/h36m_head_to_head.py share it)."""
    import torch

    install_reference_stubs()
    ref_rmcl = load_ref_module(
        "mh_so3_hpe.architectures.rmcl_manifold_mix_ste"
    )
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.DictConfig = dict
        sys.modules["omegaconf"] = om
    om = sys.modules["omegaconf"]
    if not hasattr(om, "ListConfig"):
        om.ListConfig = list
    if not hasattr(om, "OmegaConf"):
        om.OmegaConf = types.SimpleNamespace(to_yaml=lambda c: str(c))
    arch = sys.modules["mh_so3_hpe.architectures"]
    arch.RMCLManifoldMixSTE = ref_rmcl.RMCLManifoldMixSTE
    arch.ManifoldMixSTE = load_ref_module(
        "mh_so3_hpe.architectures.manifold_mix_ste"
    ).ManifoldMixSTE
    arch.MixSTE = load_ref_module("mh_so3_hpe.architectures.mix_ste").MixSTE
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hydra.main = lambda **kw: (lambda f: f)
        hydra.utils = types.ModuleType("hydra.utils")
        hydra.utils.get_original_cwd = lambda: "."
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hydra.utils
    mup = sys.modules["mup"]
    mup.make_base_shapes = lambda *a, **k: None
    mup.set_base_shapes = lambda m, *a, **k: m
    if "mup.optim" not in sys.modules:
        mup_optim = types.ModuleType("mup.optim")
        mup_optim.MuAdam = torch.optim.Adam
        sys.modules["mup.optim"] = mup_optim
    if "mup.init" not in sys.modules:
        mup_init = types.ModuleType("mup.init")
        mup_init.kaiming_uniform_ = torch.nn.init.kaiming_uniform_
        sys.modules["mup.init"] = mup_init
        mup.init = mup_init
    if "mlflow" not in sys.modules:
        sys.modules["mlflow"] = types.ModuleType("mlflow")
    return ref_rmcl
