"""Measure reference ManiPose train-step throughput (torch CPU).
Stubs timm/mup (identity DropPath at p=0-eval / Linear MuReadout) so the
reference imports; runs fwd+bwd+Adam steps and reports seq/sec.

NOTE: the stubs/skeleton here deliberately DUPLICATE
tests/conftest.install_reference_stubs + test_geometry._reference_h36m_17
instead of importing them: this is a pure-torch timing tool and pulling
in conftest would initialize JAX (and pin its backend config) inside the
measured process. If the conftest stubs gain a fix, mirror it here —
this tool anchors bench.py's REFERENCE_SEQ_PER_SEC."""
import sys, time, types
import torch, torch.nn as nn

# stub timm.models.layers.DropPath (used train-only; full module for fairness)
timm = types.ModuleType("timm"); ml = types.ModuleType("timm.models")
layers = types.ModuleType("timm.models.layers")
class DropPath(nn.Module):
    def __init__(self, p): super().__init__(); self.p = p
    def forward(self, x):
        if not self.training or self.p == 0.: return x
        keep = 1 - self.p
        mask = torch.rand(x.shape[0], *([1]*(x.dim()-1))) < keep
        return x * mask / keep
layers.DropPath = DropPath
ml.layers = layers; timm.models = ml
sys.modules.update({"timm": timm, "timm.models": ml, "timm.models.layers": layers})
mup = types.ModuleType("mup")
mup.MuReadout = nn.Linear
sys.modules["mup"] = mup

sys.path.insert(0, "/root/reference/hpe")
from mh_so3_hpe.architectures.rmcl_manifold_mix_ste import RMCLManifoldMixSTE
from mh_so3_hpe.data.h36m_lifting import h36m_skeleton
import copy
skel = copy.deepcopy(h36m_skeleton)
skel.remove_joints([4,5,9,10,11,16,20,21,22,23,24,28,29,30,31])
skel._parents[11] = 8; skel._parents[14] = 8
skel._compute_metadata()

# patch the hardcoded .cuda() epsilon in rotation_tools
import mh_so3_hpe.architectures.utils.rotation_tools as rt
def normalize_vector(v):
    mag = torch.sqrt(v.pow(2).sum(1))
    mag = torch.max(mag, torch.tensor([1e-8]))
    return v / mag.view(-1, 1)
rt.normalize_vector = normalize_vector
import mh_so3_hpe.architectures.pose_decoder  # ensure bound copies? uses module-level import
# pose_decoder imported compute_rotation_matrix_from_ortho6d directly; patch there too
import mh_so3_hpe.architectures.pose_decoder as pd
def c6d(poses):
    x = normalize_vector(poses[:, 0:3])
    z = normalize_vector(torch.cross(x, poses[:, 3:6], dim=1))
    y = torch.cross(z, x, dim=1)
    return torch.stack([x, y, z], dim=2)
pd.compute_rotation_matrix_from_ortho6d = c6d

B, L = 3, 243
model = RMCLManifoldMixSTE(skeleton=skel, num_frame=L, n_hyp=5)
model.train()
opt = torch.optim.Adam(model.parameters(), lr=4e-5, weight_decay=1e-6)
x = torch.randn(B, L, 17, 2)
y = torch.randn(B, L, 17, 3)
from mh_so3_hpe.metrics import wta_l2_loss_and_activate_head
def step():
    opt.zero_grad()
    poses, scores = model(x)
    loss, _ = wta_l2_loss_and_activate_head(poses, y)
    loss.mean().backward()
    opt.step()
step()  # warmup
n = 3
t0 = time.perf_counter()
for _ in range(n): step()
dt = (time.perf_counter() - t0) / n
print(f"reference torch-CPU: {dt:.3f}s/step, {B/dt:.4f} seq/s (B={B}, L={L})")
