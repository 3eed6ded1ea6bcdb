#!/usr/bin/env python
"""Side-by-side checkpoint visualizer (reference: hpe/viz.py).

Renders >=1 checkpoints next to the ground truth for one
(subject, action, camera) video:

  python scripts/viz.py run.viz=true \\
      model.arch=rmcl_manifold,mixste \\
      run.checkpoint_model=/ckpts/manipose.pth,/ckpts/mixste.pth \\
      data.data_dir=/path/to/data viz.viz_action=greeting
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from manipose_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from manipose_tpu.config import load_config  # noqa: E402

METHODS = {"rmcl_manifold": "MHMC", "manifold": "Manifold", "mixste": "MixSTE"}


def main(cfg):
    from manipose_tpu.config import config_from_dict
    from manipose_tpu.drivers.common import init_model_params, instantiate_model
    from manipose_tpu.drivers.h36m import fetch_and_prepare_data
    from manipose_tpu.train.checkpoint import load_torch_checkpoint
    from manipose_tpu.viz.driver import lift_for_viz
    from manipose_tpu.viz.prepare import prep_data_for_viz, prepare_prediction_for_viz
    from manipose_tpu.viz.render import render_animation

    figures_dir = Path(cfg.run.output_dir) / "figures"
    figures_dir.mkdir(parents=True, exist_ok=True)

    keypoints, dataset = fetch_and_prepare_data(cfg)
    loader, input_keypoints, ground_truth, cam = prep_data_for_viz(
        cfg, dataset=dataset, keypoints=keypoints
    )

    archs = cfg.model.arch.split(",")
    checkpoints = (cfg.run.checkpoint_model or "").split(",")
    assert len(archs) == len(checkpoints), "one checkpoint per arch"

    anim_output = {}
    n_frames = None
    for arch, ckpt in zip(archs, checkpoints):
        sub_cfg = config_from_dict(dict(cfg))
        sub_cfg.model.arch = arch
        model, rmcl = instantiate_model(sub_cfg, dataset.skeleton)
        if ckpt:
            variables = jax.tree_util.tree_map(
                jnp.asarray, load_torch_checkpoint(ckpt, arch)
            )
        else:
            variables = init_model_params(model, sub_cfg, dataset.skeleton.num_joints)
        multihyp = bool(cfg.viz.hypothesis) and rmcl
        prediction = lift_for_viz(
            model.apply, variables, loader, dataset.skeleton, sub_cfg, rmcl,
            return_hyps=multihyp,
        )
        n_frames = min(
            prediction.shape[0],
            ground_truth.shape[0],
            n_frames or prediction.shape[0],
        )
        title = METHODS.get(arch, arch)
        if title in anim_output:
            # two checkpoints of the same arch: disambiguate the panel
            # title instead of silently overwriting the first
            title = f"{title} ({Path(ckpt).stem or len(anim_output)})"
        anim_output[title] = prepare_prediction_for_viz(
            prediction[:n_frames], cam, multihyp=multihyp
        )

    anim_output = {k: v[:n_frames] for k, v in anim_output.items()}
    anim_output["Ground truth"] = prepare_prediction_for_viz(
        ground_truth[:n_frames], cam
    )

    output_name = cfg.viz.viz_output or (
        f"{'_'.join(archs)}_{cfg.viz.viz_subject}_{cfg.viz.viz_action}_"
        f"{cfg.viz.viz_camera}.{cfg.viz.extension}"
    )
    out = render_animation(
        keypoints=input_keypoints[:n_frames],
        poses=anim_output,
        skeleton=dataset.skeleton,
        fps=dataset.fps,
        output=str(figures_dir / output_name),
        azim=cam["azimuth"],
        viewport=(cam["res_w"], cam["res_h"]),
        limit=cfg.viz.viz_limit,
        downsample=cfg.viz.viz_downsample,
        size=cfg.viz.viz_size,
        bitrate=cfg.viz.viz_bitrate,
        input_video_path=cfg.viz.viz_video,
        input_video_skip=cfg.viz.viz_skip,
    )
    print(f"Rendered: {out}")


if __name__ == "__main__":
    main(load_config("config", overrides=sys.argv[1:]))
