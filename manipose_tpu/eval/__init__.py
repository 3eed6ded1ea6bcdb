from .engine import EvalConfig, evaluate, flip_poses, make_eval_step

__all__ = ["EvalConfig", "evaluate", "flip_poses", "make_eval_step"]
