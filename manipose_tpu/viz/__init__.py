from .prepare import prep_data_for_viz, prepare_prediction_for_viz
from .render import (
    render_animation,
    render_frame_prediction,
    render_rotated_frame_prediction,
)

__all__ = [
    "prep_data_for_viz",
    "prepare_prediction_for_viz",
    "render_animation",
    "render_frame_prediction",
    "render_rotated_frame_prediction",
]
