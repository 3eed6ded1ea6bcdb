from .prepare import prep_data_for_viz, prepare_prediction_for_viz
from .render import (
    render_animation,
    render_frame_prediction,
    render_rotated_frame_prediction,
)
from .video import ffmpeg_available, get_resolution, load_frames, read_video

__all__ = [
    "prep_data_for_viz",
    "prepare_prediction_for_viz",
    "render_animation",
    "render_frame_prediction",
    "render_rotated_frame_prediction",
    "ffmpeg_available",
    "get_resolution",
    "load_frames",
    "read_video",
]
