"""End-to-end inference pipeline: packaged API, crops, outputs, drawing."""

from synergynet_tpu.pipeline.api import (  # noqa: F401
    SynergyNet3DMM, preprocess_crops, MAX_FACES_PER_BATCH,
)
from synergynet_tpu.pipeline.outputs import (  # noqa: F401
    write_obj, write_obj_with_colors, write_obj_with_colors_texture,
    UVTextureMapper, load_uv_assets,
)
from synergynet_tpu.pipeline.draw import (  # noqa: F401
    draw_landmarks, draw_axis, viz_bbox,
)
from synergynet_tpu.pipeline.device_crop import (  # noqa: F401
    crop_resize_bilinear, crop_resize_matmul, crop_resize_hybrid,
    square_rois,
)
from synergynet_tpu.pipeline.api import FusedFrameEngine  # noqa: F401
from synergynet_tpu.pipeline.overlay_engine import (  # noqa: F401
    FusedOverlayEngine, render_lit_faces,
)
