"""Rendering: data-parallel z-buffer rasterizer, normals, Phong lighting,
overlay composition — the TPU-native Sim3DR."""

from synergynet_tpu.render.raster import (  # noqa: F401
    rasterize, rasterize_buffers, blend_uint8, window_for, DEPTH_INIT,
)
from synergynet_tpu.render.normals import (  # noqa: F401
    get_normal, get_tri_normal, get_ver_normal,
)
from synergynet_tpu.render.lighting import (  # noqa: F401
    RenderPipeline, compute_vertex_light, OVERLAY_LIGHT_CFG,
)
from synergynet_tpu.render.overlay import (  # noqa: F401
    render_overlay, add_weighted_u8,
)
from synergynet_tpu.render.raster import rasterize_triangles  # noqa: F401
from synergynet_tpu.render.raster_tiled import (  # noqa: F401
    rasterize_tiled, rasterize_buffers_tiled, rasterize_triangles_tiled,
    replication_for,
)
from synergynet_tpu.render.texture import (  # noqa: F401
    render_texture, rasterize_texture_buffers,
)
