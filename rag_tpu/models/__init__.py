from rag_tpu.models.stereo import (
    SITE_NAMES,
    HEAD_NAMES,
    build_site_specs,
    build_head_specs,
    init_sites,
    stereo_forward,
)
