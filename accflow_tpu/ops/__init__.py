from accflow_tpu.ops.grids import (  # noqa: F401
    coords_grid,
    downflow8,
    resize_bilinear_align_corners,
    upflow8,
)
from accflow_tpu.ops.sampling import backwarp, bilinear_sample  # noqa: F401
from accflow_tpu.ops.upsample import convex_upsample, neighborhood3x3  # noqa: F401
from accflow_tpu.ops.corr import (  # noqa: F401
    CorrPyramid,
    OnDemandCorr,
    build_corr_on_demand,
    build_corr_operands,
    build_corr_pyramid,
    lookup,
    lookup_corr_on_demand,
    lookup_corr,
    lookup_corr_gather,
    lookup_corr_patch,
    lookup_corr_rows,
)
from accflow_tpu.ops.corr_pallas import (  # noqa: F401
    lookup_corr_fused_from_pyramid,
    lookup_corr_pallas,
)
from accflow_tpu.ops.occlusion import calc_occ_mask, photometric_occ  # noqa: F401
from accflow_tpu.ops.deform import deform_conv3x3  # noqa: F401
from accflow_tpu.ops.padding import InputPadder  # noqa: F401
