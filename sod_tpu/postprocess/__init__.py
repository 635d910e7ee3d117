from sod_tpu.postprocess.bilateral_solver import (  # noqa: F401
    BilateralGrid,
    bilateral_solver_output,
)
