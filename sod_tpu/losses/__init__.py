from sod_tpu.losses.criterion import (  # noqa: F401
    Criterion,
    bce_loss_matrix,
    contrastive_loss,
    criterion_forward,
    dice_loss_matrix,
    focal_loss_matrix,
)
