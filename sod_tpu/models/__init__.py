from sod_tpu.models.vit import ViTConfig, vit_init, vit_apply, vit_small, vit_tiny, vit_base  # noqa: F401
from sod_tpu.models.maskformer import MaskFormerConfig, maskformer_init, maskformer_apply  # noqa: F401
