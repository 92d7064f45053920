"""Model families (ResNet/ViT/EfficientNet/ConvNeXt) + MLP-head
classifier + converters."""

from irp_tpu.models.resnet import ResNet, STAGE_SIZES  # noqa: F401
from irp_tpu.models.vit import VisionTransformer  # noqa: F401
from irp_tpu.models.efficientnet import EfficientNet  # noqa: F401
from irp_tpu.models.convnext import ConvNeXt  # noqa: F401
from irp_tpu.models.classifier import (  # noqa: F401
    Classifier,
    get_classifier,
    init_classifier,
    resolve_trainable_stages,
    weighted_cross_entropy,
)
from irp_tpu.models.convert import (  # noqa: F401
    load_torch_checkpoint,
    merge_pretrained,
    torch_state_dict_to_variables,
    flax_variables_to_torch_state_dict,
)
