"""Import all model files so their @register_model factories populate the
registry (mirrors /root/reference/MAP/models/__init__.py glob-import)."""

from imagenet_models_tpu.models import (  # noqa: F401
    convnext,
    fastervit,
    ga_convnext,
    ga_cswin,
    maxvit,
    mobilenet,
    pit,
    resnet,
)
