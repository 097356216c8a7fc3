"""Import all model files so their @register_model factories populate the
registry (mirrors /root/reference/MAP/models/__init__.py glob-import)."""

from imagenet_models_tpu.models import convnext  # noqa: F401

try:  # models added incrementally; keep package importable mid-build
    from imagenet_models_tpu.models import ga_convnext  # noqa: F401
except ImportError:
    pass
try:
    from imagenet_models_tpu.models import resnet  # noqa: F401
except ImportError:
    pass
try:
    from imagenet_models_tpu.models import mobilenet  # noqa: F401
except ImportError:
    pass
try:
    from imagenet_models_tpu.models import pit  # noqa: F401
except ImportError:
    pass
try:
    from imagenet_models_tpu.models import ga_cswin  # noqa: F401
except ImportError:
    pass
try:
    from imagenet_models_tpu.models import maxvit  # noqa: F401
except ImportError:
    pass
try:
    from imagenet_models_tpu.models import fastervit  # noqa: F401
except ImportError:
    pass
