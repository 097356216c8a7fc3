from imagenet_models_tpu.core.registry import create_model, list_models, register_model  # noqa: F401
