from imagenet_models_tpu.ckpt.torch_convert import (  # noqa: F401
    RuleTranslator,
    convert_torch_state_dict,
    export_torch_state_dict,
    load_torch_checkpoint,
)
