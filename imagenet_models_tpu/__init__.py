"""imagenet_models_tpu — a TPU-native (JAX/Flax/Pallas) rebuild of the
Lab-LVM/imagenet-models model zoo and training stack.

The package re-implements, TPU-first, the capabilities of the reference
(GA: Gramian-Attention heads, ICCV 2023; MAP: Multi-token Attention Pooling,
WACV 2025) on top of JAX/XLA: NHWC layouts, bf16 compute with fp32 params,
SPMD data parallelism over a `jax.sharding.Mesh`, and Pallas kernels for the
hot blocks.
"""

__version__ = "0.1.0"

from imagenet_models_tpu.core.registry import (  # noqa: F401
    create_model,
    list_models,
    register_model,
)
