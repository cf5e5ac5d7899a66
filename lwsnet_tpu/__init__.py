"""lwsnet_tpu: TPU-native anytime stereo-depth engine (JAX/XLA/Pallas).

A from-scratch re-design of PrinceVictor/LWSNet's capabilities for TPU:
NHWC Flax modules, vectorized cost volumes, pjit data parallelism over a
device mesh, Pallas kernels for the memory-bound cost-volume path, and an
Orbax-backed training loop for SceneFlow pretrain + KITTI2015 finetune.
"""

from lwsnet_tpu.config import (DataConfig, MeshConfig, ModelConfig,
                               TrainConfig, finetune_config, pretrain_config)
from lwsnet_tpu.models.lwsnet import LWSNet

__version__ = "0.1.0"
