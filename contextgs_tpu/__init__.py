"""ContextGS-TPU: a TPU-native compressed 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of ContextGS
(NeurIPS 2024): anchor-based neural Gaussian scenes (Scaffold-GS), quantization-
aware entropy training, a multi-level autoregressive anchor context model, and
arithmetic coding to a compact bitstream — designed for TPU meshes rather than
single-GPU CUDA.

Reference behavior spec: /root/reference (wyf0912/ContextGS); see SURVEY.md.
"""

__version__ = "0.1.0"

from contextgs_tpu.config import (  # noqa: F401
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    TrainConfig,
)
