from .params import (DeformHiddenConfig, FullConfig, ModelConfig,  # noqa: F401
                     OptimizationConfig, PipelineConfig, apply_overrides)
