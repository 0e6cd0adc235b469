from .config import TrainConfig, load_config, DEFAULT_CONFIGS

__all__ = ["TrainConfig", "load_config", "DEFAULT_CONFIGS"]
