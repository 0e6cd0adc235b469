from .factory import get_model, MODEL_REGISTRY

__all__ = ["get_model", "MODEL_REGISTRY"]
