from .session import get_spark
from .scoring import score_with_model, broadcast_model

__all__ = ["get_spark", "score_with_model", "broadcast_model"]
