from .generator import marketing_behavior_stream

__all__ = ["marketing_behavior_stream"]
