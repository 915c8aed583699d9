from .windowed import windowed_event_agg

__all__ = ["windowed_event_agg"]
