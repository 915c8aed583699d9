from .flagship import flagship_segmentation

__all__ = ["flagship_segmentation"]
