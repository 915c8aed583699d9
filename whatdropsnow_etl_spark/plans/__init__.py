from .flagship import flagship_segmentation
from .reference_etl import ReferenceEtl, run_reference_etl

__all__ = ["flagship_segmentation", "ReferenceEtl", "run_reference_etl"]
