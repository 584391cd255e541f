"""Point-Transformer U-Net backbone with Contrastive Boundary Learning — the shared
core of the ``pointtransformer`` and ``tgnet`` families (reference:
models/modules/cbl_point_transformer/)."""

from .backbone import PointTransformerSeg

__all__ = ["PointTransformerSeg"]
